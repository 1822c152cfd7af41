#!/usr/bin/env python
"""Run the 6-variant ablation study (reference
`/root/reference/scripts/run_ablation.py`: ``--data-root --output-dir
--batch-size --epochs --seed --fast``; 70/15/15 seeded split, fast mode =
fewer epochs + subset)."""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-root", type=Path, default=Path("data"))
    p.add_argument("--output-dir", type=Path, default=Path("outputs/ablation"))
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--patience", type=int, default=None,
                   help="early-stop patience (epochs without val "
                        "improvement); default keeps the config value")
    p.add_argument("--checkpoint-min-interval", type=float, default=None,
                   help="min seconds between best-model disk writes "
                        "(config.train.checkpoint_min_interval_s) — with "
                        "val improving most epochs, per-improvement "
                        "serialization dominates small fast epochs")
    p.add_argument("--fast", action="store_true",
                   help="5 epochs / 1000-sample subset / bs=64 "
                        "(reference run_ablation.py:133-137)")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--n-per-class", type=int, default=None,
                   help="synthetic images per class (default: 64, or 8 "
                        "with --tiny; the reference-scale recipe uses "
                        "1000 -> 4k images)")
    p.add_argument("--devices", type=int, default=-1)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--tiny", action="store_true",
                   help="tiny model + 64px (CI smoke)")
    p.add_argument("--device-cache", action="store_true",
                   help="HBM-resident dataset + one-dispatch scan epochs")
    args = p.parse_args()

    import jax
    from rovit_kan_tpu.utils.compilation_cache import (
        enable_compilation_cache)
    enable_compilation_cache()
    if args.cpu:
        jax.config.update("jax_num_cpu_devices", max(args.devices, 1))
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    from rovit_kan_tpu.config import get_config
    from rovit_kan_tpu.data.dataset import RoseLeafDataset, Subset, Loader
    from rovit_kan_tpu.data.synthetic import generate_synthetic_dataset
    from rovit_kan_tpu.experiments.ablation import run_ablation_study
    from rovit_kan_tpu.parallel.mesh import make_mesh

    config = get_config()
    epochs = args.epochs
    batch_size = args.batch_size
    max_samples = None
    if args.fast:
        epochs = 5
        max_samples = 1000
        batch_size = 64
    if args.tiny:
        config.data.image_size = 64
        config.model.depth = 2
        config.model.embed_dim = 32
        config.model.num_heads = 2
        config.model.hidden_dim = 16
        config.model.kan_layers = [32, 8, 1]
        config.flags.mixed_precision = False
        config.flags.freeze_backbone_epochs = 1
        config.train.stage_1_epochs = 1
        config.train.stage_2_epochs = 2
        config.train.stage_3_epochs = 3
        config.tpu.use_pallas_attention = False
        config.tpu.use_pallas_kan = False
        epochs = min(epochs, 4)
        batch_size = min(batch_size, 8)
    config.train.batch_size = batch_size
    config.train.epochs = epochs
    if args.patience is not None:
        config.train.early_stop_patience = args.patience
    if args.checkpoint_min_interval is not None:
        config.train.checkpoint_min_interval_s = args.checkpoint_min_interval
    # Scale curriculum boundaries to the actual epoch budget (the reference
    # keeps stage boundaries 10/25/40 even in fast mode, which never leaves
    # stage 1 at 5 epochs; we spread stages evenly instead).
    if epochs < config.train.stage_4_epochs and not args.tiny:
        config.train.stage_1_epochs = max(1, epochs // 4)
        config.train.stage_2_epochs = max(2, epochs // 2)
        config.train.stage_3_epochs = max(3, 3 * epochs // 4)
        config.train.stage_4_epochs = epochs

    root = args.data_root / "Augmented Image"
    if args.synthetic:
        n = args.n_per_class or (8 if args.tiny else 64)
        generate_synthetic_dataset(root, n_per_class=n,
                                   size=config.data.image_size,
                                   class_names=config.data.class_names,
                                   seed=args.seed)

    ds = RoseLeafDataset(root, config.data.class_names,
                         config.data.severity_map,
                         image_size=config.data.image_size, mode="augmented")

    # 70/15/15 seeded split (reference run_ablation.py:164-173).
    rng = np.random.RandomState(args.seed)
    order = rng.permutation(len(ds))
    if max_samples and len(order) > max_samples:
        order = order[:max_samples]
    n = len(order)
    n_train, n_val = int(0.7 * n), int(0.15 * n)
    train_ds = Subset(ds, order[:n_train])
    val_ds = Subset(ds, order[n_train:n_train + n_val])
    test_ds = Subset(ds, order[n_train + n_val:])

    mesh = make_mesh(args.devices)
    if args.device_cache:
        from rovit_kan_tpu.data.device_cache import device_cache_loaders
        train_l, val_l, test_l = device_cache_loaders(
            train_ds, val_ds, test_ds, batch_size, seed=args.seed,
            mesh=mesh)
    else:
        train_l = Loader(train_ds, batch_size, shuffle=True, drop_last=True,
                         seed=args.seed)
        val_l = Loader(val_ds, batch_size)
        test_l = Loader(test_ds, batch_size)

    focal_alpha = train_ds.get_class_weights()
    exp = run_ablation_study(config, train_l, val_l, test_l,
                             args.output_dir, focal_alpha=focal_alpha,
                             epochs=epochs, mesh=mesh, seed=args.seed)
    print("Ablation study complete:", args.output_dir)
    return exp


if __name__ == "__main__":
    main()
