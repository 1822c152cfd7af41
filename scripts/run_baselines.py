#!/usr/bin/env python
"""Run the baseline comparison sweep (reference
`/root/reference/scripts/run_baselines.py`): DeiT-Tiny / EfficientNet-B0 /
MobileNetV3-Large / ResNet50, focal-loss-only, 10 epochs."""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-root", type=Path, default=Path("data"))
    p.add_argument("--output-dir", type=Path,
                   default=Path("outputs/baselines"))
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--models", nargs="+", default=None,
                   help="subset of: deit_tiny efficientnet_b0 "
                        "mobilenetv3_large resnet50 vgg16 swin_tiny "
                        "(the last two are the baselines the reference "
                        "skipped for CPU cost)")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--n-per-class", type=int, default=16,
                   help="synthetic augmented images per class")
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--devices", type=int, default=-1)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--no-fps", action="store_true",
                   help="skip the bs=1 fps column (its compile goes "
                        "through the sandbox relay, which can hang)")
    p.add_argument("--fps-timeout", type=int, default=600,
                   help="SIGALRM bound on each model's fps measurement")
    args = p.parse_args()

    import jax
    from rovit_kan_tpu.utils.compilation_cache import (
        enable_compilation_cache)
    enable_compilation_cache()
    if args.cpu:
        jax.config.update("jax_num_cpu_devices", max(args.devices, 1))
        jax.config.update("jax_platforms", "cpu")

    from rovit_kan_tpu.config import get_config
    from rovit_kan_tpu.data.dataset import create_dataloaders
    from rovit_kan_tpu.data.synthetic import generate_synthetic_dataset
    from rovit_kan_tpu.experiments.baselines import run_baseline_experiments
    from rovit_kan_tpu.parallel.mesh import make_mesh

    config = get_config()
    config.data.image_size = args.image_size
    config.train.batch_size = args.batch_size

    aug_root = args.data_root / "Augmented Image"
    orig_root = args.data_root / "Original Image"
    if args.synthetic:
        generate_synthetic_dataset(aug_root, n_per_class=args.n_per_class,
                                   size=args.image_size,
                                   class_names=config.data.class_names,
                                   seed=args.seed)
        generate_synthetic_dataset(orig_root,
                                   n_per_class=max(args.n_per_class // 2, 2),
                                   size=args.image_size,
                                   class_names=config.data.class_names,
                                   seed=args.seed + 1)

    train_l, val_l, test_l = create_dataloaders(
        aug_root, orig_root, config.data.class_names,
        config.data.severity_map, batch_size=args.batch_size,
        seed=args.seed, image_size=args.image_size)

    focal_alpha = train_l.dataset.get_class_weights()
    mesh = make_mesh(args.devices)
    run_baseline_experiments(config, train_l, val_l, test_l,
                             args.output_dir, model_names=args.models,
                             epochs=args.epochs, focal_alpha=focal_alpha,
                             mesh=mesh, seed=args.seed,
                             run_fps=not args.no_fps,
                             fps_timeout_s=args.fps_timeout)


if __name__ == "__main__":
    main()
