#!/usr/bin/env python
"""Evaluate a checkpoint on the Original-Image test set (reference
`/root/reference/scripts/evaluate.py`: ``--checkpoint --data_root
--batch_size``)."""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", type=Path, required=True)
    p.add_argument("--data_root", type=Path, default=Path("data"))
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--output_dir", type=Path, default=Path("outputs/eval"))
    p.add_argument("--image_size", type=int, default=None,
                   help="evaluate at a different resolution than trained "
                        "(pos-embed interpolation); default: the "
                        "checkpoint's native size")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--calibrate", action="store_true",
                   help="fit temperature scaling on the validation split "
                        "(Augmented tree) before evaluating: ECE/Brier "
                        "improve, argmax metrics are unchanged; records "
                        "pre/post ECE and the fitted T in the results")
    p.add_argument("--store_temperature", action="store_true",
                   help="with --calibrate: write the fitted T into the "
                        "checkpoint's meta sidecar so serving/export "
                        "apply it automatically")
    p.add_argument("--device_metrics", choices=["auto", "on", "off"],
                   default="auto",
                   help="compute metrics fully on device "
                        "(ops/device_metrics.py) instead of gathering "
                        "predictions to the host — the distributed-eval "
                        "path. 'auto' (default) switches it on when more "
                        "than one device is visible.")
    p.add_argument("--matmul_precision", default=None,
                   choices=["bfloat16", "tensorfloat32", "float32"],
                   help="force XLA matmul precision (TPU default truncates "
                        "fp32 operands to bf16 on the MXU; use float32 for "
                        "bit-faithful parity runs at ~1/3 the throughput)")
    args = p.parse_args()

    import jax
    from rovit_kan_tpu.utils.compilation_cache import (
        enable_compilation_cache)
    enable_compilation_cache()
    if args.matmul_precision:
        jax.config.update("jax_default_matmul_precision",
                          args.matmul_precision)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from rovit_kan_tpu.config import get_config
    from rovit_kan_tpu.data.dataset import RoseLeafDataset, Loader
    from rovit_kan_tpu.evaluation.evaluator import (
        Evaluator, load_model_for_evaluation)

    config = get_config()

    # Model architecture (incl. its native image size) comes from the config
    # embedded in the checkpoint when present; --image_size overrides via
    # pos-embed resolution transfer.
    model, params = load_model_for_evaluation(args.checkpoint, config,
                                              image_size=args.image_size)
    size = model.image_size
    config.data.image_size = size

    test_ds = RoseLeafDataset(args.data_root / "Original Image",
                              config.data.class_names,
                              config.data.severity_map,
                              image_size=size)
    if len(test_ds) == 0:
        raise SystemExit(
            f"no images found under {args.data_root / 'Original Image'} "
            f"(expected class-per-folder JPEGs; see README 'Quick start')")
    loader = Loader(test_ds, args.batch_size)

    evaluator = Evaluator(model, params, loader, config,
                          output_dir=args.output_dir)
    if args.calibrate:
        from rovit_kan_tpu.data.dataset import create_dataloaders
        _, val_loader, _ = create_dataloaders(
            args.data_root / "Augmented Image",
            args.data_root / "Original Image",
            config.data.class_names, config.data.severity_map,
            batch_size=args.batch_size, image_size=size)
        t = evaluator.fit_temperature(val_loader)
        print(f"Fitted temperature on validation split: T={t:.4f}")
        if args.store_temperature:
            if getattr(evaluator, "temperature_degenerate", False):
                # A perfectly separated validation set drives the NLL fit
                # to T → 0; persisting that would make serving emit
                # saturated 0/1 confidences on any OOD input. Refuse.
                print("Refusing --store_temperature: the fit is degenerate "
                      "(validation perfectly separated — raw T hit the "
                      "floor). The checkpoint sidecar is unchanged; "
                      "serve.py keeps T=1.0.")
            else:
                from rovit_kan_tpu.utils.checkpoint import update_meta
                update_meta(args.checkpoint, temperature=t)
                print(f"Stored T in the checkpoint sidecar: serve.py and "
                      f"export_model.py now calibrate by default")
    use_device = (args.device_metrics == "on"
                  or (args.device_metrics == "auto"
                      and jax.device_count() > 1))
    if use_device:
        # Distributed path: per-batch outputs stay on device and the whole
        # metric suite runs as one jit program — no host gather of
        # predictions (SURVEY.md §7 hard part (e)).
        import json
        m = evaluator.evaluate_on_device()
        print("On-device metrics (no host gather):")
        for key, v in m.items():
            if key != "confusion_matrix":
                print(f"  {key:16s} {v:.4f}")
        args.output_dir.mkdir(parents=True, exist_ok=True)
        with open(args.output_dir / "test_metrics_device.json", "w") as f:
            json.dump({k: (v.tolist() if hasattr(v, "tolist") else v)
                       for k, v in m.items()}, f, indent=2)
    else:
        evaluator.evaluate()


if __name__ == "__main__":
    main()
