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
    loader = Loader(test_ds, args.batch_size)

    evaluator = Evaluator(model, params, loader, config,
                          output_dir=args.output_dir)
    evaluator.evaluate()


if __name__ == "__main__":
    main()
