#!/usr/bin/env python
"""Convert a PyTorch checkpoint to this framework's .npz weight format.

Accepts either a reference RoViTKAN ``best_model.pth`` (full model,
`/root/reference/training/trainer.py:311-325` format) or a bare timm
``deit_tiny_patch16_224`` state_dict (backbone only) — auto-detected from
the key prefixes.

Usage:
    python scripts/convert_checkpoint.py --input best_model.pth \
        --output weights.npz
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", type=Path, required=True)
    p.add_argument("--output", type=Path, required=True)
    p.add_argument("--depth", type=int, default=12)
    args = p.parse_args()

    from rovit_kan_tpu.models.convert import (
        load_torch_checkpoint, convert_reference_checkpoint,
        convert_timm_vit, save_npz)

    sd = load_torch_checkpoint(args.input)
    if any(k.startswith("backbone.model.") for k in sd):
        params = convert_reference_checkpoint(sd, depth=args.depth)
        kind = "reference RoViTKAN"
    else:
        params = {"backbone": convert_timm_vit(sd, depth=args.depth)}
        kind = "timm ViT backbone"
    save_npz(params, args.output)
    n = sum(v.size for _, v in _leaves(params))
    print(f"Converted {kind}: {n:,} params -> {args.output}")


def _leaves(tree, prefix=""):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _leaves(v, f"{prefix}{k}/")
        else:
            yield f"{prefix}{k}", v


if __name__ == "__main__":
    main()
