#!/usr/bin/env python
"""Serving-engine throughput A/B: the "auto" kernel policy (round 3:
whole-block fused Pallas kernel ON for every bf16 TPU inference build)
vs the block kernel forced off (pre-round-3 behavior — XLA at 197
tokens, packed-heads Pallas attention at >=512).

This measures the policy where it actually ships — the InferenceEngine a
user loads with ``load_engine`` — rather than a bare kernel microbench.
Caveat for this sandbox: each ``predict`` pays one uint8 H2D transfer
through the TPU relay (~4.8 MB at bs32/224px), which dominates the
~2-4 ms of compute, so through the relay both arms measure the transfer
path, not the kernels (docs/VALIDATION.md "Serving"). On local-attached
hardware the block kernel's +45-81%% forward win applies directly.

Usage:
    python scripts/bench_serving.py CHECKPOINT [--image_size 384]
        [--batch_size 32] [--iters 30]
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _measure(engine, images, iters):
    import numpy as np
    engine.warmup()
    engine.predict(images)                       # shape-specific compile
    t0 = time.perf_counter()
    acc = 0.0
    for _ in range(iters):
        out = engine.predict(images)
        acc += float(np.asarray(out["cls_probs"]).sum())   # host fetch
    dt = time.perf_counter() - t0
    if not np.isfinite(acc):
        raise ValueError(f"non-finite checksum {acc}: engine output broken")
    return images.shape[0] * iters / dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("checkpoint", type=Path)
    p.add_argument("--image_size", type=int, default=384)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    import numpy as np
    from rovit_kan_tpu.utils.compilation_cache import (
        enable_compilation_cache)
    enable_compilation_cache()

    import jax
    from rovit_kan_tpu.config import Config
    from rovit_kan_tpu.utils.checkpoint import load_checkpoint
    from rovit_kan_tpu.models.rovit_kan import build_model
    from rovit_kan_tpu.models.convert import transfer_resolution
    from rovit_kan_tpu.serving import InferenceEngine

    ck = load_checkpoint(args.checkpoint)
    base_cfg = Config.from_dict(ck["config"])
    params = ck["ema_params"] if ck.get("ema_params") is not None \
        else ck["params"]

    rng = np.random.RandomState(0)
    rows = []
    for size in dict.fromkeys((base_cfg.data.image_size, args.image_size)):
        imgs = rng.randint(0, 256,
                           (args.batch_size, size, size, 3), dtype=np.uint8)
        for policy in ("auto", False):
            cfg = Config.from_dict(ck["config"])
            cfg.data.image_size = size
            cfg.tpu.use_pallas_block = policy
            p_sized = params
            if size != base_cfg.data.image_size:
                p_sized = transfer_resolution(params, size,
                                              cfg.model.patch_size)
            model = build_model(cfg, inference=True)
            ips = _measure(InferenceEngine(model, p_sized,
                                           batch_size=args.batch_size),
                           imgs, args.iters)
            row = {"image_size": size, "policy": str(policy),
                   "resolved_block": bool(model.use_pallas_block),
                   "resolved_attention": bool(model.use_pallas_attention),
                   "images_per_sec": round(ips, 1)}
            rows.append(row)
            print(json.dumps(row), flush=True)

    result = {"device": str(jax.devices()[0].device_kind),
              "batch_size": args.batch_size, "rows": rows}
    if args.out:
        Path(args.out).write_text(json.dumps(result, indent=2))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
