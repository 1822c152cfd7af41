#!/usr/bin/env python
"""Forward-only A/B of the whole-block fused kernel across batch sizes.

Times ONLY the inference forward (no train-step compile) so a full batch
sweep fits one session; same fetch-barriered best-of-chunks discipline as
bench.py. Writes {batch: {fused_ms, xla_ms}} JSON to --out.
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def bench_fwd(batch: int, pallas_block: bool, image_size: int,
              iters: int, n_chunks: int = 5, embed_dim: int = None,
              num_heads: int = None, depth: int = None) -> float:
    import jax
    import jax.numpy as jnp
    from rovit_kan_tpu.config import get_config
    from rovit_kan_tpu.models.rovit_kan import build_model

    config = get_config()
    config.data.image_size = image_size
    config.tpu.use_pallas_block = pallas_block
    config.tpu.use_pallas_attention = False
    # Scale sweep (DeiT-Small d=384/h=6, Base d=768/h=12): validates the
    # "auto" block-kernel policy beyond the flagship's d=192.
    if embed_dim is not None:
        config.model.embed_dim = embed_dim
        config.model.kan_layers = [embed_dim, 64, 16, 1]
    if num_heads is not None:
        config.model.num_heads = num_heads
    if depth is not None:
        config.model.depth = depth
    model = build_model(config, dtype=jnp.bfloat16, inference=True)

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (batch, image_size, image_size, 3),
                          jnp.float32)
    params = model.init(key, x[:1])["params"]

    @jax.jit
    def fwd_acc(params, x, acc):
        out = model.apply({"params": params}, x, deterministic=True)
        return acc + jnp.sum(out["cls_logits"].astype(jnp.float32))

    acc = fwd_acc(params, x, jnp.zeros((), jnp.float32))
    float(acc)
    for _ in range(5):
        acc = fwd_acc(params, x, acc)
    float(acc)

    best = float("inf")
    for _ in range(n_chunks):
        acc = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        for _ in range(iters):
            acc = fwd_acc(params, x, acc)
        assert np.isfinite(float(acc))
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e3


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", type=int, nargs="+",
                   default=[1, 8, 16, 32, 64, 128, 256])
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--embed_dim", type=int, default=None,
                   help="override embed dim (e.g. 384 DeiT-Small)")
    p.add_argument("--num_heads", type=int, default=None)
    p.add_argument("--depth", type=int, default=None)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    from rovit_kan_tpu.utils.compilation_cache import (
        enable_compilation_cache)
    enable_compilation_cache()

    table = {}
    for b in args.batches:
        it = max(5, min(args.iters, 2048 // b))
        fused = bench_fwd(b, True, args.image_size, it,
                          embed_dim=args.embed_dim,
                          num_heads=args.num_heads, depth=args.depth)
        xla = bench_fwd(b, False, args.image_size, it,
                        embed_dim=args.embed_dim,
                        num_heads=args.num_heads, depth=args.depth)
        table[b] = {"fused_ms": round(fused, 3), "xla_ms": round(xla, 3),
                    "fused_ips": round(b / fused * 1e3, 1),
                    "xla_ips": round(b / xla * 1e3, 1),
                    "speedup": round(xla / fused, 3)}
        print(b, json.dumps(table[b]), flush=True)

    import jax
    result = {"device": str(jax.devices()[0].device_kind),
              "image_size": args.image_size, "embed_dim": args.embed_dim,
              "num_heads": args.num_heads, "depth": args.depth,
              "table": table}
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
