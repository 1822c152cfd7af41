#!/usr/bin/env python
"""Pallas-vs-XLA A/B benchmark for the attention + KAN kernels.

Measures full-model forward AND train-step wall time for every combination
of {pallas, xla} x {bf16, fp32} on the current backend, with the same
timing hygiene as bench.py (per-iteration output chained into a scalar,
host fetch inside the timed window). Writes a JSON table to stdout and
optionally to --out.

This is the measurement VERDICT round 1 asked for: the Pallas forward is
fused, but its backward is an XLA recompute (ops/attention.py), so whether
Pallas nets out positive for TRAINING is an empirical question.
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def bench_variant(use_pallas, bf16: bool, batch: int,
                  fwd_iters: int, train_iters: int,
                  scale: dict | None = None,
                  pallas_block: bool = False) -> dict:
    """``use_pallas``: bool for both kernels, or a (attention, kan) pair.

    ``scale`` optionally overrides model shape (embed_dim/depth/num_heads/
    image_size) to test whether kernel fusion pays beyond DeiT-Tiny.
    """
    import jax
    import jax.numpy as jnp
    from rovit_kan_tpu.config import get_config
    from rovit_kan_tpu.models.rovit_kan import build_model
    from rovit_kan_tpu.training.optimizer import (build_optimizer,
                                                  set_hyperparams)
    from rovit_kan_tpu.training.trainer import TrainState, make_train_step

    pallas_attn, pallas_kan = (use_pallas if isinstance(use_pallas, tuple)
                               else (use_pallas, use_pallas))
    config = get_config()
    config.tpu.use_pallas_attention = pallas_attn
    config.tpu.use_pallas_kan = pallas_kan
    config.tpu.use_pallas_block = pallas_block
    if scale:
        config.model.embed_dim = scale.get("embed_dim",
                                           config.model.embed_dim)
        config.model.depth = scale.get("depth", config.model.depth)
        config.model.num_heads = scale.get("num_heads",
                                           config.model.num_heads)
        config.data.image_size = scale.get("image_size",
                                           config.data.image_size)
        # KAN operates on the CLS feature vector: first layer = embed_dim.
        config.model.kan_layers = ([config.model.embed_dim]
                                   + list(config.model.kan_layers[1:]))
    size = config.data.image_size
    model = build_model(config,
                        dtype=jnp.bfloat16 if bf16 else jnp.float32)

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (batch, size, size, 3), jnp.float32)
    params = model.init(key, x[:1])["params"]

    @jax.jit
    def fwd_acc(params, x, acc):
        out = model.apply({"params": params}, x, deterministic=True)
        return acc + jnp.sum(out["cls_logits"].astype(jnp.float32))

    fwd_ms = float("nan")
    if fwd_iters > 0:
        acc = fwd_acc(params, x, jnp.zeros((), jnp.float32))
        float(acc)
        for _ in range(3):
            acc = fwd_acc(params, x, acc)
        float(acc)
        acc = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        for _ in range(fwd_iters):
            acc = fwd_acc(params, x, acc)
        assert np.isfinite(float(acc))
        fwd_ms = (time.perf_counter() - t0) / fwd_iters * 1e3

    tx = build_optimizer(config)
    train_step, _ = make_train_step(model, tx, config)
    state = TrainState(params=params,
                       opt_state=set_hyperparams(tx.init(params), 5e-4, 0.1),
                       rng=jax.random.PRNGKey(1),
                       step=jnp.zeros((), jnp.int32))
    rng = np.random.RandomState(0)
    bt = {"images": jnp.asarray(
              rng.randint(0, 256, (batch, size, size, 3)), jnp.uint8),
          "labels": jnp.asarray(rng.randint(0, 4, (batch,)), jnp.int32),
          "severity": jnp.asarray(
              rng.randint(0, 4, (batch,)).astype(np.float32))}
    args = (jnp.int32(4), jnp.float32(1.0), jnp.float32(1.0))

    state, m = train_step(state, bt, *args)
    float(m["total_loss"])
    for _ in range(3):
        state, m = train_step(state, bt, *args)
    float(m["total_loss"])
    loss_acc = jnp.zeros((), jnp.float32)
    t0 = time.perf_counter()
    for _ in range(train_iters):
        state, m = train_step(state, bt, *args)
        loss_acc = loss_acc + m["total_loss"]
    assert np.isfinite(float(loss_acc))
    train_ms = (time.perf_counter() - t0) / train_iters * 1e3

    return {"pallas_attn": pallas_attn, "pallas_kan": pallas_kan,
            "pallas_block": pallas_block, "bf16": bf16,
            "fwd_ms": round(fwd_ms, 3) if fwd_iters > 0 else None,
            "train_ms": round(train_ms, 3),
            "fwd_ips": (round(batch / fwd_ms * 1e3, 1)
                        if fwd_iters > 0 else None),
            "train_ips": round(batch / train_ms * 1e3, 1)}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--fwd_iters", type=int, default=30)
    p.add_argument("--train_iters", type=int, default=15)
    p.add_argument("--out", default=None)
    p.add_argument("--fp32", action="store_true",
                   help="also run the fp32 variants (slower compile)")
    p.add_argument("--embed_dim", type=int, default=None)
    p.add_argument("--depth", type=int, default=None)
    p.add_argument("--heads", type=int, default=None)
    p.add_argument("--image_size", type=int, default=None,
                   help="e.g. 384 -> 577 tokens (flash-attention regime)")
    p.add_argument("--attn_only", action="store_true",
                   help="only the (pallas-attn, xla) vs (xla, xla) pair")
    p.add_argument("--block", action="store_true",
                   help="A/B the whole-block fused kernel "
                        "(ops/block_kernel.py) against pure XLA")
    p.add_argument("--resid_ab", action="store_true",
                   help="3-arm same-session A/B of the block kernel's "
                        "backward: saved-residual "
                        "(ROVIT_BLOCK_RESIDUAL_BWD=1) vs recompute "
                        "(default) vs pure XLA")
    args = p.parse_args()
    scale = {k: v for k, v in [("embed_dim", args.embed_dim),
                               ("depth", args.depth),
                               ("num_heads", args.heads),
                               ("image_size", args.image_size)]
             if v is not None} or None

    import jax
    from rovit_kan_tpu.utils.compilation_cache import (
        enable_compilation_cache)
    enable_compilation_cache()

    rows = []
    # (attention, kan) pallas flags x bf16; --fp32 adds fp32 repeats.
    combos = [((True, True), True), ((False, False), True),
              ((True, False), True), ((False, True), True)]
    if args.attn_only:
        combos = [((True, False), True), ((False, False), True)]
    if args.fp32:
        combos += [((True, True), False), ((False, False), False)]
    combos = [(up, bf, False) for up, bf in combos]
    if args.block:
        combos = [((False, False), True, True), ((False, False), True, False)]
    if args.resid_ab:
        # (pallas flags, bf16, pallas_block, ROVIT_BLOCK_RESIDUAL_BWD)
        combos = [((False, False), True, True, "1"),
                  ((False, False), True, True, "0"),
                  ((False, False), True, False, "0")]
    else:
        combos = [c + ("0",) for c in combos]
    import os
    for use_pallas, bf16, pblock, residual in combos:
        os.environ["ROVIT_BLOCK_RESIDUAL_BWD"] = residual
        r = bench_variant(use_pallas, bf16, args.batch,
                          args.fwd_iters, args.train_iters, scale=scale,
                          pallas_block=pblock)
        r["residual_bwd"] = residual == "1"
        rows.append(r)
        print(json.dumps(r), flush=True)
    os.environ.pop("ROVIT_BLOCK_RESIDUAL_BWD", None)

    result = {"device": str(jax.devices()[0].device_kind),
              "scale": scale, "rows": rows}
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
