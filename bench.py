"""Headline benchmark: DeiT-Tiny+KAN full-model forward throughput.

Prints ONE JSON line:
    {"metric": "images_per_sec_fwd_bs64", "value": N, "unit": "images/sec",
     "vs_baseline": N}

Baseline: the reference's recorded inference FPS of 2.6 (bs=1, CPU,
README.md:315; methodology evaluation/metrics.py:63-93 — 10 warmup + 100
timed forwards). Here: full 4-head forward (classification + ordinal +
uncertainty + KAN) at 224px, batch 64, bf16 backbone with Pallas kernels on
TPU, 10 warmup + 100 timed steps.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

REFERENCE_FPS = 2.6  # reference README.md:315 (bs=1, CPU)
BATCH = 64
WARMUP = 10
ITERS = 100


def main() -> None:
    from rovit_kan_tpu.config import get_config
    from rovit_kan_tpu.models.rovit_kan import build_model
    from rovit_kan_tpu.utils.compilation_cache import (
        enable_compilation_cache)
    enable_compilation_cache()

    # Same predicate the kernels use for their interpret-mode fallback
    # (ops/attention.py, ops/kan_kernel.py): Pallas only on a real TPU
    # backend; elsewhere the plain XLA path is the fast one.
    on_tpu = jax.default_backend() == "tpu"
    config = get_config()
    config.tpu.use_pallas_attention = on_tpu
    config.tpu.use_pallas_kan = on_tpu
    model = build_model(config, dtype=jnp.bfloat16)

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (BATCH, 224, 224, 3), jnp.float32)
    params = model.init(key, x[:1])["params"]

    @jax.jit
    def fwd(params, x):
        return model.apply({"params": params}, x, deterministic=True)

    out = fwd(params, x)
    jax.block_until_ready(out)
    for _ in range(WARMUP):
        out = fwd(params, x)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fwd(params, x)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    ips = BATCH * ITERS / dt
    print(json.dumps({
        "metric": "images_per_sec_fwd_bs64",
        "value": round(ips, 2),
        "unit": "images/sec",
        "vs_baseline": round(ips / REFERENCE_FPS, 2),
    }))


if __name__ == "__main__":
    main()
