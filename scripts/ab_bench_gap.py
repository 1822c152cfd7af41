#!/usr/bin/env python
"""Decompose the bench.py-vs-profile_train.py train-throughput gap.

Round-4 verdict item: the driver bench measured 5,028 img/s (bs64) while
profile_train measured 5,549 on the same session — a 9-15% spread
attributed to one sentence in VALIDATION.md. This script measures exactly
where the delta lives, using bench.py's own setup (same model build, same
uint8 batch, same donated train_step, same fetch-barriered chunk timing):

1. **Chunk-length sweep** — throughput at 5/10/20/40 steps per timed
   chunk. Every chunk closes with a result-dependent host fetch; through
   the sandbox's TPU relay that fetch costs ~10ms of wall regardless of
   chunk length, so short chunks understate the device's steady-state
   rate. bench.py's train section used 10 steps/chunk while its *forward*
   sections and profile_train both use 20 — the prime suspect.
2. **Mix on/off** — the traced CutMix/MixUp branch (mix=1.0 vs 0.0), the
   other hypothesis in VALIDATION.md's one-liner.
3. **Linear fit** — per-step ms and per-chunk (fetch) ms from the sweep:
   wall(chunk) = steps * step_ms + fetch_ms.

Writes outputs/ab_bench_gap.json.
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def measure(batch_size: int, chunk_lens=(5, 10, 20, 40), n_chunks: int = 5,
            mix_values=(1.0, 0.0)) -> dict:
    import jax
    import jax.numpy as jnp
    from rovit_kan_tpu.config import get_config
    from rovit_kan_tpu.models.rovit_kan import build_model
    from rovit_kan_tpu.training.optimizer import (build_optimizer,
                                                  set_hyperparams)
    from rovit_kan_tpu.training.trainer import TrainState, make_train_step

    config = get_config()
    model = build_model(config, dtype=jnp.bfloat16)    # bench.py line 199
    key = jax.random.PRNGKey(0)
    x1 = jax.random.normal(key, (1, 224, 224, 3), jnp.float32)
    params = model.init(key, x1)["params"]

    tx = build_optimizer(config)
    train_step, _ = make_train_step(model, tx, config)
    state = TrainState(params=params,
                       opt_state=set_hyperparams(tx.init(params), 5e-4, 0.1),
                       rng=jax.random.PRNGKey(1),
                       step=jnp.zeros((), jnp.int32))

    rng = np.random.RandomState(0)
    batch = {
        "images": jnp.asarray(rng.randint(0, 256, (batch_size, 224, 224, 3),
                                          dtype=np.uint8)),
        "labels": jnp.asarray(rng.randint(0, 4, (batch_size,)), jnp.int32),
        "severity": jnp.asarray(
            rng.randint(0, 4, (batch_size,)).astype(np.float32)),
    }
    stage, live = jnp.int32(4), jnp.float32(1.0)

    out = {"batch_size": batch_size, "n_chunks": n_chunks}
    carry = [state]
    for mix_v in mix_values:
        mix = jnp.float32(mix_v)
        # Warm (compile is shared across mix values — mix is traced).
        st, m = train_step(carry[0], batch, stage, live, mix)
        float(m["total_loss"])
        for _ in range(5):
            st, m = train_step(st, batch, stage, live, mix)
        float(m["total_loss"])
        carry[0] = st

        rec = {}
        for steps in chunk_lens:
            times = []
            for _ in range(n_chunks):
                st = carry[0]
                acc = jnp.zeros((), jnp.float32)
                t0 = time.perf_counter()
                for _ in range(steps):
                    st, m = train_step(st, batch, stage, live, mix)
                    acc = acc + m["total_loss"]
                assert np.isfinite(float(acc))   # host fetch = barrier
                times.append(time.perf_counter() - t0)
                carry[0] = st
            best = min(times)
            rec[f"chunk{steps}"] = {
                "best_wall_s": best,
                "ips": batch_size * steps / best,
            }
        # Linear fit over best-of chunks: wall = steps*step_ms + fetch_ms.
        xs = np.asarray(chunk_lens, np.float64)
        ys = np.asarray([rec[f"chunk{c}"]["best_wall_s"] * 1e3
                         for c in chunk_lens])
        A = np.stack([xs, np.ones_like(xs)], 1)
        (step_ms, fetch_ms), *_ = np.linalg.lstsq(A, ys, rcond=None)
        rec["fit_step_ms"] = float(step_ms)
        rec["fit_fetch_ms_per_chunk"] = float(fetch_ms)
        rec["asymptotic_ips"] = batch_size / step_ms * 1e3
        out[f"mix{mix_v:g}"] = rec
        print(f"bs{batch_size} mix={mix_v:g}: "
              + " ".join(f"c{c}={rec[f'chunk{c}']['ips']:.0f}"
                         for c in chunk_lens)
              + f" | fit step={step_ms:.2f}ms fetch={fetch_ms:.2f}ms"
              + f" asymptote={rec['asymptotic_ips']:.0f} img/s")
    return out


def main():
    import jax
    from rovit_kan_tpu.utils.compilation_cache import (
        enable_compilation_cache)
    enable_compilation_cache()
    res = {"device": str(jax.devices()[0])}
    for bs in (64, 256):
        res[f"bs{bs}"] = measure(bs, chunk_lens=(5, 10, 20, 40)
                                 if bs == 64 else (3, 6, 12, 24))
    out = Path("outputs/ab_bench_gap.json")
    out.write_text(json.dumps(res, indent=2))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
