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


def _measure_concurrent(engine, n_clients, requests_each, request_size,
                        image_size, batched):
    """N client threads each fire R size-k requests as fast as they can.

    ``batched=False`` reproduces the pre-batching HTTP server: one lock,
    each request runs its own full padded-batch program. ``batched=True``
    routes through the MicroBatcher. Returns aggregate img/s + per-request
    latency stats + (batched) fill factor."""
    import threading
    import numpy as np
    from rovit_kan_tpu.serving import MicroBatcher

    rng = np.random.RandomState(1)
    reqs = [rng.randint(0, 256, (request_size, image_size, image_size, 3),
                        dtype=np.uint8) for _ in range(n_clients)]
    engine.warmup()

    lock = threading.Lock()
    batcher = MicroBatcher(engine) if batched else None
    lat: list = []

    def client(i):
        for _ in range(requests_each):
            t0 = time.perf_counter()
            if batched:
                out = batcher.predict(reqs[i])
            else:
                with lock:
                    out = engine.predict(reqs[i])
            float(out["cls_probs"].sum())            # host-side touch
            lat.append(time.perf_counter() - t0)

    client(0)                                         # warm shape/compile
    lat.clear()
    threads = [threading.Thread(target=client, args=(i,))
               for i in range(n_clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.perf_counter() - t0
    row = {
        "batched": batched,
        "images_per_sec": round(
            n_clients * requests_each * request_size / dt, 1),
        "mean_latency_ms": round(float(np.mean(lat)) * 1e3, 2),
        "p95_latency_ms": round(float(np.percentile(lat, 95)) * 1e3, 2),
    }
    if batched:
        s = batcher.stats()
        row["mean_requests_per_batch"] = round(
            s.get("mean_requests_per_batch", 1.0), 2)
        batcher.close()
    return row


def main():
    p = argparse.ArgumentParser()
    p.add_argument("checkpoint", type=Path, nargs="?", default=None)
    p.add_argument("--random_init", action="store_true",
                   help="benchmark a freshly initialized flagship model "
                        "instead of a checkpoint (throughput does not "
                        "depend on weight values; lets the A/B run when "
                        "no trained checkpoint is on disk)")
    p.add_argument("--image_size", type=int, default=384)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--concurrency", type=int, default=0,
                   help="instead of the kernel-policy A/B, run N "
                        "concurrent clients against the engine locked "
                        "(pre-batching) vs micro-batched")
    p.add_argument("--requests", type=int, default=20,
                   help="requests per client (concurrency mode)")
    p.add_argument("--request_size", type=int, default=1,
                   help="images per request (concurrency mode)")
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

    if args.random_init:
        from rovit_kan_tpu.config import get_config
        base_cfg = get_config()
        init_model = build_model(base_cfg, inference=True)
        params = init_model.init(
            jax.random.PRNGKey(0),
            np.zeros((1, base_cfg.data.image_size, base_cfg.data.image_size,
                      3), np.float32))["params"]
        ck = {"config": base_cfg.to_dict()}
    else:
        if args.checkpoint is None:
            raise SystemExit("pass a checkpoint path or --random_init")
        ck = load_checkpoint(args.checkpoint)
        base_cfg = Config.from_dict(ck["config"])
        params = ck["ema_params"] if ck.get("ema_params") is not None \
            else ck["params"]

    if args.concurrency:
        # Locked (pre-batching serve.py) vs MicroBatcher, same engine
        # build: the win is fewer, fuller padded-batch programs (and
        # fewer, fuller H2D transfers — a locked size-1 request still
        # transfers and computes the full padded batch).
        size = base_cfg.data.image_size
        model = build_model(Config.from_dict(ck["config"]), inference=True)
        rows = []
        for batched in (False, True):
            engine = InferenceEngine(model, params,
                                     batch_size=args.batch_size)
            row = _measure_concurrent(
                engine, args.concurrency, args.requests,
                args.request_size, size, batched)
            rows.append(row)
            print(json.dumps(row), flush=True)
        result = {"device": str(jax.devices()[0].device_kind),
                  "mode": "concurrency", "clients": args.concurrency,
                  "requests_per_client": args.requests,
                  "request_size": args.request_size,
                  "engine_batch_size": args.batch_size,
                  "image_size": size, "rows": rows}
        if args.out:
            Path(args.out).write_text(json.dumps(result, indent=2))
        print(json.dumps(result))
        return

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
