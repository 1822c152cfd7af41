#!/usr/bin/env python
"""HTTP serving endpoint around the InferenceEngine (stdlib only).

The reference stops at an eager ``predict()`` method; this completes the
production-serving story: one pre-compiled fixed-shape program behind a
threaded HTTP server, ready for a load balancer.

Protocol (stdlib-only on both sides):

  POST /predict    body = ``.npy`` bytes of a uint8 (N, H, W, 3) array
                   (``np.save(buf, imgs)``) -> JSON dict of predictions
                   (cls_pred / cls_probs / severities / uncertainty).
  GET  /healthz    -> 200 + JSON engine stats once the serving program is
                   compiled (readiness probe).
  GET  /metrics    -> Prometheus text exposition of the same stats
                   (rovit_serving_* counters/gauges).

Usage:
  python scripts/serve.py --checkpoint outputs/train/checkpoints/best_model \
      --port 8000 [--batch_size 64] [--image_size 384] [--cpu]

Client sketch:
  buf = io.BytesIO(); np.save(buf, imgs_u8)
  req = urllib.request.Request("http://host:8000/predict", buf.getvalue())
  preds = json.loads(urllib.request.urlopen(req).read())
"""
from __future__ import annotations

import argparse
import io
import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

import numpy as np


def make_server(engine, host: str = "0.0.0.0", port: int = 8000,
                batch_window_ms: float = 0.0) -> ThreadingHTTPServer:
    """Wrap an InferenceEngine in a ready-to-run ThreadingHTTPServer.

    Concurrent requests are dynamically coalesced by a
    :class:`rovit_kan_tpu.serving.MicroBatcher`: one worker thread owns the
    device and greedily packs whole queued requests into a single padded-
    batch program, so N concurrent small clients fill the MXU instead of
    each paying a full ``batch_size`` forward behind a lock. With the
    default 0 ms window a lone client sees exactly the unbatched latency;
    ``batch_window_ms > 0`` lingers for stragglers (throughput mode)."""
    from rovit_kan_tpu.serving import MicroBatcher
    batcher = MicroBatcher(engine, window_ms=batch_window_ms)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):   # quiet access log
            pass

        def _json(self, code: int, payload) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        size = engine.model.image_size
        # Generous request cap: 4 full batches of raw pixels + npy header.
        max_body = 4 * engine.batch_size * size * size * 3 + 4096

        def do_GET(self):
            if self.path == "/healthz":
                # stats() only READS the rolling deques (GIL-atomic appends
                # on the worker side) — a readiness probe must not block
                # behind an in-flight inference.
                self._json(200, batcher.stats())
            elif self.path == "/metrics":
                # Prometheus text exposition of the same stats (gauges:
                # rolling-window rates; counters: exact totals).
                lines = []
                for k, v in sorted(batcher.stats().items()):
                    name = f"rovit_serving_{k}"
                    kind = ("counter" if k in ("requests", "images_served",
                                               "batches_run",
                                               "requests_coalesced")
                            else "gauge")
                    lines += [f"# TYPE {name} {kind}", f"{name} {v}"]
                body = ("\n".join(lines) + "\n").encode()
                self.send_response(200)
                self.send_header("Content-Type",
                                 "text/plain; version=0.0.4")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self._json(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            if self.path != "/predict":
                self._json(404, {"error": f"unknown path {self.path}"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                if n > self.max_body:
                    self._json(413, {"error": f"body {n} bytes exceeds "
                                              f"cap {self.max_body}"})
                    return
                imgs = np.load(io.BytesIO(self.rfile.read(n)),
                               allow_pickle=False)
                if imgs.dtype != np.uint8 or imgs.ndim != 4 \
                        or imgs.shape[-1] != 3:
                    raise ValueError(
                        f"expected uint8 (N, H, W, 3), got "
                        f"{imgs.dtype} {imgs.shape}")
                if imgs.shape[1:3] != (self.size, self.size):
                    # The serving program is fixed-shape: a mismatched
                    # resolution would retrace (and fail on pos_embed),
                    # holding the lock — reject it as a client error.
                    raise ValueError(
                        f"engine serves {self.size}x{self.size}px, got "
                        f"{imgs.shape[1]}x{imgs.shape[2]}")
            except Exception as e:           # malformed request
                self._json(400, {"error": str(e)})
                return
            fut = None
            try:
                fut = batcher.submit(imgs)
                # Bounded wait: if the batcher worker ever wedges, surface
                # a 503 instead of hanging this handler thread forever
                # (ThreadingHTTPServer would otherwise accumulate stuck
                # threads while /healthz stays green). cancel() is safe:
                # the worker claims futures before dispatch and drops
                # cancelled ones.
                out = fut.result(timeout=120)
                self._json(200, {k: np.asarray(v).tolist()
                                 for k, v in out.items()})
            except TimeoutError:
                fut.cancel()
                self._json(503, {"error": "inference timed out"})
            except Exception as e:           # serving failure
                if fut is not None:
                    fut.cancel()
                self._json(500, {"error": str(e)})

    server = ThreadingHTTPServer((host, port), Handler)
    server.batcher = batcher                 # owned: closed by callers/tests
    return server


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", type=Path, required=True)
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--image_size", type=int, default=None,
                   help="serve at a different resolution than trained "
                        "(pos-embed interpolation)")
    p.add_argument("--batch_window_ms", type=float, default=0.0,
                   help="linger this long for more requests before running "
                        "a partially-filled batch (0 = greedy coalescing, "
                        "no added latency)")
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    p.add_argument("--temperature", type=float, default=None,
                   help="calibration temperature for served cls_probs "
                        "(softmax(logits/T); argmax unchanged). Default: "
                        "the value stored in the checkpoint sidecar by "
                        "evaluate.py --store_temperature, else 1.0")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from rovit_kan_tpu.serving import load_engine
    from rovit_kan_tpu.utils.compilation_cache import (
        enable_compilation_cache)
    enable_compilation_cache()

    engine = load_engine(args.checkpoint, batch_size=args.batch_size,
                         image_size=args.image_size,
                         temperature=args.temperature)
    if engine.temperature != 1.0:
        print(f"Serving calibrated confidences (T={engine.temperature:.4f})")
    print(f"Compiling serving program (batch {args.batch_size}, "
          f"{engine.model.image_size}px)...")
    engine.warmup()
    server = make_server(engine, args.host, args.port,
                         batch_window_ms=args.batch_window_ms)

    # Graceful stop on SIGTERM (the orchestrator/load-balancer stop
    # signal), same drain path as Ctrl-C: stop accepting, finish queued
    # inference, exit 0. shutdown() must run off the serving thread.
    import signal
    import threading

    def _term(signum, frame):
        threading.Thread(target=server.shutdown, daemon=True).start()

    signal.signal(signal.SIGTERM, _term)

    print(f"Serving on http://{args.host}:{server.server_address[1]} "
          f"(POST /predict, GET /healthz, GET /metrics)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()
    finally:
        server.server_close()
        server.batcher.close()   # drain queued requests before exit


if __name__ == "__main__":
    main()
