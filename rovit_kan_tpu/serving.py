"""Production inference engine: fixed-shape batched serving on TPU.

The reference's inference story is ``RoViTKAN.predict`` called eagerly per
batch (`/root/reference/models/rovit_kan.py:126-161`) plus an FPS
micro-benchmark. This engine is the deployment-shaped equivalent:

- ONE pre-compiled fixed-batch program (no retraces ever): partial batches
  zero-pad to ``batch_size`` and slice back — latency is constant;
- raw uint8 NHWC input; the ImageNet normalization runs on device, fused by
  XLA into the patch-embed matmul's producer;
- optional data-parallel serving over a ``Mesh`` (batch sharded over ICI);
- derived outputs matching ``predict``: softmax/argmax, ordinal class probs
  + expected severity, uncertainty std, KAN severity;
- rolling throughput/latency stats for monitoring.
"""
from __future__ import annotations

import queue
import threading
import time
from typing import Dict, Iterable, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from rovit_kan_tpu.ops.preprocess import eval_batch
from rovit_kan_tpu.ops.ordinal import (
    cumulative_to_class_probs,
    ordinal_expected_severity,
)


def build_serving_forward(model, temperature: float = 1.0):
    """Pure serving function ``(params, uint8 NHWC images) -> outputs``:
    on-device normalization + forward + derived predictions (softmax,
    ordinal class probs/expected severity, uncertainty std, KAN severity).
    Shared by ``InferenceEngine`` (jitted) and ``export.export_serving``
    (AOT-lowered to StableHLO).

    ``temperature`` applies post-hoc confidence calibration (Guo et al.
    2017; fitted on validation logits by ``Evaluator.fit_temperature`` and
    stored in the checkpoint sidecar by ``scripts/evaluate.py
    --store_temperature``): ``cls_probs = softmax(logits / T)``. A positive
    scalar divide cannot change the argmax, so ``cls_pred`` and every other
    output are unaffected — only the served confidence distribution is."""
    import math
    if not (math.isfinite(temperature) and temperature > 0.0):
        # T<=0 would break the argmax-invariance contract above (and T=0
        # divides by zero); a corrupt/hand-edited sidecar must fail loudly
        # at engine construction, not serve contradictory outputs.
        raise ValueError(
            f"calibration temperature must be a positive finite scalar, "
            f"got {temperature!r} — re-fit with `evaluate.py --calibrate "
            f"--store_temperature` or pass temperature=1.0 to disable")
    with_ordinal = getattr(model, "with_ordinal", True)
    with_uncertainty = getattr(model, "with_uncertainty", True)
    inv_t = float(1.0 / temperature)

    def forward(params, images_u8):
        out = model.apply({"params": params}, eval_batch(images_u8),
                          deterministic=True)
        res = {
            "cls_probs": jax.nn.softmax(out["cls_logits"] * inv_t, axis=-1),
            "cls_pred": jnp.argmax(out["cls_logits"], axis=-1),
            "kan_severity": out["kan_severity"][:, 0],
        }
        if with_ordinal:
            res["ordinal_probs"] = cumulative_to_class_probs(
                out["ordinal_logits"])
            res["ordinal_severity"] = ordinal_expected_severity(
                out["ordinal_logits"])[:, 0]
        if with_uncertainty:
            res["uncertainty_std"] = jnp.exp(0.5 * out["log_var"][:, 0])
        return res

    return forward


class InferenceEngine:
    def __init__(self, model, params, batch_size: int = 64, mesh=None,
                 temperature: float = 1.0):
        self.model = model
        self.batch_size = batch_size
        self.mesh = mesh
        self.temperature = float(temperature)
        # Rolling windows (bounded: a weeks-long serving process must not
        # grow per-request lists without bound). "requests"/"images_served"
        # stay exact via separate counters.
        from collections import deque
        self._latencies: deque = deque(maxlen=10_000)
        self._request_sizes: deque = deque(maxlen=10_000)
        # Non-overlapping busy spans: with pipelined dispatch, summing
        # per-request latencies double-counts overlapped wall time and
        # would UNDER-report throughput exactly when pipelining raises it.
        self._busy: deque = deque(maxlen=10_000)
        self._last_end = 0.0
        self._n_requests = 0
        self._n_images = 0

        if mesh is not None:
            from rovit_kan_tpu.parallel.mesh import replicate
            params = replicate(params, mesh)
        self.params = params

        # Transfer coalescing: the named outputs are all (B,) or (B, K)
        # — fetching them as six separate device->host transfers makes
        # small-batch serving latency-bound (each fetch pays a full
        # round-trip). Pack everything into ONE (B, sum K) fp32 array on
        # device and split host-side. The layout is derived from an
        # abstract eval, so it stays in lockstep with the head set.
        named = build_serving_forward(model, temperature=self.temperature)
        size = model.image_size
        shapes = jax.eval_shape(
            named, params,
            jax.ShapeDtypeStruct((batch_size, size, size, 3), jnp.uint8))
        self._layout = [(k, 1 if len(s.shape) == 1 else s.shape[1],
                         s.dtype, len(s.shape))
                        for k, s in sorted(shapes.items())]

        def packed(params, images_u8):
            res = named(params, images_u8)
            return jnp.concatenate(
                [(res[k][:, None] if nd == 1 else res[k])
                 .astype(jnp.float32)
                 for k, _, _, nd in self._layout], axis=1)

        self._forward = jax.jit(packed)

    def _unpack(self, flat: np.ndarray) -> Dict[str, np.ndarray]:
        out, off = {}, 0
        for k, width, dtype, ndim in self._layout:
            col = flat[:, off:off + width]
            if ndim == 1:
                col = col[:, 0]
            out[k] = col.astype(dtype)
            off += width
        return out

    def warmup(self) -> None:
        """Compile the serving program ahead of traffic."""
        size = self.model.image_size
        dummy = np.zeros((self.batch_size, size, size, 3), np.uint8)
        jax.block_until_ready(self._run(dummy))

    def _run(self, images_u8: np.ndarray):
        if self.mesh is not None:
            from rovit_kan_tpu.parallel.mesh import shard_batch
            images_u8 = shard_batch({"x": images_u8}, self.mesh)["x"]
        return self._forward(self.params, images_u8)

    def dispatch(self, images_u8: np.ndarray):
        """Async half of ``predict``: pad + enqueue the forward and return
        an opaque handle WITHOUT waiting for the result (jax dispatch is
        non-blocking). The caller can overlap host work — e.g. the
        MicroBatcher collects and dispatches the next batch while this one
        computes — then complete it with :meth:`fetch`."""
        n = images_u8.shape[0]
        if n > self.batch_size:
            raise ValueError(f"dispatch takes <= batch_size={self.batch_size}"
                             f" images, got {n}; use predict() to split")
        t0 = time.perf_counter()
        if n < self.batch_size:
            pad = np.zeros((self.batch_size - n, *images_u8.shape[1:]),
                           images_u8.dtype)
            images_u8 = np.concatenate([images_u8, pad])
        return (self._run(images_u8), n, t0)

    def fetch(self, handle) -> Dict[str, np.ndarray]:
        """Blocking half of ``predict``: device->host transfer + unpack +
        stats for a handle returned by :meth:`dispatch`."""
        flat, n, t0 = handle
        out = self._unpack(np.asarray(flat)[:n])
        end = time.perf_counter()
        self._latencies.append(end - t0)
        self._busy.append(end - max(t0, self._last_end))
        self._last_end = end
        self._request_sizes.append(n)
        self._n_requests += 1
        self._n_images += n
        return out

    def predict(self, images_u8: np.ndarray) -> Dict[str, np.ndarray]:
        """Serve one request of N <= batch_size images (uint8 NHWC).
        Larger inputs are split internally."""
        n = images_u8.shape[0]
        if n > self.batch_size:
            # Depth-2 pipeline over the chunks: dispatch chunk k+1 before
            # fetching chunk k — same compute/transfer overlap as
            # dispatching everything up front, but only TWO chunks' input
            # and output buffers are ever in flight (dispatching all
            # chunks first would hold O(n/batch_size) padded buffers on
            # device — an HBM blow-up for bulk scoring requests).
            parts, prev = [], None
            for i in range(0, n, self.batch_size):
                h = self.dispatch(images_u8[i:i + self.batch_size])
                if prev is not None:
                    parts.append(self.fetch(prev))
                prev = h
            parts.append(self.fetch(prev))
            return {k: np.concatenate([p[k] for p in parts])
                    for k in parts[0]}
        return self.fetch(self.dispatch(images_u8))

    def predict_stream(self, batches: Iterable[np.ndarray]
                       ) -> Iterator[Dict[str, np.ndarray]]:
        """Stream batches through the engine (keeps the device queue fed)."""
        for images in batches:
            yield self.predict(images)

    def stats(self) -> Dict[str, float]:
        """Rolling serving stats (last 10k requests; request/image totals
        exact). Throughput uses the ACTUAL image counts served, not the
        padded batch size; the first (compile) request is excluded from
        latency/throughput when more exist."""
        skip = 1 if self._n_requests > 1 and len(self._latencies) > 1 else 0
        lat = np.asarray(list(self._latencies)[skip:])
        busy = np.asarray(list(self._busy)[skip:])
        sizes = np.asarray(list(self._request_sizes)[skip:])
        if lat.size == 0:
            return {"requests": self._n_requests,
                    "temperature": self.temperature}
        return {
            "requests": self._n_requests,
            # Which confidence calibration this process serves (1.0 = raw)
            # — surfaces in /healthz and /metrics for fleet audits.
            "temperature": self.temperature,
            "images_served": self._n_images,
            "mean_latency_ms": float(lat.mean() * 1e3),
            "p95_latency_ms": float(np.percentile(lat, 95) * 1e3),
            # Busy spans, not latency sums: overlapped (pipelined) requests
            # must not double-count wall time.
            "images_per_sec": float(sizes.sum() / max(busy.sum(), 1e-9)),
        }


class MicroBatcher:
    """Dynamic request coalescing in front of an :class:`InferenceEngine`.

    The reference has no serving story at all; the plain HTTP handler in
    ``scripts/serve.py`` serializes requests under one lock, so N concurrent
    single-image clients each pay a full padded ``batch_size`` program — the
    MXU runs at 1/batch_size utilization. This batcher is the standard
    production fix (cf. TF-Serving's request batching): requests enqueue,
    ONE device worker greedily packs whole queued requests into a single
    batch (up to ``engine.batch_size`` images), runs the engine once, and
    slices the packed outputs back per request.

    Latency model: with ``window_ms == 0`` (default) the worker never waits
    — it packs whatever is queued at the moment the device frees up, so a
    lone client sees exactly the unbatched latency, while under concurrency
    the queue that would have formed behind the lock anyway becomes MXU
    fill. ``window_ms > 0`` additionally lingers up to that long after the
    first request of a batch for stragglers (throughput over latency).

    Thread-safe: ``submit``/``predict`` may be called from any number of
    threads; the worker thread is the engine's only caller.
    """

    _STOP = object()

    def __init__(self, engine: InferenceEngine, window_ms: float = 0.0):
        self.engine = engine
        self.window = window_ms / 1e3
        self._queue: queue.Queue = queue.Queue()
        self._lock = threading.Lock()   # orders submit() vs close()
        self._closed = False
        self._carry = None              # popped request awaiting next batch
        self.batches_run = 0
        self.requests_coalesced = 0
        self._worker = threading.Thread(
            target=self._loop, name="microbatch-worker", daemon=True)
        self._worker.start()

    # -- client side -----------------------------------------------------
    def submit(self, images_u8: np.ndarray):
        """Enqueue one request; returns a ``concurrent.futures.Future``
        resolving to the same dict ``InferenceEngine.predict`` returns.

        Validates the request shape/dtype HERE so one malformed request
        fails alone instead of poisoning the batch it would coalesce into
        (``np.concatenate`` would reject innocent co-batched requests)."""
        from concurrent.futures import Future
        if images_u8.ndim != 4 or images_u8.shape[-1] != 3:
            raise ValueError(f"expected (N, H, W, 3), got {images_u8.shape}")
        if images_u8.dtype != np.uint8:
            raise ValueError(f"expected uint8 images, got {images_u8.dtype}")
        size = getattr(getattr(self.engine, "model", None),
                       "image_size", None)
        if size is not None and images_u8.shape[1:3] != (size, size):
            raise ValueError(f"engine serves {size}x{size}px, got "
                             f"{images_u8.shape[1]}x{images_u8.shape[2]}")
        fut: Future = Future()
        with self._lock:
            # The lock makes closed-check + put atomic: no request can land
            # behind the _STOP sentinel and hang unresolved.
            if self._closed:
                raise RuntimeError("MicroBatcher is closed")
            self._queue.put((images_u8, fut))
        return fut

    def predict(self, images_u8: np.ndarray) -> Dict[str, np.ndarray]:
        """Blocking convenience wrapper around :meth:`submit`."""
        return self.submit(images_u8).result()

    def close(self) -> None:
        """Drain outstanding requests, then stop the worker."""
        with self._lock:
            if self._closed:
                return
            self._closed = True
            self._queue.put(self._STOP)
        self._worker.join()

    def stats(self) -> Dict[str, float]:
        s = dict(self.engine.stats())
        s["batches_run"] = self.batches_run
        s["requests_coalesced"] = self.requests_coalesced
        if self.batches_run:
            s["mean_requests_per_batch"] = (
                self.requests_coalesced / self.batches_run)
        return s

    # -- worker side -----------------------------------------------------
    def _collect(self, block: bool = True, linger: bool = True):
        """Pack whole queued requests into one engine batch (linger up to
        ``window`` after the first, only when ``linger``). Returns ``None``
        on the _STOP sentinel and ``[]`` when ``block=False`` finds nothing
        queued (the worker has an in-flight batch to go fetch instead).

        A popped request that doesn't fit the remaining capacity goes into
        ``self._carry`` and LEADS the next batch (re-queueing it would put
        it behind newer arrivals — FIFO violation and starvation under
        sustained small-request load)."""
        if self._carry is not None:
            first, self._carry = self._carry, None
        else:
            try:
                first = (self._queue.get() if block
                         else self._queue.get_nowait())
            except queue.Empty:
                return []
            if first is self._STOP:
                return None
        batch, total = [first], first[0].shape[0]
        deadline = time.perf_counter() + (self.window if linger else 0.0)
        while total < self.engine.batch_size:
            try:
                timeout = deadline - time.perf_counter()
                item = (self._queue.get_nowait() if timeout <= 0
                        else self._queue.get(timeout=timeout))
            except queue.Empty:
                break
            if item is self._STOP:
                self._queue.put(self._STOP)   # re-arm for the next loop
                break
            if total + item[0].shape[0] > self.engine.batch_size:
                self._carry = item            # whole requests, FIFO order
                break
            batch.append(item)
            total += item[0].shape[0]
        return batch

    # Engines expose async dispatch/fetch halves (InferenceEngine); plain
    # predict-only duck-typed engines still work, just unpipelined — their
    # predict runs EAGERLY at dispatch time (deferring it to the next
    # iteration's resolve would leave the engine idle during collection).
    def _dispatch(self, imgs):
        if hasattr(self.engine, "dispatch") and hasattr(self.engine,
                                                        "fetch"):
            return ("async", self.engine.dispatch(imgs))
        return ("done", self.engine.predict(imgs))

    def _fetch(self, tagged):
        tag, v = tagged
        if tag == "async":
            return self.engine.fetch(v)
        if tag == "sync":                # oversize: engine splits it
            return self.engine.predict(v)
        return v                         # "done": already computed

    def _resolve(self, pending) -> None:
        batch, tagged = pending
        try:
            out = self._fetch(tagged)
        except Exception as e:
            for _, fut in batch:
                fut.set_exception(e)
            return
        self.batches_run += 1
        self.requests_coalesced += len(batch)
        off = 0
        for img, fut in batch:
            n = img.shape[0]
            fut.set_result({k: v[off:off + n] for k, v in out.items()})
            off += n

    def _loop(self) -> None:
        # Depth-2 pipeline: dispatch batch k+1 to the device BEFORE
        # fetching batch k's results (jax dispatch is async), so host-side
        # collection + padding + H2D of the next batch overlap the device
        # compute of the current one.
        pending = None                 # (claimed batch, dispatch handle)
        while True:
            # No linger while a batch is in flight: its results may already
            # be ready, and parking in the window would delay delivering
            # them by up to window_ms. Stragglers coalesce into the batch
            # after next instead.
            batch = self._collect(block=pending is None,
                                  linger=pending is None)
            stop = batch is None
            new_pending = None
            if batch:
                # A client may have cancelled its Future while queued
                # (e.g. a request timeout); set_result on a cancelled
                # future raises and would kill this worker — claim each
                # future first and drop the cancelled ones.
                batch = [(img, fut) for img, fut in batch
                         if fut.set_running_or_notify_cancel()]
            if batch:
                arrays = [img for img, _ in batch]
                imgs = (arrays[0] if len(arrays) == 1 else
                        np.concatenate(arrays, axis=0))
                if imgs.shape[0] <= self.engine.batch_size:
                    try:
                        new_pending = (batch, self._dispatch(imgs))
                    except Exception as e:
                        for _, fut in batch:
                            fut.set_exception(e)
                else:
                    # Oversize single request: engine.predict splits (and
                    # internally pipelines) it — run it on the sync path,
                    # after the in-flight batch resolves.
                    if pending is not None:
                        self._resolve(pending)
                        pending = None
                    self._resolve((batch, ("sync", imgs)))
            if pending is not None:
                self._resolve(pending)
            pending = new_pending
            if stop and pending is None:
                return


def load_engine(checkpoint_path, batch_size: int = 64, mesh=None,
                config=None, image_size: int = None,
                temperature: float = None) -> InferenceEngine:
    """Checkpoint -> ready-to-serve engine (compiles on first predict or
    explicit warmup). ``image_size`` serves at a different resolution than
    trained (pos-embed interpolation; at >=512 tokens in bf16 on TPU the
    "auto" policy picks the fused Pallas attention forward).

    ``temperature=None`` (the default) adopts a calibration temperature
    recorded in the checkpoint's meta sidecar, when one exists
    (``scripts/evaluate.py --calibrate --store_temperature``); pass an
    explicit float to override, or ``1.0`` to serve raw confidences."""
    from rovit_kan_tpu.evaluation.evaluator import load_model_for_evaluation
    model, params = load_model_for_evaluation(checkpoint_path, config,
                                              image_size=image_size)
    if temperature is None:
        from rovit_kan_tpu.utils.checkpoint import load_meta
        temperature = float(load_meta(checkpoint_path).get("temperature",
                                                           1.0))
    return InferenceEngine(model, params, batch_size=batch_size, mesh=mesh,
                           temperature=temperature)
