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


def build_serving_forward(model):
    """Pure serving function ``(params, uint8 NHWC images) -> outputs``:
    on-device normalization + forward + derived predictions (softmax,
    ordinal class probs/expected severity, uncertainty std, KAN severity).
    Shared by ``InferenceEngine`` (jitted) and ``export.export_serving``
    (AOT-lowered to StableHLO)."""
    with_ordinal = getattr(model, "with_ordinal", True)
    with_uncertainty = getattr(model, "with_uncertainty", True)

    def forward(params, images_u8):
        out = model.apply({"params": params}, eval_batch(images_u8),
                          deterministic=True)
        res = {
            "cls_probs": jax.nn.softmax(out["cls_logits"], axis=-1),
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
    def __init__(self, model, params, batch_size: int = 64, mesh=None):
        self.model = model
        self.batch_size = batch_size
        self.mesh = mesh
        # Rolling windows (bounded: a weeks-long serving process must not
        # grow per-request lists without bound). "requests"/"images_served"
        # stay exact via separate counters.
        from collections import deque
        self._latencies: deque = deque(maxlen=10_000)
        self._request_sizes: deque = deque(maxlen=10_000)
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
        named = build_serving_forward(model)
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

    def predict(self, images_u8: np.ndarray) -> Dict[str, np.ndarray]:
        """Serve one request of N <= batch_size images (uint8 NHWC).
        Larger inputs are split internally."""
        n = images_u8.shape[0]
        if n > self.batch_size:
            parts = [self.predict(images_u8[i:i + self.batch_size])
                     for i in range(0, n, self.batch_size)]
            return {k: np.concatenate([p[k] for p in parts])
                    for k in parts[0]}

        t0 = time.perf_counter()
        if n < self.batch_size:
            pad = np.zeros((self.batch_size - n, *images_u8.shape[1:]),
                           images_u8.dtype)
            images_u8 = np.concatenate([images_u8, pad])
        out = self._unpack(np.asarray(self._run(images_u8))[:n])
        self._latencies.append(time.perf_counter() - t0)
        self._request_sizes.append(n)
        self._n_requests += 1
        self._n_images += n
        return out

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
        sizes = np.asarray(list(self._request_sizes)[skip:])
        if lat.size == 0:
            return {"requests": self._n_requests}
        return {
            "requests": self._n_requests,
            "images_served": self._n_images,
            "mean_latency_ms": float(lat.mean() * 1e3),
            "p95_latency_ms": float(np.percentile(lat, 95) * 1e3),
            "images_per_sec": float(sizes.sum() / lat.sum()),
        }


def load_engine(checkpoint_path, batch_size: int = 64, mesh=None,
                config=None, image_size: int = None) -> InferenceEngine:
    """Checkpoint -> ready-to-serve engine (compiles on first predict or
    explicit warmup). ``image_size`` serves at a different resolution than
    trained (pos-embed interpolation; at >=512 tokens in bf16 on TPU the
    "auto" policy picks the fused Pallas attention forward)."""
    from rovit_kan_tpu.evaluation.evaluator import load_model_for_evaluation
    model, params = load_model_for_evaluation(checkpoint_path, config,
                                              image_size=image_size)
    return InferenceEngine(model, params, batch_size=batch_size, mesh=mesh)
