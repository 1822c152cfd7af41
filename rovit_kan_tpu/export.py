"""AOT model export: serialized StableHLO serving artifacts.

The reference's only deployment artifact is a pickled torch ``state_dict``
that requires the full Python model zoo to load
(`/root/reference/training/trainer.py:219-231`). The TPU-native deployment
story is ahead-of-time lowering via ``jax.export``: the serving function
(on-device uint8 normalization + forward + derived predictions,
``serving.build_serving_forward``) is traced at a fixed batch shape,
lowered to versioned StableHLO with the trained weights baked in as
constants, and serialized to one self-contained blob. Loading needs no
model code, no config, and no checkpoint — just JAX on any machine whose
backend matches one of the export platforms.

Fixed shapes are deliberate (same contract as ``InferenceEngine``): the
compiled program never retraces and partial batches pad at the call site.
"""
from __future__ import annotations

from pathlib import Path
from typing import Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from rovit_kan_tpu.serving import build_serving_forward


def export_serving(model, params, batch_size: int = 64,
                   platforms: Optional[Sequence[str]] = None,
                   temperature: float = 1.0) -> bytes:
    """Lower + serialize the serving function with ``params`` baked in.

    Args:
        model: a built RoViT-KAN (or ablation variant) flax module.
        params: trained parameter pytree.
        batch_size: fixed serving batch.
        platforms: lowering platforms, e.g. ``("tpu", "cpu")``; defaults to
            the current backend only.
        temperature: calibration temperature baked into the artifact
            (``cls_probs = softmax(logits / T)``; argmax invariant).

    Returns:
        Serialized, versioned StableHLO bytes (``jax.export`` format).
    """
    fwd = build_serving_forward(model, temperature=temperature)
    # Close over the weights: the artifact is self-contained.
    params = jax.tree.map(jnp.asarray, params)

    def fn(images_u8):
        return fwd(params, images_u8)

    size = model.image_size
    spec = jax.ShapeDtypeStruct((batch_size, size, size, 3), jnp.uint8)
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    exported = jax.export.export(jax.jit(fn), **kwargs)(spec)
    return exported.serialize()


def load_serving(blob: bytes) -> Callable[[np.ndarray], Dict[str, jnp.ndarray]]:
    """Deserialize an exported serving artifact into a callable
    ``(uint8 NHWC images) -> {cls_probs, cls_pred, kan_severity, ...}``.
    The input batch must match the exported shape exactly."""
    exported = jax.export.deserialize(bytearray(blob))
    return exported.call


def save_exported(path, model, params, batch_size: int = 64,
                  platforms: Optional[Sequence[str]] = None,
                  temperature: float = 1.0) -> int:
    """Export and write to ``path``; returns the artifact size in bytes."""
    blob = export_serving(model, params, batch_size, platforms,
                          temperature=temperature)
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(blob)
    return len(blob)


def load_exported(path) -> Callable[[np.ndarray], Dict[str, jnp.ndarray]]:
    return load_serving(Path(path).read_bytes())
