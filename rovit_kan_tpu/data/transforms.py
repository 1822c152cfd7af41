"""Transform factories matching the reference's (missing) data/transforms.py
interface (SURVEY.md §2.8: ``augmented_transforms``, ``original_transforms``,
``inference_transforms``, ``cutmix_or_mixup`` — called from
`/root/reference/scripts/train.py:73-84`, `scripts/evaluate.py:40-46`).

The torchvision pipelines become callables over uint8 NHWC batches built
from the on-device XLA ops (ops/preprocess.py): the augmented pipeline is
key-driven (flips + color jitter + ImageNet normalize), the original/
inference pipelines normalize only. They run under jit and are what the
Trainer/Evaluator fuse into their steps; these factories exist so code
written against the reference's API ports directly.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax

from rovit_kan_tpu.ops.preprocess import augment_batch, eval_batch
from rovit_kan_tpu.ops.mixing import cutmix_or_mixup  # noqa: F401 re-export


def augmented_transforms(seed: int = 0) -> Callable:
    """Train-time pipeline: random flips + color jitter + normalize.
    Returns ``fn(images_u8, key) -> float32 normalized batch``.

    Prefer passing an explicit ``key`` (the Trainer threads its own rng
    stream through ``ops.preprocess.augment_batch`` directly). For code
    ported against the reference's keyless API the factory keeps a
    host-side call counter and folds it into ``PRNGKey(seed)`` — fresh
    draws per call, mirroring torch's global RNG — and warns once. That
    counter is Python state: under ``jit`` it traces a single constant, so
    keyless use inside a compiled step would freeze the augmentations —
    always pass a key there.
    """
    import itertools
    import warnings

    counter = itertools.count()
    base = jax.random.PRNGKey(seed)

    def apply(images_u8, key: Optional[jax.Array] = None):
        if key is None:
            n = next(counter)
            if n == 0:
                warnings.warn(
                    "augmented_transforms() called without a PRNG key; "
                    "drawing from a host-side counter stream (do not use "
                    "keyless inside jit — augmentations would be constant)",
                    stacklevel=2)
            key = jax.random.fold_in(base, n)
        return augment_batch(key, images_u8)

    return apply


def original_transforms() -> Callable:
    """Deterministic pipeline for the Original-Image test set:
    normalize only. Returns ``fn(images_u8) -> float32 batch``."""
    return eval_batch


def inference_transforms() -> Callable:
    """Inference pipeline (identical to original_transforms in the
    reference's README contract)."""
    return eval_batch
