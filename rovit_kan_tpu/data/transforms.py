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


def augmented_transforms() -> Callable:
    """Train-time pipeline: random flips + color jitter + normalize.
    Returns ``fn(images_u8, key) -> float32 normalized batch``."""

    def apply(images_u8, key: Optional[jax.Array] = None):
        if key is None:
            key = jax.random.PRNGKey(0)
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
