"""On-device CutMix / MixUp, jit-safe with fixed shapes.

Capability parity with the reference's (missing, interface-inferred)
``data.transforms.cutmix_or_mixup`` as called from
`/root/reference/training/trainer.py:84-96`: randomly picks CutMix or MixUp
per batch, mixes images and returns ``(mixed_images, labels_a, labels_b,
lam)``; severity labels are never mixed.

TPU-first details:
- CutMix's dynamic box becomes a fixed-shape boolean mask built from
  ``broadcasted_iota`` comparisons — no dynamic slicing under jit.
- The CutMix-vs-MixUp choice is a traced bernoulli + ``jnp.where`` select
  (both mixes are cheap VPU passes), so one compiled program covers both.
- lam for CutMix is recomputed from the *realized* box area, as is standard.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _mixup_spec(key: jax.Array, batch: int, alpha: float = 0.2):
    """MixUp coefficients only: (perm, lam) — no image pass."""
    k_lam, k_perm = jax.random.split(key)
    lam = jax.random.beta(k_lam, alpha, alpha)
    perm = jax.random.permutation(k_perm, batch)
    return perm, lam


def mixup(key: jax.Array, images: jnp.ndarray, alpha: float = 0.2):
    """MixUp: convex combination with lam ~ Beta(alpha, alpha)."""
    perm, lam = _mixup_spec(key, images.shape[0], alpha)
    mixed = lam * images + (1.0 - lam) * images[perm]
    return mixed, perm, lam


def _cutmix_spec(key: jax.Array, bhw, alpha: float = 1.0):
    """CutMix coefficients only: (perm, mask (1, H, W, 1), lam) — the
    box realized as an iota mask (static shapes), lam recomputed from the
    realized area; no image pass."""
    B, H, W = bhw
    k_lam, k_perm, k_x, k_y = jax.random.split(key, 4)
    lam0 = jax.random.beta(k_lam, alpha, alpha)
    perm = jax.random.permutation(k_perm, B)

    cut_ratio = jnp.sqrt(1.0 - lam0)
    cut_h = (H * cut_ratio).astype(jnp.int32)
    cut_w = (W * cut_ratio).astype(jnp.int32)
    cy = jax.random.randint(k_y, (), 0, H)
    cx = jax.random.randint(k_x, (), 0, W)
    y0 = jnp.clip(cy - cut_h // 2, 0, H)
    y1 = jnp.clip(cy + cut_h // 2, 0, H)
    x0 = jnp.clip(cx - cut_w // 2, 0, W)
    x1 = jnp.clip(cx + cut_w // 2, 0, W)

    rows = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    in_box = ((rows >= y0) & (rows < y1) & (cols >= x0) & (cols < x1))
    mask = in_box[None, :, :, None].astype(jnp.float32)
    lam = 1.0 - ((y1 - y0) * (x1 - x0)).astype(jnp.float32) / (H * W)
    return perm, mask, lam


def cutmix(key: jax.Array, images: jnp.ndarray, alpha: float = 1.0):
    """CutMix: paste a random box from a permuted batch; lam = kept area
    fraction."""
    B, H, W, _ = images.shape
    perm, mask, lam = _cutmix_spec(key, (B, H, W), alpha)
    mask = mask.astype(images.dtype)
    mixed = images * (1.0 - mask) + images[perm] * mask
    return mixed, perm, lam


def cutmix_or_mixup(
    key: jax.Array,
    images: jnp.ndarray,
    labels: jnp.ndarray,
    use_cutmix: bool = True,
    use_mixup: bool = True,
    cutmix_alpha: float = 1.0,
    mixup_alpha: float = 0.2,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Randomly apply CutMix or MixUp to a batch (one coin per batch).

    Returns:
        (mixed_images, labels_a, labels_b, lam) with labels_a = original
        labels and labels_b = permuted labels. When both flags are False the
        batch passes through with lam = 1.
    """
    if not use_cutmix and not use_mixup:
        return images, labels, labels, jnp.float32(1.0)

    k_choice, k_mix = jax.random.split(key)
    if use_cutmix and use_mixup:
        pick_cutmix = jax.random.bernoulli(k_choice, 0.5)
    else:
        pick_cutmix = jnp.bool_(use_cutmix)

    # Both mixes are the same blend a*images + b*images[perm]; they differ
    # only in the (tiny) coefficient tensors and the permutation. Select
    # those FIRST, then pay the two full-tensor passes + batch gather
    # once — not once per branch plus a third select pass (the old
    # formulation was ~6 full-tensor passes, this is ~3; outputs are
    # bitwise identical because the winning branch's expression is
    # unchanged).
    B, H, W, _ = images.shape
    cm_perm, cm_mask, cm_lam = _cutmix_spec(k_mix, (B, H, W), cutmix_alpha)
    mu_perm, mu_lam = _mixup_spec(k_mix, B, mixup_alpha)

    a = jnp.where(pick_cutmix, 1.0 - cm_mask, mu_lam)      # (1, H, W, 1)
    b = jnp.where(pick_cutmix, cm_mask, 1.0 - mu_lam)
    perm = jnp.where(pick_cutmix, cm_perm, mu_perm)
    lam = jnp.where(pick_cutmix, cm_lam, mu_lam)

    mixed = a.astype(images.dtype) * images \
        + b.astype(images.dtype) * images[perm]
    return mixed, labels, labels[perm], lam.astype(jnp.float32)
