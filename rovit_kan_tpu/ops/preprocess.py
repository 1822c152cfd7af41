"""On-device image preprocessing / augmentation as XLA ops.

The reference's (missing) ``data/transforms.py`` is reverse-engineered from
README.md:139 and the pretrained-DeiT convention: resize/normalize to 224
with ImageNet statistics, plus random flips and color jitter for the
augmented pipeline. Here the resize happens host-side at load (PIL, cached),
while the *random* augmentations run on-device inside the jit step so the
host pipeline stays deterministic and cheap:

    uint8 HBM batch -> f32 -> random flips -> color jitter -> normalize

All ops are elementwise/gather VPU work, fused by XLA into the train step.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def normalize(images: jnp.ndarray) -> jnp.ndarray:
    """[0,1] float images (B,H,W,3) -> ImageNet-normalized."""
    mean = jnp.asarray(IMAGENET_MEAN, images.dtype)
    std = jnp.asarray(IMAGENET_STD, images.dtype)
    return (images - mean) / std


def denormalize(images: jnp.ndarray) -> jnp.ndarray:
    mean = jnp.asarray(IMAGENET_MEAN, images.dtype)
    std = jnp.asarray(IMAGENET_STD, images.dtype)
    return images * std + mean


def to_float(images_u8: jnp.ndarray) -> jnp.ndarray:
    return images_u8.astype(jnp.float32) / 255.0


def random_flips(key: jax.Array, images: jnp.ndarray) -> jnp.ndarray:
    """Independent per-image horizontal + vertical flips (p=0.5 each)."""
    B = images.shape[0]
    kh, kv = jax.random.split(key)
    fh = jax.random.bernoulli(kh, 0.5, (B,))
    fv = jax.random.bernoulli(kv, 0.5, (B,))
    flipped_h = images[:, :, ::-1, :]
    images = jnp.where(fh[:, None, None, None], flipped_h, images)
    flipped_v = images[:, ::-1, :, :]
    images = jnp.where(fv[:, None, None, None], flipped_v, images)
    return images


def _grayscale(images: jnp.ndarray) -> jnp.ndarray:
    return (0.299 * images[..., 0] + 0.587 * images[..., 1]
            + 0.114 * images[..., 2])


def color_jitter(key: jax.Array, images: jnp.ndarray,
                 brightness: float = 0.2, contrast: float = 0.2,
                 saturation: float = 0.2) -> jnp.ndarray:
    """Per-image brightness/contrast/saturation jitter on [0,1] images.

    torchvision ColorJitter semantics: each op blends against statistics of
    the *current* image and clamps to [0,1] before the next op."""
    B = images.shape[0]
    kb, kc, ks = jax.random.split(key, 3)

    fb = jax.random.uniform(kb, (B, 1, 1, 1),
                            minval=1 - brightness, maxval=1 + brightness)
    images = jnp.clip(images * fb, 0.0, 1.0)

    fc = jax.random.uniform(kc, (B, 1, 1, 1),
                            minval=1 - contrast, maxval=1 + contrast)
    # torchvision contrast pivot: mean of the current grayscale image.
    pivot = _grayscale(images).mean(axis=(1, 2))[:, None, None, None]
    images = jnp.clip((images - pivot) * fc + pivot, 0.0, 1.0)

    fs = jax.random.uniform(ks, (B, 1, 1, 1),
                            minval=1 - saturation, maxval=1 + saturation)
    gray3 = _grayscale(images)[..., None]
    images = (images - gray3) * fs + gray3

    return jnp.clip(images, 0.0, 1.0)


def augment_batch(key: jax.Array, images_u8: jnp.ndarray) -> jnp.ndarray:
    """Full augmented-train pipeline: flips + jitter + normalize."""
    kf, kj = jax.random.split(key)
    x = to_float(images_u8)
    x = random_flips(kf, x)
    x = color_jitter(kj, x)
    return normalize(x)


def eval_batch(images_u8: jnp.ndarray) -> jnp.ndarray:
    """Inference pipeline: normalize only."""
    return normalize(to_float(images_u8))
