"""Attention rollout for the ViT backbone, hook-free and batched.

Capability parity with `/root/reference/explainability/attention_maps.py:10-158`:
rollout = product over layers of row-normalized ``(A + I)`` after head fusion
(mean/max/min), CLS-to-patch row reshaped to the patch grid, bilinearly
resized to image resolution, min-max normalized, JET-colormap overlay +
3-panel figure.

TPU-first redesign: the reference registers forward hooks on timm's attn
modules (and actually captures the *block output*, not attention — a latent
bug noted in SURVEY.md §2.2); here the model's forward *returns* true
per-layer softmax attention (``return_attention=True``) and the whole
rollout — fusion, normalize, layer-product (a ``lax.scan``-free unrolled
matmul chain over 12 layers), resize — runs as one jit program over the full
batch.

The reference also stores ``discard_ratio=0.9`` but never applies it
(attention_maps.py:62-89 has no discard logic); we reproduce that default
behavior (no discard) but implement the documented intent behind
``apply_discard=True``.
"""
from __future__ import annotations

import functools
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("head_fusion", "image_size",
                                             "discard_ratio",
                                             "apply_discard"))
def attention_rollout(
    attention: jnp.ndarray,
    head_fusion: str = "mean",
    image_size: int = 224,
    discard_ratio: float = 0.9,
    apply_discard: bool = False,
) -> jnp.ndarray:
    """Batched attention rollout.

    Args:
        attention: ``(depth, B, heads, N, N)`` per-layer softmax attention.
        head_fusion: 'mean' | 'max' | 'min' (reference lines 62-74).
        apply_discard: zero out the lowest ``discard_ratio`` fraction of
            non-CLS attention entries per row before normalizing (the
            reference documents but never applies this).

    Returns:
        ``(B, image_size, image_size)`` maps in [0, 1].
    """
    depth, B, h, N, _ = attention.shape
    if head_fusion == "max":
        fused = attention.max(axis=2)
    elif head_fusion == "min":
        fused = attention.min(axis=2)
    else:
        fused = attention.mean(axis=2)                 # (depth, B, N, N)

    if apply_discard:
        # Keep the top (1 - ratio) entries per row; never discard the CLS
        # column (standard rollout practice).
        k = max(1, int(N * (1.0 - discard_ratio)))
        thresh = jnp.sort(fused, axis=-1)[..., N - k][..., None]
        keep = (fused >= thresh)
        keep = keep.at[..., 0].set(True)
        fused = fused * keep

    eye = jnp.eye(N, dtype=fused.dtype)
    a = fused + eye                                    # (depth, B, N, N)
    a = a / a.sum(axis=-1, keepdims=True)

    rollout = jnp.broadcast_to(eye, (B, N, N))
    for layer in range(depth):
        rollout = jnp.einsum("bij,bjk->bik", rollout, a[layer],
                             preferred_element_type=jnp.float32)

    cls_attn = rollout[:, 0, 1:]                       # (B, N-1)
    g = int(np.sqrt(cls_attn.shape[-1]))
    maps = cls_attn.reshape(B, g, g)
    maps = jax.image.resize(maps, (B, image_size, image_size), "bilinear")
    mn = maps.min(axis=(1, 2), keepdims=True)
    mx = maps.max(axis=(1, 2), keepdims=True)
    return (maps - mn) / (mx - mn + 1e-8)


def overlay_heatmap(image: np.ndarray, heatmap: np.ndarray,
                    alpha: float = 0.5) -> np.ndarray:
    """JET-colormap overlay (reference lines 107-123; matplotlib jet stands
    in for cv2.COLORMAP_JET — no cv2 dependency)."""
    import matplotlib.cm as cm
    colored = cm.jet(np.clip(heatmap, 0, 1))[..., :3]      # (H, W, 3) float
    image = np.asarray(image, np.float32)
    if image.max() > 1.0:
        image = image / 255.0
    out = (1 - alpha) * image + alpha * colored
    return np.clip(out, 0, 1)


class ViTAttentionRollout:
    """Object-style API mirroring the reference class
    (attention_maps.py:10-158)."""

    def __init__(self, model, params, discard_ratio: float = 0.9,
                 apply_discard: bool = False):
        """``discard_ratio`` only takes effect with ``apply_discard=True``
        (the reference stores the ratio but never applies it — the default
        reproduces that; the flag enables the documented intent)."""
        self.model = model
        self.params = params
        self.discard_ratio = discard_ratio
        self.apply_discard = apply_discard

        @jax.jit
        def _attn(params, x):
            out = model.apply({"params": params}, x, deterministic=True,
                              return_attention=True)
            return out["attention"]

        self._attn = _attn

    def generate(self, images: jnp.ndarray,
                 head_fusion: str = "mean") -> np.ndarray:
        """Rollout maps for a normalized image batch ``(B, H, W, 3)``.
        Returns ``(B, H, W)`` numpy in [0, 1]."""
        attention = self._attn(self.params, images)
        size = images.shape[1]
        return np.asarray(attention_rollout(
            attention, head_fusion=head_fusion, image_size=size,
            discard_ratio=self.discard_ratio,
            apply_discard=self.apply_discard))

    def visualize(self, image_display: np.ndarray, attention_map: np.ndarray,
                  save_path: Optional[Path] = None, title: str = ""):
        """3-panel figure: original / heatmap / overlay (reference
        lines 125-158)."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, 3, figsize=(14, 5))
        img = np.asarray(image_display, np.float32)
        if img.max() > 1.0:
            img = img / 255.0
        axes[0].imshow(img)
        axes[0].set_title("Original")
        im = axes[1].imshow(attention_map, cmap="jet")
        axes[1].set_title("Attention rollout")
        fig.colorbar(im, ax=axes[1], fraction=0.046)
        axes[2].imshow(overlay_heatmap(img, attention_map))
        axes[2].set_title("Overlay")
        for ax in axes:
            ax.axis("off")
        if title:
            fig.suptitle(title)
        fig.tight_layout()
        if save_path is not None:
            fig.savefig(save_path, dpi=120, bbox_inches="tight")
            plt.close(fig)
            return None
        return fig
