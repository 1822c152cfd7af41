"""Grad-CAM++ on the last transformer block's norm1 activation, hook-free.

Capability parity with `/root/reference/explainability/gradcam.py:10-163`:
alpha = g^2 / (2 g^2 + sum_tokens(a * g^3)) with a zero-denominator guard,
token weights = sum_channels(alpha * relu(g)), CAM = sum_channels(w * a)
minus the CLS token, ReLU, reshape to the patch grid, bilinear resize,
min-max normalize.

TPU-first redesign: the reference needs forward + full-backward hooks on
``blocks[-1].norm1``; JAX has no hooks, so the backbone accepts an additive
zero-valued perturbation at that exact tap (models/vit.py Block.norm1) —
``jax.grad`` w.r.t. the perturbation *is* the hook's grad_output, and the
forward returns the tap activation. One jit'd value_and_grad serves the whole
batch with per-example target classes (the reference loops images one at a
time through .backward()).
"""
from __future__ import annotations

import functools
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from rovit_kan_tpu.explainability.attention_maps import overlay_heatmap


def _cam_from_grads(acts: jnp.ndarray, grads: jnp.ndarray,
                    image_size: int) -> jnp.ndarray:
    """Grad-CAM++ map from tap activations/gradients ``(B, N, D)``."""
    g2 = grads ** 2
    g3 = grads ** 3
    denom = 2.0 * g2 + jnp.sum(acts * g3, axis=1, keepdims=True)
    denom = jnp.where(denom != 0.0, denom, jnp.ones_like(denom))
    alpha = g2 / denom                                     # (B, N, D)
    weights = jnp.sum(alpha * jax.nn.relu(grads), axis=2,
                      keepdims=True)                       # (B, N, 1)
    cam = jnp.sum(weights * acts, axis=2)                  # (B, N)
    cam = jax.nn.relu(cam[:, 1:])                          # drop CLS
    B = cam.shape[0]
    g = int(np.sqrt(cam.shape[-1]))
    cam = cam.reshape(B, g, g)
    cam = jax.image.resize(cam, (B, image_size, image_size), "bilinear")
    mn = cam.min(axis=(1, 2), keepdims=True)
    mx = cam.max(axis=(1, 2), keepdims=True)
    return jnp.where(mx > mn, (cam - mn) / (mx - mn + 1e-12),
                     jnp.zeros_like(cam))


@functools.lru_cache(maxsize=8)
def make_gradcam_fn(model):
    """Build the jit'd batched Grad-CAM++ function for a model.

    Memoized per model (flax modules are hashable dataclasses) so the
    function-style API doesn't retrace/recompile on every call."""

    @jax.jit
    def _gradcam(params, x, class_idx):
        B = x.shape[0]
        N = (model.image_size // model.patch_size) ** 2 + 1
        zeros = jnp.zeros((B, N, model.embed_dim), jnp.float32)

        def target_sum(perturb):
            out = model.apply({"params": params}, x, deterministic=True,
                              gradcam_perturbation=perturb)
            logits = out["cls_logits"]
            idx = jnp.where(class_idx >= 0, class_idx,
                            jnp.argmax(logits, axis=-1))
            picked = jnp.take_along_axis(logits, idx[:, None], axis=-1)
            # Summing over the batch gives each example its own target grad
            # (examples are independent through the tap).
            return picked.sum(), (out, idx)

        (_, (out, idx)), grads = jax.value_and_grad(
            target_sum, has_aux=True)(zeros)
        acts = out["norm1_tap"]
        return _cam_from_grads(acts, grads, model.image_size), idx

    return _gradcam


def gradcam_plus_plus(model, params, x: jnp.ndarray,
                      class_idx: Optional[np.ndarray] = None) -> np.ndarray:
    """One-shot batched Grad-CAM++. ``class_idx``: per-example target class
    ((B,) int array), or None for the predicted class (reference
    gradcam.py:52-54). Returns ``(B, H, W)`` maps in [0, 1]."""
    B = x.shape[0]
    if class_idx is None:
        class_idx = -np.ones((B,), np.int32)
    cams, _ = make_gradcam_fn(model)(params, x,
                                     jnp.asarray(class_idx, jnp.int32))
    return np.asarray(cams)


class GradCAMPlusPlus:
    """Object-style API mirroring the reference class (gradcam.py:10-163)."""

    def __init__(self, model, params):
        self.model = model
        self.params = params
        self._fn = make_gradcam_fn(model)

    def compute(self, images: jnp.ndarray,
                class_idx: Optional[np.ndarray] = None) -> np.ndarray:
        B = images.shape[0]
        if class_idx is None:
            class_idx = -np.ones((B,), np.int32)
        cams, _ = self._fn(self.params, images,
                           jnp.asarray(class_idx, jnp.int32))
        return np.asarray(cams)

    def overlay_on_image(self, image: np.ndarray, cam: np.ndarray,
                         alpha: float = 0.5) -> np.ndarray:
        return overlay_heatmap(image, cam, alpha)

    def visualize(self, image_display: np.ndarray, cam: np.ndarray,
                  save_path: Optional[Path] = None, title: str = ""):
        """3-panel figure: original / CAM / overlay (reference
        gradcam.py:106-163)."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, 3, figsize=(14, 5))
        img = np.asarray(image_display, np.float32)
        if img.max() > 1.0:
            img = img / 255.0
        axes[0].imshow(img)
        axes[0].set_title("Original")
        im = axes[1].imshow(cam, cmap="jet")
        axes[1].set_title("Grad-CAM++")
        fig.colorbar(im, ax=axes[1], fraction=0.046)
        axes[2].imshow(overlay_heatmap(img, cam))
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
