"""PyTorch/timm checkpoint -> flax pytree weight converter.

Enables bit-faithful parity with the reference: its backbone weights come
from timm's ``deit_tiny_patch16_224`` (`/root/reference/models/backbone.py:
12-18`) and its trained checkpoints are torch ``state_dict``s of the whole
RoViTKAN (`/root/reference/training/trainer.py:311-325`, keys like
``backbone.model.blocks.0.attn.qkv.weight``, ``classification_head.fc1.*``,
``kan_module.kan_layers.0.spline_weights``).

Conversion rules:
- torch ``nn.Linear.weight`` is ``(out, in)`` -> transpose to flax
  ``(in, out)`` kernels;
- the patch-embed conv kernel ``(out, C, kh, kw)`` becomes a dense matmul
  kernel ``(kh*kw*C, out)`` via ``transpose(2, 3, 1, 0).reshape(...)`` — our
  PatchEmbed flattens patch pixels in (row, col, channel) order
  (models/vit.py:37-58);
- LayerNorm ``weight``/``bias`` -> ``scale``/``bias``;
- KAN ``spline_weights`` keep their ``(in, out, K)`` layout; the dense
  residual ``linear.weight`` transposes like any Linear.

Accepts plain dicts of numpy arrays too, so tests and offline conversion
don't need torch installed.
"""
from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    # Owned copy, never a view: torch's .numpy() shares memory with the
    # live tensor (and jnp.asarray on CPU can zero-copy numpy), so without
    # this a later in-place torch optimizer step would silently mutate the
    # converted tree.
    return np.array(x, dtype=np.float32, copy=True)


def _linear(sd: Mapping, prefix: str) -> Dict[str, np.ndarray]:
    return {"kernel": _np(sd[f"{prefix}.weight"]).T,
            "bias": _np(sd[f"{prefix}.bias"])}


def _layernorm(sd: Mapping, prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": _np(sd[f"{prefix}.weight"]),
            "bias": _np(sd[f"{prefix}.bias"])}


def convert_timm_vit(sd: Mapping, depth: int = 12,
                     prefix: str = "") -> Dict:
    """Convert a timm VisionTransformer state_dict (deit_tiny layout:
    cls_token, pos_embed, patch_embed.proj, blocks.{i}.{norm1,attn.qkv,
    attn.proj,norm2,mlp.fc1,mlp.fc2}, norm) to our backbone param tree."""
    p = prefix
    conv_w = _np(sd[f"{p}patch_embed.proj.weight"])     # (D, C, kh, kw)
    D, C, kh, kw = conv_w.shape
    kernel = conv_w.transpose(2, 3, 1, 0).reshape(kh * kw * C, D)

    out: Dict = {
        "cls_token": _np(sd[f"{p}cls_token"]),
        "pos_embed": _np(sd[f"{p}pos_embed"]),
        "patch_embed": {"proj": {"kernel": kernel,
                                 "bias": _np(sd[f"{p}patch_embed.proj.bias"])}},
        "norm": _layernorm(sd, f"{p}norm"),
    }
    for i in range(depth):
        b = f"{p}blocks.{i}"
        out[f"blocks_{i}"] = {
            "norm1": _layernorm(sd, f"{b}.norm1"),
            "attn": {"qkv": _linear(sd, f"{b}.attn.qkv"),
                     "proj": _linear(sd, f"{b}.attn.proj")},
            "norm2": _layernorm(sd, f"{b}.norm2"),
            "mlp": {"fc1": _linear(sd, f"{b}.mlp.fc1"),
                    "fc2": _linear(sd, f"{b}.mlp.fc2")},
        }
    return out


def _head_trunk(sd: Mapping, prefix: str) -> Dict:
    return {"trunk": {"fc1": _linear(sd, f"{prefix}.fc1")}}


def convert_reference_checkpoint(sd: Mapping, depth: int = 12) -> Dict:
    """Convert a full reference RoViTKAN ``model_state_dict`` to our param
    tree. Missing heads (ablation variants) are simply absent from the
    output, matching the structurally-absent-head model configs."""
    params: Dict = {
        "backbone": convert_timm_vit(sd, depth=depth,
                                     prefix="backbone.model."),
    }
    if "classification_head.fc1.weight" in sd:
        params["classification_head"] = {
            **_head_trunk(sd, "classification_head"),
            "fc2": _linear(sd, "classification_head.fc2"),
        }
    if "ordinal_head.fc1.weight" in sd:
        params["ordinal_head"] = {
            **_head_trunk(sd, "ordinal_head"),
            "fc2": _linear(sd, "ordinal_head.fc2"),
        }
    if "uncertainty_head.fc1.weight" in sd:
        params["uncertainty_head"] = {
            **_head_trunk(sd, "uncertainty_head"),
            "fc_mu": _linear(sd, "uncertainty_head.fc_mu"),
            "fc_logvar": _linear(sd, "uncertainty_head.fc_logvar"),
        }
    if "kan_module.kan_layers.0.spline_weights" in sd:
        kan: Dict = {}
        n_kan = sum(1 for k in sd
                    if k.startswith("kan_module.kan_layers.")
                    and k.endswith(".spline_weights"))
        for i in range(n_kan):
            b = f"kan_module.kan_layers.{i}"
            kan[f"kan_layers_{i}"] = {
                "spline_weights": _np(sd[f"{b}.spline_weights"]),
                "kernel": _np(sd[f"{b}.linear.weight"]).T,
                "bias": _np(sd[f"{b}.linear.bias"]),
            }
        params["kan_module"] = kan
    return params


def load_torch_checkpoint(path) -> Dict:
    """Load a reference ``best_model.pth`` (torch serialization) and return
    its ``model_state_dict`` as numpy arrays."""
    import torch
    ck = torch.load(path, map_location="cpu", weights_only=False)
    sd = ck.get("model_state_dict", ck)
    return {k: _np(v) for k, v in sd.items()}


def save_npz(params: Dict, path) -> None:
    """Flatten a param tree to an .npz (keys joined with '/')."""
    flat: Dict[str, np.ndarray] = {}

    def rec(tree, prefix=""):
        for k, v in tree.items():
            key = f"{prefix}{k}"
            if isinstance(v, dict):
                rec(v, key + "/")
            else:
                flat[key] = np.asarray(v)

    rec(params)
    np.savez(path, **flat)


def load_npz(path) -> Dict:
    """Inverse of save_npz."""
    out: Dict = {}
    with np.load(path) as z:
        for key in z.files:
            parts = key.split("/")
            node = out
            for part in parts[:-1]:
                node = node.setdefault(part, {})
            node[parts[-1]] = z[key]
    return out


def convert_checkpoint_file(pth_path, npz_path=None,
                            depth: int = 12) -> Dict:
    """One-shot: reference .pth -> our param tree (+ optional .npz)."""
    sd = load_torch_checkpoint(pth_path)
    params = convert_reference_checkpoint(sd, depth=depth)
    if npz_path is not None:
        save_npz(params, npz_path)
    return params


def interpolate_pos_embed(pos_embed: np.ndarray,
                          target_tokens: int) -> np.ndarray:
    """Bilinearly resample a ViT position embedding ``(1, 1+N, D)`` to a new
    patch-grid size (standard resolution-transfer recipe: the CLS position
    is kept; the N patch positions reshape to their sqrt(N) x sqrt(N) grid
    and resample to the target grid)."""
    cls_pos, patch_pos = pos_embed[:, :1], pos_embed[:, 1:]
    n_src = patch_pos.shape[1]
    n_dst = target_tokens - 1
    if n_src == n_dst:
        return pos_embed
    gs = int(np.sqrt(n_src))
    gd = int(np.sqrt(n_dst))
    d = patch_pos.shape[-1]
    import jax
    grid = patch_pos.reshape(1, gs, gs, d)
    resized = np.asarray(jax.image.resize(grid, (1, gd, gd, d), "bilinear"))
    return np.concatenate([cls_pos, resized.reshape(1, gd * gd, d)], axis=1)


def transfer_resolution(params: Dict, image_size: int,
                        patch_size: int) -> Dict:
    """Return a copy of a RoViTKAN param tree with the backbone's position
    embedding bilinearly resampled for ``image_size`` (copy-on-write of the
    two touched dict levels; the input tree is untouched). The single
    load-time recipe behind ``load_model_for_evaluation(image_size=...)``
    and the serving benchmarks."""
    n_tokens = (image_size // patch_size) ** 2 + 1
    out = dict(params)
    out["backbone"] = dict(params["backbone"])
    out["backbone"]["pos_embed"] = interpolate_pos_embed(
        np.asarray(params["backbone"]["pos_embed"]), n_tokens)
    return out


def merge_pretrained(params: Dict, pretrained: Dict, verbose: bool = True) -> Dict:
    """Overlay converted pretrained weights onto a freshly-initialized param
    tree (the reference's ``pretrained=True`` path,
    `/root/reference/models/backbone.py:12-16`). Subtrees present in
    ``pretrained`` with matching shapes replace the init values; everything
    else (heads the checkpoint lacks, shape mismatches from a different
    image size) keeps its initialization.
    """
    import copy
    out = copy.deepcopy(params)

    def rec(dst, src, path=""):
        for k, v in src.items():
            if k not in dst:
                if verbose:
                    print(f"  [pretrained] skipping unknown {path}{k}")
                continue
            if isinstance(v, dict):
                rec(dst[k], v, f"{path}{k}/")
            elif np.shape(dst[k]) == np.shape(v):
                dst[k] = np.asarray(v, dtype=np.float32)
            elif k == "pos_embed" and np.ndim(v) == 3 \
                    and np.shape(v)[-1] == np.shape(dst[k])[-1]:
                # Resolution transfer: resample patch positions to the
                # target grid (e.g. 224px weights -> other image sizes).
                dst[k] = interpolate_pos_embed(
                    np.asarray(v, np.float32), np.shape(dst[k])[1])
                if verbose:
                    print(f"  [pretrained] interpolated {path}{k} "
                          f"{np.shape(v)} -> {np.shape(dst[k])}")
            elif verbose:
                print(f"  [pretrained] shape mismatch {path}{k}: "
                      f"{np.shape(v)} vs {np.shape(dst[k])} — keeping init")

    rec(out, pretrained)
    return out
