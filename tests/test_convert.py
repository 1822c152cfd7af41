"""Weight-converter parity: a clean-room torch twin of the reference model
(timm-layout ViT backbone + reference-layout heads/KAN, built from the
published architecture specs) is randomly initialized, converted with
models/convert.py, and must produce matching outputs in JAX.

This validates every transpose/reshape in the converter and the numerical
fidelity of the JAX forward (LN eps, exact GELU, attention scaling, ordinal/
KAN math) in one shot — the SURVEY.md 'hard part (a)'.
"""
import math

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from rovit_kan_tpu.models.rovit_kan import RoViTKAN
from rovit_kan_tpu.models.convert import (
    convert_reference_checkpoint, convert_timm_vit, save_npz, load_npz)

D, DEPTH, HEADS, IMG, PATCH, HID = 32, 2, 2, 32, 16, 16
KAN_DIMS = (32, 8, 1)


# ---- torch twin: timm VisionTransformer layout (deit_tiny structure) ----
class TorchBlock(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = nn.Module()
        self.attn.qkv = nn.Linear(dim, dim * 3)
        self.attn.proj = nn.Linear(dim, dim)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(dim, dim * 4)
        self.mlp.fc2 = nn.Linear(dim * 4, dim)
        self.heads = heads

    def forward(self, x):
        B, N, C = x.shape
        h = self.heads
        y = self.norm1(x)
        qkv = self.attn.qkv(y).reshape(B, N, 3, h, C // h).permute(
            2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        a = (q @ k.transpose(-2, -1)) * (C // h) ** -0.5
        a = a.softmax(dim=-1)
        y = (a @ v).transpose(1, 2).reshape(B, N, C)
        x = x + self.attn.proj(y)
        y = self.norm2(x)
        y = self.mlp.fc2(nn.functional.gelu(self.mlp.fc1(y)))
        return x + y


class TorchViT(nn.Module):
    """timm deit_tiny_patch16_224 structure at test size."""

    def __init__(self):
        super().__init__()
        n = (IMG // PATCH) ** 2
        self.cls_token = nn.Parameter(torch.randn(1, 1, D) * 0.02)
        self.pos_embed = nn.Parameter(torch.randn(1, n + 1, D) * 0.02)
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, D, PATCH, stride=PATCH)
        self.blocks = nn.ModuleList(
            [TorchBlock(D, HEADS) for _ in range(DEPTH)])
        self.norm = nn.LayerNorm(D, eps=1e-6)

    def forward(self, x):
        B = x.shape[0]
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)  # (B, N, D)
        x = torch.cat([self.cls_token.expand(B, -1, -1), x], dim=1)
        x = x + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        return self.norm(x)[:, 0]                                # CLS


# ---- torch twin: reference heads (models/heads.py) + KAN (models/kan.py) --
class TorchHead(nn.Module):
    def __init__(self, din, hid, dout):
        super().__init__()
        self.fc1 = nn.Linear(din, hid)
        self.fc2 = nn.Linear(hid, dout)

    def forward(self, x):
        return self.fc2(torch.relu(self.fc1(x)))


class TorchUncertainty(nn.Module):
    def __init__(self, din, hid):
        super().__init__()
        self.fc1 = nn.Linear(din, hid)
        self.fc_mu = nn.Linear(hid, 1)
        self.fc_logvar = nn.Linear(hid, 1)

    def forward(self, x):
        x = torch.relu(self.fc1(x))
        return self.fc_mu(x), torch.clamp(self.fc_logvar(x), -10, 10)


def torch_bspline_basis(x, knots, degree):
    """Literal Cox-de Boor transcription of reference models/kan.py:8-44."""
    num_knots = len(knots)
    num_basis = num_knots - degree - 1
    x = torch.clamp(x, knots[0], knots[-1])
    basis = [((x >= knots[i]) & (x < knots[i + 1])).float()
             for i in range(num_basis)]
    for d in range(1, degree + 1):
        nb = []
        for i in range(num_basis):
            term = torch.zeros_like(x)
            if knots[i + d] != knots[i]:
                term = term + (x - knots[i]) / (knots[i + d] - knots[i]) \
                    * basis[i]
            if i + d + 1 < num_knots and knots[i + d + 1] != knots[i + 1] \
                    and i + 1 < num_basis:
                term = term + (knots[i + d + 1] - x) / (
                    knots[i + d + 1] - knots[i + 1]) * basis[i + 1]
            nb.append(term)
        basis = nb
    return torch.stack(basis, dim=-1)


class TorchKANLayer(nn.Module):
    def __init__(self, din, dout, num_knots=5, degree=3):
        super().__init__()
        self.degree = degree
        knots = torch.linspace(-1, 1, num_knots + 2 * degree)
        self.register_buffer("knots", knots)
        nb = num_knots + degree - 1
        self.spline_weights = nn.Parameter(torch.randn(din, dout, nb) * 0.1)
        self.linear = nn.Linear(din, dout)

    def forward(self, x):
        basis = torch_bspline_basis(torch.tanh(x), self.knots, self.degree)
        spline = torch.einsum("bik,iok->bo", basis, self.spline_weights)
        return self.linear(x) + spline


class TorchKAN(nn.Module):
    def __init__(self, dims=KAN_DIMS):
        super().__init__()
        self.kan_layers = nn.ModuleList(
            [TorchKANLayer(dims[i], dims[i + 1])
             for i in range(len(dims) - 1)])

    def forward(self, x):
        for layer in self.kan_layers[:-1]:
            x = torch.relu(layer(x))
        return 3.0 * torch.sigmoid(self.kan_layers[-1](x))


class TorchRoViTKAN(nn.Module):
    def __init__(self):
        super().__init__()
        self.backbone = nn.Module()
        self.backbone.model = TorchViT()
        self.classification_head = TorchHead(D, HID, 4)
        self.ordinal_head = TorchHead(D, HID, 3)
        self.uncertainty_head = TorchUncertainty(D, HID)
        self.kan_module = TorchKAN()

    def forward(self, x):
        f = self.backbone.model(x)
        mu, lv = self.uncertainty_head(f)
        return {"features": f,
                "cls_logits": self.classification_head(f),
                "ordinal_logits": self.ordinal_head(f),
                "mu": mu, "log_var": lv,
                "kan_severity": self.kan_module(f)}


@pytest.fixture(scope="module")
def twin():
    torch.manual_seed(0)
    tm = TorchRoViTKAN().eval()
    jm = RoViTKAN(embed_dim=D, depth=DEPTH, num_heads=HEADS, image_size=IMG,
                  patch_size=PATCH, kan_layers=KAN_DIMS, hidden_dim=HID,
                  use_pallas_attention=False, use_pallas_kan=False)
    params = convert_reference_checkpoint(tm.state_dict(), depth=DEPTH)
    return tm, jm, params


def test_converted_tree_structure(twin):
    tm, jm, params = twin
    ref = jm.init(jax.random.PRNGKey(0),
                  np.zeros((1, IMG, IMG, 3), np.float32))["params"]
    flat_ref = {"/".join(p): v.shape for p, v in
                _flatten(ref)}
    flat_got = {"/".join(p): np.shape(v) for p, v in _flatten(params)}
    assert flat_ref == flat_got


def _flatten(tree, prefix=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _flatten(v, prefix + (k,))
        else:
            yield prefix + (k,), v


def test_full_model_output_parity(twin):
    tm, jm, params = twin
    rng = np.random.RandomState(0)
    x = rng.randn(4, IMG, IMG, 3).astype(np.float32)

    with torch.no_grad():
        tout = tm(torch.tensor(x).permute(0, 3, 1, 2))
    jout = jm.apply({"params": params}, jnp.asarray(x), deterministic=True)

    for key, tol in [("features", 2e-5), ("cls_logits", 2e-5),
                     ("ordinal_logits", 2e-5), ("mu", 2e-5),
                     ("log_var", 2e-5), ("kan_severity", 2e-5)]:
        np.testing.assert_allclose(
            np.asarray(jout[key]), tout[key].numpy(), atol=tol,
            err_msg=key)


def test_backbone_only_conversion(twin):
    tm, jm, params = twin
    sd = {k[len("backbone.model."):]: v for k, v in tm.state_dict().items()
          if k.startswith("backbone.model.")}
    bb = convert_timm_vit(sd, depth=DEPTH)
    np.testing.assert_allclose(bb["pos_embed"],
                               params["backbone"]["pos_embed"])


def test_npz_roundtrip(twin, tmp_path):
    _, jm, params = twin
    save_npz(params, tmp_path / "w.npz")
    loaded = load_npz(tmp_path / "w.npz")
    for (pa, va), (pb, vb) in zip(sorted(_flatten(params)),
                                  sorted(_flatten(loaded))):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(va), vb)


def test_ablation_checkpoint_conversion(twin):
    """A no-KAN state dict converts to a tree without the kan_module."""
    tm, _, _ = twin
    sd = {k: v for k, v in tm.state_dict().items()
          if not k.startswith("kan_module")}
    params = convert_reference_checkpoint(sd, depth=DEPTH)
    assert "kan_module" not in params
    assert "classification_head" in params
