"""Tests for the two baselines the reference *skipped* for CPU cost:
VGG16 and Swin-Tiny (`/root/reference/experiments/baselines.py:62-64`).

Param counts are asserted against the published architectures re-headed
to 4 classes:
  - torchvision vgg16: 138,357,544 @1000 cls -> 134,276,932 @4
  - timm swin_tiny_patch4_window7_224: 28,288,354 @1000 -> 27,522,430 @4
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rovit_kan_tpu.models.baselines import (
    BACKBONES, BaselineModel, SwinTiny, _rel_pos_index, _shift_mask)


def _param_count(model, size):
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                            jnp.zeros((1, size, size, 3)))
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(shapes))


def test_registry_has_skipped_baselines():
    assert "vgg16" in BACKBONES and "swin_tiny" in BACKBONES


@pytest.mark.parametrize("name,expected", [
    ("vgg16", 134_276_932),
    ("swin_tiny", 27_522_430),
])
def test_param_counts_match_published(name, expected):
    model = BaselineModel(backbone_name=name, num_classes=4)
    assert _param_count(model, 224) == expected


@pytest.mark.parametrize("name,size", [("vgg16", 32), ("swin_tiny", 32)])
def test_forward_small_image(name, size):
    """Both models handle non-canonical sizes with fully static shapes
    (VGG16: any multiple of 32; Swin: window falls back to a divisor)."""
    model = BaselineModel(backbone_name=name, num_classes=4)
    x = jnp.asarray(np.random.RandomState(0).rand(2, size, size, 3),
                    jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    logits = out["cls_logits"]
    assert logits.shape == (2, 4)
    assert bool(jnp.isfinite(logits).all())


def test_swin_grad_flow():
    """Every Swin parameter (incl. relative-bias tables) receives a
    finite, not-identically-zero gradient."""
    model = BaselineModel(backbone_name="swin_tiny", num_classes=4)
    x = jnp.asarray(np.random.RandomState(1).rand(2, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)

    def loss(params):
        out = model.apply({**variables, "params": params}, x)
        return jnp.mean(out["cls_logits"] ** 2)

    grads = jax.grad(loss)(variables["params"])
    leaves = jax.tree.leaves(grads)
    assert all(bool(jnp.isfinite(g).all()) for g in leaves)
    nonzero = sum(float(jnp.abs(g).sum()) > 0 for g in leaves)
    assert nonzero / len(leaves) > 0.9


def test_rel_pos_index_static_properties():
    ws = 7
    idx = _rel_pos_index(ws)
    n = ws * ws
    assert idx.shape == (n, n)
    # Indices address the (2ws-1)^2 bias table.
    assert idx.min() >= 0 and idx.max() < (2 * ws - 1) ** 2
    # Zero relative offset (the diagonal) maps to one single table entry.
    assert len(set(idx[np.arange(n), np.arange(n)].tolist())) == 1
    # Antisymmetry: idx[i,j] and idx[j,i] are mirrored about the center.
    center = idx[0, 0 + 0]  # any diagonal entry is the center index
    assert np.all(idx + idx.T == 2 * center)


def test_shift_mask_blocks_cross_region_attention():
    """Tokens rolled in from the opposite edge must not attend to local
    tokens: the additive mask is -100 exactly where the pre-roll region
    ids differ, 0 elsewhere."""
    H = W = 8
    ws, shift = 4, 2
    mask = _shift_mask(H, W, ws, shift)
    nW = (H // ws) * (W // ws)
    assert mask.shape == (nW, ws * ws, ws * ws)
    # Window 0 (top-left) is entirely interior: no masking at all.
    assert np.all(mask[0] == 0.0)
    # The bottom-right window mixes 4 regions: it must mask something,
    # and masking is symmetric (i,j blocked iff j,i blocked).
    assert (mask[-1] == -100.0).any()
    assert np.array_equal(mask[-1], mask[-1].T)
    # Diagonal (self-attention) is never masked.
    for w in range(nW):
        assert np.all(np.diag(mask[w]) == 0.0)


def test_swin_shifted_blocks_present_at_224_scale_config():
    """At the canonical 224px the window is 7 at every stage and odd
    blocks shift by 3 (ws // 2) whenever the feature map is larger than
    one window."""
    model = SwinTiny()
    x = jnp.zeros((1, 56, 56, 96))  # stage-0 feature map at 224px
    # ws selection logic mirrored from SwinTiny.__call__:
    ws = min(model.window, x.shape[1])
    while x.shape[1] % ws:
        ws -= 1
    assert ws == 7
