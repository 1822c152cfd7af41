"""Whole-block fused kernel vs the XLA block formulation (+ flax Block)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rovit_kan_tpu.ops.block_kernel import (
    _block_xla, fused_vit_block, _PKEYS)


def _params(rng, D=192, hidden=768, dtype=jnp.float32):
    def t(*shape, scale=0.05):
        return jnp.asarray(rng.normal(0, scale, shape), dtype)
    return {
        "ln1_scale": jnp.ones((D,), dtype) + t(D, scale=0.02),
        "ln1_bias": t(D, scale=0.02),
        "wqkv": t(D, 3 * D), "bqkv": t(3 * D, scale=0.02),
        "wproj": t(D, D), "bproj": t(D, scale=0.02),
        "ln2_scale": jnp.ones((D,), dtype) + t(D, scale=0.02),
        "ln2_bias": t(D, scale=0.02),
        "w1": t(D, hidden), "b1": t(hidden, scale=0.02),
        "w2": t(hidden, D), "b2": t(D, scale=0.02),
    }


def test_fused_block_matches_xla_fp32():
    rng = np.random.RandomState(0)
    p = _params(rng)
    x = jnp.asarray(rng.normal(0, 1, (4, 197, 192)), jnp.float32)
    got = fused_vit_block(x, p, 3)
    want = _block_xla(x, p, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-4)


def test_fused_block_matches_xla_bf16():
    rng = np.random.RandomState(1)
    p = _params(rng)
    x = jnp.asarray(rng.normal(0, 1, (2, 197, 192)), jnp.bfloat16)
    got = fused_vit_block(x, p, 3)
    want = _block_xla(x, p, 3)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=5e-2, rtol=5e-2)


def test_fused_block_gradients_match_xla():
    rng = np.random.RandomState(2)
    p = _params(rng, D=64, hidden=128)
    x = jnp.asarray(rng.normal(0, 1, (2, 17, 64)), jnp.float32)

    def loss_f(fn):
        return lambda xx, pp: jnp.sum(fn(xx, pp, 2) ** 2)

    g1 = jax.grad(loss_f(fused_vit_block), argnums=(0, 1))(x, p)
    g2 = jax.grad(loss_f(_block_xla), argnums=(0, 1))(x, p)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=1e-3)


def test_model_level_fused_block_matches_default():
    """RoViTKAN with use_pallas_block=True: identical param tree, outputs
    match the unfused model on the same params (checkpoint-compatible)."""
    from rovit_kan_tpu.models.rovit_kan import RoViTKAN

    kw = dict(embed_dim=32, depth=2, num_heads=2, image_size=32,
              patch_size=16, kan_layers=(32, 8, 1), hidden_dim=16,
              use_pallas_attention=False, use_pallas_kan=False)
    m_ref = RoViTKAN(**kw)
    m_fused = RoViTKAN(**kw, use_pallas_block=True)
    x = jnp.asarray(np.random.RandomState(4).normal(0, 1, (2, 32, 32, 3)),
                    jnp.float32)
    v_ref = m_ref.init(jax.random.PRNGKey(0), x)
    v_fused = m_fused.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(v_ref)
            == jax.tree_util.tree_structure(v_fused))
    out_ref = m_ref.apply(v_ref, x, deterministic=True)
    out_fused = m_fused.apply(v_ref, x, deterministic=True)  # SAME params
    for k in ("features", "cls_logits", "kan_severity", "mu"):
        np.testing.assert_allclose(np.asarray(out_fused[k]),
                                   np.asarray(out_ref[k]),
                                   atol=2e-4, rtol=1e-3)
    # Aux-output requests fall back per-call and still work.
    out_attn = m_fused.apply(v_ref, x, deterministic=True,
                             return_attention=True)
    assert out_attn["attention"].shape[0] == 2    # depth


def test_fused_block_matches_flax_block():
    """End-to-end agreement with the actual models/vit.py Block module."""
    from rovit_kan_tpu.models.vit import Block

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.normal(0, 1, (2, 197, 192)), jnp.float32)
    blk = Block(dim=192, num_heads=3, dtype=jnp.float32, use_pallas=False)
    variables = blk.init(jax.random.PRNGKey(0), x)
    bp = variables["params"]
    p = {
        "ln1_scale": bp["norm1"]["scale"], "ln1_bias": bp["norm1"]["bias"],
        "wqkv": bp["attn"]["qkv"]["kernel"], "bqkv": bp["attn"]["qkv"]["bias"],
        "wproj": bp["attn"]["proj"]["kernel"],
        "bproj": bp["attn"]["proj"]["bias"],
        "ln2_scale": bp["norm2"]["scale"], "ln2_bias": bp["norm2"]["bias"],
        "w1": bp["mlp"]["fc1"]["kernel"], "b1": bp["mlp"]["fc1"]["bias"],
        "w2": bp["mlp"]["fc2"]["kernel"], "b2": bp["mlp"]["fc2"]["bias"],
    }
    assert set(p) == set(_PKEYS)
    want, _, _ = blk.apply(variables, x)
    got = fused_vit_block(x, p, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-4)


def test_residual_bwd_matches_recompute_bwd(monkeypatch):
    """The recompute backward (default — it wins the on-chip A/B) and the
    saved-residual backward (ROVIT_BLOCK_RESIDUAL_BWD=1) are the same
    math — in fp32 the saved intermediates are exact, so gradients must
    agree to float tolerance."""
    rng = np.random.RandomState(7)
    p = _params(rng, D=64, hidden=128)
    x = jnp.asarray(rng.normal(0, 1, (2, 17, 64)), jnp.float32)

    def loss(xx, pp):
        return jnp.sum(fused_vit_block(xx, pp, 2) ** 2)

    monkeypatch.setenv("ROVIT_BLOCK_RESIDUAL_BWD", "1")
    g_res = jax.grad(loss, argnums=(0, 1))(x, p)
    monkeypatch.delenv("ROVIT_BLOCK_RESIDUAL_BWD", raising=False)
    g_rec = jax.grad(loss, argnums=(0, 1))(x, p)
    for a, b in zip(jax.tree.leaves(g_res), jax.tree.leaves(g_rec)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_residual_fwd_matches_plain_fwd():
    """The residual-spilling forward must return the identical block
    output as the single-output inference kernel (same math, extra
    writes)."""
    from rovit_kan_tpu.ops.block_kernel import _fused_block_res_impl
    rng = np.random.RandomState(8)
    p = _params(rng)
    x = jnp.asarray(rng.normal(0, 1, (2, 197, 192)), jnp.float32)
    plain = fused_vit_block(x, p, 3)
    out, qkv, attn, a1 = _fused_block_res_impl(
        x, *(p[k] for k in _PKEYS), heads=3, interpret=True)
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(out))
    # Residual shapes: padded-token layout, compute dtype.
    assert qkv.shape == (2, 200, 3 * 192)
    assert attn.shape == (2, 200, 192)
    assert a1.shape == (2, 200, 768)
