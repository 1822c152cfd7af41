"""Fused Pallas attention vs the XLA einsum path (interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp

from rovit_kan_tpu.ops.attention import fused_attention, _attention_xla


def test_fused_attention_matches_xla():
    rng = np.random.RandomState(0)
    B, h, N, d = 2, 3, 13, 8          # deliberately unaligned N, d
    q = jnp.asarray(rng.randn(B, h, N, d).astype(np.float32)) * d ** -0.5
    k = jnp.asarray(rng.randn(B, h, N, d).astype(np.float32))
    v = jnp.asarray(rng.randn(B, h, N, d).astype(np.float32))

    got = np.asarray(fused_attention(q, k, v))
    want = np.asarray(_attention_xla(q, k, v))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_fused_attention_gradients_match_xla():
    rng = np.random.RandomState(1)
    B, h, N, d = 1, 2, 9, 4
    q = jnp.asarray(rng.randn(B, h, N, d).astype(np.float32))
    k = jnp.asarray(rng.randn(B, h, N, d).astype(np.float32))
    v = jnp.asarray(rng.randn(B, h, N, d).astype(np.float32))

    g1 = jax.grad(lambda *a: jnp.sum(fused_attention(*a) ** 2),
                  argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(lambda *a: jnp.sum(_attention_xla(*a) ** 2),
                  argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-4)


def test_fused_attention_bwd_kernel_model_shape():
    """The fused Pallas backward (not an XLA recompute) matches the XLA
    gradients at the flagship shape (197 tokens, head_dim 64)."""
    rng = np.random.RandomState(2)
    B, h, N, d = 1, 3, 197, 64
    scale = d ** -0.5
    q = jnp.asarray(rng.randn(B, h, N, d).astype(np.float32)) * scale
    k = jnp.asarray(rng.randn(B, h, N, d).astype(np.float32))
    v = jnp.asarray(rng.randn(B, h, N, d).astype(np.float32))
    g = jnp.asarray(rng.randn(B, h, N, d).astype(np.float32))

    _, vjp_fused = jax.vjp(fused_attention, q, k, v)
    _, vjp_xla = jax.vjp(_attention_xla, q, k, v)
    for a, b in zip(vjp_fused(g), vjp_xla(g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)


def test_fused_attention_bf16_grads_finite_and_close():
    """bf16 operands through the fused backward: grads returned in bf16
    (primal dtype) and within bf16 rounding of the fp32 XLA gradients."""
    rng = np.random.RandomState(3)
    B, h, N, d = 1, 2, 29, 16
    q32 = rng.randn(B, h, N, d).astype(np.float32) * d ** -0.5
    k32 = rng.randn(B, h, N, d).astype(np.float32)
    v32 = rng.randn(B, h, N, d).astype(np.float32)

    def loss(fn, *args):
        return jnp.sum(fn(*args).astype(jnp.float32) ** 2)

    g_bf = jax.grad(lambda *a: loss(fused_attention, *a), argnums=(0, 1, 2))(
        jnp.asarray(q32, jnp.bfloat16), jnp.asarray(k32, jnp.bfloat16),
        jnp.asarray(v32, jnp.bfloat16))
    g_fp = jax.grad(lambda *a: loss(_attention_xla, *a), argnums=(0, 1, 2))(
        jnp.asarray(q32), jnp.asarray(k32), jnp.asarray(v32))
    for a, b in zip(g_bf, g_fp):
        assert a.dtype == jnp.bfloat16
        err = np.abs(np.asarray(a, np.float32) - np.asarray(b))
        assert err.max() < 0.35 * max(1.0, np.abs(np.asarray(b)).max())


def test_fused_attention_bf16_inputs():
    """bf16 operands (the mixed-precision path) stay close to the fp32
    XLA reference — softmax statistics are fp32 inside the kernel."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from rovit_kan_tpu.ops.attention import fused_attention, _attention_xla

    rng = np.random.RandomState(0)
    q = rng.randn(2, 3, 197, 64).astype(np.float32)
    k = rng.randn(2, 3, 197, 64).astype(np.float32)
    v = rng.randn(2, 3, 197, 64).astype(np.float32)
    scale = 64 ** -0.5
    want = np.asarray(_attention_xla(jnp.asarray(q * scale),
                                     jnp.asarray(k), jnp.asarray(v)))
    got = np.asarray(fused_attention(
        jnp.asarray(q * scale, jnp.bfloat16),
        jnp.asarray(k, jnp.bfloat16),
        jnp.asarray(v, jnp.bfloat16))).astype(np.float32)
    # bf16 operand rounding only: ~1e-2 absolute on O(1) values.
    assert np.abs(got - want).max() < 5e-2
