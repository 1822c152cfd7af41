"""Golden tests for the B-spline basis and KAN layer numerics.

The independent oracle is a direct, textbook Cox-de Boor implementation in
NumPy with the reference's conventions (half-open degree-0 intervals, clamp
to knot range, zero-guarded terms) plus a literal loop-based contraction —
written here from the math spec, evaluated elementwise.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rovit_kan_tpu.ops.spline import (
    make_knots,
    num_basis_functions,
    bspline_basis,
    kan_layer_apply,
)
from rovit_kan_tpu.ops.kan_kernel import fused_kan_layer


def naive_basis(x, knots, degree):
    """Scalar-at-a-time Cox-de Boor oracle."""
    x = np.clip(x, knots[0], knots[-1])
    nk = len(knots)
    nb = nk - degree - 1
    B = np.zeros((x.size, nb))
    xf = x.reshape(-1)
    for n, xv in enumerate(xf):
        b = np.array([1.0 if knots[i] <= xv < knots[i + 1] else 0.0
                      for i in range(nb)])
        for d in range(1, degree + 1):
            nb_new = np.zeros(nb)
            for i in range(nb):
                t = 0.0
                if knots[i + d] != knots[i]:
                    t += (xv - knots[i]) / (knots[i + d] - knots[i]) * b[i]
                if i + d + 1 < nk and knots[i + d + 1] != knots[i + 1] and i + 1 < nb:
                    t += ((knots[i + d + 1] - xv)
                          / (knots[i + d + 1] - knots[i + 1])) * b[i + 1]
                nb_new[i] = t
            b = nb_new
        B[n] = b
    return B.reshape(*x.shape, nb)


def test_knot_vector_and_basis_count():
    knots = make_knots(5, 3)
    assert knots.shape == (11,)
    assert knots[0] == -1.0 and knots[-1] == 1.0
    assert num_basis_functions(5, 3) == 7
    assert len(knots) - 3 - 1 == 7


def test_basis_matches_naive_oracle():
    knots = make_knots(5, 3)
    rng = np.random.RandomState(0)
    x = rng.uniform(-1.5, 1.5, size=(4, 6)).astype(np.float32)
    got = np.asarray(bspline_basis(jnp.asarray(x), knots, 3))
    want = naive_basis(x, knots, 3)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_basis_partition_of_unity_interior():
    # Clamped-uniform B-splines of this construction only sum to 1 strictly
    # inside the supported region [knots[degree], knots[-degree-1]].
    knots = make_knots(5, 3)
    x = jnp.linspace(float(knots[3]) + 1e-3, float(knots[-4]) - 1e-3, 64)
    basis = bspline_basis(x, knots, 3)
    np.testing.assert_allclose(np.asarray(basis.sum(-1)), 1.0, atol=1e-5)


def test_basis_nonnegative_and_local_support():
    knots = make_knots(5, 3)
    x = jnp.linspace(-1.0, 1.0, 101)
    basis = np.asarray(bspline_basis(x, knots, 3))
    assert (basis >= -1e-7).all()
    # Each basis function is supported on at most degree+1 knot spans.
    spans = (basis > 1e-9).sum(axis=0)
    assert (spans < basis.shape[0]).all()


def test_kan_layer_matches_loop_semantics():
    """Einsum/matmul contraction == the reference's double-loop semantics."""
    rng = np.random.RandomState(1)
    B, fin, fout, K = 3, 5, 4, 7
    knots = make_knots(5, 3)
    x = rng.randn(B, fin).astype(np.float32)
    W = (0.1 * rng.randn(fin, fout, K)).astype(np.float32)
    Wl = rng.randn(fin, fout).astype(np.float32)
    bl = rng.randn(fout).astype(np.float32)

    got = np.asarray(kan_layer_apply(jnp.asarray(x), jnp.asarray(W),
                                     jnp.asarray(Wl), jnp.asarray(bl), knots))

    basis = naive_basis(np.tanh(x), knots, 3)       # (B, fin, K)
    spline = np.zeros((B, fout))
    for i in range(fin):
        for j in range(fout):
            spline[:, j] += (basis[:, i, :] * W[i, j]).sum(-1)
    want = x @ Wl + bl + spline
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("B,fin,fout", [(4, 192, 64), (3, 16, 1)])
def test_fused_kan_kernel_matches_xla(B, fin, fout):
    rng = np.random.RandomState(2)
    knots = make_knots(5, 3)
    x = jnp.asarray(rng.randn(B, fin).astype(np.float32))
    W = jnp.asarray((0.1 * rng.randn(fin, fout, 7)).astype(np.float32))
    Wl = jnp.asarray(rng.randn(fin, fout).astype(np.float32) * 0.1)
    bl = jnp.asarray(rng.randn(fout).astype(np.float32))

    want = kan_layer_apply(x, W, Wl, bl, knots)
    got = fused_kan_layer(x, W, Wl, bl, knots)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_fused_kan_kernel_gradients():
    rng = np.random.RandomState(3)
    knots = make_knots(5, 3)
    x = jnp.asarray(rng.randn(4, 8).astype(np.float32))
    W = jnp.asarray((0.1 * rng.randn(8, 3, 7)).astype(np.float32))
    Wl = jnp.asarray(rng.randn(8, 3).astype(np.float32) * 0.1)
    bl = jnp.asarray(rng.randn(3).astype(np.float32))

    def loss_fused(x, W, Wl, bl):
        return jnp.sum(fused_kan_layer(x, W, Wl, bl, knots) ** 2)

    def loss_xla(x, W, Wl, bl):
        return jnp.sum(kan_layer_apply(x, W, Wl, bl, knots) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, W, Wl, bl)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(x, W, Wl, bl)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_fused_kan_module_matches_xla_stack():
    """Whole-module Pallas fusion == the layer-by-layer XLA path (values
    and gradients)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from rovit_kan_tpu.models.kan import KANSeverityModule

    dims = (24, 8, 1)
    x = jnp.asarray(np.random.RandomState(0).randn(10, 24), jnp.float32)
    plain = KANSeverityModule(dims, use_pallas=False)
    fused = KANSeverityModule(dims, use_pallas=True)
    params = plain.init(jax.random.PRNGKey(0), x)["params"]

    # Same param tree structure (converter compatibility).
    p2 = fused.init(jax.random.PRNGKey(0), x)["params"]
    assert jax.tree.structure(params) == jax.tree.structure(p2)

    y_plain = plain.apply({"params": params}, x)
    y_fused = fused.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_plain),
                               atol=1e-5)
    assert float(y_fused.min()) >= 0.0 and float(y_fused.max()) <= 3.0

    def loss(m, p):
        return (m.apply({"params": p}, x) ** 2).sum()

    g_plain = jax.grad(lambda p: loss(plain, p))(params)
    g_fused = jax.grad(lambda p: loss(fused, p))(params)
    for a, b in zip(jax.tree.leaves(g_plain), jax.tree.leaves(g_fused)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-4)
