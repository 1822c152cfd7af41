"""Property-based tests (hypothesis): invariants that must hold for ANY
input, not just the fixed fixtures — spline partition-of-unity, ordinal
probability simplex, mixing bounds, metric ranges."""
import numpy as np
from hypothesis import given, settings, strategies as st

import jax
import jax.numpy as jnp

from rovit_kan_tpu.ops.spline import make_knots, bspline_basis
from rovit_kan_tpu.ops.ordinal import (
    cumulative_to_class_probs, ordinal_expected_severity)
from rovit_kan_tpu.ops.mixing import cutmix_or_mixup
from rovit_kan_tpu.evaluation import metrics as M

# Single-core CPU: keep example counts small and deadlines off.
SETTINGS = settings(max_examples=20, deadline=None)


@SETTINGS
@given(st.integers(3, 9), st.integers(1, 3), st.integers(0, 2 ** 31 - 1))
def test_bspline_partition_of_unity(num_knots, degree, seed):
    """Interior-point basis functions sum to 1 and are nonnegative for any
    (num_knots, degree) combination."""
    knots = make_knots(num_knots, degree)
    rng = np.random.RandomState(seed)
    # Strictly inside the knot range (boundaries lose partition of unity
    # with the reference's half-open interval convention).
    lo, hi = knots[degree], knots[-degree - 1]
    x = jnp.asarray(rng.uniform(lo + 1e-4, hi - 1e-4, (32,)), jnp.float32)
    basis = np.asarray(bspline_basis(x, knots, degree))
    assert (basis >= -1e-6).all()
    np.testing.assert_allclose(basis.sum(-1), 1.0, atol=1e-4)


@SETTINGS
@given(st.integers(0, 2 ** 31 - 1), st.integers(2, 8))
def test_ordinal_probs_form_simplex(seed, k):
    """Class probabilities from any cumulative logits sum to 1; expected
    severity lies in [0, K-1] whenever the probs are a valid simplex."""
    rng = np.random.RandomState(seed)
    logits = jnp.asarray(rng.randn(16, k - 1) * 3, jnp.float32)
    probs = np.asarray(cumulative_to_class_probs(logits))
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)
    sev = np.asarray(ordinal_expected_severity(logits))
    # NOTE: the reference's adjacent-difference conversion can yield
    # negative middle probs for non-monotone cumulative logits (faithfully
    # reproduced); severity stays bounded when probs are nonnegative.
    if (probs >= -1e-6).all():
        assert (sev >= -1e-4).all() and (sev <= k - 1 + 1e-4).all()


@SETTINGS
@given(st.integers(0, 2 ** 31 - 1))
def test_cutmix_or_mixup_invariants(seed):
    """lam in [0,1]; mixed pixels stay within the convex hull of inputs."""
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.rand(4, 16, 16, 3), jnp.float32)
    labels = jnp.asarray(rng.randint(0, 4, 4))
    mixed, la, lb, lam = cutmix_or_mixup(jax.random.PRNGKey(seed), x, labels)
    assert 0.0 <= float(lam) <= 1.0
    m = np.asarray(mixed)
    assert m.min() >= float(np.asarray(x).min()) - 1e-6
    assert m.max() <= float(np.asarray(x).max()) + 1e-6


@SETTINGS
@given(st.integers(0, 2 ** 31 - 1), st.integers(10, 200))
def test_metric_ranges(seed, n):
    """accuracy/F1 in [0,1]; ECE in [0,1]; Brier in [0,2]; Spearman in
    [-1,1] for arbitrary prediction distributions."""
    rng = np.random.RandomState(seed)
    y = rng.randint(0, 4, n)
    logits = rng.randn(n, 4) * rng.uniform(0.1, 5)
    p = np.exp(logits - logits.max(1, keepdims=True))
    p /= p.sum(1, keepdims=True)
    preds = p.argmax(1)
    assert 0.0 <= M.accuracy(y, preds) <= 1.0
    assert 0.0 <= M.macro_f1(y, preds, 4) <= 1.0
    assert 0.0 <= M.ece(p, y) <= 1.0
    assert 0.0 <= M.brier_score(p, y) <= 2.0
    rho = M.spearman_rho(y.astype(float), rng.randn(n))
    assert -1.0 - 1e-9 <= rho <= 1.0 + 1e-9


@SETTINGS
@given(st.integers(0, 2 ** 31 - 1), st.integers(1, 6),
       st.floats(0.25, 4.0))
def test_moe_routing_invariants(seed, num_experts, capacity_factor):
    """Expert-choice MoE (models/moe.py) for ANY (E, capacity factor):
    output is finite; each token's total combine weight is at most its
    gate-prob mass (<= 1); tokens chosen by no expert contribute exactly
    zero (residual-carried)."""
    from rovit_kan_tpu.models.moe import MoEMlp, expert_capacity

    rng = np.random.RandomState(seed)
    B, S, D = 2, 7, 8
    x = jnp.asarray(rng.randn(B, S, D), jnp.float32)
    moe = MoEMlp(D, 16, num_experts=num_experts,
                 capacity_factor=capacity_factor)
    params = moe.init(jax.random.PRNGKey(seed % 1000), x)["params"]
    out = np.asarray(moe.apply({"params": params}, x))
    assert np.isfinite(out).all()

    # Recompute the routing exactly as the layer does to find the
    # never-chosen tokens: their output rows must be exactly zero.
    gate = np.asarray(x) @ np.asarray(params["gate"]["kernel"])
    probs = np.exp(gate - gate.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    C = expert_capacity(S, num_experts, capacity_factor)
    chosen = np.zeros((B, S), bool)
    for b in range(B):
        for e in range(num_experts):
            top = np.argsort(-probs[b, :, e], kind="stable")[:C]
            chosen[b, top] = True
    np.testing.assert_array_equal(out[~chosen], 0.0)
    # A chosen token's combine weight is its gate prob for each expert
    # that picked it, so total weight per token <= sum_e p_e = 1 -> the
    # output is bounded by the max per-expert FFN response magnitude.
    assert (probs.sum(-1) <= 1.0 + 1e-5).all()
