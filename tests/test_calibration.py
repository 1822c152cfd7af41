"""Temperature scaling + reliability curve (evaluation/calibration.py)."""
import numpy as np
import pytest

from rovit_kan_tpu.evaluation.calibration import (
    apply_temperature, fit_temperature, reliability_curve)
from rovit_kan_tpu.evaluation import metrics as M


def _calibrated_logits(n=4000, k=4, seed=0):
    """Logits whose softmax IS the label-generating distribution — the
    NLL-optimal temperature for these is exactly 1."""
    rng = np.random.RandomState(seed)
    logits = rng.normal(0.0, 1.5, (n, k))
    z = logits - logits.max(axis=1, keepdims=True)
    p = np.exp(z) / np.exp(z).sum(axis=1, keepdims=True)
    labels = np.array([rng.choice(k, p=pi) for pi in p])
    return logits, labels


def test_recovers_known_temperature():
    logits, labels = _calibrated_logits()
    # Scaling calibrated logits by c makes the optimal temperature c.
    for c in (3.0, 0.5):
        t = fit_temperature(logits * c, labels)
        assert t == pytest.approx(c, rel=0.1)


def test_overconfident_model_ece_and_brier_improve():
    logits, labels = _calibrated_logits()
    hot = logits * 5.0                      # grossly over-confident
    t = fit_temperature(hot, labels)
    assert t > 2.0
    raw = apply_temperature(hot, 1.0)
    cal = apply_temperature(hot, t)
    assert M.ece(cal, labels) < M.ece(raw, labels)
    assert M.brier_score(cal, labels) < M.brier_score(raw, labels)


def test_argmax_metrics_invariant():
    logits, labels = _calibrated_logits(n=512)
    t = fit_temperature(logits * 4.0, labels)
    raw = apply_temperature(logits * 4.0, 1.0)
    cal = apply_temperature(logits * 4.0, t)
    np.testing.assert_array_equal(raw.argmax(1), cal.argmax(1))
    assert M.accuracy(labels, cal.argmax(1)) == M.accuracy(labels,
                                                           raw.argmax(1))


def test_reliability_curve_shapes_and_mass():
    logits, labels = _calibrated_logits(n=1000)
    probs = apply_temperature(logits, 1.0)
    rc = reliability_curve(probs, labels, n_bins=10)
    assert rc["edges"].shape == (11,)
    assert rc["fraction"].sum() == pytest.approx(1.0)
    filled = ~np.isnan(rc["accuracy"])
    assert filled.any()
    # Bin confidence lies inside its bin.
    for i in np.where(filled)[0]:
        assert rc["edges"][i] < rc["confidence"][i] <= rc["edges"][i + 1]


def test_probs_match_softmax():
    logits, _ = _calibrated_logits(n=64)
    p = apply_temperature(logits, 2.0)
    z = logits / 2.0
    e = np.exp(z - z.max(axis=1, keepdims=True))
    np.testing.assert_allclose(p, e / e.sum(axis=1, keepdims=True),
                               atol=1e-6)


def test_degenerate_fit_is_floored_and_flagged():
    """A perfectly separated validation set has no real NLL minimum
    (VERDICT r4 weak #3: vgg16/swin_tiny fit T=0.063/0.116, ece_cal=0.0).
    With saturated margins the fp64 NLL underflows to a flat 0.0 plateau,
    so the minimizer can land anywhere inside it — the guard must trigger
    on NLL saturation, not only on the T floor."""
    from rovit_kan_tpu.evaluation.calibration import (NLL_SATURATED, T_FLOOR,
                                                      fit_temperature_report)
    rng = np.random.RandomState(0)
    labels = rng.randint(0, 4, 512)
    # Saturated, always-correct logits: margin ~20 on the true class.
    logits = rng.normal(0.0, 0.5, (512, 4))
    logits[np.arange(512), labels] += 20.0
    with pytest.warns(UserWarning, match="Degenerate temperature fit"):
        rep = fit_temperature_report(logits, labels)
    assert rep["degenerate"] is True
    assert rep["val_accuracy"] == 1.0
    assert rep["nll"] < NLL_SATURATED
    assert rep["temperature"] >= T_FLOOR

    with pytest.warns(UserWarning):
        t = fit_temperature(logits, labels)
    assert t >= T_FLOOR


def test_degenerate_fit_at_bracket_edge_is_floored():
    """Moderate always-correct margins keep the NLL strictly decreasing as
    T -> 0 without a wide flat plateau: the minimizer slams into the
    bracket's low edge and the T_FLOOR arm of the guard clamps it."""
    from rovit_kan_tpu.evaluation.calibration import (T_FLOOR,
                                                      fit_temperature_report)
    rng = np.random.RandomState(1)
    labels = rng.randint(0, 4, 512)
    logits = rng.normal(0.0, 0.1, (512, 4))
    logits[np.arange(512), labels] += 2.0
    with pytest.warns(UserWarning, match="Degenerate temperature fit"):
        rep = fit_temperature_report(logits, labels)
    assert rep["degenerate"] is True
    assert rep["temperature"] == T_FLOOR
    assert rep["raw_temperature"] < T_FLOOR


def test_healthy_fit_not_flagged():
    from rovit_kan_tpu.evaluation.calibration import fit_temperature_report
    logits, labels = _calibrated_logits(n=1000)
    rep = fit_temperature_report(logits * 3.0, labels)
    assert rep["degenerate"] is False
    assert rep["temperature"] == rep["raw_temperature"]
    assert rep["temperature"] == pytest.approx(3.0, rel=0.15)
