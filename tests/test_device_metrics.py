"""On-device jit metrics vs the host (sklearn/scipy-validated) versions."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rovit_kan_tpu.ops import device_metrics as D
from rovit_kan_tpu.evaluation import metrics as H


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(0)
    n = 100
    labels = rng.randint(0, 4, n)
    logits = rng.randn(n, 4)
    logits[np.arange(n), labels] += 1.5
    probs = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    sev_true = labels.astype(np.float32)
    sev_pred = sev_true + rng.randn(n).astype(np.float32) * 0.7
    valid = np.ones(n, np.float32)
    return probs.astype(np.float32), labels, sev_pred, sev_true, valid


def test_all_metrics_match_host(data):
    probs, labels, sev_pred, sev_true, valid = data
    got = jax.jit(D.all_metrics, static_argnames="num_classes")(
        jnp.asarray(probs), jnp.asarray(labels), jnp.asarray(sev_pred),
        jnp.asarray(sev_true), jnp.asarray(valid), num_classes=4)
    preds = probs.argmax(1)
    assert float(got["accuracy"]) == pytest.approx(
        H.accuracy(labels, preds), abs=1e-6)
    assert float(got["macro_f1"]) == pytest.approx(
        H.macro_f1(labels, preds, 4), abs=1e-6)
    assert float(got["mae"]) == pytest.approx(
        H.mae(sev_true, sev_pred), abs=1e-5)
    assert float(got["spearman_rho"]) == pytest.approx(
        H.spearman_rho(sev_true, sev_pred), abs=1e-5)
    assert float(got["brier_score"]) == pytest.approx(
        H.brier_score(probs, labels), abs=1e-5)
    assert float(got["ece"]) == pytest.approx(
        H.ece(probs, labels), abs=1e-5)
    np.testing.assert_array_equal(
        np.asarray(got["confusion_matrix"]),
        H.compute_confusion_matrix(labels, preds, 4))


def test_spearman_ties_scipy_parity():
    from scipy.stats import spearmanr
    rng = np.random.RandomState(1)
    a = rng.randint(0, 4, 60).astype(np.float32)      # heavy ties
    b = rng.randint(0, 4, 60).astype(np.float32)
    got = float(D.spearman_rho(jnp.asarray(a), jnp.asarray(b)))
    assert got == pytest.approx(spearmanr(a, b).statistic, abs=1e-5)


def test_padding_invariance(data):
    """Metrics over a padded batch equal metrics over the unpadded data."""
    probs, labels, sev_pred, sev_true, valid = data
    pad = 28
    probs_p = np.concatenate([probs, np.full((pad, 4), 0.25, np.float32)])
    labels_p = np.concatenate([labels, np.zeros(pad, labels.dtype)])
    sp_p = np.concatenate([sev_pred, np.zeros(pad, np.float32)])
    st_p = np.concatenate([sev_true, np.zeros(pad, np.float32)])
    valid_p = np.concatenate([valid, np.zeros(pad, np.float32)])

    a = D.all_metrics(jnp.asarray(probs), jnp.asarray(labels),
                      jnp.asarray(sev_pred), jnp.asarray(sev_true),
                      jnp.asarray(valid))
    b = D.all_metrics(jnp.asarray(probs_p), jnp.asarray(labels_p),
                      jnp.asarray(sp_p), jnp.asarray(st_p),
                      jnp.asarray(valid_p))
    for k in ("accuracy", "macro_f1", "mae", "spearman_rho", "brier_score",
              "ece"):
        assert float(a[k]) == pytest.approx(float(b[k]), abs=1e-5), k
    np.testing.assert_allclose(np.asarray(a["confusion_matrix"]),
                               np.asarray(b["confusion_matrix"]))
