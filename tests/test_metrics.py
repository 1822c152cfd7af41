"""Metrics validated against sklearn/scipy goldens (the reference delegates
to those libraries — evaluation/metrics.py:13,21)."""
import numpy as np
import pytest

from rovit_kan_tpu.evaluation import metrics as M


@pytest.fixture(scope="module")
def preds():
    rng = np.random.RandomState(0)
    y_true = rng.randint(0, 4, 200)
    y_pred = np.where(rng.rand(200) < 0.7, y_true, rng.randint(0, 4, 200))
    logits = rng.randn(200, 4)
    logits[np.arange(200), y_pred] += 2.0
    probs = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    return y_true, y_pred, probs


def test_accuracy(preds):
    y_true, y_pred, _ = preds
    assert M.accuracy(y_true, y_pred) == pytest.approx(
        (y_true == y_pred).mean())


def test_f1_vs_sklearn(preds):
    from sklearn.metrics import f1_score
    y_true, y_pred, _ = preds
    assert M.macro_f1(y_true, y_pred, 4) == pytest.approx(
        f1_score(y_true, y_pred, average="macro"))
    assert M.weighted_f1(y_true, y_pred, 4) == pytest.approx(
        f1_score(y_true, y_pred, average="weighted"))


def test_f1_with_absent_class():
    from sklearn.metrics import f1_score
    y_true = np.array([0, 0, 1, 1, 2])
    y_pred = np.array([0, 1, 1, 1, 2])          # class 3 never appears
    assert M.macro_f1(y_true, y_pred, 4) == pytest.approx(
        f1_score(y_true, y_pred, labels=[0, 1, 2, 3], average="macro"))


def test_spearman_vs_scipy():
    from scipy.stats import spearmanr
    rng = np.random.RandomState(1)
    a = rng.randint(0, 4, 100).astype(float)    # heavy ties
    b = a + rng.randn(100)
    assert M.spearman_rho(a, b) == pytest.approx(spearmanr(a, b).statistic,
                                                 abs=1e-10)
    assert M.spearman_rho(a, -a) == pytest.approx(-1.0)
    assert M.spearman_rho(a, np.zeros(100)) == 0.0


def test_mae():
    assert M.mae([0, 1, 2], [1, 1, 1]) == pytest.approx(2 / 3)


def test_brier(preds):
    y_true, _, probs = preds
    onehot = np.eye(4)[y_true]
    expected = ((probs - onehot) ** 2).sum(1).mean()
    assert M.brier_score(probs, y_true) == pytest.approx(expected)
    # Perfect prediction -> 0.
    assert M.brier_score(onehot, y_true) == pytest.approx(0.0)


def test_ece_perfect_calibration():
    # Confidence 1.0 and always correct -> ECE 0.
    y = np.array([0, 1, 2, 3])
    probs = np.eye(4)[y]
    assert M.ece(probs, y) == pytest.approx(0.0)
    # Confidence 1.0 but 50% correct -> ECE 0.5.
    y_half = np.array([0, 1, 0, 1])
    probs_half = np.eye(4)[[0, 1, 1, 0]] * 0.999 + 0.00025
    assert M.ece(probs_half, y_half) == pytest.approx(0.5, abs=1e-2)


def test_confusion_matrix(preds):
    from sklearn.metrics import confusion_matrix
    y_true, y_pred, _ = preds
    np.testing.assert_array_equal(
        M.compute_confusion_matrix(y_true, y_pred, 4),
        confusion_matrix(y_true, y_pred, labels=range(4)))


def test_per_class_vs_sklearn(preds):
    from sklearn.metrics import precision_recall_fscore_support
    y_true, y_pred, _ = preds
    p, r, f, s = precision_recall_fscore_support(
        y_true, y_pred, labels=range(4), zero_division=0)
    got = M.per_class_metrics(y_true, y_pred, ["a", "b", "c", "d"])
    for i, name in enumerate(["a", "b", "c", "d"]):
        assert got[name]["precision"] == pytest.approx(p[i])
        assert got[name]["recall"] == pytest.approx(r[i])
        assert got[name]["f1"] == pytest.approx(f[i])
        assert got[name]["support"] == s[i]


def test_count_params():
    tree = {"a": np.zeros((3, 4)), "b": {"c": np.zeros(5)}}
    assert M.count_params(tree) == 17
