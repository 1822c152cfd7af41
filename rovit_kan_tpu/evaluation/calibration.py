"""Post-hoc confidence calibration: temperature scaling + reliability curve.

The reference reports ECE (its `evaluation/metrics.py:39-60`, headline ECE
0.1066 in README.md:314) but ships no calibration machinery. This module
adds the standard recipe (Guo et al. 2017, "On Calibration of Modern Neural
Networks"): a single scalar ``T > 0`` fitted on *validation* logits by NLL
minimization, applied at inference as ``softmax(z / T)``. Scaling by a
positive scalar cannot change the argmax, so accuracy/F1/confusion are
invariant — only the confidence distribution (and with it ECE and Brier)
moves.

The NLL is convex in 1/T, hence unimodal in T: a golden-section search over
log-T is exact enough (tol 1e-4) and dependency-free. Fitting runs once on
host over the gathered validation logits (a few thousand rows); nothing
here touches the jit'd inference path except the final scalar divide.
"""
from __future__ import annotations

from typing import Dict

import numpy as np

__all__ = ["fit_temperature", "apply_temperature", "reliability_curve"]


def _nll(logits: np.ndarray, labels: np.ndarray, temp: float) -> float:
    z = logits / temp
    z = z - z.max(axis=1, keepdims=True)
    logp = z - np.log(np.exp(z).sum(axis=1, keepdims=True))
    return float(-logp[np.arange(len(labels)), labels].mean())


def fit_temperature(logits, labels, lo: float = 0.05, hi: float = 10.0,
                    tol: float = 1e-4) -> float:
    """Scalar temperature minimizing validation NLL.

    Args:
        logits: ``(N, K)`` raw (pre-softmax) validation logits.
        labels: ``(N,)`` int labels.
        lo/hi: search bracket for T.

    Returns:
        The fitted temperature (T > 1 softens an over-confident model,
        T < 1 sharpens an under-confident one).
    """
    logits = np.asarray(logits, np.float64)
    labels = np.asarray(labels)
    a, b = np.log(lo), np.log(hi)           # scale-free log-T search
    gr = (np.sqrt(5.0) - 1.0) / 2.0
    c, d = b - gr * (b - a), a + gr * (b - a)
    fc = _nll(logits, labels, np.exp(c))
    fd = _nll(logits, labels, np.exp(d))
    while b - a > tol:
        if fc < fd:
            b, d, fd = d, c, fc
            c = b - gr * (b - a)
            fc = _nll(logits, labels, np.exp(c))
        else:
            a, c, fc = c, d, fd
            d = a + gr * (b - a)
            fd = _nll(logits, labels, np.exp(d))
    return float(np.exp((a + b) / 2.0))


def apply_temperature(logits: np.ndarray, temp: float) -> np.ndarray:
    """``softmax(logits / temp)`` (host-side, fp64-stable)."""
    z = np.asarray(logits, np.float64) / temp
    z = z - z.max(axis=-1, keepdims=True)
    e = np.exp(z)
    return (e / e.sum(axis=-1, keepdims=True)).astype(np.float32)


def reliability_curve(probs: np.ndarray, labels: np.ndarray,
                      n_bins: int = 10) -> Dict[str, np.ndarray]:
    """Per-bin confidence/accuracy/mass for a reliability diagram.

    Half-open ``(lo, hi]`` bins matching the ECE implementation
    (evaluation/metrics.py / reference metrics.py:39-60). Empty bins carry
    NaN confidence/accuracy and zero mass.
    """
    probs = np.asarray(probs)
    labels = np.asarray(labels)
    conf = probs.max(axis=1)
    correct = (probs.argmax(axis=1) == labels).astype(np.float64)
    edges = np.linspace(0.0, 1.0, n_bins + 1)
    confidence = np.full(n_bins, np.nan)
    accuracy = np.full(n_bins, np.nan)
    fraction = np.zeros(n_bins)
    for i in range(n_bins):
        m = (conf > edges[i]) & (conf <= edges[i + 1])
        if m.any():
            confidence[i] = conf[m].mean()
            accuracy[i] = correct[m].mean()
            fraction[i] = m.mean()
    return {"edges": edges, "confidence": confidence,
            "accuracy": accuracy, "fraction": fraction}
