"""Jit-compatible on-device metrics.

The host-side metrics (evaluation/metrics.py) mirror the reference's
sklearn/scipy usage; these are the same quantities as pure XLA ops so they
run *inside* a jit program on sharded data — distributed evaluation without
gathering predictions to the host (SURVEY.md §7 hard part (e): Spearman's
rho via rank = argsort of argsort, extended to average-rank tie handling).

All functions take a ``valid`` mask (fixed-shape padded batches) and reduce
over the whole array.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp


def _masked_mean(x: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    return (x * valid).sum() / jnp.maximum(valid.sum(), 1.0)


def accuracy(preds: jnp.ndarray, labels: jnp.ndarray,
             valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    valid = jnp.ones_like(preds, jnp.float32) if valid is None else valid
    return _masked_mean((preds == labels).astype(jnp.float32), valid)


def mae(pred: jnp.ndarray, target: jnp.ndarray,
        valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    valid = jnp.ones_like(pred, jnp.float32) if valid is None else valid
    return _masked_mean(jnp.abs(pred - target), valid)


def confusion_matrix(preds: jnp.ndarray, labels: jnp.ndarray,
                     num_classes: int,
                     valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """(K, K) counts via one-hot outer products (scatter-free, SPMD-safe)."""
    valid = jnp.ones_like(preds, jnp.float32) if valid is None else valid
    t = jax.nn.one_hot(labels, num_classes) * valid[:, None]
    p = jax.nn.one_hot(preds, num_classes)
    return jnp.einsum("ni,nj->ij", t, p)


def macro_f1_from_cm(cm: jnp.ndarray) -> jnp.ndarray:
    tp = jnp.diagonal(cm)
    pred_pos = cm.sum(axis=0)
    true_pos = cm.sum(axis=1)
    precision = jnp.where(pred_pos > 0, tp / jnp.maximum(pred_pos, 1), 0.0)
    recall = jnp.where(true_pos > 0, tp / jnp.maximum(true_pos, 1), 0.0)
    denom = precision + recall
    f1 = jnp.where(denom > 0, 2 * precision * recall
                   / jnp.maximum(denom, 1e-12), 0.0)
    return f1.mean()


def _average_ranks(x: jnp.ndarray) -> jnp.ndarray:
    """Fractional (average-tie) ranks, 1-based — rankdata('average').

    Sort, assign tie-group ids from sorted-neighbour equality, segment-sum
    ordinal ranks per group, then scatter the per-group averages back to the
    original order. O(n log n) time, O(n) memory — scales to 20k+ point
    evals where an equality-matrix formulation would need n^2 floats.
    """
    n = x.shape[0]
    order = jnp.argsort(x, stable=True)
    xs = x[order]
    new_group = jnp.concatenate(
        [jnp.ones((1,), bool), xs[1:] != xs[:-1]])
    gid = jnp.cumsum(new_group) - 1
    pos = jnp.arange(1, n + 1, dtype=jnp.float32)
    sums = jnp.zeros((n,), jnp.float32).at[gid].add(pos)
    cnts = jnp.zeros((n,), jnp.float32).at[gid].add(1.0)
    avg = sums / jnp.maximum(cnts, 1.0)
    return jnp.empty((n,), jnp.float32).at[order].set(avg[gid])


def spearman_rho(a: jnp.ndarray, b: jnp.ndarray,
                 valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Spearman rank correlation with average-tie ranks (scipy semantics).

    Padded entries (valid=0) are pushed to a sentinel beyond the data range
    so they occupy the tail ranks, then masked out of the correlation.
    """
    if valid is None:
        valid = jnp.ones_like(a, jnp.float32)
    big = jnp.maximum(jnp.abs(a).max(), jnp.abs(b).max()) + 1.0
    a = jnp.where(valid > 0, a, big + jnp.arange(a.shape[0]))
    b = jnp.where(valid > 0, b, big + jnp.arange(b.shape[0]))
    ra = _average_ranks(a)
    rb = _average_ranks(b)
    n = jnp.maximum(valid.sum(), 1.0)
    ma = (ra * valid).sum() / n
    mb = (rb * valid).sum() / n
    da = (ra - ma) * valid
    db = (rb - mb) * valid
    denom = jnp.sqrt((da ** 2).sum() * (db ** 2).sum())
    return jnp.where(denom > 0, (da * db).sum() / denom, 0.0)


def brier_score(probs: jnp.ndarray, labels: jnp.ndarray,
                valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    if valid is None:
        valid = jnp.ones(probs.shape[0], jnp.float32)
    onehot = jax.nn.one_hot(labels, probs.shape[-1])
    per = ((probs - onehot) ** 2).sum(axis=-1)
    return _masked_mean(per, valid)


def ece(probs: jnp.ndarray, labels: jnp.ndarray, n_bins: int = 10,
        valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """10-bin ECE with half-open (lo, hi] bins (reference metrics.py:39-60)."""
    if valid is None:
        valid = jnp.ones(probs.shape[0], jnp.float32)
    conf = probs.max(axis=-1)
    correct = (probs.argmax(axis=-1) == labels).astype(jnp.float32)
    edges = jnp.linspace(0.0, 1.0, n_bins + 1)
    n = jnp.maximum(valid.sum(), 1.0)

    def bin_term(i, acc):
        lo, hi = edges[i], edges[i + 1]
        in_bin = ((conf > lo) & (conf <= hi)).astype(jnp.float32) * valid
        cnt = in_bin.sum()
        safe = jnp.maximum(cnt, 1.0)
        gap = jnp.abs((correct * in_bin).sum() / safe
                      - (conf * in_bin).sum() / safe)
        return acc + jnp.where(cnt > 0, (cnt / n) * gap, 0.0)

    return jax.lax.fori_loop(0, n_bins, bin_term, jnp.float32(0.0))


def all_metrics(probs: jnp.ndarray, labels: jnp.ndarray,
                severity_pred: jnp.ndarray, severity_true: jnp.ndarray,
                valid: jnp.ndarray,
                num_classes: int = 4) -> Dict[str, jnp.ndarray]:
    """Full metric set in one jit-able call (composable into an SPMD eval
    step — inputs may be gathered shards)."""
    preds = probs.argmax(axis=-1)
    cm = confusion_matrix(preds, labels, num_classes, valid)
    return {
        "accuracy": accuracy(preds, labels, valid),
        "macro_f1": macro_f1_from_cm(cm),
        "mae": mae(severity_pred, severity_true, valid),
        "spearman_rho": spearman_rho(severity_true, severity_pred, valid),
        "brier_score": brier_score(probs, labels, valid),
        "ece": ece(probs, labels, valid=valid),
        "confusion_matrix": cm,
    }
