"""Multi-task losses as pure jit-friendly functions.

Capability parity with `/root/reference/training/losses.py:7-181`, with the
curriculum redesigned for XLA: the reference gates loss terms on Python
``stage >= n and output is not None`` branches; here ``stage`` is a traced
int32 and each term is multiplied by a 0/1 mask ``(stage >= n) * head_present``
— one compiled program serves all four curriculum stages.

All losses reduce with 'mean' (the only reduction the reference ever uses in
training) and are computed in fp32.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp


def focal_loss(logits: jnp.ndarray, targets: jnp.ndarray,
               gamma: float = 2.0,
               alpha: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Focal loss ``alpha_t * (1 - p_t)^gamma * CE`` (reference lines 7-38).

    Args:
        logits: ``(B, K)``.
        targets: ``(B,)`` int class indices.
        alpha: optional ``(K,)`` per-class weights.
    """
    logits = logits.astype(jnp.float32)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(log_probs, targets[:, None], axis=-1)[:, 0]
    pt = jnp.exp(-ce)
    focal = (1.0 - pt) ** gamma * ce
    if alpha is not None:
        focal = alpha[targets] * focal
    return jnp.mean(focal)


def focal_loss_per_example(logits, targets, gamma=2.0, alpha=None):
    """Unreduced focal loss (for mixup's lam-weighted combination)."""
    logits = logits.astype(jnp.float32)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(log_probs, targets[:, None], axis=-1)[:, 0]
    pt = jnp.exp(-ce)
    focal = (1.0 - pt) ** gamma * ce
    if alpha is not None:
        focal = alpha[targets] * focal
    return focal


def _masked_mean(per_example: jnp.ndarray,
                 valid: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Batch mean; with ``valid`` (0/1 per example) the mean runs over the
    valid rows only (fixed-shape padded eval batches — the reference never
    pads, so masking reproduces its ragged-batch loss exactly)."""
    if valid is None:
        return jnp.mean(per_example)
    return (per_example * valid).sum() / jnp.maximum(valid.sum(), 1.0)


def ordinal_bce_per_example(cum_logits: jnp.ndarray,
                            targets: jnp.ndarray) -> jnp.ndarray:
    """Per-example ordinal BCE over K-1 thresholds, targets ``[y > k]``."""
    cum_logits = cum_logits.astype(jnp.float32)
    num_thresholds = cum_logits.shape[-1]
    ks = jnp.arange(num_thresholds)
    binary = (targets[:, None] > ks[None, :]).astype(jnp.float32)
    # Numerically stable BCE-with-logits.
    bce = (jnp.maximum(cum_logits, 0.0) - cum_logits * binary
           + jnp.log1p(jnp.exp(-jnp.abs(cum_logits))))
    return jnp.mean(bce, axis=-1)


def ordinal_bce_loss(cum_logits: jnp.ndarray,
                     targets: jnp.ndarray) -> jnp.ndarray:
    """Ordinal BCE over K-1 thresholds with binary targets ``[y > k]``
    (reference lines 41-72): mean over thresholds, then over the batch."""
    return jnp.mean(ordinal_bce_per_example(cum_logits, targets))


def uncertainty_per_example(mu: jnp.ndarray, log_var: jnp.ndarray,
                            targets: jnp.ndarray) -> jnp.ndarray:
    if targets.ndim == 1:
        targets = targets[:, None].astype(jnp.float32)
    precision = jnp.exp(-log_var)
    recon = (targets - mu) ** 2 * precision
    return jnp.mean(0.5 * (recon + log_var), axis=-1)


def uncertainty_loss(mu: jnp.ndarray, log_var: jnp.ndarray,
                     targets: jnp.ndarray) -> jnp.ndarray:
    """Heteroscedastic Gaussian NLL
    ``0.5 * ((t - mu)^2 * exp(-log_var) + log_var)`` (reference lines 75-101).
    """
    return jnp.mean(uncertainty_per_example(mu, log_var, targets))


def kan_regression_per_example(predictions: jnp.ndarray,
                               targets: jnp.ndarray) -> jnp.ndarray:
    if targets.ndim == 1:
        targets = targets[:, None].astype(jnp.float32)
    return jnp.mean((predictions - targets) ** 2, axis=-1)


def kan_regression_loss(predictions: jnp.ndarray,
                        targets: jnp.ndarray) -> jnp.ndarray:
    """MSE of KAN severity vs the severity label (reference lines 104-114)."""
    return jnp.mean(kan_regression_per_example(predictions, targets))


def joint_loss(
    outputs: Dict[str, jnp.ndarray],
    class_targets: jnp.ndarray,
    severity_targets: jnp.ndarray,
    stage,
    *,
    lambda_ord: float = 1.0,
    mu_unc: float = 0.5,
    nu_kan: float = 0.5,
    focal_gamma: float = 2.0,
    focal_alpha: Optional[jnp.ndarray] = None,
    head_mask: Optional[Dict[str, bool]] = None,
    mixup: Optional[Dict[str, jnp.ndarray]] = None,
    valid: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Stage-masked joint loss ``L = L_cls + l*L_ord + m*L_unc + n*L_kan``
    (reference JointLoss, lines 117-181).

    Args:
        stage: traced or static int in [1, 4].
        head_mask: static presence flags for ablation variants (a missing
            head's term is identically 0, matching the reference's
            None-guards).
        mixup: optional dict with ``labels_a``, ``labels_b``, ``lam`` — the
            classification term becomes
            ``lam * L(logits, a) + (1-lam) * L(logits, b)`` while severity
            targets stay unmixed (reference training/trainer.py:104-111).

    Returns:
        dict of scalar losses: cls/ord/unc/kan/total.
    """
    head_mask = head_mask or {"ordinal": True, "uncertainty": True, "kan": True}
    stage = jnp.asarray(stage, jnp.int32)

    if mixup is not None:
        la = focal_loss_per_example(outputs["cls_logits"], mixup["labels_a"],
                                    focal_gamma, focal_alpha)
        lb = focal_loss_per_example(outputs["cls_logits"], mixup["labels_b"],
                                    focal_gamma, focal_alpha)
        cls = _masked_mean(mixup["lam"] * la + (1.0 - mixup["lam"]) * lb,
                           valid)
    else:
        cls = _masked_mean(
            focal_loss_per_example(outputs["cls_logits"], class_targets,
                                   focal_gamma, focal_alpha), valid)

    m_ord = (stage >= 2).astype(jnp.float32) * float(head_mask["ordinal"])
    m_unc = (stage >= 3).astype(jnp.float32) * float(head_mask["uncertainty"])
    m_kan = (stage >= 4).astype(jnp.float32) * float(head_mask["kan"])

    ord_l = m_ord * _masked_mean(
        ordinal_bce_per_example(outputs["ordinal_logits"], severity_targets),
        valid)
    unc_l = m_unc * _masked_mean(
        uncertainty_per_example(outputs["mu"], outputs["log_var"],
                                severity_targets), valid)
    kan_l = m_kan * _masked_mean(
        kan_regression_per_example(outputs["kan_severity"],
                                   severity_targets), valid)

    total = cls + lambda_ord * ord_l + mu_unc * unc_l + nu_kan * kan_l
    return {
        "cls_loss": cls,
        "ord_loss": ord_l,
        "unc_loss": unc_l,
        "kan_loss": kan_l,
        "total_loss": total,
    }
