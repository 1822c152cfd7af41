"""Golden tests for the loss functions against a torch-CPU oracle built from
torch.nn.functional primitives (clean-room from the published math:
focal = alpha_t (1-p_t)^g CE; ordinal BCE on [y>k]; heteroscedastic NLL;
MSE; stage-gated weighted sum)."""
import numpy as np
import pytest
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from rovit_kan_tpu.training.losses import (
    focal_loss,
    ordinal_bce_loss,
    uncertainty_loss,
    kan_regression_loss,
    joint_loss,
)


def torch_focal(logits, targets, gamma=2.0, alpha=None):
    lo, ta = torch.tensor(logits), torch.tensor(targets)
    ce = F.cross_entropy(lo, ta, reduction="none")
    pt = F.softmax(lo, dim=1).gather(1, ta.unsqueeze(1)).squeeze(1)
    out = (1 - pt) ** gamma * ce
    if alpha is not None:
        out = torch.tensor(alpha)[ta] * out
    return out.mean().item()


def test_focal_loss_matches_torch():
    rng = np.random.RandomState(0)
    logits = rng.randn(16, 4).astype(np.float32)
    targets = rng.randint(0, 4, 16)
    alpha = rng.uniform(0.5, 2.0, 4).astype(np.float32)

    got = float(focal_loss(jnp.asarray(logits), jnp.asarray(targets)))
    want = torch_focal(logits, targets)
    np.testing.assert_allclose(got, want, rtol=1e-5)

    got_a = float(focal_loss(jnp.asarray(logits), jnp.asarray(targets),
                             alpha=jnp.asarray(alpha)))
    want_a = torch_focal(logits, targets, alpha=alpha)
    np.testing.assert_allclose(got_a, want_a, rtol=1e-5)


def test_ordinal_bce_matches_torch():
    rng = np.random.RandomState(1)
    logits = rng.randn(16, 3).astype(np.float32)
    targets = rng.randint(0, 4, 16)

    binary = np.stack([(targets > k).astype(np.float32) for k in range(3)], 1)
    want = F.binary_cross_entropy_with_logits(
        torch.tensor(logits), torch.tensor(binary), reduction="none"
    ).mean(dim=1).mean().item()
    got = float(ordinal_bce_loss(jnp.asarray(logits), jnp.asarray(targets)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_uncertainty_loss_matches_formula():
    rng = np.random.RandomState(2)
    mu = rng.randn(16, 1).astype(np.float32)
    log_var = rng.randn(16, 1).astype(np.float32)
    t = rng.randint(0, 4, 16).astype(np.float32)

    want = 0.5 * ((t[:, None] - mu) ** 2 * np.exp(-log_var) + log_var)
    got = float(uncertainty_loss(jnp.asarray(mu), jnp.asarray(log_var),
                                 jnp.asarray(t)))
    np.testing.assert_allclose(got, want.mean(), rtol=1e-5)


def test_kan_regression_loss():
    pred = np.array([[0.5], [2.0]], np.float32)
    t = np.array([1.0, 2.0], np.float32)
    got = float(kan_regression_loss(jnp.asarray(pred), jnp.asarray(t)))
    np.testing.assert_allclose(got, 0.125, rtol=1e-6)


def test_joint_loss_stage_gating():
    rng = np.random.RandomState(3)
    B = 8
    outputs = {
        "cls_logits": jnp.asarray(rng.randn(B, 4).astype(np.float32)),
        "ordinal_logits": jnp.asarray(rng.randn(B, 3).astype(np.float32)),
        "mu": jnp.asarray(rng.randn(B, 1).astype(np.float32)),
        "log_var": jnp.asarray(rng.randn(B, 1).astype(np.float32)),
        "kan_severity": jnp.asarray(
            3 * 1 / (1 + np.exp(-rng.randn(B, 1))).astype(np.float32)),
    }
    cls_t = jnp.asarray(rng.randint(0, 4, B))
    sev_t = jnp.asarray(rng.randint(0, 4, B))

    l1 = joint_loss(outputs, cls_t, sev_t, stage=1)
    l2 = joint_loss(outputs, cls_t, sev_t, stage=2)
    l4 = joint_loss(outputs, cls_t, sev_t, stage=4)

    assert float(l1["ord_loss"]) == 0.0
    assert float(l1["unc_loss"]) == 0.0
    assert float(l1["kan_loss"]) == 0.0
    assert float(l1["total_loss"]) == float(l1["cls_loss"])
    assert float(l2["ord_loss"]) > 0.0
    assert float(l2["unc_loss"]) == 0.0
    # Weighted sum: total = cls + 1.0*ord + 0.5*unc + 0.5*kan.
    np.testing.assert_allclose(
        float(l4["total_loss"]),
        float(l4["cls_loss"]) + 1.0 * float(l4["ord_loss"])
        + 0.5 * float(l4["unc_loss"]) + 0.5 * float(l4["kan_loss"]),
        rtol=1e-6)

    # Head-mask kills a term even at stage 4 (ablation semantics).
    l4m = joint_loss(outputs, cls_t, sev_t, stage=4,
                     head_mask={"ordinal": True, "uncertainty": True,
                                "kan": False})
    assert float(l4m["kan_loss"]) == 0.0


def test_joint_loss_mixup_combination():
    rng = np.random.RandomState(4)
    B = 8
    outputs = {
        "cls_logits": jnp.asarray(rng.randn(B, 4).astype(np.float32)),
        "ordinal_logits": jnp.zeros((B, 3)),
        "mu": jnp.zeros((B, 1)),
        "log_var": jnp.zeros((B, 1)),
        "kan_severity": jnp.zeros((B, 1)),
    }
    a = jnp.asarray(rng.randint(0, 4, B))
    b = jnp.asarray(rng.randint(0, 4, B))
    sev = jnp.asarray(rng.randint(0, 4, B))
    lam = 0.3

    lm = joint_loss(outputs, a, sev, stage=1,
                    mixup={"labels_a": a, "labels_b": b,
                           "lam": jnp.float32(lam)})
    la = joint_loss(outputs, a, sev, stage=1)
    lb = joint_loss(outputs, b, sev, stage=1)
    np.testing.assert_allclose(
        float(lm["cls_loss"]),
        lam * float(la["cls_loss"]) + (1 - lam) * float(lb["cls_loss"]),
        rtol=1e-5)


def test_joint_loss_valid_mask():
    """Masked loss over a padded batch == loss over the unpadded rows."""
    import numpy as np
    import jax.numpy as jnp
    from rovit_kan_tpu.training.losses import joint_loss

    rng = np.random.RandomState(0)
    B, pad = 6, 3
    out = {
        "cls_logits": rng.randn(B + pad, 4).astype(np.float32),
        "ordinal_logits": rng.randn(B + pad, 3).astype(np.float32),
        "mu": rng.randn(B + pad, 1).astype(np.float32),
        "log_var": rng.randn(B + pad, 1).astype(np.float32),
        "kan_severity": rng.rand(B + pad, 1).astype(np.float32) * 3,
    }
    labels = rng.randint(0, 4, B + pad)
    sev = labels.astype(np.float32)
    valid = np.array([1.0] * B + [0.0] * pad, np.float32)

    masked = joint_loss({k: jnp.asarray(v) for k, v in out.items()},
                        jnp.asarray(labels), jnp.asarray(sev), 4,
                        valid=jnp.asarray(valid))
    unpadded = joint_loss({k: jnp.asarray(v[:B]) for k, v in out.items()},
                          jnp.asarray(labels[:B]), jnp.asarray(sev[:B]), 4)
    for k in masked:
        assert float(masked[k]) == pytest.approx(float(unpadded[k]),
                                                 abs=1e-6), k
