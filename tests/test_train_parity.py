"""Training-pipeline parity vs a PyTorch twin: N optimizer steps of the
reference recipe (AdamW two-LR-group + grad-clip + joint multi-task loss,
transcribed from /root/reference/training/trainer.py:54-181 and
training/optimizer.py:7-49) run in torch and in this framework from the SAME
initial weights on the SAME batches, asserting

1. per-step total losses match to ~1e-4 (fp32, no dropout, no augmentation),
2. final parameters match after conversion,
3. final eval metrics agree between BOTH evaluators — the torch side
   computed with sklearn/scipy (as the reference evaluator does,
   /root/reference/evaluation/evaluator.py:25-110), the JAX side with this
   repo's native metrics.

This is the strongest offline substitute for "bit-faithful metrics vs the
reference checkpoint" (no real checkpoint ships with the reference repo).
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp
import optax

from test_convert import (TorchRoViTKAN, D, DEPTH, HEADS, IMG, PATCH, HID,
                          KAN_DIMS)

from rovit_kan_tpu.models.rovit_kan import RoViTKAN
from rovit_kan_tpu.models.convert import convert_reference_checkpoint
from rovit_kan_tpu.training.losses import joint_loss
from rovit_kan_tpu.evaluation import metrics as jm_metrics

LR = 5e-4
WD = 1e-4
CLIP = 1.0
N_STEPS = 6
BATCH = 16
LAMBDA_ORD, MU_UNC, NU_KAN = 1.0, 0.5, 0.5
GAMMA = 2.0


# ---- torch joint loss: same math as the reference's JointLoss ----------
def torch_focal(logits, targets, alpha):
    logp = F.log_softmax(logits.float(), dim=-1)
    ce = -logp.gather(1, targets[:, None])[:, 0]
    pt = torch.exp(-ce)
    focal = (1.0 - pt) ** GAMMA * ce
    return (alpha[targets] * focal).mean()


def torch_ordinal(cum_logits, sev):
    ks = torch.arange(cum_logits.shape[-1])
    binary = (sev[:, None] > ks[None, :]).float()
    return F.binary_cross_entropy_with_logits(cum_logits.float(), binary)


def torch_uncertainty(mu, log_var, sev):
    t = sev[:, None].float()
    return (0.5 * ((t - mu) ** 2 * torch.exp(-log_var) + log_var)).mean()


def torch_joint(out, labels, sev, alpha):
    cls = torch_focal(out["cls_logits"], labels, alpha)
    ordl = torch_ordinal(out["ordinal_logits"], sev)
    unc = torch_uncertainty(out["mu"], out["log_var"], sev)
    kan = F.mse_loss(out["kan_severity"], sev[:, None].float())
    return cls + LAMBDA_ORD * ordl + MU_UNC * unc + NU_KAN * kan


def _data(seed, n):
    rng = np.random.RandomState(seed)
    x = rng.randn(n, IMG, IMG, 3).astype(np.float32) * 0.5
    labels = rng.randint(0, 4, (n,)).astype(np.int32)
    sev = labels.astype(np.float32)      # severity == class (reference map)
    return x, labels, sev


@pytest.fixture(scope="module")
def trained_pair():
    torch.manual_seed(0)
    tm = TorchRoViTKAN().train()
    alpha_np = np.asarray([1.1, 0.9, 1.0, 1.2], np.float32)
    alpha_t = torch.tensor(alpha_np)

    # Reference optimizer: AdamW, backbone at lr/10 (optimizer.py:7-32).
    bb = [p for k, p in tm.named_parameters() if k.startswith("backbone")]
    heads = [p for k, p in tm.named_parameters()
             if not k.startswith("backbone")]
    opt = torch.optim.AdamW(
        [{"params": bb, "lr": LR * 0.1}, {"params": heads, "lr": LR}],
        lr=LR, weight_decay=WD, betas=(0.9, 0.999), eps=1e-8)

    # Same initial weights on the JAX side. The converted tree holds numpy
    # VIEWS sharing memory with the live torch tensors, and jnp.asarray on
    # CPU can zero-copy-alias numpy buffers — force a real copy, else
    # torch's in-place opt.step() mutates our params too.
    params0 = jax.tree.map(
        lambda t: np.array(t, copy=True),
        convert_reference_checkpoint(tm.state_dict(), depth=DEPTH))
    model = RoViTKAN(embed_dim=D, depth=DEPTH, num_heads=HEADS,
                     image_size=IMG, patch_size=PATCH, kan_layers=KAN_DIMS,
                     hidden_dim=HID, use_pallas_attention=False,
                     use_pallas_kan=False)

    # Reference-recipe parity step: deterministic forward (no dropout), no
    # augmentation, stage 4, grad clip + AdamW — mirrors make_train_step
    # minus the augmentation front-end.
    tx = optax.chain(
        optax.clip_by_global_norm(CLIP),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.add_decayed_weights(WD),
        optax.masked(optax.scale(0.1),
                     lambda p: {k: jax.tree.map(lambda _: k == "backbone", v)
                                for k, v in p.items()}),
        optax.scale(-LR),
    )
    opt_state = tx.init(params0)
    alpha_j = jnp.asarray(alpha_np)

    @jax.jit
    def jstep(params, opt_state, x, labels, sev):
        def loss_fn(p):
            out = model.apply({"params": p}, x, deterministic=True)
            losses = joint_loss(out, labels, sev, 4, lambda_ord=LAMBDA_ORD,
                                mu_unc=MU_UNC, nu_kan=NU_KAN,
                                focal_gamma=GAMMA, focal_alpha=alpha_j)
            return losses["total_loss"]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    jparams = params0
    t_losses, j_losses = [], []
    for step in range(N_STEPS):
        x, labels, sev = _data(100 + step, BATCH)

        xt = torch.tensor(x).permute(0, 3, 1, 2)
        out = tm(xt)
        loss = torch_joint(out, torch.tensor(labels, dtype=torch.long),
                           torch.tensor(sev), alpha_t)
        opt.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(tm.parameters(), CLIP)
        opt.step()
        t_losses.append(float(loss))

        jparams, opt_state, jl = jstep(jparams, opt_state, jnp.asarray(x),
                                       jnp.asarray(labels), jnp.asarray(sev))
        j_losses.append(float(jl))

    return tm, model, jparams, np.asarray(t_losses), np.asarray(j_losses)


def test_per_step_loss_parity(trained_pair):
    _, _, _, t_losses, j_losses = trained_pair
    np.testing.assert_allclose(j_losses, t_losses, atol=1e-4, rtol=1e-4)


def test_final_params_parity(trained_pair):
    tm, _, jparams, _, _ = trained_pair
    converted = convert_reference_checkpoint(tm.state_dict(), depth=DEPTH)

    def flat(tree, prefix=()):
        for k, v in sorted(tree.items()):
            if isinstance(v, dict):
                yield from flat(v, prefix + (k,))
            else:
                yield prefix + (k,), np.asarray(v)

    for (pa, va), (pb, vb) in zip(flat(converted), flat(jparams)):
        assert pa == pb
        np.testing.assert_allclose(vb, va, atol=2e-5, err_msg=str(pa))


def test_final_eval_metrics_parity(trained_pair):
    """Both evaluators on the SAME held-out batch: torch predictions scored
    with sklearn/scipy (the reference evaluator's scorers) vs JAX
    predictions scored with this repo's native metrics."""
    from sklearn.metrics import accuracy_score, f1_score
    from scipy.stats import spearmanr

    tm, model, jparams, _, _ = trained_pair
    x, labels, sev = _data(999, 64)

    tm.eval()
    with torch.no_grad():
        tout = tm(torch.tensor(x).permute(0, 3, 1, 2))
    tprobs = F.softmax(tout["cls_logits"], dim=-1).numpy()
    tpred = tprobs.argmax(-1)
    tsev = tout["kan_severity"].numpy()[:, 0]

    t_metrics = {
        "accuracy": accuracy_score(labels, tpred),
        "macro_f1": f1_score(labels, tpred, average="macro",
                             labels=range(4), zero_division=0),
        "mae": float(np.abs(tsev - sev).mean()),
        "spearman_rho": float(spearmanr(sev, tsev).statistic),
    }

    jout = model.apply({"params": jparams}, jnp.asarray(x),
                       deterministic=True)
    jprobs = np.asarray(jax.nn.softmax(jout["cls_logits"], -1))
    jpred = jprobs.argmax(-1)
    jsev = np.asarray(jout["kan_severity"])[:, 0]

    j_metrics = {
        "accuracy": jm_metrics.accuracy(labels, jpred),
        "macro_f1": jm_metrics.macro_f1(labels, jpred, num_classes=4),
        "mae": jm_metrics.mae(sev, jsev),
        "spearman_rho": jm_metrics.spearman_rho(sev, jsev),
    }

    for k in t_metrics:
        assert j_metrics[k] == pytest.approx(t_metrics[k], abs=2e-4), k
    # Distribution-level agreement too (brier/ece inputs identical).
    np.testing.assert_allclose(jprobs, tprobs, atol=1e-4)
    assert jm_metrics.brier_score(jprobs, labels) == pytest.approx(
        jm_metrics.brier_score(tprobs, labels), abs=1e-4)
    assert jm_metrics.ece(jprobs, labels) == pytest.approx(
        jm_metrics.ece(tprobs, labels), abs=1e-4)
