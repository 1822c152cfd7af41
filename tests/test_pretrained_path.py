"""Pretrained-path end-to-end: briefly TRAIN the torch twin on a synthetic
task (the stand-in for timm's ImageNet-pretrained deit_tiny — no weights
ship offline), convert the checkpoint through the real CLI code path
(load_torch_checkpoint -> convert -> save_npz -> load_npz), merge it into a
fresh init with merge_pretrained, fine-tune for N steps, and assert the
pretrained arm beats the from-scratch arm at equal steps.

This proves the reference's ``pretrained=True`` default
(/root/reference/models/backbone.py:12-16) works end-to-end here, not just
shape-wise.
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
import optax

from test_convert import TorchRoViTKAN, D, DEPTH, HEADS, IMG, PATCH, HID, KAN_DIMS
from test_train_parity import torch_joint, LR, WD, CLIP

from rovit_kan_tpu.models.rovit_kan import RoViTKAN
from rovit_kan_tpu.models.convert import (
    convert_reference_checkpoint, load_torch_checkpoint, load_npz,
    merge_pretrained, save_npz)
from rovit_kan_tpu.training.losses import joint_loss

ALPHA = np.ones(4, np.float32)


def _task_data(seed, n):
    """Class-separable images: per-class spatial template + noise."""
    rng = np.random.RandomState(seed)
    labels = rng.randint(0, 4, (n,)).astype(np.int32)
    templates = np.random.RandomState(7).randn(4, IMG, IMG, 3).astype(
        np.float32)
    x = templates[labels] * 0.6 + rng.randn(n, IMG, IMG, 3).astype(
        np.float32) * 0.4
    return x, labels, labels.astype(np.float32)


def _make_jax_step(model):
    tx = optax.chain(
        optax.clip_by_global_norm(CLIP),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.add_decayed_weights(WD),
        optax.masked(optax.scale(0.1),
                     lambda p: {k: jax.tree.map(lambda _: k == "backbone", v)
                                for k, v in p.items()}),
        optax.scale(-LR),
    )
    alpha = jnp.asarray(ALPHA)

    @jax.jit
    def step(params, opt_state, x, labels, sev):
        def loss_fn(p):
            out = model.apply({"params": p}, x, deterministic=True)
            return joint_loss(out, labels, sev, 4, focal_alpha=alpha
                              )["total_loss"]
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return tx, step


def _finetune_and_eval(model, params, step, tx, n_steps=8):
    opt_state = tx.init(params)
    for i in range(n_steps):
        x, labels, sev = _task_data(200 + i, 32)
        params, opt_state, _ = step(params, opt_state, jnp.asarray(x),
                                    jnp.asarray(labels), jnp.asarray(sev))
    xe, le, _ = _task_data(991, 128)
    out = model.apply({"params": params}, jnp.asarray(xe),
                      deterministic=True)
    pred = np.asarray(out["cls_logits"]).argmax(-1)
    probs = np.asarray(jax.nn.log_softmax(out["cls_logits"], -1))
    nll = float(-probs[np.arange(len(le)), le].mean())
    return float((pred == le).mean()), nll


def test_pretrained_beats_scratch(tmp_path):
    # ---- "pretraining": 30 torch steps on the task ---------------------
    torch.manual_seed(0)
    tm = TorchRoViTKAN().train()
    opt = torch.optim.AdamW(tm.parameters(), lr=1e-3, weight_decay=WD)
    alpha_t = torch.tensor(ALPHA)
    for i in range(30):
        x, labels, sev = _task_data(i, 32)
        out = tm(torch.tensor(x).permute(0, 3, 1, 2))
        loss = torch_joint(out, torch.tensor(labels, dtype=torch.long),
                           torch.tensor(sev), alpha_t)
        opt.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(tm.parameters(), CLIP)
        opt.step()

    # ---- reference-format checkpoint -> npz (real CLI code path) -------
    ckpt = tmp_path / "best_model.pth"
    torch.save({"model_state_dict": tm.state_dict(), "epoch": 1}, ckpt)
    sd = load_torch_checkpoint(ckpt)
    assert any(k.startswith("backbone.model.") for k in sd)
    save_npz(convert_reference_checkpoint(sd, depth=DEPTH),
             tmp_path / "pre.npz")
    pre = load_npz(tmp_path / "pre.npz")

    # ---- two arms: merged-pretrained vs scratch, equal budget ----------
    model = RoViTKAN(embed_dim=D, depth=DEPTH, num_heads=HEADS,
                     image_size=IMG, patch_size=PATCH, kan_layers=KAN_DIMS,
                     hidden_dim=HID, use_pallas_attention=False,
                     use_pallas_kan=False)
    init = model.init(jax.random.PRNGKey(3),
                      jnp.zeros((1, IMG, IMG, 3)))["params"]
    merged = merge_pretrained(init, pre, verbose=False)
    tx, step = _make_jax_step(model)

    acc_pre, nll_pre = _finetune_and_eval(model, merged, step, tx)
    acc_scratch, nll_scratch = _finetune_and_eval(model, init, step, tx)

    assert acc_pre > acc_scratch, (acc_pre, acc_scratch)
    assert nll_pre < nll_scratch, (nll_pre, nll_scratch)
    # The pretrained arm should actually have learned the task.
    assert acc_pre > 0.5, acc_pre


def test_merge_pretrained_pos_embed_interpolation():
    """Resolution transfer: a pos_embed from a different grid resamples
    instead of being dropped (reference fine-tunes 224px weights)."""
    model = RoViTKAN(embed_dim=D, depth=DEPTH, num_heads=HEADS,
                     image_size=IMG, patch_size=PATCH, kan_layers=KAN_DIMS,
                     hidden_dim=HID, use_pallas_attention=False,
                     use_pallas_kan=False)
    init = model.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, IMG, IMG, 3)))["params"]
    n_target = init["backbone"]["pos_embed"].shape[1]
    other = {"backbone": {"pos_embed":
                          np.random.RandomState(0).randn(
                              1, 17, D).astype(np.float32)}}
    merged = merge_pretrained(init, other, verbose=False)
    assert merged["backbone"]["pos_embed"].shape == (1, n_target, D)
    assert not np.allclose(merged["backbone"]["pos_embed"],
                           np.asarray(init["backbone"]["pos_embed"]))
