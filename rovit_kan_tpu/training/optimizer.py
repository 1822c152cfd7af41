"""Optimizer: AdamW with two LR groups + cosine schedule, TPU-style.

Capability parity with `/root/reference/training/optimizer.py:7-49`:
- two param groups split on the top-level 'backbone' subtree — backbone runs
  at lr/10, heads at lr (reference lines 7-32);
- AdamW weight decay 1e-4 on all params (torch AdamW semantics: decoupled
  decay applied with the group lr);
- cosine annealing over epochs with eta_min=1e-6, stepped once per epoch
  (reference lines 35-44);
- global-norm gradient clip 1.0 (the reference clips in the trainer,
  training/trainer.py:122-126; here it is the first link of the chain).

TPU-first design: the learning rate and the backbone scale are
``inject_hyperparams`` fields of the optimizer state, so per-epoch LR
stepping and the 5-epoch backbone freeze are *state updates*, not recompiles.
Freezing sets ``backbone_scale = 0`` (update identically zero, weight decay
included) and the train step additionally zeroes backbone grads so Adam
moments stay cold, matching torch's requires_grad=False semantics.
"""
from __future__ import annotations

import math
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from rovit_kan_tpu.config import Config


def _group_mask(params, predicate):
    return {k: jax.tree.map(lambda _: predicate(k), v)
            for k, v in params.items()}


class FlatAdamWState(NamedTuple):
    count: jnp.ndarray
    mu: jnp.ndarray            # (n_params,) first moment, flat
    nu: jnp.ndarray            # (n_params,) second moment, flat


def _flat_adamw(learning_rate, backbone_scale, *, wd: float, clip: float,
                b1=0.9, b2=0.999, eps=1e-8):
    """The exact chain clip->adam->decay->group-scale->(-lr) computed over
    ONE flattened parameter vector.

    Why: the per-leaf optax chain launches hundreds of ~µs kernels over
    the ~150-leaf param tree — measured 4.7-5.0 ms per step on TPU v5e
    regardless of batch size (33-43%% of a bs=64 step,
    outputs/profile_train_*.json). Flattening turns the update into a
    handful of fused vector ops. Math is element-for-element identical to
    the chain (same Adam bias correction, decoupled weight decay, and
    per-group backbone scaling via a precomputed factor vector); only the
    global-norm summation order differs (float-tolerance, covered by the
    torch-twin training parity test).
    """
    from jax.flatten_util import ravel_pytree

    def init(params):
        flat, _ = ravel_pytree(params)
        return FlatAdamWState(count=jnp.zeros((), jnp.int32),
                              mu=jnp.zeros_like(flat),
                              nu=jnp.zeros_like(flat))

    def update(grads, state, params):
        if params is None:
            raise ValueError("flat AdamW requires params")
        gflat, unravel = ravel_pytree(grads)
        pflat, _ = ravel_pytree(params)
        # Per-element group factor: backbone leaves move at
        # backbone_scale * lr (0 while frozen), heads at lr.
        factors, _ = ravel_pytree({
            k: jax.tree.map(
                lambda leaf: jnp.full(leaf.shape,
                                      backbone_scale if k == "backbone"
                                      else 1.0, leaf.dtype), v)
            for k, v in grads.items()})

        gnorm = jnp.sqrt(jnp.sum(gflat * gflat))
        gflat = gflat * (clip / jnp.maximum(gnorm, clip))

        count = state.count + 1
        mu = b1 * state.mu + (1.0 - b1) * gflat
        nu = b2 * state.nu + (1.0 - b2) * gflat * gflat
        c = count.astype(jnp.float32)
        mu_hat = mu / (1.0 - b1 ** c)
        nu_hat = nu / (1.0 - b2 ** c)
        u = mu_hat / (jnp.sqrt(nu_hat) + eps)
        u = (u + wd * pflat) * factors * (-learning_rate)
        return unravel(u), FlatAdamWState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


def build_optimizer(config: Config, flat: "bool | None" = None):
    """Returns an optax GradientTransformation with injected hyperparams
    ``learning_rate`` (head LR) and ``backbone_scale`` (0 frozen, 0.1 live).

    ``flat=None`` reads ``config.tpu.fused_optimizer`` (default True):
    the single-vector AdamW (see _flat_adamw) — same math, ~hundreds fewer
    kernel launches per step. Pass ``flat=False`` for the per-leaf optax
    chain (required when optimizer moments must shard per-parameter, e.g.
    tensor parallelism — the Trainer does this automatically when
    ``param_specs`` is set).
    """
    wd = config.train.weight_decay
    clip = config.flags.gradient_clip
    if flat is None:
        flat = bool(getattr(config.tpu, "fused_optimizer", True))

    if flat:
        def make_tx(learning_rate, backbone_scale):
            return _flat_adamw(learning_rate, backbone_scale,
                               wd=wd, clip=clip)
    else:
        def make_tx(learning_rate, backbone_scale):
            def bb_mask(params):
                return _group_mask(params, lambda k: k == "backbone")

            return optax.chain(
                optax.clip_by_global_norm(clip),
                optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
                optax.add_decayed_weights(wd),
                optax.masked(optax.scale(backbone_scale), bb_mask),
                optax.scale(-learning_rate),
            )

    tx = optax.inject_hyperparams(make_tx)(
        learning_rate=config.train.learning_rate,
        backbone_scale=0.1,
    )
    if getattr(config.train, "accum_steps", 1) > 1:
        # Gradient accumulation: identical math to a large batch (grads are
        # averaged over accum_steps micro-batches before one update).
        tx = optax.MultiSteps(tx, every_k_schedule=config.train.accum_steps)
    return tx


def cosine_schedule(lr0: float, epoch: int, total_epochs: int,
                    eta_min: float = 1e-6) -> float:
    """torch CosineAnnealingLR value for a 1-indexed epoch:
    ``eta_min + 0.5*(lr0 - eta_min)*(1 + cos(pi * (epoch-1) / T_max))``."""
    t = epoch - 1
    return eta_min + 0.5 * (lr0 - eta_min) * (
        1.0 + math.cos(math.pi * t / total_epochs))


def cosine_lr(config: Config, epoch: int) -> float:
    """Config-bound cosine schedule, stepped once per epoch (reference
    training/optimizer.py:35-44)."""
    return cosine_schedule(config.train.learning_rate, epoch,
                           config.train.epochs)


def set_hyperparams(opt_state, learning_rate: float, backbone_scale: float):
    """Functionally update injected hyperparams on an optimizer state
    (reaches through an optax.MultiSteps wrapper when present)."""
    if hasattr(opt_state, "inner_opt_state"):          # MultiSteps
        inner = set_hyperparams(opt_state.inner_opt_state,
                                learning_rate, backbone_scale)
        return opt_state._replace(inner_opt_state=inner)
    hp = dict(opt_state.hyperparams)
    hp["learning_rate"] = learning_rate
    hp["backbone_scale"] = backbone_scale
    return opt_state._replace(hyperparams=hp)


def zero_backbone_grads(grads: Any, live: float) -> Any:
    """Multiply backbone grads by ``live`` (0.0 while frozen, 1.0 after) —
    keeps Adam moments cold during the freeze, as with requires_grad=False.
    ``live`` may be a traced scalar: no recompile at the unfreeze boundary."""
    return {k: jax.tree.map(lambda g: g * live, v) if k == "backbone" else v
            for k, v in grads.items()}
