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
from typing import Any

import jax
import optax

from rovit_kan_tpu.config import Config


def _group_mask(params, predicate):
    return {k: jax.tree.map(lambda _: predicate(k), v)
            for k, v in params.items()}


def build_optimizer(config: Config):
    """Returns an optax GradientTransformation with injected hyperparams
    ``learning_rate`` (head LR) and ``backbone_scale`` (0 frozen, 0.1 live).
    """
    wd = config.train.weight_decay
    clip = config.flags.gradient_clip

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
