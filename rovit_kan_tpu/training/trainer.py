"""Curriculum trainer: one jit-compiled train step for all four stages.

Capability parity with `/root/reference/training/trainer.py:20-340` —
curriculum staging, backbone freeze/unfreeze at epoch boundaries,
CutMix/MixUp with lam-combined classification loss (severity labels never
mixed, reference lines 104-111), grad clip, per-epoch cosine LR, per-loss
accumulators + accuracy, best-val checkpointing, early stopping — redesigned
for the TPU execution model:

- ONE compiled train step serves every epoch: the curriculum stage, the
  mixup coin, the freeze flag, and the LR all enter as traced values or
  optimizer-state hyperparams (the reference's AMP GradScaler is unnecessary
  — bf16 on TPU trains without loss scaling).
- Host-side augmentation is limited to decode/resize; flips/jitter/
  normalize/CutMix/MixUp are fused into the step on device.
- State (params + opt state) is donated each step: zero-copy updates in HBM.
- Data parallelism: pass a Mesh and the same step runs SPMD with the batch
  sharded over ICI; gradient psum is inserted by XLA.
"""
from __future__ import annotations

import time
from pathlib import Path
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
import flax.struct

from rovit_kan_tpu.config import Config
from rovit_kan_tpu.ops.augment_kernel import fused_augment_batch
from rovit_kan_tpu.ops.mixing import cutmix_or_mixup
from rovit_kan_tpu.ops.preprocess import augment_batch, eval_batch
from rovit_kan_tpu.training.losses import joint_loss
from rovit_kan_tpu.training.optimizer import (
    build_optimizer,
    cosine_lr,
    set_hyperparams,
    zero_backbone_grads,
)
from rovit_kan_tpu.parallel.mesh import make_mesh, shard_batch, replicate


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    rng: jax.Array
    step: jnp.ndarray
    # EMA of params (config.train.ema_decay > 0); None when disabled — an
    # empty pytree node, so every tree_map/donation/checkpoint path is
    # structurally unchanged for the default config.
    ema_params: Any = None


def _default_forward(model) -> Callable:
    """``(params, x, deterministic, dropout_rng) -> outputs`` via
    ``model.apply`` — the seam a pipelined Trainer swaps for
    ``parallel.pipeline.pipelined_forward`` (same contract, different
    param layout)."""
    def forward(params, x, deterministic, rng):
        rngs = None if deterministic else {"dropout": rng}
        return model.apply({"params": params}, x,
                           deterministic=deterministic, rngs=rngs)
    return forward


def make_train_step(model, tx, config: Config,
                    focal_alpha: Optional[np.ndarray] = None,
                    forward_fn: Optional[Callable] = None) -> Callable:
    """Build the jit'd train step.

    Signature: ``(state, batch, stage, backbone_live, use_mix) -> (state,
    metrics)`` where ``stage`` (int32), ``backbone_live`` (f32 0/1) and
    ``use_mix`` (f32 0/1) are traced — no retrace across curriculum/freeze
    boundaries.
    """
    lc = config.loss
    fl = config.flags
    alpha = jnp.asarray(focal_alpha) if focal_alpha is not None else None
    head_mask = model.head_mask
    ema_decay = getattr(config.train, "ema_decay", 0.0)
    if forward_fn is None:
        forward_fn = _default_forward(model)

    # Measured augment policy: the fused kernel computes in bf16, so
    # "auto" engages it exactly where the model itself is bf16 (TPU +
    # mixed_precision); f32 training keeps the exact-parity XLA chain.
    fa = getattr(config.train, "fused_augment", "auto")
    use_fused_aug = (fa if isinstance(fa, bool)
                     else (jax.default_backend() == "tpu"
                           and config.flags.mixed_precision))

    def step_fn(state: TrainState, batch, stage, backbone_live, use_mix):
        rng, k_aug, k_mix, k_drop = jax.random.split(state.rng, 4)

        if use_fused_aug:
            x = fused_augment_batch(k_aug, batch["images"])
        else:
            x = augment_batch(k_aug, batch["images"])
        labels = batch["labels"]
        severity = batch["severity"]

        # use_mix gate (val of 0 disables mixing without retracing). A
        # lax.cond — not a blend of both outcomes — so a mix-off step
        # (validation-style epochs, ablations) pays ZERO mixing cost:
        # the old formulation always executed cutmix+mixup and then two
        # more full-tensor blend passes even at use_mix=0.
        def _with_mix(xx):
            mixed, la, lb, lam = cutmix_or_mixup(
                k_mix, xx, labels, fl.use_cutmix, fl.use_mixup,
                fl.cutmix_alpha, fl.mixup_alpha)
            return mixed, la, lb, lam.astype(jnp.float32)

        def _no_mix(xx):
            return xx, labels, labels, jnp.float32(1.0)

        if fl.use_cutmix or fl.use_mixup:
            x, la, lb, lam = jax.lax.cond(use_mix > 0, _with_mix,
                                          _no_mix, x)
        else:
            x, la, lb, lam = _no_mix(x)

        def loss_fn(params):
            out = forward_fn(params, x, False, k_drop)
            losses = joint_loss(
                out, labels, severity, stage,
                lambda_ord=lc.lambda_ord, mu_unc=lc.mu_unc, nu_kan=lc.nu_kan,
                focal_gamma=lc.focal_gamma, focal_alpha=alpha,
                head_mask=head_mask,
                mixup={"labels_a": la, "labels_b": lb, "lam": lam})
            return losses["total_loss"], (losses, out)

        (_, (losses, out)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        grads = zero_backbone_grads(grads, backbone_live)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        acc = jnp.mean((jnp.argmax(out["cls_logits"], -1) == labels)
                       .astype(jnp.float32))
        metrics = dict(losses)
        metrics["accuracy"] = acc
        if ema_decay > 0:                        # static: no retrace cost
            # Under gradient accumulation params only move every
            # accum_steps-th call (optax.MultiSteps); updating the EMA on
            # no-op micro-steps would compress the effective horizon to
            # ema_decay**accum_steps. Read the apply boundary from the
            # MultiSteps state itself (mini_step wraps to 0 on the call
            # that applies) — unlike a (state.step % accum) gate this
            # stays aligned after resume(), which restores opt_state but
            # resets the step counter.
            accum = getattr(config.train, "accum_steps", 1)
            applied = (opt_state.mini_step == 0) if accum > 1 else True
            d = jnp.where(applied, ema_decay, 1.0)
            ema = jax.tree.map(
                lambda e, p: d * e + (1.0 - d) * p.astype(e.dtype),
                state.ema_params, params)
        else:
            ema = state.ema_params
        new_state = TrainState(params=params, opt_state=opt_state, rng=rng,
                               step=state.step + 1, ema_params=ema)
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,)), step_fn


def _batch_constrainer(mesh, axis_name: str = "data") -> Callable:
    """Sharding constraint that keeps scanned-epoch batches data-parallel:
    with a REPLICATED dataset cache the gathered batch would otherwise be
    replicated too and every chip would redundantly compute the full
    batch. (With a sharded cache the shard_map gather already emits
    P("data") batches — there the constraint is a no-op kept for one
    uniform body.)"""
    if mesh is None or mesh.devices.size <= 1:
        return lambda b: b
    from jax.sharding import NamedSharding, PartitionSpec as P

    def constrain(batch):
        return {k: jax.lax.with_sharding_constraint(
            v, NamedSharding(mesh, P(axis_name)))
            for k, v in batch.items()}

    return constrain


def make_scanned_epoch(step_core: Callable, mesh=None,
                       axis_name: str = "data",
                       sharded_gather: bool = False) -> Callable:
    """Compile a WHOLE training epoch as one ``lax.scan`` over batch
    indices into an HBM-resident dataset (data/device_cache.py).

    One dispatch per epoch: the per-step host round-trip (dispatch latency,
    which dominates small-model steps) disappears entirely. With a multi-
    device ``mesh`` each gathered batch is constrained to shard over the
    mesh, so the step runs SPMD exactly like the per-batch path. With
    ``sharded_gather`` the dataset arrays are stored P("data") and
    ``idx_matrix`` is the ``(steps, dp, batch/dp)`` per-shard LOCAL plan —
    each device gathers its own shard's rows (no collectives). Signature:
    ``(state, images, labels, severity, idx_matrix, stage, backbone_live,
    use_mix) -> (state, mean_metrics)``.
    """
    constrain = _batch_constrainer(mesh, axis_name)
    from rovit_kan_tpu.data.device_cache import make_gather
    gather = make_gather(mesh, sharded_gather)

    def epoch_fn(state: TrainState, images, labels, severity, idx_matrix,
                 stage, backbone_live, use_mix):
        def body(state, idx):
            batch = constrain(gather(images, labels, severity, idx))
            return step_core(state, batch, stage, backbone_live, use_mix)

        state, metrics = jax.lax.scan(body, state, idx_matrix)
        return state, jax.tree.map(lambda m: m.mean(), metrics)

    return jax.jit(epoch_fn, donate_argnums=(0,))


def make_eval_step(model, config: Config,
                   focal_alpha: Optional[np.ndarray] = None,
                   forward_fn: Optional[Callable] = None) -> Callable:
    """Jit'd eval step: deterministic forward, stage-4 loss, valid-masked
    batch statistics (reference val_epoch, trainer.py:183-231)."""
    lc = config.loss
    alpha = jnp.asarray(focal_alpha) if focal_alpha is not None else None
    head_mask = model.head_mask
    if forward_fn is None:
        forward_fn = _default_forward(model)

    def step_fn(params, batch):
        x = eval_batch(batch["images"])
        out = forward_fn(params, x, True, None)
        valid = batch["valid"]
        losses = joint_loss(out, batch["labels"], batch["severity"], 4,
                            lambda_ord=lc.lambda_ord, mu_unc=lc.mu_unc,
                            nu_kan=lc.nu_kan, focal_gamma=lc.focal_gamma,
                            focal_alpha=alpha, head_mask=head_mask,
                            valid=valid)
        n = jnp.maximum(valid.sum(), 1.0)
        correct = ((jnp.argmax(out["cls_logits"], -1) == batch["labels"])
                   .astype(jnp.float32) * valid).sum()
        return {**losses, "correct": correct, "n": n}

    return jax.jit(step_fn), step_fn


class Trainer:
    """Epoch-driven fit loop (reference Trainer.fit, trainer.py:233-309)."""

    def __init__(self, model, train_loader, val_loader, config: Config,
                 logger=None, focal_alpha: Optional[np.ndarray] = None,
                 mesh=None, seed: int = 42, param_specs=None):
        self.model = model
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.config = config
        self.logger = logger
        self.mesh = mesh if mesh is not None else make_mesh(1)
        # Optional tensor-parallel PartitionSpec tree (parallel/tensor.py):
        # when set, params + optimizer moments are sharded over the mesh's
        # "model" axis instead of replicated; the train/eval steps are
        # unchanged (GSPMD inserts the collectives).
        self.param_specs = param_specs
        # Pipeline-parallel mode: a mesh carrying a "pipe" axis switches
        # the param layout to parallel/pipeline.py's (blocks stacked and
        # sharded P("pipe")) and routes the forward through the GPipe
        # schedule; the rest of the step (augmentation, mixup, curriculum
        # loss, freeze mask, EMA, AdamW) is byte-identical code.
        from rovit_kan_tpu.parallel.pipeline import is_pipeline_mesh
        self.pipelined = is_pipeline_mesh(self.mesh)
        if self.pipelined and param_specs is not None:
            raise ValueError("pipeline mesh and tensor-parallel param_specs "
                             "are mutually exclusive: for dp x pp x tp give "
                             "the mesh a 'model' axis (make_pipeline_mesh("
                             "model=...)) and the trainer derives the "
                             "combined specs itself")
        forward_fn = None
        if self.pipelined:
            from rovit_kan_tpu.parallel.pipeline import pipelined_forward
            n_micro = int(getattr(config.tpu, "pipeline_microbatches", 4))
            # Fit to the local batch: largest divisor of B_loc <= requested
            # (a non-divisor would fail shape checks; fewer microbatches
            # just means a bigger bubble).
            data_ax = dict(zip(self.mesh.axis_names,
                               self.mesh.devices.shape)).get("data", 1)
            b_loc = max(config.train.batch_size // max(data_ax, 1), 1)
            while n_micro > 1 and b_loc % n_micro:
                n_micro -= 1
            self._n_micro = n_micro
            _mesh, _n = self.mesh, self._n_micro

            def forward_fn(params, x, deterministic, rng):
                return pipelined_forward(
                    model, params, x, _mesh, n_micro=_n,
                    deterministic=deterministic, rng=rng)
        # TP/PP shard optimizer moments per-parameter; the flat
        # single-vector update cannot, so fall back to the per-leaf chain.
        self.tx = build_optimizer(
            config,
            flat=False if (param_specs is not None or self.pipelined)
            else None)
        self.focal_alpha = focal_alpha
        self.seed = seed

        self.train_step, self._step_core = make_train_step(
            model, self.tx, config, focal_alpha, forward_fn=forward_fn)
        self.eval_step, self._eval_core = make_eval_step(
            model, config, focal_alpha, forward_fn=forward_fn)
        self._scanned_epoch = None   # built lazily for DeviceLoader input

        self._use_mix = 1.0 if (config.flags.use_mixup
                                or config.flags.use_cutmix) else 0.0
        self.best_val_loss = float("inf")
        self.epochs_without_improvement = 0
        self.history: Dict[str, list] = {}
        from rovit_kan_tpu.utils.profiling import StepTimer
        self.step_timer = StepTimer(warmup=1)

    def _init_params(self, key):
        size = self.config.data.image_size
        return self.model.init(key, jnp.zeros((1, size, size, 3)))["params"]

    def init_state(self, params=None) -> TrainState:
        """``params`` (when given) is always the CANONICAL layout; the
        pipelined trainer converts internally."""
        rng = jax.random.PRNGKey(self.seed)
        if params is None:
            k_init, rng = jax.random.split(rng)
            params = self._init_params(k_init)
        if self.pipelined:
            from rovit_kan_tpu.parallel.pipeline import split_params
            params = split_params(params)
        opt_state = self.tx.init(params)
        ema = (jax.tree.map(jnp.copy, params)
               if self.config.train.ema_decay > 0 else None)
        state = TrainState(params=params, opt_state=opt_state, rng=rng,
                           step=jnp.zeros((), jnp.int32), ema_params=ema)
        return self._place_state(state)

    @staticmethod
    def eval_params(state: TrainState):
        """The weights validation/checkpointing should see: the EMA tree
        when EMA is on, the live params otherwise."""
        return (state.ema_params if state.ema_params is not None
                else state.params)

    def _place_state(self, state: TrainState) -> TrainState:
        if self.param_specs is not None:
            from rovit_kan_tpu.parallel.tensor import shard_state
            return shard_state(state, self.mesh, self.param_specs)
        if self.pipelined:
            from rovit_kan_tpu.parallel.pipeline import (
                MODEL_AXIS, pipeline_param_specs)
            from rovit_kan_tpu.parallel.tensor import shard_state
            tp = MODEL_AXIS in self.mesh.axis_names
            return shard_state(state, self.mesh,
                               pipeline_param_specs(state.params, tp=tp))
        return replicate(state, self.mesh)

    def _epoch_knobs(self, epoch: int):
        """Per-epoch (stage, lr, backbone_scale, backbone_live)."""
        cfg = self.config
        stage = cfg.get_stage_for_epoch(epoch)
        lr = cosine_lr(cfg, epoch)
        frozen = (cfg.flags.freeze_backbone_epochs > 0
                  and epoch <= cfg.flags.freeze_backbone_epochs)
        backbone_scale = 0.0 if frozen else 0.1
        backbone_live = 0.0 if frozen else 1.0
        return stage, lr, backbone_scale, backbone_live

    def _device_batches(self, loader, drop_valid: bool = True):
        """Iterate device-resident batches with one batch of H2D transfer
        in flight ahead of compute (device_put is async — issuing it an
        iteration early overlaps PCIe/ICI transfer with the current step)."""
        pending = None
        for batch in loader:
            if drop_valid:
                batch.pop("valid", None)
            nxt = shard_batch(batch, self.mesh)
            if pending is not None:
                yield pending
            pending = nxt
        if pending is not None:
            yield pending

    def train_epoch(self, state: TrainState, epoch: int):
        # Training requires full batches: zero-padded tail rows would enter
        # the loss (and leak into real rows through CutMix/MixUp). Loaders
        # built by create_dataloaders/device_cache_loaders set this.
        if getattr(self.train_loader, "drop_last", True) is False:
            raise ValueError(
                "train_loader must use drop_last=True — padded tail rows "
                "would be trained on (eval loaders may pad; training must "
                "not)")
        stage, lr, bb_scale, bb_live = self._epoch_knobs(epoch)
        state = state.replace(
            opt_state=set_hyperparams(state.opt_state, lr, bb_scale))

        # One-dispatch path: loader with an HBM-resident dataset -> the
        # whole epoch is a single compiled lax.scan. Requires drop_last
        # (full batches only); otherwise fall through to the per-batch
        # iterator, which pads + masks the tail.
        if hasattr(self.train_loader, "epoch_index_plan") \
                and getattr(self.train_loader, "drop_last", False):
            return self._train_epoch_scanned(state, stage, lr, bb_live)

        per_step = []
        use_mix = jnp.float32(self._use_mix)
        total = len(self.train_loader)
        # 10%-milestone progress prints (reference trainer.py:155-165).
        # Printing the loss costs one device sync per milestone — 10 syncs
        # per epoch, off the hot path.
        milestone = total // 10  # 0 for <10-batch epochs: no spam, no syncs
        self.step_timer.start()
        for i, batch in enumerate(self._device_batches(self.train_loader)):
            # No host sync inside the loop: metrics stay device arrays and
            # the dispatch queue keeps the chip busy while the host loads
            # the next batch.
            state, metrics = self.train_step(
                state, batch, jnp.int32(stage), jnp.float32(bb_live),
                use_mix)
            per_step.append(metrics)
            if milestone and (i + 1) % milestone == 0 and total:
                print(f"  Batch {i + 1}/{total} "
                      f"({100.0 * (i + 1) / total:.0f}%) "
                      f"loss {float(metrics['total_loss']):.4f}")
        n_batches = len(per_step)
        sums: Dict[str, float] = {}
        for metrics in per_step:                       # syncs once, at end
            for k, v in metrics.items():
                sums[k] = sums.get(k, 0.0) + float(v)
        epoch_s = self.step_timer.stop()
        avg = {k: v / max(n_batches, 1) for k, v in sums.items()}
        avg["lr"] = lr
        avg["stage"] = stage
        if n_batches:
            avg["images_per_sec"] = (n_batches * self.config.train.batch_size
                                     / epoch_s)
        return state, avg

    def _train_epoch_scanned(self, state: TrainState, stage, lr, bb_live):
        if self._scanned_epoch is None:
            sharded = getattr(self.train_loader, "sharded", False)
            if sharded and self.train_loader.mesh is not self.mesh:
                # The gather shard_maps over the Trainer mesh; arrays
                # committed to a different mesh would mis-split the plans
                # (e.g. a Trainer left on its default 1-device mesh).
                raise ValueError(
                    "sharded DeviceLoader and Trainer must share one mesh "
                    "— pass the loader's mesh to Trainer(mesh=...)")
            self._scanned_epoch = make_scanned_epoch(
                self._step_core, mesh=self.mesh, sharded_gather=sharded)
        use_mix = jnp.float32(self._use_mix)
        idx = jnp.asarray(self.train_loader.epoch_index_plan())
        images, labels, severity = self.train_loader.arrays
        self.step_timer.start()
        state, metrics = self._scanned_epoch(
            state, images, labels, severity, idx, jnp.int32(stage),
            jnp.float32(bb_live), use_mix)
        avg = {k: float(v) for k, v in metrics.items()}   # syncs
        epoch_s = self.step_timer.stop()
        avg["lr"] = lr
        avg["stage"] = stage
        avg["images_per_sec"] = idx.size / epoch_s
        return state, avg

    def val_epoch(self, state: TrainState):
        if hasattr(self.val_loader, "eval_index_plan"):
            return self._val_epoch_scanned(state)
        sums: Dict[str, float] = {}
        correct = 0.0
        total = 0.0
        n_batches = 0
        for batch in self.val_loader:
            batch = shard_batch(batch, self.mesh)
            m = self.eval_step(self.eval_params(state), batch)
            n_batches += 1
            correct += float(m["correct"])
            total += float(m["n"])
            for k in ("total_loss", "cls_loss", "ord_loss", "unc_loss",
                      "kan_loss"):
                sums[k] = sums.get(k, 0.0) + float(m[k])
        avg = {k: v / max(n_batches, 1) for k, v in sums.items()}
        avg["accuracy"] = correct / max(total, 1.0)
        return avg

    def _val_epoch_scanned(self, state: TrainState):
        """Whole validation pass as one lax.scan dispatch (DeviceLoader) —
        same step math as the per-batch path (shared ``_eval_core``)."""
        if not hasattr(self, "_scanned_val"):
            eval_core = self._eval_core
            constrain = _batch_constrainer(self.mesh)
            from rovit_kan_tpu.data.device_cache import make_gather
            sharded = getattr(self.val_loader, "sharded", False)
            if sharded and self.val_loader.mesh is not self.mesh:
                raise ValueError(
                    "sharded DeviceLoader and Trainer must share one mesh "
                    "— pass the loader's mesh to Trainer(mesh=...)")
            gather = make_gather(self.mesh, sharded)

            def body(carry, plan):
                idx, valid = plan
                params, images, labels, severity = carry
                batch = constrain({
                    **gather(images, labels, severity, idx),
                    "valid": valid.reshape(-1) if sharded else valid})
                return carry, eval_core(params, batch)

            def epoch_fn(params, images, labels, severity, idx, valid):
                _, m = jax.lax.scan(body, (params, images, labels, severity),
                                    (idx, valid))
                out = {k: v.mean() for k, v in m.items()
                       if k not in ("correct", "n")}
                out["accuracy"] = m["correct"].sum() / jnp.maximum(
                    m["n"].sum(), 1.0)
                return out

            self._scanned_val = jax.jit(epoch_fn)

        idx, valid = self.val_loader.eval_index_plan()
        images, labels, severity = self.val_loader.arrays
        m = self._scanned_val(self.eval_params(state), images, labels,
                              severity, jnp.asarray(idx), jnp.asarray(valid))
        return {k: float(v) for k, v in m.items()}

    def resume(self, name: str = "best_model"):
        """Restore a saved checkpoint into a fresh TrainState; returns
        ``(state, next_epoch)`` for continuing ``fit`` (the reference's
        load_checkpoint restores model+optimizer+scheduler state and the
        epoch counter, trainer.py:327-340).

        The optimizer state restores against a structure template (a fresh
        ``tx.init``) so NamedTuple field order is preserved — restoring by
        leaf order would scramble wrapper states like optax.MultiSteps,
        whose field names are not alphabetical."""
        from rovit_kan_tpu.utils.checkpoint import load_checkpoint
        rng = jax.random.PRNGKey(self.seed)
        k_init, rng = jax.random.split(rng)
        params_t = self._init_params(k_init)
        ema_on = self.config.train.ema_decay > 0
        opt_t = self.tx.init(params_t)
        # Try targets in order: as-configured, then with the EMA entry
        # toggled (a checkpoint written under a different ema_decay setting
        # still restores its optimizer moments — only the EMA tree is
        # seeded/dropped), then params-only as the last resort.
        targets = [{"params": params_t, "opt_state": opt_t},
                   {"params": params_t, "opt_state": opt_t,
                    "ema_params": params_t}]
        if ema_on:
            targets.reverse()
        ck = None
        for target in targets:
            try:
                ck = load_checkpoint(self._ckpt_dir() / name, target=target)
                break
            except Exception:
                continue
        if ck is not None:
            params, opt_state = ck["params"], ck["opt_state"]
            ema = ck.get("ema_params") if ema_on else None
            if ema_on and ema is None:
                print("resume: checkpoint has no EMA tree; seeding EMA "
                      "from the restored params")
                ema = jax.tree.map(jnp.copy, params)
        else:
            # Checkpoint without an opt_state (or different optimizer
            # config): restore params only, optimizer starts fresh.
            print("resume: optimizer state structure mismatch; restoring "
                  "params only (fresh optimizer)")
            ck = load_checkpoint(self._ckpt_dir() / name)
            params = jax.tree.map(jnp.asarray, ck["params"])
            opt_state = self.tx.init(params)
            # EMA resumed from a non-EMA checkpoint seeds from params.
            ema = jax.tree.map(jnp.copy, params) if ema_on else None
        self.best_val_loss = ck.get("best_val_loss", float("inf"))
        # Early-stop patience continues where it left off (a preempt/resume
        # cycle must not grant fresh patience).
        self.epochs_without_improvement = ck.get(
            "epochs_without_improvement", 0)
        if self.pipelined:
            # Checkpoints are canonical (see save_checkpoint); convert to
            # the pipelined layout before placing on the mesh.
            from rovit_kan_tpu.parallel.pipeline import (
                map_param_subtrees, split_params)
            opt_state = map_param_subtrees(opt_state, params, split_params)
            params = split_params(params)
            ema = split_params(ema) if ema is not None else None
        state = TrainState(params=params, opt_state=opt_state, rng=rng,
                           step=jnp.zeros((), jnp.int32), ema_params=ema)
        return self._place_state(state), ck.get("epoch", 0) + 1

    def _install_preempt_handler(self):
        """Graceful preemption (TPU pods get reclaimed): SIGTERM sets a
        flag; ``fit`` checkpoints the CURRENT state as ``preempt_model``
        at the next epoch boundary and returns cleanly instead of dying
        mid-run. Resume with ``resume("preempt_model")`` (``train.py
        --resume`` prefers it automatically). Main-thread only — signal
        handlers cannot be installed elsewhere; returns the previous
        handler or None."""
        import signal
        import threading

        if threading.current_thread() is not threading.main_thread():
            return None

        def _on_preempt(signum, frame):
            self._preempt_requested = True
            print("Preemption signal received — will checkpoint and stop "
                  "at the next epoch boundary")

        try:
            # Wrap in a tuple: signal.signal returns None for C-installed
            # handlers, which must still be RESTORED (to SIG_DFL) — a bare
            # None could not be told apart from "never installed".
            return ("installed", signal.signal(signal.SIGTERM, _on_preempt))
        except ValueError:       # non-main interpreter corner cases
            return None

    def _restore_preempt_handler(self, token):
        import signal
        if token is not None:
            prev = token[1]
            signal.signal(signal.SIGTERM,
                          prev if prev is not None else signal.SIG_DFL)

    def fit(self, state: Optional[TrainState] = None,
            epochs: Optional[int] = None,
            start_epoch: int = 1) -> Dict[str, Any]:
        cfg = self.config
        if state is None:
            state = self.init_state()
        epochs = epochs or cfg.train.epochs
        self._preempt_requested = False
        _prev_sigterm = self._install_preempt_handler()
        # A fresh fit starts with fresh patience/best trackers; a stale
        # counter or best-loss from a previous fit would stop immediately /
        # suppress checkpointing. A resumed fit (start_epoch > 1) keeps the
        # checkpoint's best_val_loss AND patience counter set by resume()
        # — a preempt/resume cycle must not reset early stopping.
        if start_epoch == 1:
            self.epochs_without_improvement = 0
            self.best_val_loss = float("inf")

        # Align the loader's epoch-keyed shuffle stream with the starting
        # epoch so a resumed run replays the same batch order it would have
        # seen uninterrupted.
        if start_epoch > 1 and hasattr(self.train_loader, "set_epoch"):
            self.train_loader.set_epoch(start_epoch - 1)

        history: Dict[str, list] = {"train": [], "val": []}
        # Deep-copy: the incoming state's buffers are donated to the first
        # train step; if no epoch ever improves (e.g. NaN losses) this
        # fallback must still be readable.
        best_state = jax.tree.map(lambda x: x.copy(), state)
        preempted = False
        improved = False    # did THIS fit ever beat best_val_loss?
        # Disk-write cooldown (config.train.checkpoint_min_interval_s):
        # best_state updates in memory on EVERY improvement; the disk
        # write is throttled and any pending best is flushed before fit
        # returns (and on preemption), so selection/results are identical
        # — only the per-epoch serialization cost moves off the hot loop.
        ckpt_interval = cfg.train.checkpoint_min_interval_s
        last_ckpt_t = float("-inf")
        pending_best = None           # (epoch, val_metrics) awaiting flush
        try:
            for epoch in range(start_epoch, epochs + 1):
                t0 = time.time()
                state, train_m = self.train_epoch(state, epoch)
                val_m = self.val_epoch(state)
                dt = time.time() - t0

                if self.logger is not None:
                    self.logger.log_epoch(epoch, train_m["stage"], train_m,
                                          val_m)
                history["train"].append(train_m)
                history["val"].append(val_m)
                print(f"Epoch {epoch:3d} stage {train_m['stage']} "
                      f"train_loss {train_m['total_loss']:.4f} "
                      f"val_loss {val_m['total_loss']:.4f} "
                      f"val_acc {val_m['accuracy']:.4f} ({dt:.1f}s)")

                if val_m["total_loss"] < self.best_val_loss:
                    self.best_val_loss = val_m["total_loss"]
                    self.epochs_without_improvement = 0
                    improved = True
                    # Deep-copy: the live state's buffers are donated to the
                    # next train step and would be deleted under best_state.
                    best_state = jax.tree.map(lambda x: x.copy(), state)
                    if time.time() - last_ckpt_t >= ckpt_interval:
                        # Async: the orbax write overlaps the next epochs;
                        # fit joins it before returning (and
                        # save_checkpoint itself joins before overwriting
                        # the same path).
                        self.save_checkpoint(state, epoch, val_m,
                                             block=False)
                        last_ckpt_t = time.time()
                        pending_best = None
                    else:
                        pending_best = (epoch, val_m)
                else:
                    self.epochs_without_improvement += 1
                    if self.epochs_without_improvement \
                            >= cfg.train.early_stop_patience:
                        print(f"Early stopping at epoch {epoch}")
                        break

                if self._preempt_requested and epoch < epochs:
                    # (A signal during the FINAL epoch is completion, not
                    # preemption — nothing is left to resume.)
                    # Save the CURRENT (not best) state so a resumed run
                    # continues exactly where this one stopped, with the
                    # best-loss and patience trackers intact
                    # (save_checkpoint persists both).
                    if pending_best is not None:
                        # A cooldown-deferred best exists only in memory;
                        # losing the process must not lose it.
                        self.save_checkpoint(best_state, *pending_best)
                        pending_best = None
                    self.save_checkpoint(state, epoch, val_m,
                                         name="preempt_model")
                    print(f"Preempted at epoch {epoch}: state saved as "
                          f"preempt_model; resume with --resume")
                    preempted = True
                    break
        finally:
            self._restore_preempt_handler(_prev_sigterm)

        if not preempted:
            if pending_best is not None:
                # Flush the cooldown-deferred best: evaluate.py/serving
                # read best_model from disk and must see the true best.
                self.save_checkpoint(best_state, *pending_best)
            # A completed (or early-stopped) fit invalidates any stale
            # preemption checkpoint (and its staging dir/sidecars) —
            # leaving it would hijack a later --resume with older state.
            from rovit_kan_tpu.utils.checkpoint import discard_staging
            discard_staging(self._ckpt_dir() / "preempt_model")

        # Join any in-flight async best_model write before returning —
        # callers read the checkpoint immediately (final eval, serving).
        from rovit_kan_tpu.utils.checkpoint import wait_for_checkpoints
        wait_for_checkpoints()

        self.history = history
        # "improved" tells resumed callers whether best_state is really the
        # best: a resume from preempt_model starts fit with the PREEMPTED
        # state as best_state, and if no epoch beats the restored
        # best_val_loss the true best lives only in the on-disk best_model.
        return {"state": state, "best_state": best_state,
                "history": history, "best_val_loss": self.best_val_loss,
                "preempted": preempted, "improved": improved}

    # -- checkpointing (orbax) ------------------------------------------
    def _ckpt_dir(self) -> Path:
        d = Path(self.config.paths.checkpoints_dir)
        d.mkdir(parents=True, exist_ok=True)
        return d

    def save_checkpoint(self, state: TrainState, epoch: int,
                        metrics: Dict[str, float], name: str = "best_model",
                        block: bool = True):
        from rovit_kan_tpu.utils.checkpoint import save_checkpoint
        params, opt_state, ema = (state.params, state.opt_state,
                                  state.ema_params)
        if self.pipelined:
            # Checkpoints are always CANONICAL layout: evaluator, serving,
            # export, and non-pipelined resumes load them untouched.
            from rovit_kan_tpu.parallel.pipeline import (
                map_param_subtrees, merge_params)
            opt_state = map_param_subtrees(opt_state, params, merge_params)
            ema = merge_params(ema) if ema is not None else None
            params = merge_params(params)
        save_checkpoint(self._ckpt_dir() / name, params,
                        opt_state=opt_state, epoch=epoch,
                        best_val_loss=self.best_val_loss, metrics=metrics,
                        config=self.config, ema_params=ema,
                        epochs_without_improvement=(
                            self.epochs_without_improvement),
                        block=block)

    def load_checkpoint(self, name: str = "best_model"):
        from rovit_kan_tpu.utils.checkpoint import load_checkpoint
        return load_checkpoint(self._ckpt_dir() / name)
