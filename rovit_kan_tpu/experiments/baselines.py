"""Baseline comparison harness: train timm-equivalent classifiers natively.

Capability parity with `/root/reference/experiments/baselines.py:55-268`:
- the model set EfficientNet-B0 / MobileNetV3-Large / DeiT-Tiny / ResNet50
  (reference lines 61-68; all four reimplemented natively in
  models/baselines.py since timm is unavailable);
- single-group AdamW + per-epoch cosine schedule, focal-loss-only training
  (their ``SimpleLoss`` adapter, lines 110-143), curriculum disabled and no
  backbone freeze (lines 151-155);
- per-model try/except so one failure doesn't kill the sweep (lines 79-92);
- manual test loop computing accuracy / macro-F1 / FPS / params
  (lines 173-199) and a comparison CSV sorted by accuracy (lines 208-220).

TPU-first: its own jit train step (the CNN baselines carry BatchNorm
``batch_stats``, a mutable collection the multi-task Trainer doesn't need);
batch sharded over the mesh, state donated.
"""
from __future__ import annotations

import csv
import json
import time
import traceback
from pathlib import Path
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from rovit_kan_tpu.config import Config
from rovit_kan_tpu.models.baselines import BaselineModel, BACKBONES
from rovit_kan_tpu.ops.preprocess import augment_batch, eval_batch
from rovit_kan_tpu.training.losses import focal_loss_per_example
from rovit_kan_tpu.evaluation import metrics as M
from rovit_kan_tpu.parallel.mesh import make_mesh, shard_batch, replicate

DEFAULT_BASELINES = ["deit_tiny", "efficientnet_b0", "mobilenetv3_large",
                     "resnet50"]


class BaselineExperiment:
    def __init__(self, config: Config, train_loader, val_loader, test_loader,
                 output_dir, model_names: Optional[List[str]] = None,
                 epochs: int = 10, focal_alpha: Optional[np.ndarray] = None,
                 mesh=None, seed: int = 42, run_fps: bool = True,
                 fps_timeout_s: int = 600):
        self.config = config
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.test_loader = test_loader
        self.output_dir = Path(output_dir)
        self.model_names = model_names or DEFAULT_BASELINES
        self.epochs = epochs
        self.focal_alpha = focal_alpha
        self.mesh = mesh if mesh is not None else make_mesh(1)
        self.seed = seed
        self.run_fps = run_fps
        self.fps_timeout_s = fps_timeout_s
        self.results: Dict[str, Dict] = {}

    # -- jit'd steps ----------------------------------------------------
    def _make_steps(self, model):
        gamma = self.config.loss.focal_gamma
        alpha = (jnp.asarray(self.focal_alpha)
                 if self.focal_alpha is not None else None)
        clip = self.config.flags.gradient_clip

        tx = optax.inject_hyperparams(
            lambda learning_rate: optax.chain(
                optax.clip_by_global_norm(clip),
                optax.adamw(learning_rate,
                            weight_decay=self.config.train.weight_decay),
            ))(learning_rate=self.config.train.learning_rate)

        def train_step(variables, opt_state, rng, batch):
            rng, k_aug, k_drop = jax.random.split(rng, 3)
            x = augment_batch(k_aug, batch["images"])
            # Mask padded rows (a non-drop_last loader zero-pads the tail
            # batch with label-0 samples, valid=0) out of both the loss
            # mean and the accuracy — same convention as training/losses.py.
            valid = batch["valid"].astype(jnp.float32)
            denom = jnp.maximum(valid.sum(), 1.0)

            def loss_fn(params):
                out, mutated = model.apply(
                    {"params": params, **{k: v for k, v in variables.items()
                                          if k != "params"}},
                    x, deterministic=False, mutable=["batch_stats"],
                    rngs={"dropout": k_drop})
                per_ex = focal_loss_per_example(
                    out["cls_logits"], batch["labels"], gamma, alpha)
                loss = (per_ex * valid).sum() / denom
                return loss, (out, mutated)

            (loss, (out, mutated)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(variables["params"])
            updates, new_opt = tx.update(grads, opt_state,
                                         variables["params"])
            params = optax.apply_updates(variables["params"], updates)
            acc = ((jnp.argmax(out["cls_logits"], -1)
                    == batch["labels"]).astype(jnp.float32)
                   * valid).sum() / denom
            new_vars = {"params": params, **mutated}
            return new_vars, new_opt, rng, {"loss": loss, "accuracy": acc}

        return (jax.jit(train_step, donate_argnums=(0, 1)),
                self._eval_step_for(model), tx)

    @staticmethod
    def _eval_step_for(model):
        """The single serving-step definition: preprocess -> apply ->
        softmax. Both the accuracy eval and the fps column build their
        step through here (with different model twins), so the two can
        never measure different compute."""
        def eval_step(variables, batch):
            out = model.apply(variables, eval_batch(batch["images"]),
                              deterministic=True)
            logits = out["cls_logits"].astype(jnp.float32)
            return {"probs": jax.nn.softmax(logits, -1), "logits": logits}

        return jax.jit(eval_step)

    def _cosine_lr(self, epoch: int) -> float:
        from rovit_kan_tpu.training.optimizer import cosine_schedule
        return cosine_schedule(self.config.train.learning_rate, epoch,
                               self.epochs)

    # -- single model ---------------------------------------------------
    def run_single(self, name: str) -> Dict:
        print(f"=== Baseline: {name} ===")
        model = BaselineModel(backbone_name=name,
                              num_classes=self.config.model.num_classes)
        train_step, eval_step, tx = self._make_steps(model)

        rng = jax.random.PRNGKey(self.seed)
        size = self.config.data.image_size
        variables = dict(model.init(
            rng, jnp.zeros((1, size, size, 3), jnp.float32)))
        opt_state = tx.init(variables["params"])
        variables = replicate(variables, self.mesh)
        opt_state = replicate(opt_state, self.mesh)

        t_train = time.time()
        for epoch in range(1, self.epochs + 1):
            lr = self._cosine_lr(epoch)
            opt_state.hyperparams["learning_rate"] = jnp.asarray(lr)
            per_step = []
            for batch in self.train_loader:
                batch = shard_batch(batch, self.mesh)
                variables, opt_state, rng, m = train_step(
                    variables, opt_state, rng, batch)
                per_step.append(m)   # device arrays; sync once per epoch
            nb = max(len(per_step), 1)
            sums = {k: sum(float(m[k]) for m in per_step)
                    for k in ("loss", "accuracy")}
            print(f"  epoch {epoch:2d} loss {sums['loss']/nb:.4f} "
                  f"acc {sums['accuracy']/nb:.4f}")
        train_time = time.time() - t_train

        # Manual test loop (reference baselines.py:173-199).
        probs, logits, labels = [], [], []
        for batch in self.test_loader:
            out = eval_step(variables, shard_batch(batch, self.mesh))
            valid = batch["valid"].astype(bool)
            probs.append(np.asarray(out["probs"])[valid])
            logits.append(np.asarray(out["logits"])[valid])
            labels.append(batch["labels"][valid])
        probs = np.concatenate(probs)
        logits = np.concatenate(logits)
        labels = np.concatenate(labels)
        preds = probs.argmax(1)

        k = self.config.model.num_classes
        result = {
            "model": name,
            "accuracy": M.accuracy(labels, preds),
            "macro_f1": M.macro_f1(labels, preds, k),
            "weighted_f1": M.weighted_f1(labels, preds, k),
            "brier_score": M.brier_score(probs, labels),
            "ece": M.ece(probs, labels),
            "params": M.count_params(variables["params"]),
            "train_time_s": train_time,
        }
        result.update(self._calibrate(eval_step, variables, logits, labels))
        if self.run_fps:
            # fps is a bonus column: a fused-kernel failure here must not
            # discard the trained baseline's metrics above. The bs=1
            # compile also goes through the sandbox's TPU relay, which has
            # twice hung indefinitely mid-request (round-4 vgg16: the
            # whole sweep's result was lost to it) — bound it with the
            # same SIGALRM watchdog bench.py uses so a dead relay costs
            # one column, not the trained model.
            import signal

            def _alarm(signum, frame):
                raise TimeoutError(
                    f"fps column for {name}: relay unresponsive "
                    f"for {self.fps_timeout_s}s")

            old = signal.signal(signal.SIGALRM, _alarm)
            signal.alarm(self.fps_timeout_s)
            try:
                dummy = np.zeros((1, size, size, 3), np.uint8)
                fps_step = self._fps_step(name, model) or eval_step
                result["fps"] = float(M.fps_benchmark(
                    lambda x: fps_step(variables, {"images": x}), dummy))
            except Exception as e:
                print(f"  fps column for {name} FAILED (metrics kept):")
                traceback.print_exc()
                # Same convention as Evaluator.evaluate: a null fps plus
                # the error, so the artifact explains its own blank cell.
                result["fps"] = None
                result["fps_error"] = f"{type(e).__name__}: {e}"
            finally:
                signal.alarm(0)
                signal.signal(signal.SIGALRM, old)
        return result

    def _calibrate(self, eval_step, variables, test_logits,
                   test_labels) -> Dict[str, float]:
        """Temperature scaling per baseline: fit T on the validation split,
        re-score the test logits. The raw `ece` column stays comparable to
        the reference's recorded CSV; `ece_calibrated` sits beside it."""
        from rovit_kan_tpu.evaluation.calibration import (
            apply_temperature, fit_temperature_report)

        val_logits, val_labels = [], []
        for batch in self.val_loader:
            out = eval_step(variables, shard_batch(batch, self.mesh))
            valid = batch["valid"].astype(bool)
            val_logits.append(np.asarray(out["logits"])[valid])
            val_labels.append(batch["labels"][valid])
        rep = fit_temperature_report(np.concatenate(val_logits),
                                     np.concatenate(val_labels))
        t = rep["temperature"]
        cal = apply_temperature(test_logits, t)
        return {"temperature": float(t),
                "temperature_degenerate": bool(rep["degenerate"]),
                "ece_calibrated": M.ece(cal, test_labels),
                "brier_calibrated": M.brier_score(cal, test_labels)}

    def _fps_step(self, name: str, model):
        """Inference step for the fps column, or None to reuse the plain
        eval step. On TPU the deit_tiny baseline gets the SAME serving
        build as the flagship — bf16 compute + whole-block fused Pallas
        kernel (config.tpu.use_pallas_block, same "auto" policy as
        models/rovit_kan._resolve_pallas_block) on the identical fp32
        param tree. Other backbones (convnets — no block kernel) and CPU
        runs measure the plain eval build."""
        from rovit_kan_tpu.models.rovit_kan import _resolve_pallas_block

        policy = getattr(self.config.tpu, "use_pallas_block", "auto")
        if not (name == "deit_tiny"
                and _resolve_pallas_block(policy, inference=True,
                                          dtype=jnp.bfloat16)):
            return None

        infer = BaselineModel(backbone_name=name,
                              num_classes=model.num_classes,
                              dtype=jnp.bfloat16, use_fused_block=True)
        return self._eval_step_for(infer)

    def run_all(self) -> Dict[str, Dict]:
        self.output_dir.mkdir(parents=True, exist_ok=True)
        for name in self.model_names:
            if name not in BACKBONES:
                print(f"  skipping unknown baseline '{name}'")
                continue
            try:
                r = self.run_single(name)
                self.results[name] = r
                (self.output_dir / f"{name}_metrics.json").write_text(
                    json.dumps(r, indent=2))
            except Exception:
                # One failure must not kill the sweep (reference
                # baselines.py:79-92).
                print(f"  baseline {name} FAILED:")
                traceback.print_exc()
        return self.results

    def save_comparison(self) -> Path:
        """CSV sorted by accuracy desc (reference baselines.py:208-220).

        Rows for models NOT trained in this run are merged in from their
        existing ``<name>_metrics.json`` sidecars, so a subset re-run
        (``run_baselines.py --models vgg16 swin_tiny``) refreshes those
        rows without clobbering the rest of the table."""
        path = self.output_dir / "baseline_comparison.csv"
        merged = {}
        for p in sorted(self.output_dir.glob("*_metrics.json")):
            try:
                prev = json.loads(p.read_text())
            except (OSError, ValueError):
                continue
            if isinstance(prev, dict) and "model" in prev:
                merged[prev["model"]] = prev
        merged.update(self.results)
        rows = sorted(merged.values(),
                      key=lambda r: -r.get("accuracy", 0.0))
        fields = ["model", "accuracy", "macro_f1", "weighted_f1",
                  "brier_score", "ece", "ece_calibrated", "temperature",
                  "temperature_degenerate", "params", "fps", "train_time_s"]
        with open(path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=fields, extrasaction="ignore")
            w.writeheader()
            w.writerows(rows)
        return path


def run_baseline_experiments(config: Config, train_loader, val_loader,
                             test_loader, output_dir, model_names=None,
                             epochs: int = 10, focal_alpha=None, mesh=None,
                             seed: int = 42, run_fps: bool = True,
                             fps_timeout_s: int = 600) -> BaselineExperiment:
    """Entry point (reference baselines.py:223-268)."""
    exp = BaselineExperiment(config, train_loader, val_loader, test_loader,
                             output_dir, model_names=model_names,
                             epochs=epochs, focal_alpha=focal_alpha,
                             mesh=mesh, seed=seed, run_fps=run_fps,
                             fps_timeout_s=fps_timeout_s)
    exp.run_all()
    exp.save_comparison()
    print(f"{'model':20s} {'acc':>8s} {'macro_f1':>9s} {'params':>10s}")
    for name, r in sorted(exp.results.items(),
                          key=lambda kv: -kv[1].get("accuracy", 0)):
        print(f"{name:20s} {r['accuracy']:8.4f} {r['macro_f1']:9.4f} "
              f"{r['params']:10d}")
    return exp
