"""Ablation study: 6 canonical variants, skip-resume, comparison tables.

Capability parity with `/root/reference/experiments/ablation.py:20-479`:
- ``AblationConfig`` per-variant toggles (lines 20-27);
- the 6 canonical variants full / no_ordinal / no_uncertainty / no_kan /
  no_curriculum / classification_only (lines 166-198);
- resume-by-skip: a completed experiment (checkpoint + cached
  ``test_metrics.json`` present) is not retrained (lines 208-231);
- per-experiment config copy with redirected output paths (lines 275-283);
- class weights from the train split feeding the focal alpha (lines 290-295);
- CSV summary, comparison printer, component importance = accuracy deltas
  vs the full model (lines 357-447).

TPU-first: variants with structurally absent heads are different static
module configs (``with_*`` flags on RoViTKAN) -> separate compiled programs,
exactly like the reference's AblationModel rebuilds; the curriculum toggle
is a config flag consumed by the *same* jit'd train step (stage is traced).
"""
from __future__ import annotations

import copy
import csv
import json
import shutil
from dataclasses import dataclass
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from rovit_kan_tpu.config import Config
from rovit_kan_tpu.models.rovit_kan import build_model
from rovit_kan_tpu.training.trainer import Trainer
from rovit_kan_tpu.evaluation.evaluator import (
    Evaluator,
    load_model_for_evaluation,
)
from rovit_kan_tpu.results.logger import ExperimentLogger


@dataclass
class AblationConfig:
    """Per-variant toggles (reference ablation.py:20-27)."""
    name: str
    use_ordinal: bool = True
    use_uncertainty: bool = True
    use_kan: bool = True
    use_curriculum: bool = True
    description: str = ""


CANONICAL_VARIANTS: List[AblationConfig] = [
    AblationConfig("full_model", description="Full RoViT-KAN"),
    AblationConfig("no_ordinal", use_ordinal=False,
                   description="Without ordinal head"),
    AblationConfig("no_uncertainty", use_uncertainty=False,
                   description="Without uncertainty head"),
    AblationConfig("no_kan", use_kan=False,
                   description="Without KAN module"),
    AblationConfig("no_curriculum", use_curriculum=False,
                   description="Without curriculum learning"),
    AblationConfig("classification_only", use_ordinal=False,
                   use_uncertainty=False, use_kan=False,
                   description="Classification head only"),
]

CSV_FIELDS = ["experiment", "accuracy", "macro_f1", "weighted_f1", "mae",
              "spearman_rho", "brier_score", "ece", "ece_calibrated",
              "temperature", "temperature_degenerate", "fps", "params"]


class AblationExperiment:
    """Runs the variant suite (reference AblationExperiment,
    ablation.py:146-447)."""

    def __init__(self, config: Config, train_loader, val_loader, test_loader,
                 output_dir, focal_alpha: Optional[np.ndarray] = None,
                 variants: Optional[List[AblationConfig]] = None,
                 mesh=None, seed: int = 42, run_fps: bool = True):
        self.base_config = config
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.test_loader = test_loader
        self.output_dir = Path(output_dir)
        self.focal_alpha = focal_alpha
        self.variants = variants or CANONICAL_VARIANTS
        self.mesh = mesh
        self.seed = seed
        self.run_fps = run_fps
        self.results: Dict[str, Dict] = {}

    def _exp_config(self, variant: AblationConfig) -> Config:
        """Deep-copied config with per-experiment paths + curriculum toggle
        (reference ablation.py:275-283)."""
        cfg = copy.deepcopy(self.base_config)
        exp_dir = self.output_dir / variant.name
        cfg.paths.checkpoints_dir = exp_dir
        cfg.paths.results_dir = exp_dir
        cfg.paths.logs_dir = exp_dir
        cfg.flags.curriculum = variant.use_curriculum
        # Persisted into the checkpoint so evaluate/serving rebuild the
        # exact variant architecture.
        cfg.model.with_ordinal = variant.use_ordinal
        cfg.model.with_uncertainty = variant.use_uncertainty
        cfg.model.with_kan = variant.use_kan
        return cfg

    def run_single_experiment(self, variant: AblationConfig,
                              epochs: Optional[int] = None) -> Dict:
        cfg = self._exp_config(variant)
        exp_dir = self.output_dir / variant.name
        exp_dir.mkdir(parents=True, exist_ok=True)

        # Resume-by-skip (reference ablation.py:208-231). The checkpoint
        # must be a COMMITTED orbax dir (promote_staging adopts a
        # committed-but-unswapped async write first) — a torn/foreign dir
        # must not mark the variant complete. A pending preempt_model
        # VETOES the skip: its presence means this variant's training is
        # incomplete (a completed fit deletes it), and a preempted retrain
        # may have already written a fresh-but-half-trained best_model
        # next to a STALE cached test_metrics.json from an older run —
        # skipping there would resurrect the old run's metrics as if they
        # belonged to the new checkpoint (observed in round 5).
        from rovit_kan_tpu.utils.checkpoint import promote_staging
        cached = exp_dir / "test_metrics.json"
        ckpt = exp_dir / "best_model"
        preempt_pending = promote_staging(exp_dir / "preempt_model")
        if cached.exists() and not preempt_pending and promote_staging(ckpt):
            print(f"[{variant.name}] cached results found — skipping retrain")
            metrics = json.loads(cached.read_text())
            self.results[variant.name] = metrics
            return metrics

        print(f"=== Ablation: {variant.name} ({variant.description}) ===")
        model = build_model(cfg, with_ordinal=variant.use_ordinal,
                            with_uncertainty=variant.use_uncertainty,
                            with_kan=variant.use_kan)
        logger = ExperimentLogger(exp_dir, variant.name)
        trainer = Trainer(model, self.train_loader, self.val_loader, cfg,
                          logger=logger, focal_alpha=self.focal_alpha,
                          mesh=self.mesh, seed=self.seed)
        preempt = exp_dir / "preempt_model"
        resumed = preempt_pending            # never restore a torn write
        if resumed:
            # A previous run of this variant was preempted mid-training:
            # continue from its epoch-boundary checkpoint instead of
            # silently redoing the finished epochs.
            print(f"[{variant.name}] preemption checkpoint found — "
                  f"resuming")
            state, start_epoch = trainer.resume("preempt_model")
            # Rows the dead process logged past its checkpoint are stale.
            logger.truncate_from(start_epoch)
            fit = trainer.fit(state, epochs=epochs,
                              start_epoch=start_epoch)
        else:
            # Fresh retrain (e.g. regenerating the golden CSVs): replace
            # any previous run's epoch CSV — log_epoch appends whenever
            # the file exists, which would concatenate two lineages.
            logger.reset()
            fit = trainer.fit(epochs=epochs)
        if fit.get("preempted"):
            # Never cache a half-trained variant: writing test_metrics.json
            # here would make the skip-resume check treat it as complete
            # forever. The preempt checkpoint stays; the next run of this
            # variant resumes it automatically (above).
            raise SystemExit(
                f"[{variant.name}] preempted mid-training — results NOT "
                f"cached; re-run to continue")

        # Evaluate the same weights model selection used: the EMA tree when
        # EMA is on (val_epoch scores eval_params; evaluating the raw tree
        # would report metrics for weights that were never validated).
        if resumed and not fit["improved"] and promote_staging(ckpt):
            # Resumed from a preemption checkpoint and no epoch beat the
            # restored best_val_loss: the in-memory best_state is the
            # preemption-time state — the true best lives on disk.
            _, eval_weights = load_model_for_evaluation(ckpt, cfg)
        else:
            eval_weights = trainer.eval_params(fit["best_state"])
            if trainer.pipelined:
                from rovit_kan_tpu.parallel.pipeline import merge_params
                eval_weights = merge_params(eval_weights)
        evaluator = Evaluator(model, eval_weights,
                              self.test_loader, cfg, output_dir=exp_dir)
        metrics = evaluator.evaluate(run_fps=self.run_fps)
        # Per-variant temperature scaling: the raw `ece` column stays
        # comparable to the reference's recorded CSVs; `ece_calibrated`
        # shows what one validation-fitted scalar buys each variant.
        metrics.update(evaluator.calibrated_metrics(self.val_loader))
        metrics["experiment"] = variant.name
        metrics["best_val_loss"] = fit["best_val_loss"]
        logger.save_metrics(metrics, "test_metrics.json")
        if preempt.exists():
            # This variant is now complete: a stale preemption checkpoint
            # would make the NEXT run resume into an already-finished
            # training (and skip-resume already covers re-runs).
            shutil.rmtree(preempt)
        logger.plot_training_curves()
        self.results[variant.name] = metrics
        return metrics

    def run_all_experiments(self, epochs: Optional[int] = None) -> Dict:
        for variant in self.variants:
            self.run_single_experiment(variant, epochs=epochs)
        return self.results

    def save_summary_csv(self) -> Path:
        """CSV summary across variants (reference ablation.py:357-391)."""
        path = self.output_dir / "ablation_results.csv"
        with open(path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=CSV_FIELDS, extrasaction="ignore")
            w.writeheader()
            for name, m in self.results.items():
                w.writerow({"experiment": name,
                            **{k: m.get(k, "") for k in CSV_FIELDS[1:]}})
        return path

    def print_comparison(self) -> None:
        """Side-by-side table (reference ablation.py:393-417)."""
        cols = ["experiment", "accuracy", "macro_f1", "mae", "brier_score",
                "ece", "ece_calibrated", "params"]
        print(f"{'experiment':22s} " + " ".join(f"{c:>12s}" for c in cols[1:]))
        for name, m in self.results.items():
            vals = []
            for c in cols[1:]:
                v = m.get(c, "")
                vals.append(f"{v:12.4f}" if isinstance(v, float)
                            else f"{v!s:>12s}")
            print(f"{name:22s} " + " ".join(vals))

    def get_component_importance(self) -> Dict[str, float]:
        """Accuracy delta of each single-component removal vs the full model
        (reference ablation.py:419-447)."""
        if "full_model" not in self.results:
            return {}
        full_acc = self.results["full_model"]["accuracy"]
        deltas = {}
        component_of = {"no_ordinal": "ordinal_head",
                        "no_uncertainty": "uncertainty_head",
                        "no_kan": "kan_module",
                        "no_curriculum": "curriculum"}
        for variant, comp in component_of.items():
            if variant in self.results:
                deltas[comp] = full_acc - self.results[variant]["accuracy"]
        return deltas


def run_ablation_study(config: Config, train_loader, val_loader, test_loader,
                       output_dir, focal_alpha=None, epochs=None,
                       variants=None, mesh=None, seed: int = 42,
                       run_fps: bool = True) -> AblationExperiment:
    """Orchestrator (reference ablation.py:450-479)."""
    exp = AblationExperiment(config, train_loader, val_loader, test_loader,
                             output_dir, focal_alpha=focal_alpha,
                             variants=variants, mesh=mesh, seed=seed,
                             run_fps=run_fps)
    exp.run_all_experiments(epochs=epochs)
    exp.save_summary_csv()
    exp.print_comparison()
    importance = exp.get_component_importance()
    if importance:
        print("Component importance (accuracy delta vs full):")
        for comp, d in sorted(importance.items(), key=lambda kv: -kv[1]):
            print(f"  {comp:20s} {d:+.4f}")
    (Path(output_dir) / "component_importance.json").write_text(
        json.dumps(importance, indent=2))
    return exp
