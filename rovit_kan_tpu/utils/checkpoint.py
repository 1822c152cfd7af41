"""Orbax checkpointing of train state + metadata.

TPU-native equivalent of the reference's single-file torch checkpoint
(`/root/reference/training/trainer.py:311-340`: model/optimizer/scheduler
state + epoch + best_val_loss + metrics + config). Orbax writes sharding-
aware, async-capable checkpoints that restore directly onto a device mesh.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_jsonable(x):
    if isinstance(x, dict):
        return {k: _to_jsonable(v) for k, v in x.items()}
    if isinstance(x, (list, tuple)):
        return [_to_jsonable(v) for v in x]
    if isinstance(x, (np.generic,)):
        return x.item()
    if hasattr(x, "item") and getattr(x, "ndim", None) == 0:
        return x.item()
    if isinstance(x, (int, float, str, bool)) or x is None:
        return x
    return str(x)


def save_checkpoint(path, params: Any, opt_state: Any = None,
                    epoch: int = 0, best_val_loss: float = float("inf"),
                    metrics: Optional[Dict] = None,
                    config: Any = None, ema_params: Any = None,
                    epochs_without_improvement: int = 0) -> None:
    """Save params (+ optional opt state / EMA params) and a JSON metadata
    sidecar. ``ema_params``, when present, are what evaluation should use
    (the trainer validated with them)."""
    path = Path(path).absolute()
    ckptr = ocp.StandardCheckpointer()
    tree = {"params": params}
    if opt_state is not None:
        tree["opt_state"] = opt_state
    if ema_params is not None:
        tree["ema_params"] = ema_params
    if path.exists():
        import shutil
        shutil.rmtree(path)
    ckptr.save(path, tree)
    ckptr.wait_until_finished()
    meta = {"epoch": epoch, "best_val_loss": best_val_loss,
            "epochs_without_improvement": epochs_without_improvement,
            "metrics": _to_jsonable(metrics or {})}
    if config is not None:
        meta["config"] = (config.to_dict() if hasattr(config, "to_dict")
                          else _to_jsonable(config))
    (path.parent / (path.name + ".meta.json")).write_text(json.dumps(meta))


def load_checkpoint(path, target: Any = None) -> Dict[str, Any]:
    """Load a checkpoint; returns {params, opt_state?, epoch, best_val_loss,
    metrics}. ``target`` (optional pytree of like-shaped arrays) restores
    with matching shardings/dtypes; without a target, everything restores as
    host numpy, so a checkpoint written on any device mesh loads on any
    other topology (single chip, CPU, different mesh)."""
    path = Path(path).absolute()
    if target is not None:
        tree = ocp.StandardCheckpointer().restore(path, target=target)
    else:
        ckptr = ocp.PyTreeCheckpointer()
        meta = ckptr.metadata(path).item_metadata
        meta_tree = meta.tree if hasattr(meta, "tree") else meta
        restore_args = jax.tree.map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta_tree)
        tree = ckptr.restore(path, restore_args=restore_args)
    meta_path = path.parent / (path.name + ".meta.json")
    meta = json.loads(meta_path.read_text()) if meta_path.exists() else {}
    return {**tree, **meta}
