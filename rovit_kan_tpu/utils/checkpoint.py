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


_CKPTR: Optional[ocp.StandardCheckpointer] = None


def _checkpointer() -> ocp.StandardCheckpointer:
    """Process-wide ``StandardCheckpointer`` — which IS an orbax
    ``AsyncCheckpointer``: ``save()`` returns once the arrays are staged
    to host and the write continues on a background thread. Reusing one
    instance is what lets back-to-back saves overlap training."""
    global _CKPTR
    if _CKPTR is None:
        _CKPTR = ocp.StandardCheckpointer()
    return _CKPTR


def wait_for_checkpoints() -> None:
    """Join any in-flight async checkpoint write (no-op when none).
    The Trainer calls this at the end of ``fit`` so readers (evaluator,
    serving, export) always see committed checkpoints."""
    if _CKPTR is not None:
        _CKPTR.wait_until_finished()


def is_finalized(path) -> bool:
    """True iff ``path`` is a committed (fully written) orbax checkpoint.
    Orbax commits via atomic tmp-dir + rename, so an interrupted async
    write leaves either a ``*.orbax-checkpoint-tmp`` sibling (never the
    final name) or — crash between this module's rmtree and the rename —
    nothing; a directory that exists under the final name but lacks the
    orbax metadata (e.g. hand-made or foreign) is also rejected. Resume
    logic uses this to never restore a torso (scripts/train.py,
    experiments/ablation.py)."""
    path = Path(path).absolute()
    try:
        return (path.exists()
                and (path / "_CHECKPOINT_METADATA").exists()
                and ocp.utils.is_checkpoint_finalized(path))
    except (ValueError, OSError):
        return False


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
                    epochs_without_improvement: int = 0,
                    block: bool = True) -> None:
    """Save params (+ optional opt state / EMA params) and a JSON metadata
    sidecar. ``ema_params``, when present, are what evaluation should use
    (the trainer validated with them).

    ``block=False`` makes the save asynchronous: the call returns once
    the arrays are staged to host and the write proceeds on a background
    thread while training continues (the Trainer's per-epoch best_model
    saves use this). Join with :func:`wait_for_checkpoints`; a torn
    async write is detectable via :func:`is_finalized`.
    """
    path = Path(path).absolute()
    ckptr = _checkpointer()
    tree = {"params": params}
    if opt_state is not None:
        tree["opt_state"] = opt_state
    if ema_params is not None:
        tree["ema_params"] = ema_params
    # Join any in-flight async write FIRST: orbax commits via atomic
    # tmp-dir + rename, so an uncommitted prior save to this path is
    # invisible to exists() right now but materializes mid-save and
    # orbax then refuses the destination.
    ckptr.wait_until_finished()
    if path.exists():
        import shutil
        shutil.rmtree(path)
    ckptr.save(path, tree)
    if block:
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
    # Same-process read-after-async-write safety.
    wait_for_checkpoints()
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
