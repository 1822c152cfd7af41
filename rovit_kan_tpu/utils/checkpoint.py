"""Orbax checkpointing of train state + metadata.

TPU-native equivalent of the reference's single-file torch checkpoint
(`/root/reference/training/trainer.py:311-340`: model/optimizer/scheduler
state + epoch + best_val_loss + metrics + config). Orbax writes sharding-
aware, async-capable checkpoints that restore directly onto a device mesh.

Async + durability protocol: ``save_checkpoint(block=False)`` returns
once the arrays are staged to host; the orbax write proceeds on a
background thread while training continues. The write targets a STAGING
name (``<name>.next``) so the previously committed checkpoint survives
the whole window — only after orbax commits (atomic tmp-dir + rename)
is the staging dir swapped into the final name (at the next save, at
:func:`wait_for_checkpoints`, or on :func:`load_checkpoint`). The meta
sidecar moves in the same swap, so it never describes a checkpoint that
doesn't exist. A crash at ANY point leaves either the old committed
checkpoint, a committed staging dir (possibly alongside an older
committed final — the async window can span hours), or a half-swapped
pair (new data + old sidecar); :func:`promote_staging` adopts or
repairs all three on the next run — never a restorable torso, never
nothing. Multi-host: process 0 owns every filesystem mutation, with
:func:`_barrier` sync points so peers never race it on shared storage.
"""
from __future__ import annotations

import json
import shutil
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


_CKPTR: Optional[ocp.StandardCheckpointer] = None
_PYTREE_CKPTR: Optional[ocp.PyTreeCheckpointer] = None
# final-path str -> staging Path, for async saves whose commit->final
# swap is still outstanding.
_PENDING: Dict[str, Path] = {}

_STAGE_SUFFIX = ".next"


def _barrier(tag: str) -> None:
    """Cross-process sync point. Filesystem mutations here are done by
    process 0 only; every process must wait for them before acting on
    the directory (multi-host on shared storage)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(tag)


def _checkpointer() -> ocp.StandardCheckpointer:
    """Process-wide ``StandardCheckpointer`` — which IS an orbax
    ``AsyncCheckpointer``: ``save()`` returns once the arrays are staged
    to host and the write continues on a background thread. Reusing one
    instance is what lets back-to-back saves overlap training."""
    global _CKPTR
    if _CKPTR is None:
        _CKPTR = ocp.StandardCheckpointer()
    return _CKPTR


def _stage_for(path: Path) -> Path:
    return path.with_name(path.name + _STAGE_SUFFIX)


def _meta_for(path: Path) -> Path:
    return path.parent / (path.name + ".meta.json")


def _swap_into_place(final: Path, stage: Path) -> None:
    """Replace ``final`` with the committed ``stage`` (+ its sidecar)."""
    try:
        if final.exists():
            shutil.rmtree(final)
        stage.rename(final)
    except FileNotFoundError:
        # Lost a swap race to a concurrent process (multi-host resume on
        # shared storage, or a reader's promote racing the trainer): the
        # winner has already renamed the stage. Nothing left to do.
        return
    stage_meta = _meta_for(stage)
    if stage_meta.exists():
        stage_meta.replace(_meta_for(final))


def _complete_pending() -> None:
    """Swap every committed staging dir into its final name. Call only
    after ``wait_until_finished`` (the writes must have either committed
    or raised). Multi-process: only process 0 touches the filesystem."""
    had_pending = bool(_PENDING)
    for final_s in list(_PENDING):
        stage = _PENDING.pop(final_s)
        if jax.process_index() == 0 and is_finalized(stage):
            _swap_into_place(Path(final_s), stage)
    if had_pending:
        # Non-zero processes must not read (or re-stage over) the final
        # names until process 0's swaps land on shared storage.
        _barrier("complete-pending")


def wait_for_checkpoints() -> None:
    """Join any in-flight async checkpoint write and finish its
    commit->final swap (no-op when none). The Trainer calls this at the
    end of ``fit`` so readers (evaluator, serving, export) always see
    committed checkpoints under their final names."""
    if _CKPTR is not None:
        _CKPTR.wait_until_finished()
    _complete_pending()


def is_finalized(path) -> bool:
    """True iff ``path`` is a committed (fully written) orbax checkpoint.
    Orbax commits via atomic tmp-dir + rename, so an interrupted write
    leaves a ``*.orbax-checkpoint-tmp`` sibling, never the final name; a
    directory that exists under the name but lacks the orbax metadata
    (hand-made or foreign) is also rejected. Resume logic combines this
    with :func:`promote_staging` to never restore a torso
    (scripts/train.py, experiments/ablation.py)."""
    path = Path(path).absolute()
    try:
        return (path.exists()
                and (path / "_CHECKPOINT_METADATA").exists()
                and ocp.utils.is_checkpoint_finalized(path))
    except (ValueError, OSError):
        return False


def _meta_epoch(path: Path) -> Optional[int]:
    try:
        return int(json.loads(_meta_for(path).read_text())["epoch"])
    except (OSError, ValueError, TypeError, KeyError):
        return None


def promote_staging(path) -> bool:
    """Crash recovery: if a committed ``<path>.next`` staging dir exists,
    promote it over ``path`` — the protocol guarantees a surviving stage
    is strictly newer than its sibling final (``save_checkpoint`` deletes
    the stage before every write, and the swap deletes it on success), so
    this adopts the stage even when ``path`` itself is a committed
    checkpoint (the common hard-kill residue: the async write committed,
    the deferred swap never ran). As a belt-and-braces check the sidecar
    epochs are compared when both exist, and an older stage is left
    alone. Also repairs the half-swap torso (crash between the data
    rename and the sidecar rename: ``path`` holds the new data, the old
    meta, and an orphan stage sidecar survives). Returns whether ``path``
    is a committed checkpoint afterwards. Call before deciding what to
    resume from (``train.py --resume`` and the ablation runner do)."""
    path = Path(path).absolute()
    stage = _stage_for(path)
    stage_meta = _meta_for(stage)
    if jax.process_index() == 0:
        if is_finalized(stage):
            fe, se = _meta_epoch(path), _meta_epoch(stage)
            final_newer = (is_finalized(path) and fe is not None
                           and se is not None and fe > se)
            if not final_newer:
                _swap_into_place(path, stage)
        elif (stage_meta.exists() and not stage.exists()
              and is_finalized(path)):
            # Half-swap torso: finish the sidecar half of the swap.
            stage_meta.replace(_meta_for(path))
    _barrier(f"promote:{path}")
    return is_finalized(path)


def discard_staging(path) -> None:
    """Delete ``path``, its ``<path>.next`` staging dir and both meta
    sidecars (process 0 only; no-op for whatever doesn't exist). Callers
    invalidating a checkpoint (e.g. the Trainer deleting a stale
    preempt_model after a completed fit) must go through this so the
    staging-name convention lives in one module."""
    path = Path(path).absolute()
    if jax.process_index() == 0:
        for d in (path, _stage_for(path)):
            if d.exists():
                shutil.rmtree(d)
            meta = _meta_for(d)
            if meta.exists():
                meta.unlink()
    _barrier(f"discard:{path}")


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
    saves use this). The write goes to a ``<name>.next`` staging dir and
    is swapped into the final name only after commit — the previously
    committed checkpoint stays restorable throughout (module docstring).
    Join with :func:`wait_for_checkpoints`.
    """
    path = Path(path).absolute()
    ckptr = _checkpointer()
    tree = {"params": params}
    if opt_state is not None:
        tree["opt_state"] = opt_state
    if ema_params is not None:
        tree["ema_params"] = ema_params
    # Join + finish any earlier async save first (possibly to this same
    # path): the staging dir below must be free, and a committed earlier
    # write must land under its final name before we stage a newer one.
    ckptr.wait_until_finished()
    _complete_pending()
    stage = _stage_for(path)
    if jax.process_index() == 0:
        if stage.exists():
            # A torso from a crashed write (or an unclaimed committed
            # stage we are about to supersede with strictly newer data).
            shutil.rmtree(stage)
        # Reap orbax tmp-dir torsos from crashed writes in this directory
        # (cheap scan; nothing is in flight from this process right now).
        try:
            for tmp in ocp.utils.tmp_checkpoints(path.parent):
                # orbax 0.11+ returns TemporaryPath objects whose .get()
                # is the absolute tmp dir; older versions return names.
                tmp_path = (tmp.get() if hasattr(tmp, "get")
                            else path.parent / str(tmp))
                shutil.rmtree(str(tmp_path), ignore_errors=True)
        except (OSError, ValueError, TypeError):
            pass
    # Every process must see the cleaned directory before orbax starts
    # writing into it (no-op single-process).
    _barrier(f"stage-clean:{path}")
    ckptr.save(stage, tree)
    # Sidecar: written against the STAGING name now (tiny JSON), renamed
    # to the final name in the same swap as the data — the final meta
    # never describes an uncommitted checkpoint.
    meta = {"epoch": epoch, "best_val_loss": best_val_loss,
            "epochs_without_improvement": epochs_without_improvement,
            "metrics": _to_jsonable(metrics or {})}
    if config is not None:
        meta["config"] = (config.to_dict() if hasattr(config, "to_dict")
                          else _to_jsonable(config))
    if jax.process_index() == 0:
        _meta_for(stage).write_text(json.dumps(meta))
    _PENDING[str(path)] = stage
    if block:
        ckptr.wait_until_finished()
        _complete_pending()


def load_checkpoint(path, target: Any = None) -> Dict[str, Any]:
    """Load a checkpoint; returns {params, opt_state?, epoch, best_val_loss,
    metrics}. ``target`` (optional pytree of like-shaped arrays) restores
    with matching shardings/dtypes; without a target, everything restores as
    host numpy, so a checkpoint written on any device mesh loads on any
    other topology (single chip, CPU, different mesh)."""
    global _PYTREE_CKPTR
    # Same-process read-after-async-write safety + cross-run crash
    # recovery (adopt a committed-but-unswapped staging dir).
    wait_for_checkpoints()
    path = Path(path).absolute()
    promote_staging(path)
    if target is not None:
        tree = _checkpointer().restore(path, target=target)
    else:
        if _PYTREE_CKPTR is None:
            _PYTREE_CKPTR = ocp.PyTreeCheckpointer()
        ckptr = _PYTREE_CKPTR
        meta = ckptr.metadata(path).item_metadata
        meta_tree = meta.tree if hasattr(meta, "tree") else meta
        restore_args = jax.tree.map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta_tree)
        tree = ckptr.restore(path, restore_args=restore_args)
    meta_path = _meta_for(path)
    meta = json.loads(meta_path.read_text()) if meta_path.exists() else {}
    return {**tree, **meta}


def load_meta(path) -> Dict[str, Any]:
    """Read just the JSON metadata sidecar of a checkpoint (no array
    restore). Returns ``{}`` when the checkpoint has no sidecar. Joins any
    in-flight async save and adopts a committed-but-unswapped staging dir
    first, same as :func:`load_checkpoint`."""
    wait_for_checkpoints()
    path = Path(path).absolute()
    promote_staging(path)
    meta_path = _meta_for(path)
    return json.loads(meta_path.read_text()) if meta_path.exists() else {}


def update_meta(path, **fields) -> Dict[str, Any]:
    """Merge ``fields`` into a checkpoint's metadata sidecar (atomic
    replace; process 0 writes, all processes return the merged dict).

    Post-hoc annotations — e.g. the calibration temperature fitted *after*
    training (``scripts/evaluate.py --store_temperature``) — belong in the
    sidecar, not the array tree: rewriting the Orbax payload to add one
    scalar would re-serialize every weight and invalidate the staging
    protocol's crash guarantees, while the sidecar is a single tiny JSON
    whose replace is atomic on POSIX."""
    # Normalize ONCE so the barrier tag matches across processes even when
    # callers pass textually different but equivalent paths (the sibling
    # promote_staging/discard_staging normalize the same way).
    path = Path(path).absolute()
    meta = {**load_meta(path), **{k: _to_jsonable(v)
                                  for k, v in fields.items()}}
    if jax.process_index() == 0:
        meta_path = _meta_for(path)
        tmp = meta_path.parent / (meta_path.name + ".tmp")
        tmp.write_text(json.dumps(meta))
        tmp.replace(meta_path)
    _barrier(f"meta-update:{path}")
    return meta
