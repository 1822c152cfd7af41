"""Multi-host (multi-process) SPMD support.

The data-parallel design in ``mesh.py`` is topology-agnostic: the same
jit'd train step runs on a mesh spanning multiple hosts once
``jax.distributed`` is initialized — XLA routes the gradient psum over ICI
within a slice and DCN across slices automatically. This module holds the
process-level glue:

- ``maybe_initialize_distributed()``: idempotent ``jax.distributed``
  bring-up from standard env vars (no-op single-host, where TPU pods'
  auto-bootstrap also works with zero args).
- ``global_mesh()``: a mesh over ALL devices (local + remote).
- ``local_batch_slice()``: which rows of the global batch this host feeds —
  hosts each load 1/num_processes of every batch; ``make_global_array``
  assembles the host shards into one globally-sharded array.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_initialized = False


def maybe_initialize_distributed(coordinator_address: Optional[str] = None,
                                 num_processes: Optional[int] = None,
                                 process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed once. On TPU pods all args auto-detect;
    elsewhere they come from the args or JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID. Returns True if distributed mode is
    active."""
    global _initialized
    if _initialized:
        return jax.process_count() > 1
    import os
    coordinator_address = (coordinator_address
                           or os.environ.get("JAX_COORDINATOR_ADDRESS"))
    if coordinator_address is None and jax.process_count() == 1:
        return False           # plain single-process run
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes or int(
                os.environ.get("JAX_NUM_PROCESSES", 0)) or None,
            process_id=process_id if process_id is not None else (
                int(os.environ["JAX_PROCESS_ID"])
                if "JAX_PROCESS_ID" in os.environ else None),
        )
        _initialized = True
    except RuntimeError:
        _initialized = True    # already initialized elsewhere
    return jax.process_count() > 1


def global_mesh(axis_name: str = "data") -> Mesh:
    """1-D data mesh over every device in the job (all hosts)."""
    return Mesh(np.asarray(jax.devices()), (axis_name,))


def local_batch_slice(global_batch_size: int) -> slice:
    """The contiguous row range of the global batch this process loads.

    Raises when the batch does not divide evenly — silent truncation would
    drop trailing rows from every batch on every host."""
    n_proc = jax.process_count()
    if global_batch_size % n_proc:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by "
            f"{n_proc} processes — pad or resize the batch")
    per = global_batch_size // n_proc
    start = per * jax.process_index()
    return slice(start, start + per)


def make_global_array(local_rows: Any, mesh: Mesh,
                      axis_name: str = "data"):
    """Assemble per-host batch shards into one global jax.Array sharded
    over the mesh (wraps ``jax.make_array_from_process_local_data``)."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, x),
        local_rows)
