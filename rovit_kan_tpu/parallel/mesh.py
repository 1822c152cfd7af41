"""Device mesh + sharding utilities.

The reference has no distributed layer at all (single-process PyTorch;
SURVEY.md §2 item 17). The TPU-native scaling story is batch data-parallel
over ICI: a 1-D ``jax.sharding.Mesh`` with the batch dimension sharded and
params replicated. Gradients are averaged by XLA-inserted psum when the
jit'd loss reduces over the sharded batch dimension — no hand-written
collectives needed at this model scale (5.7M params), and the same code runs
single-chip (mesh of 1) through multi-host (mesh over DCN) unchanged.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int = -1, axis_name: str = "data",
              devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices == -1:
        n_devices = len(devices)
    return Mesh(np.asarray(devices[:n_devices]), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis_name: str = "data") -> Any:
    """Device-put a host batch with the leading dim sharded over the mesh.

    Multi-host aware: under ``jax.distributed`` (process_count > 1) every
    process passes the SAME logical global batch (loaders are seeded
    identically on every host); each host device_puts only its
    ``local_batch_slice`` rows and the shards are assembled into one global
    array — no host ever materializes remote rows on device.
    """
    s = batch_sharding(mesh, axis_name)
    if jax.process_count() > 1:
        from rovit_kan_tpu.parallel.multihost import local_batch_slice

        def put(x):
            sl = local_batch_slice(x.shape[0])
            return jax.make_array_from_process_local_data(s, x[sl])

        return jax.tree.map(put, batch)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Device-put a pytree fully replicated over the mesh."""
    s = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)
