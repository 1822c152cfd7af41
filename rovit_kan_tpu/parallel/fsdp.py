"""Fully-sharded data parallelism (ZeRO-3 / FSDP) — the GSPMD way.

The reference is single-device (SURVEY.md §2 item 17); this module adds the
last classic scaling axis to the parallel portfolio (DP ``mesh.py``, TP
``tensor.py``, PP ``pipeline.py``, SP ``tensor.seq_sharding``, EP
``models/moe.py``): parameters, gradients, optimizer moments and EMA are
*sharded over the data axis* instead of replicated, so per-device state
memory scales 1/dp. At the 5.7M-param flagship FSDP is never required; it
exists for the scaled-up widths this framework also serves (the block
kernel is validated to d=768) and for fine-tuning regimes where optimizer
state, not activations, caps the batch.

TPU-native design — no hand-written gather/scatter machinery (contrast a
torch FSDP engine's flattening, bucketing and hooks): each parameter leaf
is *annotated* with a PartitionSpec that shards its largest divisible
dimension over ``"data"``, and XLA's sharding propagation derives the
ZeRO-3 schedule from the layout alone:

- forward/backward: each weight is all-gathered just before use and the
  gathered copy is discarded after — peak param memory is one layer's
  weights, not the model's.
- gradients: the batch-reduction psum over "data" becomes a
  reduce-scatter straight into the sharded layout (an all-reduce IS
  RS+AG; dropping the AG is exactly ZeRO's saving).
- optimizer update: runs fully sharded — each device updates only its
  1/dp slice of params and moments (``tensor.shard_state`` lays the
  optax moments and EMA out with the same specs, leaf-for-leaf).

The train step itself is unchanged: the same jit'd function runs
replicated-DP or FSDP depending only on how its inputs are sharded
(``Trainer(..., param_specs=fsdp_param_specs(...))``).

Composition: with ``tp=True`` the Megatron rules from ``tensor._RULES``
claim their dimension first and FSDP shards the largest *remaining* free
dimension over "data" — e.g. the qkv kernel ``(D, 3D)`` becomes
``P("data", "model")``, fully 2-D-sharded (the standard FSDP+TP hybrid).
Pipeline and expert parallelism keep their own layouts (stacked
``P("pipe")`` / ``P("expert")`` trees) and are not composed here.

Small leaves (LayerNorm scales, biases, the KAN spline grids — anything
under ``min_size`` elements) stay replicated: gathering a 192-float
vector costs more in collective latency than its replication costs in
HBM, the same cutoff reasoning as tensor.py's replicated-everything-else
rule.
"""
from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, PartitionSpec as P

DATA_AXIS = "data"


def fsdp_param_specs(params: Any, mesh: Mesh, *, axis: str = DATA_AXIS,
                     min_size: int = 4096, tp: bool = False) -> Any:
    """PartitionSpec pytree sharding every large param leaf over ``axis``.

    For each leaf the largest dimension divisible by the axis size (and
    not already claimed by a Megatron rule when ``tp=True``) is sharded;
    leaves with fewer than ``min_size`` elements, or no divisible free
    dimension, keep their base (TP or replicated) spec. Feed the result
    to ``Trainer(param_specs=...)`` / ``tensor.shard_state`` — both also
    apply it to optimizer moments and EMA, which is where ZeRO's memory
    saving lives (AdamW's m/v are 2x params in fp32).

    ``params`` may be real arrays or ``jax.eval_shape`` structs (train.py
    derives specs structure-only, before any weights exist).
    """
    n = dict(zip(mesh.axis_names, mesh.devices.shape)).get(axis)
    if n is None:
        raise ValueError(f"mesh {mesh.axis_names} has no '{axis}' axis")
    if tp and "model" not in mesh.axis_names:
        raise ValueError(
            f"tp=True needs a 'model' axis on the mesh (got "
            f"{mesh.axis_names}); the Megatron rules would emit specs "
            f"referencing a missing axis")

    def trim(entries):
        while entries and entries[-1] is None:
            entries = entries[:-1]
        return P(*entries)

    def spec_for(path, leaf):
        if tp:
            from rovit_kan_tpu.parallel.tensor import _spec_for_path
            base = tuple(_spec_for_path(path))
        else:
            base = ()
        base = base + (None,) * (leaf.ndim - len(base))
        if leaf.size < min_size or n == 1:
            return trim(base)
        free = [(leaf.shape[d], d) for d in range(leaf.ndim)
                if base[d] is None and leaf.shape[d] % n == 0
                and leaf.shape[d] >= n]
        if not free:
            return trim(base)
        _, d = max(free)
        return trim(tuple(axis if i == d else base[i]
                          for i in range(leaf.ndim)))

    return jax.tree_util.tree_map_with_path(spec_for, params)


def sharded_size(tree: Any, specs: Any, mesh: Mesh) -> int:
    """Per-device bytes of ``tree`` under ``specs`` (diagnostic: the
    README/SCALING numbers quote replicated vs FSDP state memory)."""
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))

    def leaf_bytes(x, spec):
        shards = 1
        for ax in spec:
            if ax is not None:
                shards *= sizes[ax]
        return x.size * x.dtype.itemsize // shards

    return sum(jax.tree.leaves(jax.tree.map(
        leaf_bytes, tree, specs, is_leaf=lambda x: isinstance(x, P))))
