"""Tensor-parallel (2-D data x model mesh) sharding rules.

The reference is strictly single-device (SURVEY.md §2 item 17), so pure
data-parallel replication is *sufficient* for parity — but a TPU framework
should also scale the model dimension over ICI. This module provides the
idiomatic GSPMD recipe: a 2-D ``Mesh`` with axes ``("data", "model")`` and
``PartitionSpec`` rules for the transformer weights (Megatron-style
column/row sharding of the attention and MLP matmuls); XLA's sharding
propagation inserts the all-reduces. The train step itself is unchanged —
the same jit'd function runs 1-device, DP, or DP x TP depending only on how
its inputs are sharded.

Sharding rules (backbone transformer blocks):
- ``attn/qkv``  kernel ``(D, 3D)`` -> ``P(None, "model")`` (column), bias
  ``(3D,)`` -> ``P("model")``: each model shard computes a slice of the
  fused Q/K/V projection.
- ``attn/proj`` kernel ``(D, D)``  -> ``P("model", None)`` (row), bias
  replicated: contraction over the sharded dim ends the attention block
  with one psum over "model".
- ``mlp/fc1``   kernel ``(D, 4D)`` -> column; ``mlp/fc2`` ``(4D, D)`` ->
  row — the classic pair needing a single psum at fc2.
- Everything else (patch embed, LayerNorms, CLS/pos embeddings, task heads,
  KAN) is replicated: at DeiT-Tiny scale those are <4% of FLOPs and
  replication avoids tiny uneven shards.

Note: DeiT-Tiny has 3 attention heads; a model axis that does not divide
the head count still runs correctly (GSPMD reshards around the
``(B, N, 3, h, hd)`` reshape) at the cost of an extra collective — head
counts divisible by the model axis stay on the fast path.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path-suffix match, leaf name) -> spec. Order matters: first match wins.
_RULES = (
    (("attn", "qkv"), "kernel", P(None, "model")),
    (("attn", "qkv"), "bias", P("model")),
    (("attn", "proj"), "kernel", P("model", None)),
    (("attn", "proj"), "bias", P()),
    (("mlp", "fc1"), "kernel", P(None, "model")),
    (("mlp", "fc1"), "bias", P("model")),
    (("mlp", "fc2"), "kernel", P("model", None)),
    (("mlp", "fc2"), "bias", P()),
)


def _data_x_mesh(data: int, second: int, second_axis: str,
                 devices: Optional[Sequence]) -> Mesh:
    """Shared ("data", <axis>) mesh builder: resolves data=-1 to the
    remaining devices and validates the split."""
    if devices is None:
        devices = jax.devices()
    if data == -1:
        data = len(devices) // second
    if data < 1:
        raise ValueError(
            f"2-D mesh needs at least {second_axis} = {second} devices "
            f"(data axis resolved to {data} from {len(devices)} device(s))")
    n = data * second
    if n > len(devices):
        raise ValueError(f"need {n} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:n]).reshape(data, second),
                ("data", second_axis))


def make_2d_mesh(data: int = -1, model: int = 1,
                 devices: Optional[Sequence] = None) -> Mesh:
    """Mesh with axes ``("data", "model")`` over ``data * model`` devices."""
    return _data_x_mesh(data, model, "model", devices)


def seq_sharding(mesh: Mesh, axis: str = "model",
                 batch_axis: str = "data") -> NamedSharding:
    """Sequence-parallel activation sharding for the (B, N, D) residual
    stream: batch over ``batch_axis``, tokens over the tensor-parallel
    ``axis``.

    Megatron-style sequence parallelism, the GSPMD way: instead of manual
    reduce-scatter/all-gather calls, the residual stream is *annotated*
    P(batch_axis, axis, None) at every block boundary
    (models/vit.py::VisionTransformer.act_sharding) and XLA's propagation
    does the rest — LayerNorms, residual adds and dropout run token-sharded
    (1/S of the elementwise work and activation bytes per device), and each
    block's two TP all-reduces become reduce-scatter + all-gather pairs
    (identical ICI bytes: an all-reduce IS an RS+AG). The batch dim must be
    named explicitly: ``None`` in a NamedSharding spec means REPLICATED,
    not unconstrained, so leaving it out would all-gather the batch over
    the data axis at every block boundary — the inverse of SP's purpose.
    ``batch_axis`` is dropped from the spec if the mesh lacks it (pure-TP
    1-D mesh). Sharding annotations require divisibility, so a token count
    that does not divide the axis (197 is prime) is padded inside the model
    with attention-masked filler tokens (models/vit.py).
    """
    b = batch_axis if batch_axis in mesh.shape else None
    return NamedSharding(mesh, P(b, axis, None))


def make_moe_mesh(data: int = -1, expert: int = 1,
                  devices: Optional[Sequence] = None) -> Mesh:
    """Mesh with axes ``("data", "expert")`` for expert parallelism."""
    return _data_x_mesh(data, expert, "expert", devices)


def moe_param_specs(params: Any, axis: str = "expert") -> Any:
    """PartitionSpec pytree sharding the stacked MoE expert params
    (``blocks_i/moe/{w1,b1,w2,b2}``, leading dim = experts — models/moe.py)
    over ``axis``; the gate and all dense params stay replicated. Under a
    ``("data", "expert")`` mesh GSPMD turns the dispatch/combine einsums
    into all-to-alls over the expert axis — each device stores and runs
    E/ep experts. Compose with ``shard_params`` / ``shard_state`` exactly
    like the Megatron specs."""
    def spec_for(path, leaf):
        names = tuple(getattr(k, "key", getattr(k, "name", str(k)))
                      for k in path)
        if "moe" in names and names[-1] in ("w1", "w2", "b1", "b2"):
            return P(*((axis,) + (None,) * (leaf.ndim - 1)))
        return P()
    return jax.tree_util.tree_map_with_path(spec_for, params)


def _spec_for_path(path) -> P:
    names = tuple(getattr(k, "key", getattr(k, "name", str(k)))
                  for k in path)
    for suffix, leaf, spec in _RULES:
        if names[-1] == leaf and names[-1 - len(suffix):-1] == tuple(suffix):
            return spec
    return P()


def param_specs(params: Any) -> Any:
    """PartitionSpec pytree for a RoViT-KAN param tree (see module doc)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: _spec_for_path(path), params)


def shard_params(params: Any, mesh: Mesh, specs: Any = None) -> Any:
    """Device-put params onto ``mesh`` per ``specs`` (divisibility-checked:
    a dim not divisible by its mesh axis falls back to replicated)."""
    if specs is None:
        specs = param_specs(params)
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))

    def put(x, spec):
        # Per-axis fallback: a dim that doesn't divide its mesh axis is
        # nulled alone — the other dims keep their sharding (e.g. a 3-D
        # P("pipe", None, "model") leaf whose model dim doesn't divide tp
        # stays sharded over "pipe"; dropping that too would silently
        # replicate all depth/S blocks onto every device).
        if any(axis is not None and x.shape[dim] % axis_sizes[axis] != 0
               for dim, axis in enumerate(spec)):
            spec = P(*(None if (axis is not None
                                and x.shape[dim] % axis_sizes[axis] != 0)
                       else axis for dim, axis in enumerate(spec)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, params, specs,
                        is_leaf=lambda x: isinstance(x, P))


def shard_state(state: Any, mesh: Mesh, specs: Any = None) -> Any:
    """Shard a TrainState: params (and the optimizer moments, which optax
    lays out params-shaped) per ``specs``; everything else replicated."""
    from rovit_kan_tpu.parallel.mesh import replicate

    params = shard_params(state.params, mesh, specs)
    # Optimizer moments mirror the param tree, so the same rules apply
    # leaf-for-leaf wherever the structure matches.
    spec_tree = specs if specs is not None else param_specs(state.params)
    opt_state = _shard_opt_state(state.opt_state, state.params, mesh,
                                 spec_tree)
    rest = replicate({"rng": state.rng, "step": state.step}, mesh)
    out = state.replace(params=params, opt_state=opt_state,
                        rng=rest["rng"], step=rest["step"])
    # EMA params mirror the param tree -> same shardings.
    if getattr(state, "ema_params", None) is not None:
        out = out.replace(
            ema_params=shard_params(state.ema_params, mesh, specs))
    return out


def _shard_opt_state(opt_state, params, mesh: Mesh, spec_tree):
    """Walk the optax state; any subtree whose structure equals the param
    tree's is sharded with the param specs, all other leaves replicated."""
    from rovit_kan_tpu.parallel.mesh import replicate

    param_struct = jax.tree_util.tree_structure(params)

    def is_param_shaped(x):
        try:
            return jax.tree_util.tree_structure(x) == param_struct
        except Exception:
            return False

    def rec(node):
        if is_param_shaped(node):
            return shard_params(node, mesh, spec_tree)
        if hasattr(node, "_fields"):          # NamedTuple optax states
            return type(node)(*(rec(getattr(node, f))
                                for f in node._fields))
        if isinstance(node, (list, tuple)):
            return type(node)(rec(c) for c in node)
        if isinstance(node, dict):
            return {k: rec(v) for k, v in node.items()}
        return replicate(node, mesh)

    return rec(opt_state)
