"""Pipeline parallelism (GPipe schedule) for the transformer block stack.

The reference is strictly single-device (SURVEY.md §2 item 17); this module
completes the TPU parallelism portfolio (DP `mesh.py`, 2-D TP `tensor.py`,
multi-host `multihost.py`) with the third classic axis: the 12 blocks are
split into S contiguous *stages*, one per rank of a ``"pipe"`` mesh axis,
and microbatches stream through the stages with activations handed
stage-to-stage over ICI by ``jax.lax.ppermute`` inside ``shard_map``.

TPU-native design (the shard_map+ppermute recipe from the public scaling
playbook — NOT a port of any torch pipeline engine):

- **Param layout**: the per-block param subtrees (``backbone/blocks_i``,
  identical structures) are stacked on a leading depth axis into ONE
  ``backbone/blocks`` subtree sharded ``P("pipe")`` — each device *stores*
  only ``depth / S`` blocks, which is the whole point of pipeline
  parallelism (model memory scales 1/S). The tree keeps its top-level
  shape, so every path-keyed mechanism (backbone LR group, freeze mask,
  EMA, weight decay) works unchanged. ``split_params`` / ``merge_params``
  convert to and from the canonical checkpoint layout, so checkpoints
  stay layout-independent (the Trainer saves canonical).
- **Schedule**: classic GPipe. The local batch is cut into M microbatches;
  for ``t in range(M + S - 1)`` (a ``lax.scan`` — compiled once, no Python
  unrolling) every stage applies its blocks (an inner ``lax.scan`` over the
  local depth) to its current microbatch and ppermutes the activation to
  the next stage. Bubble fraction is the textbook ``(S-1)/(M+S-1)``.
  Each stage application is rematerialized on the backward pass by
  default (``jax.checkpoint``) so pipelined training stores per-tick
  stage inputs, not every block intermediate.
- **Everything outside the block stack** (patch embed, CLS/pos, final LN,
  task heads, loss) runs as plain GSPMD ops on the global arrays — sharded
  over ``"data"``, replicated over ``"pipe"`` — so the pipelined step
  composes with the existing DP story unchanged; XLA inserts the gradient
  psums over "data" exactly as in the 1-D mesh path.
- The whole schedule is differentiable (``ppermute``/``psum`` have exact
  transposes), so one ``jax.grad`` drives pipelined *training*. The
  Trainer runs its FULL step (augmentation, CutMix/MixUp, curriculum loss,
  freeze mask, EMA, AdamW) in this layout when given a pipeline mesh —
  see ``training/trainer.py`` and ``scripts/train.py --pipeline_parallel``.

At the flagship's 5.7M params pipeline parallelism is never *required*;
it exists for the scaled-up widths this framework also serves (the block
kernel is validated to d=768 — docs/VALIDATION.md "Scale generalization")
and to prove the framework's mesh story covers dp x tp x pp.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

DATA_AXIS = "data"
PIPE_AXIS = "pipe"
MODEL_AXIS = "model"


def make_pipeline_mesh(data: int = -1, pipe: int = 2, model: int = 1,
                       devices: Optional[Sequence] = None) -> Mesh:
    """Mesh with axes ``("data", "pipe")`` over ``data * pipe`` devices.

    With ``model > 1`` the mesh gains a third, innermost ``"model"`` axis —
    ``("data", "pipe", "model")`` — composing pipeline parallelism with
    Megatron-style tensor parallelism (``tensor.py`` rules applied within
    each pipeline stage). "model" is innermost so the per-block activation
    all-reduces (the most frequent collective) ride adjacent-device ICI;
    the once-per-tick ppermute over "pipe" tolerates the longer hops.
    """
    if devices is None:
        devices = jax.devices()
    if data == -1:
        data = len(devices) // (pipe * model)
    if data < 1:
        raise ValueError(
            f"pipeline mesh needs at least pipe*model = {pipe * model} "
            f"devices (data axis resolved to {data} from {len(devices)} "
            f"device(s))")
    n = data * pipe * model
    if n > len(devices):
        raise ValueError(f"need {n} devices, have {len(devices)}")
    if model > 1:
        return Mesh(np.asarray(devices[:n]).reshape(data, pipe, model),
                    (DATA_AXIS, PIPE_AXIS, MODEL_AXIS))
    return Mesh(np.asarray(devices[:n]).reshape(data, pipe),
                (DATA_AXIS, PIPE_AXIS))


def is_pipeline_mesh(mesh) -> bool:
    return mesh is not None and PIPE_AXIS in getattr(mesh, "axis_names", ())


def _block_keys(params: Dict[str, Any]) -> list:
    bb = params["backbone"]
    n = sum(1 for k in bb if k.startswith("blocks_"))
    return [f"blocks_{i}" for i in range(n)]


def split_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """Canonical tree -> pipelined layout: ``backbone/blocks_i`` subtrees
    stacked on a leading ``(depth, ...)`` axis as ONE ``backbone/blocks``
    subtree; everything else untouched. Inverse: :func:`merge_params`."""
    keys = _block_keys(params)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs),
                           *(params["backbone"][k] for k in keys))
    bb = {k: v for k, v in params["backbone"].items() if k not in keys}
    bb["blocks"] = stacked
    return {**{k: v for k, v in params.items() if k != "backbone"},
            "backbone": bb}


def merge_params(split: Dict[str, Any]) -> Dict[str, Any]:
    """Inverse of :func:`split_params` (the Trainer checkpoints through
    this, so pipelined checkpoints are canonical and evaluator/serving
    load them untouched)."""
    stacked = split["backbone"]["blocks"]
    depth = jax.tree.leaves(stacked)[0].shape[0]
    bb = {k: v for k, v in split["backbone"].items() if k != "blocks"}
    for i in range(depth):
        bb[f"blocks_{i}"] = jax.tree.map(lambda x: x[i], stacked)
    return {**{k: v for k, v in split.items() if k != "backbone"},
            "backbone": bb}


def pipeline_param_specs(split: Dict[str, Any], tp: bool = False) -> Any:
    """PartitionSpec tree for the pipelined layout: ``backbone/blocks``
    leaves shard their leading depth axis ``P("pipe")``, everything else
    replicates. Feed to ``tensor.shard_params`` / ``tensor.shard_state``
    (which also handles optimizer moments and divisibility checks).

    With ``tp=True`` (a mesh that also carries a ``"model"`` axis) each
    stacked block leaf additionally gets the Megatron column/row sharding
    from ``tensor._RULES`` on its trailing dims — e.g. the stacked qkv
    kernel ``(depth, D, 3D)`` becomes ``P("pipe", None, "model")`` — so a
    3-D dp x pp x tp mesh shards every block weight along BOTH the depth
    and the model dimension."""
    from rovit_kan_tpu.parallel.tensor import _spec_for_path

    def spec(path, _):
        names = tuple(getattr(k, "key", getattr(k, "name", str(k)))
                      for k in path)
        if names[:2] == ("backbone", "blocks"):
            inner = _spec_for_path(path) if tp else P()
            return P(PIPE_AXIS, *inner)
        return P()

    return jax.tree_util.tree_map_with_path(spec, split)


def shard_pipeline_params(split: Dict[str, Any], mesh: Mesh
                          ) -> Dict[str, Any]:
    from rovit_kan_tpu.parallel.tensor import shard_params
    tp = MODEL_AXIS in mesh.axis_names
    return shard_params(split, mesh, pipeline_param_specs(split, tp=tp))


def map_param_subtrees(tree: Any, template_params: Any, fn) -> Any:
    """Apply ``fn`` to every subtree of ``tree`` whose structure equals the
    param tree's (optimizer moments, EMA, grads); leave other leaves
    untouched. Used to convert optimizer state between canonical and
    pipelined layouts at checkpoint boundaries."""
    param_struct = jax.tree_util.tree_structure(template_params)

    def is_param_shaped(x):
        try:
            return jax.tree_util.tree_structure(x) == param_struct
        except Exception:
            return False

    def rec(node):
        if is_param_shaped(node):
            return fn(node)
        if hasattr(node, "_fields"):            # NamedTuple optax states
            return type(node)(*(rec(getattr(node, f))
                                for f in node._fields))
        if isinstance(node, (list, tuple)):
            return type(node)(rec(c) for c in node)
        if isinstance(node, dict):
            return {k: rec(v) for k, v in node.items()}
        return node

    return rec(tree)


def _flat_block(b: Dict[str, Any]) -> Dict[str, Any]:
    """Flax block param subtree -> the flat dict `_block_xla` consumes."""
    return {
        "ln1_scale": b["norm1"]["scale"], "ln1_bias": b["norm1"]["bias"],
        "wqkv": b["attn"]["qkv"]["kernel"], "bqkv": b["attn"]["qkv"]["bias"],
        "wproj": b["attn"]["proj"]["kernel"],
        "bproj": b["attn"]["proj"]["bias"],
        "ln2_scale": b["norm2"]["scale"], "ln2_bias": b["norm2"]["bias"],
        "w1": b["mlp"]["fc1"]["kernel"], "b1": b["mlp"]["fc1"]["bias"],
        "w2": b["mlp"]["fc2"]["kernel"], "b2": b["mlp"]["fc2"]["bias"],
    }


def pipeline_blocks(tokens: jnp.ndarray, stacked: Dict[str, Any],
                    mesh: Mesh, *, heads: int, n_micro: int,
                    remat: bool = True) -> jnp.ndarray:
    """Run the stacked block params over ``tokens`` with a GPipe schedule.

    Args:
        tokens: ``(B, N, D)`` global token array (sharded over "data" or
            replicated — any layout jit can reshard).
        stacked: pytree with leading ``(depth, ...)`` leaves
            (``split_params(...)["backbone"]["blocks"]``), depth divisible
            by the "pipe" axis size.
        mesh: mesh containing axes "data" and "pipe".
        heads: attention head count.
        n_micro: microbatches per local batch (must divide
            ``B / mesh.shape["data"]``).
        remat: rematerialize each stage application on the backward pass
            (``jax.checkpoint``). Backprop through the tick scan would
            otherwise store every block's intermediates for all
            ``M + S - 1`` ticks; with remat only the per-tick stage
            inputs are kept — the standard memory/FLOPs trade for
            pipelined training (on by default; the schedule's backward
            recomputes one extra forward per stage).

    Returns:
        ``(B, N, D)`` tokens after all ``depth`` blocks, numerically
        matching the sequential unfused forward (same per-block math as
        ``ops.block_kernel._block_xla``).
    """
    from rovit_kan_tpu.ops.block_kernel import _block_xla

    S = dict(zip(mesh.axis_names, mesh.devices.shape))[PIPE_AXIS]
    depth = jax.tree.leaves(stacked)[0].shape[0]
    if depth % S:
        raise ValueError(f"depth {depth} not divisible by pipe={S}")

    def run(x, params):                      # x: (B_loc, N, D) per shard
        stage = jax.lax.axis_index(PIPE_AXIS)
        B_loc, N, D = x.shape
        if B_loc % n_micro:
            raise ValueError(
                f"local batch {B_loc} not divisible by n_micro={n_micro}")
        mb = B_loc // n_micro
        xm = x.reshape(n_micro, mb, N, D)

        def apply_stage(y):
            def body(carry, p):
                return _block_xla(carry, _flat_block(p), heads), None
            y, _ = jax.lax.scan(body, y, params)
            return y

        if remat:
            apply_stage = jax.checkpoint(apply_stage)

        def tick(carry, t):
            buf, out = carry
            inp = jax.lax.dynamic_index_in_dim(
                xm, jnp.clip(t, 0, n_micro - 1), 0, keepdims=False)
            y = apply_stage(jnp.where(stage == 0, inp, buf))
            # Last stage banks its result once the pipe has filled.
            idx = jnp.clip(t - (S - 1), 0, n_micro - 1)
            w = ((stage == S - 1) & (t >= S - 1)).astype(y.dtype)
            cur = jax.lax.dynamic_index_in_dim(out, idx, 0, keepdims=False)
            out = jax.lax.dynamic_update_index_in_dim(
                out, cur * (1 - w) + y * w, idx, 0)
            buf = jax.lax.ppermute(
                y, PIPE_AXIS, [(i, (i + 1) % S) for i in range(S)])
            return (buf, out), None

        init = (jnp.zeros((mb, N, D), x.dtype),
                jnp.zeros((n_micro, mb, N, D), x.dtype))
        (_, out), _ = jax.lax.scan(tick, init,
                                   jnp.arange(n_micro + S - 1))
        # Broadcast the last stage's banked outputs to every pipe rank
        # (one all-reduce over "pipe"; rides ICI) so downstream GSPMD ops
        # see a pipe-replicated value.
        out = jax.lax.psum(
            jnp.where(stage == S - 1, out, 0).astype(jnp.float32),
            PIPE_AXIS).astype(x.dtype)
        return out.reshape(B_loc, N, D)

    # Partial-manual shard_map: "data" and "pipe" are manual (the schedule
    # indexes stages and ppermutes activations itself); any OTHER mesh axis
    # — notably "model" on a 3-D dp x pp x tp mesh — stays auto, so GSPMD
    # runs Megatron tensor parallelism *inside* each pipeline stage from
    # the param shardings alone (qkv/fc1 column, proj/fc2 row, one psum
    # per block riding the innermost-axis ICI).
    fn = jax.shard_map(
        run, mesh=mesh,
        in_specs=(P(DATA_AXIS), P(PIPE_AXIS)),
        out_specs=P(DATA_AXIS),
        axis_names={DATA_AXIS, PIPE_AXIS},
        check_vma=False,
    )
    # jit here (inlined when already under an outer jit) — remat's
    # closed_call can't be evaluated eagerly inside shard_map.
    return jax.jit(fn)(tokens, stacked)


def _embed(model, bb: Dict[str, Any], x: jnp.ndarray) -> jnp.ndarray:
    """Patch embed + CLS + pos — pure-function mirror of
    models/vit.py::VisionTransformer.__call__ lines 254-266."""
    dtype = model.dtype
    B, H, W, C = x.shape
    p = model.patch_size
    gh, gw = H // p, W // p
    x = x.reshape(B, gh, p, gw, p, C).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(B, gh * gw, p * p * C).astype(dtype)
    proj = bb["patch_embed"]["proj"]
    x = x @ proj["kernel"].astype(dtype) + proj["bias"].astype(dtype)
    cls = jnp.broadcast_to(bb["cls_token"], (B, 1, x.shape[-1]))
    x = jnp.concatenate([cls.astype(x.dtype), x], axis=1)
    return x + bb["pos_embed"].astype(x.dtype)


def _final_features(bb: Dict[str, Any], tokens: jnp.ndarray) -> jnp.ndarray:
    """Final LayerNorm (fp32) + CLS pooling (vit.py lines 291-293)."""
    t = tokens.astype(jnp.float32)
    mu = jnp.mean(t, axis=-1, keepdims=True)
    var = jnp.mean((t - mu) ** 2, axis=-1, keepdims=True)
    t = (t - mu) * jax.lax.rsqrt(var + 1e-6)
    t = t * bb["norm"]["scale"] + bb["norm"]["bias"]
    return t[:, 0]


def _apply_heads(model, params: Dict[str, Any], feats: jnp.ndarray,
                 deterministic: bool = True,
                 rng: Optional[jax.Array] = None) -> Dict[str, jnp.ndarray]:
    """Task heads on the CLS feature, applied from their param subtrees.
    With ``deterministic=False`` each head draws its dropout mask from a
    fold of ``rng`` (a different stream than the flax-path-derived keys of
    ``model.apply`` — equally valid dropout, not bit-identical)."""
    from rovit_kan_tpu.models.heads import (
        ClassificationHead, OrdinalHead, UncertaintyHead)
    from rovit_kan_tpu.models.kan import KANSeverityModule

    def rngs(i):
        if deterministic or rng is None:
            return None
        return {"dropout": jax.random.fold_in(rng, i)}

    B = feats.shape[0]
    out = {
        "features": feats,
        "cls_logits": ClassificationHead(
            model.hidden_dim, model.num_classes, model.dropout).apply(
            {"params": params["classification_head"]}, feats,
            deterministic, rngs=rngs(0)),
    }
    if model.with_ordinal:
        out["ordinal_logits"] = OrdinalHead(
            model.hidden_dim, model.num_classes, model.dropout).apply(
            {"params": params["ordinal_head"]}, feats, deterministic,
            rngs=rngs(1))
    else:
        out["ordinal_logits"] = jnp.zeros((B, model.num_classes - 1))
    if model.with_uncertainty:
        mu, log_var = UncertaintyHead(
            model.hidden_dim, model.dropout).apply(
            {"params": params["uncertainty_head"]}, feats, deterministic,
            rngs=rngs(2))
    else:
        mu, log_var = jnp.zeros((B, 1)), jnp.zeros((B, 1))
    out["mu"], out["log_var"] = mu, log_var
    if model.with_kan:
        out["kan_severity"] = KANSeverityModule(
            tuple(model.kan_layers), model.kan_num_knots,
            model.kan_degree).apply({"params": params["kan_module"]}, feats)
    else:
        out["kan_severity"] = jnp.zeros((B, 1))
    return out


def pipelined_forward(model, split: Dict[str, Any], images: jnp.ndarray,
                      mesh: Mesh, *, n_micro: int = 4, remat: bool = True,
                      deterministic: bool = True,
                      rng: Optional[jax.Array] = None
                      ) -> Dict[str, jnp.ndarray]:
    """Full RoViT-KAN forward with the block stack pipelined over "pipe".

    ``split`` is the pipelined param layout (:func:`split_params`).
    Numerically matches ``model.apply`` on the merged params (unfused XLA
    path) — asserted in tests/test_pipeline.py.
    """
    tokens = _embed(model, split["backbone"], images)
    tokens = pipeline_blocks(tokens, split["backbone"]["blocks"], mesh,
                             heads=model.num_heads, n_micro=n_micro,
                             remat=remat)
    feats = _final_features(split["backbone"], tokens)
    return _apply_heads(model, split, feats, deterministic, rng)


def make_pipelined_train_step(model, mesh: Mesh, optimizer, *,
                              n_micro: int = 4, stage: int = 4,
                              head_mask: Optional[Dict[str, bool]] = None):
    """Minimal jitted dp x pp training step over the pipelined param tree
    (joint loss + optimizer update; no augmentation/EMA — for the FULL
    curriculum step in this layout use ``Trainer`` with a pipeline mesh).

    Returns ``step(split_params, opt_state, batch) -> (split_params,
    opt_state, metrics)`` where ``batch`` holds normalized fp32 ``images``
    (B, H, W, 3), int ``labels`` and float ``severity``; B is sharded over
    "data" and the block params over "pipe".
    """
    import optax

    from rovit_kan_tpu.training.losses import joint_loss

    mask = head_mask or model.head_mask

    def loss_fn(split, batch):
        out = pipelined_forward(model, split, batch["images"], mesh,
                                n_micro=n_micro)
        losses = joint_loss(out, batch["labels"], batch["severity"],
                            stage, head_mask=mask)
        return losses["total_loss"], losses

    @jax.jit
    def step(split, opt_state, batch):
        (_, losses), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(split, batch)
        updates, opt_state = optimizer.update(grads, opt_state, split)
        split = optax.apply_updates(split, updates)
        return split, opt_state, losses

    return step
