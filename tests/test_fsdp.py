"""FSDP (ZeRO-3) correctness: sharding params/moments/EMA over the data
axis must not change the math — one train step under FSDP matches the
replicated-DP step bit-for-bit up to collective reduction order — while
the state actually lives sharded (1/dp per device, no silent gather).

The reference is single-device (SURVEY.md §2 item 17); parallel/fsdp.py
is the GSPMD recipe: specs only, XLA derives the gather/scatter schedule.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from rovit_kan_tpu.config import get_config
from rovit_kan_tpu.models.rovit_kan import RoViTKAN
from rovit_kan_tpu.parallel.fsdp import fsdp_param_specs, sharded_size
from rovit_kan_tpu.parallel.mesh import make_mesh, shard_batch
from rovit_kan_tpu.parallel.tensor import make_2d_mesh
from rovit_kan_tpu.training.trainer import Trainer


def _model():
    return RoViTKAN(embed_dim=32, depth=1, num_heads=2, image_size=32,
                    patch_size=16, kan_layers=(32, 8, 1), hidden_dim=16,
                    use_pallas_attention=False, use_pallas_kan=False)


def _setup(mesh, specs_fn=None):
    cfg = get_config()
    cfg.data.image_size = 32
    cfg.train.batch_size = 16
    cfg.flags.mixed_precision = False
    cfg.flags.use_mixup = False          # keep the step deterministic
    cfg.flags.use_cutmix = False
    cfg.train.ema_decay = 0.999          # EMA tree must shard too
    model = _model()
    specs = None
    if specs_fn is not None:
        dummy = np.zeros((1, 32, 32, 3), np.float32)
        shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                                dummy)["params"]
        specs = specs_fn(shapes)
    trainer = Trainer(model, None, None, cfg, mesh=mesh, seed=0,
                      param_specs=specs)
    return cfg, model, trainer


def _batch(seed=0, bs=16):
    rng = np.random.RandomState(seed)
    return {
        "images": rng.randint(0, 256, (bs, 32, 32, 3)).astype(np.uint8),
        "labels": rng.randint(0, 4, (bs,)).astype(np.int32),
        "severity": rng.randint(0, 4, (bs,)).astype(np.float32),
    }


def test_fsdp_specs_pick_largest_divisible_dim():
    mesh = make_mesh(8)
    params = {
        "big": jax.ShapeDtypeStruct((32, 96), jnp.float32),
        "tall": jax.ShapeDtypeStruct((128, 17), jnp.float32),  # 17 % 8 != 0
        "bias": jax.ShapeDtypeStruct((96,), jnp.float32),      # < min_size
        "odd": jax.ShapeDtypeStruct((17, 33), jnp.float32),    # nothing fits
    }
    specs = fsdp_param_specs(params, mesh, min_size=256)
    assert specs["big"] == P(None, "data")    # 96 > 32, both divisible
    assert specs["tall"] == P("data")         # only 128 divides by 8
    assert specs["bias"] == P()               # small leaves replicated
    assert specs["odd"] == P()                # fallback: fully replicated


def test_fsdp_specs_compose_with_tp():
    """With tp=True the Megatron rule claims its dim and FSDP shards the
    largest remaining one: qkv (D, 3D) -> P('data', 'model')."""
    mesh = make_2d_mesh(4, 2)
    model = _model()
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                            np.zeros((1, 32, 32, 3), np.float32))["params"]
    specs = fsdp_param_specs(shapes, mesh, min_size=256, tp=True)
    blk = specs["backbone"]["blocks_0"]
    assert blk["attn"]["qkv"]["kernel"] == P("data", "model")
    assert blk["mlp"]["fc2"]["kernel"] == P("model", "data")
    # Non-TP leaves still get plain FSDP: patch embed (768, 32) -> dim 0.
    assert specs["backbone"]["patch_embed"]["proj"]["kernel"] == P("data")


def test_fsdp_specs_require_axis():
    mesh = make_2d_mesh(4, 2)
    with pytest.raises(ValueError, match="no 'absent' axis"):
        fsdp_param_specs({}, mesh, axis="absent")


def test_fsdp_tp_requires_model_axis():
    """tp=True on a 1-D data mesh must fail loudly, not emit specs that
    KeyError deep inside shard_params."""
    with pytest.raises(ValueError, match="'model' axis"):
        fsdp_param_specs({}, make_mesh(8), tp=True)


def test_fsdp_state_layout():
    """Params, optax moments AND EMA live sharded over 'data'."""
    mesh = make_mesh(8)
    cfg, model, trainer = _setup(
        mesh, lambda s: fsdp_param_specs(s, mesh, min_size=256))
    state = trainer.init_state()
    qkv = state.params["backbone"]["blocks_0"]["attn"]["qkv"]["kernel"]
    assert not qkv.sharding.is_fully_replicated
    # 8-way split of the 96-wide fused qkv output.
    shard_shapes = {tuple(s.data.shape) for s in qkv.addressable_shards}
    assert shard_shapes == {(32, 12)}
    moments = [l for l in jax.tree.leaves(state.opt_state)
               if getattr(l, "shape", None) == qkv.shape]
    assert moments and all(
        not m.sharding.is_fully_replicated for m in moments)
    assert state.ema_params is not None
    eq = state.ema_params["backbone"]["blocks_0"]["attn"]["qkv"]["kernel"]
    assert not eq.sharding.is_fully_replicated
    assert state.step.sharding.is_fully_replicated


def test_fsdp_step_matches_single_device():
    """One FSDP train step vs the 1-device baseline: same loss and params,
    and the updated params are STILL sharded (ZeRO survives the update)."""
    batch = _batch()
    mesh1 = make_mesh(1)
    _, _, tr1 = _setup(mesh1)
    s1 = tr1.init_state()
    s1, m1 = tr1.train_step(s1, shard_batch(batch, mesh1), jnp.int32(4),
                            jnp.float32(1.0), jnp.float32(0.0))

    mesh = make_mesh(8)
    _, _, tr = _setup(
        mesh, lambda s: fsdp_param_specs(s, mesh, min_size=256))
    s = tr.init_state()
    s, m = tr.train_step(s, shard_batch(batch, mesh), jnp.int32(4),
                         jnp.float32(1.0), jnp.float32(0.0))
    assert float(m1["total_loss"]) == pytest.approx(
        float(m["total_loss"]), rel=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)
    qkv = s.params["backbone"]["blocks_0"]["attn"]["qkv"]["kernel"]
    assert not qkv.sharding.is_fully_replicated


def test_fsdp_tp_hybrid_step():
    """FSDP + TP on a (data=4, model=2) mesh: parity with 1 device and the
    qkv kernel stays 2-D-sharded after the update."""
    batch = _batch()
    mesh1 = make_mesh(1)
    _, _, tr1 = _setup(mesh1)
    s1 = tr1.init_state()
    s1, m1 = tr1.train_step(s1, shard_batch(batch, mesh1), jnp.int32(4),
                            jnp.float32(1.0), jnp.float32(0.0))

    mesh = make_2d_mesh(4, 2)
    _, _, tr = _setup(
        mesh, lambda s: fsdp_param_specs(s, mesh, min_size=256, tp=True))
    s = tr.init_state()
    s, m = tr.train_step(s, shard_batch(batch, mesh), jnp.int32(4),
                         jnp.float32(1.0), jnp.float32(0.0))
    assert float(m1["total_loss"]) == pytest.approx(
        float(m["total_loss"]), rel=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)
    qkv = s.params["backbone"]["blocks_0"]["attn"]["qkv"]["kernel"]
    assert not qkv.sharding.is_fully_replicated
    # Both mesh axes used: each shard is (32/4, 96/2).
    shard_shapes = {tuple(x.data.shape) for x in qkv.addressable_shards}
    assert shard_shapes == {(8, 48)}


def test_sharded_size_accounting():
    mesh = make_mesh(8)
    tree = {"w": jnp.zeros((64, 128), jnp.float32),
            "b": jnp.zeros((128,), jnp.float32)}
    specs = {"w": P(None, "data"), "b": P()}
    # w shards 8-way (64*128*4/8 bytes); b replicates fully.
    assert sharded_size(tree, specs, mesh) == 64 * 128 * 4 // 8 + 128 * 4
