"""SPMD data-parallel correctness: the same train step on a 1-device and an
8-device mesh must produce identical losses and parameter updates (XLA
inserts the gradient psum; batch stats must not depend on the sharding)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rovit_kan_tpu.config import get_config
from rovit_kan_tpu.models.rovit_kan import RoViTKAN
from rovit_kan_tpu.parallel.mesh import (
    make_mesh, shard_batch, replicate, batch_sharding)
from rovit_kan_tpu.training.trainer import Trainer, make_eval_step


def _setup(n_dev):
    cfg = get_config()
    cfg.data.image_size = 32
    cfg.train.batch_size = 16
    cfg.flags.mixed_precision = False
    cfg.flags.use_mixup = False          # keep the step deterministic
    cfg.flags.use_cutmix = False
    model = RoViTKAN(embed_dim=32, depth=1, num_heads=2, image_size=32,
                     patch_size=16, kan_layers=(32, 8, 1), hidden_dim=16,
                     use_pallas_attention=False, use_pallas_kan=False)
    mesh = make_mesh(n_dev)
    trainer = Trainer(model, None, None, cfg, mesh=mesh, seed=0)
    return cfg, model, mesh, trainer


def _batch(seed=0, bs=16):
    rng = np.random.RandomState(seed)
    return {
        "images": rng.randint(0, 256, (bs, 32, 32, 3)).astype(np.uint8),
        "labels": rng.randint(0, 4, (bs,)).astype(np.int32),
        "severity": rng.randint(0, 4, (bs,)).astype(np.float32),
    }


def test_eight_device_mesh_available():
    assert len(jax.devices()) >= 8


def test_dp_step_matches_single_device():
    batch = _batch()
    results = {}
    for n_dev in (1, 8):
        cfg, model, mesh, trainer = _setup(n_dev)
        state = trainer.init_state()
        sharded = shard_batch(batch, mesh)
        state, metrics = trainer.train_step(
            state, sharded, jnp.int32(4), jnp.float32(1.0), jnp.float32(0.0))
        # A second step exercises the updated params.
        state, metrics2 = trainer.train_step(
            state, shard_batch(_batch(1), mesh), jnp.int32(4),
            jnp.float32(1.0), jnp.float32(0.0))
        results[n_dev] = (float(metrics["total_loss"]),
                          float(metrics2["total_loss"]),
                          np.asarray(jax.tree.leaves(state.params)[0]))

    l1a, l1b, p1 = results[1]
    l8a, l8b, p8 = results[8]
    assert l1a == pytest.approx(l8a, rel=1e-5)
    assert l1b == pytest.approx(l8b, rel=1e-5)
    np.testing.assert_allclose(p1, p8, atol=1e-6)


def test_batch_sharding_layout():
    _, _, mesh, _ = _setup(8)
    batch = shard_batch(_batch(bs=16), mesh)
    s = batch["images"].sharding
    assert s.is_equivalent_to(batch_sharding(mesh), ndim=4)
    # 16-row batch over 8 devices -> 2 rows per shard.
    shard_shapes = {tuple(sh.data.shape) for sh in batch["images"].addressable_shards}
    assert shard_shapes == {(2, 32, 32, 3)}


def test_eval_step_on_mesh():
    cfg, model, mesh, trainer = _setup(8)
    state = trainer.init_state()
    batch = _batch()
    batch["valid"] = np.ones(16, np.float32)
    m = trainer.eval_step(state.params, shard_batch(batch, mesh))
    assert float(m["n"]) == 16.0
    assert np.isfinite(float(m["total_loss"]))


def test_replicated_params_layout():
    _, _, mesh, trainer = _setup(8)
    state = trainer.init_state()
    leaf = jax.tree.leaves(state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_scanned_epoch_dp_matches_single_device():
    """DeviceLoader + scanned lax.scan epoch on an 8-device mesh must match
    the 1-device scanned run (batch sharding constraint keeps it SPMD)."""
    from rovit_kan_tpu.data.device_cache import DeviceLoader

    class ArrayDS:
        def __init__(self, n=32):
            rng = np.random.RandomState(0)
            self.imgs = rng.randint(0, 256, (n, 32, 32, 3)).astype(np.uint8)
            self.labels = rng.randint(0, 4, n)

        def __len__(self):
            return len(self.imgs)

        def __getitem__(self, i):
            return self.imgs[i], int(self.labels[i]), float(self.labels[i])

    results = {}
    for n_dev in (1, 8):
        cfg, model, mesh, _ = _setup(n_dev)
        train = DeviceLoader(ArrayDS(), 16, shuffle=True, drop_last=True,
                             seed=5, mesh=mesh)
        val = DeviceLoader(ArrayDS(), 16, mesh=mesh)
        trainer = Trainer(model, train, val, cfg, mesh=mesh, seed=0)
        state = trainer.init_state()
        state, m1 = trainer.train_epoch(state, epoch=10)  # stage 4, live bb
        v = trainer.val_epoch(state)
        results[n_dev] = (m1["total_loss"], v["total_loss"], v["accuracy"],
                          np.asarray(jax.tree.leaves(state.params)[0]))

    t1, v1, a1, p1 = results[1]
    t8, v8, a8, p8 = results[8]
    assert t1 == pytest.approx(t8, rel=1e-5)
    assert v1 == pytest.approx(v8, rel=1e-5)
    assert a1 == pytest.approx(a8, abs=1e-6)
    np.testing.assert_allclose(p1, p8, atol=1e-6)


# ---------------------------------------------------------------------------
# Sharded device cache (data stored P("data"), shard-local gathers)
# ---------------------------------------------------------------------------

class _IdDS:
    """Synthetic dataset whose image pixels encode the sample id."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        img = np.full((32, 32, 3), i, np.uint8)
        return img, int(i % 4), float(i % 4)


def test_sharded_cache_storage_and_coverage():
    """P(\"data\") storage holds 1/dp per device; iterating covers every
    sample exactly once with correct (image, label, severity) triples."""
    from rovit_kan_tpu.data.device_cache import DeviceLoader
    _, _, mesh, _ = _setup(8)
    n = 29                                    # not divisible by dp=8
    loader = DeviceLoader(_IdDS(n), 16, mesh=mesh, shard_data=True)

    rows_per = -(-n // 8)
    shard = loader._images.addressable_shards[0].data
    assert shard.shape[0] == rows_per        # 1/dp of padded storage
    assert loader._images.shape[0] == rows_per * 8

    seen = []
    for batch in loader:
        imgs = np.asarray(batch["images"])
        labels = np.asarray(batch["labels"])
        sev = np.asarray(batch["severity"])
        valid = np.asarray(batch["valid"])
        for j in range(imgs.shape[0]):
            if valid[j]:
                gid = int(imgs[j, 0, 0, 0])   # pixel encodes sample id
                assert labels[j] == gid % 4
                assert sev[j] == float(gid % 4)
                seen.append(gid)
    assert sorted(seen) == list(range(n))     # every sample exactly once


def test_sharded_cache_scanned_train_bit_equal_replicated():
    """The sharded-gather scanned epoch is bit-equal to the replicated
    scanned epoch fed the SAME global batch composition (the strided
    local->global index map)."""
    from rovit_kan_tpu.data.device_cache import DeviceLoader
    from rovit_kan_tpu.training.trainer import make_scanned_epoch

    cfg, model, mesh, _ = _setup(8)
    ds = _IdDS(32)
    sh = DeviceLoader(ds, 16, shuffle=True, drop_last=True, seed=5,
                      mesh=mesh, shard_data=True)
    re = DeviceLoader(ds, 16, shuffle=True, drop_last=True, seed=5,
                      mesh=mesh)

    results = {}
    for name, loader in (("sharded", sh), ("replicated", re)):
        trainer = Trainer(model, loader, None, cfg, mesh=mesh, seed=0)
        state = trainer.init_state()
        ep = make_scanned_epoch(trainer._step_core, mesh=mesh,
                                sharded_gather=(name == "sharded"))
        if name == "sharded":
            idx = sh.epoch_index_plan()       # (steps, dp, bpd) locals
        else:
            # Regenerate the FIRST epoch's stratified plan on a fresh twin
            # loader and map it local->global (strided assignment:
            # global = local*dp + shard) so both arms see identical sample
            # content at every batch position.
            twin = DeviceLoader(ds, 16, shuffle=True, drop_last=True,
                                seed=5, mesh=mesh, shard_data=True)
            plan = twin.epoch_index_plan()
            s_ids = np.arange(8)[None, :, None]
            idx = (plan * 8 + s_ids).reshape(plan.shape[0], -1)
        images, labels, severity = loader.arrays
        state, m = ep(state, images, labels, severity, jnp.asarray(idx),
                      jnp.int32(4), jnp.float32(1.0), jnp.float32(0.0))
        results[name] = (float(m["total_loss"]),
                         np.asarray(jax.tree.leaves(state.params)[0]))

    loss_s, p_s = results["sharded"]
    loss_r, p_r = results["replicated"]
    assert loss_s == pytest.approx(loss_r, rel=1e-6)
    np.testing.assert_allclose(p_s, p_r, atol=1e-6)


def test_sharded_cache_trainer_end_to_end():
    """Full Trainer loop (scanned train + scanned val) on sharded loaders;
    val metrics equal the replicated-cache val on the same 32 samples."""
    from rovit_kan_tpu.data.device_cache import DeviceLoader

    cfg, model, mesh, _ = _setup(8)
    ds = _IdDS(32)
    sh_t = DeviceLoader(ds, 16, shuffle=True, drop_last=True, seed=5,
                        mesh=mesh, shard_data=True)
    sh_v = DeviceLoader(ds, 16, mesh=mesh, shard_data=True)
    trainer = Trainer(model, sh_t, sh_v, cfg, mesh=mesh, seed=0)
    state = trainer.init_state()
    state, m = trainer.train_epoch(state, epoch=10)
    assert np.isfinite(m["total_loss"])
    v_sh = trainer.val_epoch(state)

    re_v = DeviceLoader(ds, 16, mesh=mesh)
    trainer_r = Trainer(model, sh_t, re_v, cfg, mesh=mesh, seed=0)
    v_re = trainer_r.val_epoch(state)
    # Full batches of a per-row-mean loss: partition into batches differs
    # but the epoch means must agree.
    assert v_sh["total_loss"] == pytest.approx(v_re["total_loss"], rel=1e-5)
    assert v_sh["accuracy"] == pytest.approx(v_re["accuracy"], abs=1e-6)


def test_sharded_cache_batch_divisibility_error():
    from rovit_kan_tpu.data.device_cache import DeviceLoader
    _, _, mesh, _ = _setup(8)
    with pytest.raises(ValueError, match="divisible"):
        DeviceLoader(_IdDS(16), 12, mesh=mesh, shard_data=True)


def test_sharded_cache_shuffled_full_coverage():
    """shuffle=True without drop_last must still yield EVERY sample
    (padded + valid-masked tails, per-shard shuffled order) — the
    drop_last=False full-coverage contract."""
    from rovit_kan_tpu.data.device_cache import DeviceLoader
    _, _, mesh, _ = _setup(8)
    n = 29
    loader = DeviceLoader(_IdDS(n), 16, shuffle=True, mesh=mesh,
                          shard_data=True)
    orders = []
    for _ in range(2):                       # two epochs
        seen = [int(np.asarray(b["images"])[j, 0, 0, 0])
                for b in loader
                for j in range(16) if np.asarray(b["valid"])[j]]
        assert sorted(seen) == list(range(n))
        orders.append(seen)
    assert orders[0] != orders[1]            # epoch-keyed shuffle moves


def test_sharded_cache_trainer_mesh_mismatch_error():
    """A sharded loader on a different mesh than the Trainer must raise a
    clear error, not mis-split the plans."""
    from rovit_kan_tpu.data.device_cache import DeviceLoader
    from rovit_kan_tpu.parallel.mesh import make_mesh

    cfg, model, mesh, _ = _setup(8)
    loader = DeviceLoader(_IdDS(32), 16, shuffle=True, drop_last=True,
                          mesh=mesh, shard_data=True)
    trainer = Trainer(model, loader, loader, cfg, mesh=make_mesh(1), seed=0)
    state = trainer.init_state()
    with pytest.raises(ValueError, match="share one mesh"):
        trainer.train_epoch(state, epoch=10)


# ---------------------------------------------------------------------------
# Tensor parallelism (2-D data x model mesh, parallel/tensor.py)
# ---------------------------------------------------------------------------

def _setup_tp(data=4, model_ax=2):
    from rovit_kan_tpu.parallel.tensor import make_2d_mesh, param_specs
    cfg, model, _, _ = _setup(1)
    mesh = make_2d_mesh(data, model_ax)
    trainer = Trainer(model, None, None, cfg, mesh=mesh, seed=0,
                      param_specs=True)
    # Trainer takes a spec TREE; build it from a template init.
    params_t = trainer._init_params(jax.random.PRNGKey(0))
    trainer.param_specs = param_specs(params_t)
    return cfg, model, mesh, trainer


def test_tp_param_specs_rules():
    """Megatron-style column/row specs on attention + MLP, replicated
    elsewhere; dims not divisible by the model axis fall back to P()."""
    from jax.sharding import PartitionSpec as P
    from rovit_kan_tpu.parallel.tensor import param_specs

    _, model, _, trainer = _setup_tp()
    params = trainer._init_params(jax.random.PRNGKey(0))
    specs = param_specs(params)
    blk = specs["backbone"]["blocks_0"]
    assert blk["attn"]["qkv"]["kernel"] == P(None, "model")
    assert blk["attn"]["proj"]["kernel"] == P("model", None)
    assert blk["mlp"]["fc1"]["kernel"] == P(None, "model")
    assert blk["mlp"]["fc2"]["kernel"] == P("model", None)
    assert specs["backbone"]["patch_embed"]["proj"]["kernel"] == P()
    assert specs["backbone"]["cls_token"] == P()


def test_tp_state_layout():
    """Params AND the optax moments are model-sharded; scalars replicated."""
    _, _, mesh, trainer = _setup_tp()
    state = trainer.init_state()
    qkv = state.params["backbone"]["blocks_0"]["attn"]["qkv"]["kernel"]
    assert not qkv.sharding.is_fully_replicated
    # 2-way model axis splits the 96-wide fused qkv output into 48s.
    shard_shapes = {tuple(s.data.shape) for s in qkv.addressable_shards}
    assert shard_shapes == {(32, 48)}
    # Adam moments follow the same layout (find a moment leaf for qkv).
    moments = [l for l in jax.tree.leaves(state.opt_state)
               if getattr(l, "shape", None) == qkv.shape]
    assert moments and all(
        not m.sharding.is_fully_replicated for m in moments)
    assert state.step.sharding.is_fully_replicated


def test_tp_step_matches_single_device():
    """One train step on a (data=4, model=2) mesh vs 1 device: same losses
    and updated params (GSPMD collectives only reorder reductions)."""
    batch = _batch()
    # Single-device baseline.
    cfg, model, mesh1, tr1 = _setup(1)
    s1 = tr1.init_state()
    s1, m1 = tr1.train_step(s1, shard_batch(batch, mesh1), jnp.int32(4),
                            jnp.float32(1.0), jnp.float32(0.0))
    # DP x TP.
    cfg, model, mesh, tr = _setup_tp()
    s = tr.init_state()
    s, m = tr.train_step(s, shard_batch(batch, mesh), jnp.int32(4),
                         jnp.float32(1.0), jnp.float32(0.0))
    assert float(m1["total_loss"]) == pytest.approx(
        float(m["total_loss"]), rel=1e-5)
    p1 = np.asarray(jax.tree.leaves(s1.params)[0])
    p = np.asarray(jax.tree.leaves(s.params)[0])
    np.testing.assert_allclose(p1, p, atol=2e-6)
    # The updated qkv kernel is still model-sharded (no silent gather).
    qkv = s.params["backbone"]["blocks_0"]["attn"]["qkv"]["kernel"]
    assert not qkv.sharding.is_fully_replicated


@pytest.mark.slow
def test_flagship_on_mesh_dp_and_dpxtp():
    """The REAL flagship — get_config()'s 5.7M-param 224px model with EMA +
    MultiSteps accumulation — jits and executes one step under pure DP and
    under dp=4 x tp=2 on the 8-device mesh. Catches sharding/divisibility
    issues toys can't (3 heads vs tp=2, KAN tree, EMA/accumulator state
    placement)."""
    from rovit_kan_tpu.config import get_config
    from rovit_kan_tpu.models.rovit_kan import build_model
    from rovit_kan_tpu.parallel.tensor import make_2d_mesh, param_specs

    def run(tp):
        cfg = get_config()
        cfg.train.batch_size = 8
        cfg.train.ema_decay = 0.999
        cfg.train.accum_steps = 2
        model = build_model(cfg)
        assert model.embed_dim == 192 and model.depth == 12 \
            and model.num_heads == 3
        if tp > 1:
            mesh = make_2d_mesh(8 // tp, tp)
            trainer = Trainer(model, None, None, cfg, mesh=mesh, seed=0,
                              param_specs=True)
            trainer.param_specs = param_specs(
                trainer._init_params(jax.random.PRNGKey(0)))
        else:
            mesh = make_mesh(8)
            trainer = Trainer(model, None, None, cfg, mesh=mesh, seed=0)
        state = trainer.init_state()
        n_params = sum(int(x.size) for x in jax.tree.leaves(state.params))
        assert n_params == 5_706_394          # exact flagship
        assert state.ema_params is not None
        if tp > 1:
            qkv = state.params["backbone"]["blocks_0"]["attn"]["qkv"]["kernel"]
            assert not qkv.sharding.is_fully_replicated
            moments = [l for l in jax.tree.leaves(state.opt_state)
                       if getattr(l, "shape", None) == qkv.shape]
            assert moments and all(
                not m.sharding.is_fully_replicated for m in moments)
        batch = {
            "images": np.random.RandomState(0).randint(
                0, 256, (8, 224, 224, 3)).astype(np.uint8),
            "labels": np.arange(8, dtype=np.int32) % 4,
            "severity": (np.arange(8) % 4).astype(np.float32),
        }
        state, m = trainer.train_step(
            state, shard_batch(batch, mesh), jnp.int32(4),
            jnp.float32(1.0), jnp.float32(1.0))
        assert np.isfinite(float(m["total_loss"]))

    run(tp=1)
    run(tp=2)


def test_sp_step_matches_single_device():
    """Sequence parallelism (act_sharding = tokens over 'model') on a
    (data=4, model=2) mesh: same losses/params as the 1-device baseline.
    The toy's 5 tokens don't divide tp=2, so this also exercises the
    masked-filler-token padding path (models/vit.py)."""
    from rovit_kan_tpu.parallel.tensor import (
        make_2d_mesh, param_specs, seq_sharding)

    batch = _batch()
    cfg, model, mesh1, tr1 = _setup(1)
    s1 = tr1.init_state()
    s1, m1 = tr1.train_step(s1, shard_batch(batch, mesh1), jnp.int32(4),
                            jnp.float32(1.0), jnp.float32(0.0))

    cfg, base_model, _, _ = _setup(1)
    mesh = make_2d_mesh(4, 2)
    sp_model = RoViTKAN(embed_dim=32, depth=1, num_heads=2, image_size=32,
                        patch_size=16, kan_layers=(32, 8, 1), hidden_dim=16,
                        use_pallas_attention=False, use_pallas_kan=False,
                        act_sharding=seq_sharding(mesh))
    tr = Trainer(sp_model, None, None, cfg, mesh=mesh, seed=0,
                 param_specs=True)
    tr.param_specs = param_specs(tr._init_params(jax.random.PRNGKey(0)))
    s = tr.init_state()
    s, m = tr.train_step(s, shard_batch(batch, mesh), jnp.int32(4),
                         jnp.float32(1.0), jnp.float32(0.0))
    assert float(m1["total_loss"]) == pytest.approx(
        float(m["total_loss"]), rel=1e-5)
    p1 = np.asarray(jax.tree.leaves(s1.params)[0])
    p = np.asarray(jax.tree.leaves(s.params)[0])
    np.testing.assert_allclose(p1, p, atol=2e-6)


def test_sp_eval_matches_no_sp():
    """Forward parity: the SP-annotated model applied with the SAME params
    must produce bit-comparable logits to the unannotated one (the
    constraint is a layout hint, not a math change)."""
    from rovit_kan_tpu.parallel.tensor import make_2d_mesh, seq_sharding

    cfg, model, _, _ = _setup(1)
    mesh = make_2d_mesh(4, 2)
    sp_model = RoViTKAN(embed_dim=32, depth=1, num_heads=2, image_size=32,
                        patch_size=16, kan_layers=(32, 8, 1), hidden_dim=16,
                        use_pallas_attention=False, use_pallas_kan=False,
                        act_sharding=seq_sharding(mesh))
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 32, 32, 3)))["params"]
    x = jnp.asarray(_batch()["images"], jnp.float32) / 255.0
    ref = model.apply({"params": params}, x, deterministic=True)
    sp = jax.jit(lambda p, x: sp_model.apply(
        {"params": p}, x, deterministic=True))(replicate(params, mesh), x)
    np.testing.assert_allclose(np.asarray(ref["cls_logits"]),
                               np.asarray(sp["cls_logits"]),
                               atol=1e-5, rtol=1e-5)


def test_sp_composes_with_remat():
    """SP's n_valid arg is static under nn.remat (static_argnums=(2, 4)):
    a remat'd SP model must produce finite grads identical to non-remat."""
    from rovit_kan_tpu.parallel.tensor import make_2d_mesh, seq_sharding

    mesh = make_2d_mesh(4, 2)

    def make(remat):
        return RoViTKAN(embed_dim=32, depth=1, num_heads=2, image_size=32,
                        patch_size=16, kan_layers=(32, 8, 1), hidden_dim=16,
                        use_pallas_attention=False, use_pallas_kan=False,
                        remat=remat, act_sharding=seq_sharding(mesh))

    x = jnp.asarray(_batch(bs=8)["images"], jnp.float32) / 255.0
    params = make(False).init(jax.random.PRNGKey(0),
                              jnp.zeros((1, 32, 32, 3)))["params"]
    params = replicate(params, mesh)

    def loss(model):
        def f(p):
            out = model.apply({"params": p}, x, deterministic=True)
            return jnp.sum(out["cls_logits"] ** 2)
        return f

    g_plain = jax.jit(jax.grad(loss(make(False))))(params)
    g_remat = jax.jit(jax.grad(loss(make(True))))(params)
    for a, b in zip(jax.tree.leaves(g_plain), jax.tree.leaves(g_remat)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_tp_non_divisible_falls_back_replicated():
    from jax.sharding import PartitionSpec as P
    from rovit_kan_tpu.parallel.tensor import make_2d_mesh, shard_params
    mesh = make_2d_mesh(2, 4)
    # 6 not divisible by 4 -> replicated; 8 divisible -> sharded.
    tree = {"a": {"kernel": jnp.zeros((4, 6))}, "b": jnp.zeros((8, 4))}
    specs = {"a": {"kernel": P(None, "model")}, "b": P("model", None)}
    out = shard_params(tree, mesh, specs)
    assert out["a"]["kernel"].sharding.is_fully_replicated
    assert not out["b"].sharding.is_fully_replicated


def test_shard_params_per_axis_divisibility_fallback():
    """A dim that doesn't divide its mesh axis is nulled ALONE — the
    other dims keep their sharding (a 3-D P('pipe', None, 'model') leaf
    whose model dim doesn't divide tp must stay sharded over 'pipe')."""
    import numpy as np
    from jax.sharding import Mesh, PartitionSpec as P

    from rovit_kan_tpu.parallel.tensor import shard_params

    devs = jax.devices()
    mesh = Mesh(np.asarray(devs[:8]).reshape(2, 2, 2),
                ("data", "pipe", "model"))
    # Leading dim 4 divides pipe=2; trailing dim 90 does NOT divide
    # model=2... (90 % 2 == 0, pick 91) -> use 91.
    leaf = jnp.zeros((4, 16, 91))
    out = shard_params({"w": leaf}, mesh,
                       {"w": P("pipe", None, "model")})
    spec = out["w"].sharding.spec
    assert spec[0] == "pipe" and spec[1] is None and spec[2] is None


def test_make_pipeline_mesh_too_few_devices_raises():
    from rovit_kan_tpu.parallel.pipeline import make_pipeline_mesh
    from rovit_kan_tpu.parallel.tensor import make_2d_mesh

    with pytest.raises(ValueError, match="at least"):
        make_pipeline_mesh(data=-1, pipe=4, model=4)   # 16 > 8 devices
    with pytest.raises(ValueError, match="at least"):
        make_2d_mesh(data=-1, model=16)
