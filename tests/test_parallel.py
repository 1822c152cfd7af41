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
