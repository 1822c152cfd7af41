"""Mixture-of-Experts FFN (models/moe.py) + expert parallelism
(parallel/tensor.py::make_moe_mesh / moe_param_specs).

The reference has no MoE (its FFN is timm's dense MLP); these tests pin the
opt-in expert-choice layer's semantics: exact reduction to the dense Mlp at
E=1/C=S, load-balance-by-construction shapes, gradient flow through the
gate, sequence-parallel filler masking, and a full expert-parallel train
step on a ("data", "expert") mesh matching the 1-device step.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rovit_kan_tpu.config import get_config
from rovit_kan_tpu.models.moe import MoEMlp, expert_capacity
from rovit_kan_tpu.models.rovit_kan import RoViTKAN
from rovit_kan_tpu.models.vit import Mlp
from rovit_kan_tpu.parallel.mesh import make_mesh, shard_batch
from rovit_kan_tpu.training.trainer import Trainer


def _moe_model():
    return RoViTKAN(embed_dim=32, depth=2, num_heads=2, image_size=32,
                    patch_size=16, kan_layers=(32, 8, 1), hidden_dim=16,
                    use_pallas_attention=False, use_pallas_kan=False,
                    moe_experts=4, moe_every=2, moe_capacity_factor=2.0)


def _cfg():
    cfg = get_config()
    cfg.data.image_size = 32
    cfg.train.batch_size = 16
    cfg.flags.mixed_precision = False
    cfg.flags.use_mixup = False
    cfg.flags.use_cutmix = False
    return cfg


def _batch(seed=0, bs=16):
    rng = np.random.RandomState(seed)
    return {
        "images": rng.randint(0, 256, (bs, 32, 32, 3)).astype(np.uint8),
        "labels": rng.randint(0, 4, (bs,)).astype(np.int32),
        "severity": rng.randint(0, 4, (bs,)).astype(np.float32),
    }


def test_expert_capacity():
    assert expert_capacity(8, 4, 2.0) == 4
    assert expert_capacity(5, 2, 1.0) == 3       # ceil
    assert expert_capacity(4, 8, 4.0) == 2
    assert expert_capacity(4, 1, 100.0) == 4     # clipped to S
    assert expert_capacity(4, 100, 0.01) == 1    # floor of 1
    assert expert_capacity(17, 4, 0.5) == 3      # ceil(8.5/4), not
    #                                              ceil(floor(8.5)/4) == 2


def test_moe_every_validated():
    model = RoViTKAN(embed_dim=32, depth=2, num_heads=2, image_size=32,
                     patch_size=16, kan_layers=(32, 8, 1), hidden_dim=16,
                     use_pallas_attention=False, use_pallas_kan=False,
                     moe_experts=4, moe_every=0)
    with pytest.raises(ValueError, match="moe_every"):
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))


def test_single_expert_full_capacity_is_dense_mlp():
    """E=1, C=S: gate prob is exactly 1.0 and the dispatch is a
    permutation, so MoEMlp must equal Mlp with expert 0's weights."""
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 6, 16))
    moe = MoEMlp(16, 32, num_experts=1, capacity_factor=1.0)
    pm = moe.init(key, x)["params"]
    pd = {"fc1": {"kernel": pm["w1"][0], "bias": pm["b1"][0]},
          "fc2": {"kernel": pm["w2"][0], "bias": pm["b2"][0]}}
    np.testing.assert_allclose(
        np.asarray(moe.apply({"params": pm}, x)),
        np.asarray(Mlp(16, 32).apply({"params": pd}, x)), atol=1e-5)


def test_gate_receives_gradient():
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (2, 8, 16))
    moe = MoEMlp(16, 32, num_experts=4, capacity_factor=2.0)
    p = moe.init(key, x)["params"]

    def loss(p):
        return jnp.sum(moe.apply({"params": p}, x) ** 2)

    g = jax.grad(loss)(p)
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert float(jnp.abs(g["gate"]["kernel"]).sum()) > 0


def test_n_valid_filler_never_displaces_real_tokens():
    """Sequence-parallel padding contract: outputs on real rows are
    identical with and without filler rows appended (models/moe.py masks
    filler out of the gate scores before top_k)."""
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (2, 6, 16))
    moe = MoEMlp(16, 32, num_experts=4, capacity_factor=2.0)
    p = moe.init(key, x)["params"]
    xp = jnp.pad(x, ((0, 0), (0, 2), (0, 0)), constant_values=3.0)
    np.testing.assert_allclose(
        np.asarray(moe.apply({"params": p}, xp, 6)[:, :6]),
        np.asarray(moe.apply({"params": p}, x)), atol=1e-6)


def test_moe_vit_param_tree_and_forward():
    """moe_every=2 on depth 2: block 0 dense (mlp), block 1 sparse (moe);
    forward emits the usual fixed-shape head dict."""
    model = _moe_model()
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 32, 32, 3)))["params"]
    bb = params["backbone"]
    assert "mlp" in bb["blocks_0"] and "moe" not in bb["blocks_0"]
    assert "moe" in bb["blocks_1"] and "mlp" not in bb["blocks_1"]
    assert bb["blocks_1"]["moe"]["w1"].shape == (4, 32, 128)
    out = model.apply({"params": params}, jnp.zeros((2, 32, 32, 3)),
                      deterministic=True)
    assert out["cls_logits"].shape == (2, 4)


def test_moe_composes_with_sequence_parallel():
    """SP's filler-token padding (5 -> 6 tokens on tp=2) must not change
    MoE outputs: vit.py threads n_valid into MoEMlp, which masks filler
    out of the gate scores before top_k."""
    from rovit_kan_tpu.parallel.tensor import make_2d_mesh, seq_sharding
    from rovit_kan_tpu.parallel.mesh import replicate

    mesh = make_2d_mesh(4, 2)
    kw = dict(embed_dim=32, depth=2, num_heads=2, image_size=32,
              patch_size=16, kan_layers=(32, 8, 1), hidden_dim=16,
              use_pallas_attention=False, use_pallas_kan=False,
              moe_experts=4, moe_every=2, moe_capacity_factor=2.0)
    plain = RoViTKAN(**kw)
    sp = RoViTKAN(**kw, act_sharding=seq_sharding(mesh))
    params = plain.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 32, 32, 3)))["params"]
    x = jnp.asarray(_batch(bs=8)["images"], jnp.float32) / 255.0
    ref = plain.apply({"params": params}, x, deterministic=True)
    got = jax.jit(lambda p, x: sp.apply({"params": p}, x,
                                        deterministic=True))(
        replicate(params, mesh), x)
    np.testing.assert_allclose(np.asarray(ref["cls_logits"]),
                               np.asarray(got["cls_logits"]),
                               atol=1e-5, rtol=1e-5)


def test_expert_parallel_step_matches_single_device():
    """Full Trainer step on a ("data", "expert") dp=2 x ep=4 mesh with the
    stacked expert params genuinely sharded P("expert") must match the
    1-device step (losses and updated params)."""
    from rovit_kan_tpu.parallel.tensor import make_moe_mesh, moe_param_specs

    batch = _batch()
    results = {}
    for n_dev in (1, 8):
        cfg = _cfg()
        model = _moe_model()
        if n_dev == 1:
            mesh = make_mesh(1)
            trainer = Trainer(model, None, None, cfg, mesh=mesh, seed=0)
        else:
            mesh = make_moe_mesh(2, 4)
            trainer = Trainer(model, None, None, cfg, mesh=mesh, seed=0,
                              param_specs=True)
            trainer.param_specs = moe_param_specs(
                trainer._init_params(jax.random.PRNGKey(0)))
        state = trainer.init_state()
        if n_dev == 8:
            w1 = state.params["backbone"]["blocks_1"]["moe"]["w1"]
            assert not w1.sharding.is_fully_replicated, \
                "expert weights not sharded"
            # 4 experts over ep=4 -> exactly 1 expert per shard.
            shard_shapes = {tuple(s.data.shape)
                            for s in w1.addressable_shards}
            assert shard_shapes == {(1, 32, 128)}
        state, metrics = trainer.train_step(
            state, shard_batch(batch, mesh), jnp.int32(4),
            jnp.float32(1.0), jnp.float32(0.0))
        results[n_dev] = (float(metrics["total_loss"]),
                          np.asarray(jax.tree.leaves(state.params)[0]))

    l1, p1 = results[1]
    l8, p8 = results[8]
    assert l1 == pytest.approx(l8, rel=1e-5)
    np.testing.assert_allclose(p1, p8, atol=2e-6)
