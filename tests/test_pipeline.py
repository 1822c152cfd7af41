"""Pipeline parallelism: the GPipe shard_map schedule must match the plain
sequential forward to float tolerance, its gradients must match, a full
dp x pp training step must run with block params actually sharded over the
"pipe" axis, and the Trainer's pipelined mode must match the plain Trainer
step-for-step (same rng streams) while checkpointing canonically."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from rovit_kan_tpu.models.rovit_kan import RoViTKAN
from rovit_kan_tpu.parallel.pipeline import (
    make_pipeline_mesh,
    make_pipelined_train_step,
    merge_params,
    pipeline_blocks,
    pipelined_forward,
    shard_pipeline_params,
    split_params,
)


def _toy_model(depth=4):
    return RoViTKAN(embed_dim=32, depth=depth, num_heads=2, image_size=32,
                    patch_size=16, kan_layers=(32, 8, 1), hidden_dim=16,
                    dropout=0.0, use_pallas_attention=False,
                    use_pallas_kan=False, use_pallas_block=False)


@pytest.fixture(scope="module")
def setup():
    model = _toy_model()
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (8, 32, 32, 3), jnp.float32)
    params = model.init(key, x[:1])["params"]
    return model, params, x


def test_split_merge_roundtrip(setup):
    model, params, _ = setup
    split = split_params(params)
    assert "blocks" in split["backbone"] and "blocks_0" not in split["backbone"]
    assert jax.tree.leaves(split["backbone"]["blocks"])[0].shape[0] == 4
    merged = merge_params(split)
    assert jax.tree.structure(merged) == jax.tree.structure(params)
    for a, b in zip(jax.tree.leaves(merged), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("data,pipe,n_micro", [(2, 4, 4), (4, 2, 2)])
def test_pipeline_forward_matches_sequential(setup, data, pipe, n_micro):
    model, params, x = setup
    mesh = make_pipeline_mesh(data=data, pipe=pipe)
    split = shard_pipeline_params(split_params(params), mesh)
    got = jax.jit(lambda s, xx: pipelined_forward(
        model, s, xx, mesh, n_micro=n_micro))(split, x)
    want = model.apply({"params": params}, x, deterministic=True)
    for k in ("features", "cls_logits", "ordinal_logits", "mu",
              "log_var", "kan_severity"):
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                   atol=2e-4, rtol=1e-3, err_msg=k)


def test_pipeline_blocks_only_matches_scan(setup):
    """The schedule itself (no embedding/heads) vs a sequential block loop."""
    from rovit_kan_tpu.ops.block_kernel import _block_xla
    from rovit_kan_tpu.parallel.pipeline import _flat_block

    model, params, _ = setup
    mesh = make_pipeline_mesh(data=2, pipe=4)
    stacked = split_params(params)["backbone"]["blocks"]
    key = jax.random.PRNGKey(1)
    tokens = jax.random.normal(key, (8, 5, 32), jnp.float32)

    got = pipeline_blocks(tokens, stacked, mesh, heads=2, n_micro=2)
    want = tokens
    for i in range(4):
        want = _block_xla(
            want, _flat_block(jax.tree.map(lambda v: v[i], stacked)), 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-3)


def test_pipeline_grad_matches_sequential(setup):
    model, params, x = setup
    mesh = make_pipeline_mesh(data=2, pipe=4)
    labels = jnp.arange(8) % 4

    def loss_pipe(split, xx):
        out = pipelined_forward(model, split, xx, mesh, n_micro=2)
        return jnp.mean(
            optax.softmax_cross_entropy_with_integer_labels(
                out["cls_logits"], labels)) + jnp.mean(out["kan_severity"])

    def loss_plain(p, xx):
        out = model.apply({"params": p}, xx, deterministic=True)
        return jnp.mean(
            optax.softmax_cross_entropy_with_integer_labels(
                out["cls_logits"], labels)) + jnp.mean(out["kan_severity"])

    g_pipe = merge_params(jax.grad(loss_pipe)(split_params(params), x))
    g_plain = jax.grad(loss_plain)(params, x)
    assert jax.tree.structure(g_pipe) == jax.tree.structure(g_plain)
    flat_pipe = jax.tree_util.tree_leaves_with_path(g_pipe)
    flat_plain = jax.tree.leaves(g_plain)
    for (path, a), b in zip(flat_pipe, flat_plain):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-3,
            err_msg=jax.tree_util.keystr(path))


def test_pipelined_train_step_runs_and_shards(setup):
    model, params, x = setup
    mesh = make_pipeline_mesh(data=2, pipe=4)
    split = shard_pipeline_params(split_params(params), mesh)
    # Block params must actually live sharded over "pipe".
    leaf = jax.tree.leaves(split["backbone"]["blocks"])[0]
    spec = leaf.sharding.spec
    assert spec and spec[0] == "pipe"

    optimizer = optax.adamw(1e-3)
    opt_state = optimizer.init(split)
    step = make_pipelined_train_step(model, mesh, optimizer, n_micro=2)
    batch = {
        "images": x,
        "labels": jnp.arange(8) % 4,
        "severity": (jnp.arange(8) % 4).astype(jnp.float32),
    }
    split2, opt_state, losses = step(split, opt_state, batch)
    l0 = float(losses["total_loss"])
    assert np.isfinite(l0)
    # Params changed and kept their sharding.
    leaf2 = jax.tree.leaves(split2["backbone"]["blocks"])[0]
    assert not np.allclose(np.asarray(leaf), np.asarray(leaf2))
    assert leaf2.sharding.spec[0] == "pipe"
    # Loss drops over a few steps on the fixed batch.
    for _ in range(3):
        split2, opt_state, losses = step(split2, opt_state, batch)
    assert float(losses["total_loss"]) < l0


# --- Trainer integration -------------------------------------------------

def _trainer_pair():
    """A pipelined (dp=2 x pp=4) and a plain 1-device Trainer over the same
    toy config; dropout 0 so the two layouts' rng streams can't diverge."""
    from rovit_kan_tpu.config import get_config
    from rovit_kan_tpu.parallel.mesh import make_mesh
    from rovit_kan_tpu.training.trainer import Trainer

    cfg = get_config()
    cfg.data.image_size = 32
    cfg.train.batch_size = 8
    cfg.flags.mixed_precision = False
    cfg.model.depth = 4
    cfg.model.embed_dim = 32
    cfg.model.num_heads = 2
    cfg.model.hidden_dim = 16
    cfg.model.dropout = 0.0
    cfg.model.kan_layers = [32, 8, 1]
    cfg.tpu.use_pallas_attention = False
    cfg.tpu.use_pallas_kan = False
    cfg.tpu.use_pallas_block = False
    cfg.tpu.pipeline_microbatches = 2
    model = RoViTKAN(embed_dim=32, depth=4, num_heads=2, image_size=32,
                     patch_size=16, kan_layers=(32, 8, 1), hidden_dim=16,
                     dropout=0.0, use_pallas_attention=False,
                     use_pallas_kan=False, use_pallas_block=False)
    pmesh = make_pipeline_mesh(data=2, pipe=4)
    tr_pipe = Trainer(model, None, None, cfg, mesh=pmesh, seed=0)
    tr_plain = Trainer(model, None, None, cfg, mesh=make_mesh(1), seed=0)
    return cfg, tr_pipe, tr_plain


def _batch(seed=0, bs=8):
    rng = np.random.RandomState(seed)
    return {
        "images": rng.randint(0, 256, (bs, 32, 32, 3)).astype(np.uint8),
        "labels": rng.randint(0, 4, (bs,)).astype(np.int32),
        "severity": rng.randint(0, 4, (bs,)).astype(np.float32),
    }


def test_trainer_pipelined_step_matches_plain(tmp_path):
    from rovit_kan_tpu.parallel.mesh import shard_batch

    cfg, tr_pipe, tr_plain = _trainer_pair()
    assert tr_pipe.pipelined and not tr_plain.pipelined

    s_pipe = tr_pipe.init_state()
    s_plain = tr_plain.init_state()
    # Same seed -> identical canonical params; pipelined state holds the
    # split layout sharded over "pipe".
    blk = s_pipe.params["backbone"]["blocks"]
    assert jax.tree.leaves(blk)[0].sharding.spec[0] == "pipe"
    merged0 = merge_params(s_pipe.params)
    for a, b in zip(jax.tree.leaves(merged0),
                    jax.tree.leaves(s_plain.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # Two full train steps (augmentation + mixup + joint loss + AdamW):
    # identical rng streams, float-tolerance losses, matching params.
    args = (jnp.int32(4), jnp.float32(1.0), jnp.float32(1.0))
    for i in range(2):
        b = _batch(i)
        s_pipe, m_pipe = tr_pipe.train_step(
            s_pipe, shard_batch(b, tr_pipe.mesh), *args)
        s_plain, m_plain = tr_plain.train_step(
            s_plain, shard_batch(b, tr_plain.mesh), *args)
        np.testing.assert_allclose(float(m_pipe["total_loss"]),
                                   float(m_plain["total_loss"]),
                                   rtol=2e-3, atol=2e-3)
    merged = merge_params(s_pipe.params)
    for (path, a), b in zip(jax.tree_util.tree_leaves_with_path(merged),
                            jax.tree.leaves(s_plain.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-3,
            err_msg=jax.tree_util.keystr(path))


def test_trainer_pipelined_checkpoint_is_canonical(tmp_path):
    """save_checkpoint from a pipelined Trainer must write the canonical
    layout (loadable by evaluator/serving and by a plain Trainer.resume);
    the pipelined resume must round-trip back to the split layout."""
    cfg, tr_pipe, tr_plain = _trainer_pair()
    cfg.paths.checkpoints_dir = tmp_path / "ck"
    state = tr_pipe.init_state()
    tr_pipe.save_checkpoint(state, epoch=3, metrics={"total_loss": 1.0})

    ck = tr_pipe.load_checkpoint()
    assert "blocks_0" in ck["params"]["backbone"]          # canonical
    assert "blocks" not in ck["params"]["backbone"]

    # Pipelined resume: split layout again, sharded, optimizer restored.
    state2, next_epoch = tr_pipe.resume()
    assert next_epoch == 4
    blk = state2.params["backbone"]["blocks"]
    assert jax.tree.leaves(blk)[0].sharding.spec[0] == "pipe"
    for a, b in zip(jax.tree.leaves(merge_params(state2.params)),
                    jax.tree.leaves(merge_params(state.params))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # A PLAIN trainer resumes the same checkpoint untouched.
    tr_plain.config.paths.checkpoints_dir = tmp_path / "ck"
    state3, _ = tr_plain.resume()
    for a, b in zip(jax.tree.leaves(state3.params),
                    jax.tree.leaves(merge_params(state.params))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_trainer_pipelined_scanned_epoch_fit(tmp_path):
    """Composition proof: pipeline mesh + HBM DeviceLoader (whole-epoch
    lax.scan) + eval + canonical checkpointing in one fit(); losses match
    a plain 1-device fit with the same seeds to float tolerance."""
    from rovit_kan_tpu.data.device_cache import DeviceLoader
    from rovit_kan_tpu.parallel.mesh import make_mesh
    from rovit_kan_tpu.training.trainer import Trainer

    class ArrayDS:
        def __init__(self, n=16):
            rng = np.random.RandomState(0)
            self.imgs = rng.randint(0, 256, (n, 32, 32, 3)).astype(np.uint8)
            self.labels = rng.randint(0, 4, n)
            self.sev = self.labels.astype(np.float32)

        def __len__(self):
            return len(self.imgs)

        def __getitem__(self, i):
            return self.imgs[i], int(self.labels[i]), float(self.sev[i])

        def get_class_weights(self):
            return np.ones(4, np.float32)

    cfg, tr_pipe, tr_plain = _trainer_pair()
    ds = ArrayDS()
    cfg.train.epochs = 2
    cfg.train.early_stop_patience = 10

    import copy
    cfg_p = copy.deepcopy(cfg)
    cfg_p.paths.checkpoints_dir = tmp_path / "pp"
    pmesh = tr_pipe.mesh
    tr_pp = Trainer(tr_pipe.model, DeviceLoader(ds, 8, shuffle=True,
                                                drop_last=True, seed=7,
                                                mesh=pmesh),
                    DeviceLoader(ds, 8, mesh=pmesh), cfg_p,
                    mesh=pmesh, seed=3)
    res_pp = tr_pp.fit()

    cfg_s = copy.deepcopy(cfg)
    cfg_s.paths.checkpoints_dir = tmp_path / "plain"
    mesh1 = make_mesh(1)
    tr_1 = Trainer(tr_plain.model, DeviceLoader(ds, 8, shuffle=True,
                                                drop_last=True, seed=7),
                   DeviceLoader(ds, 8), cfg_s, mesh=mesh1, seed=3)
    res_1 = tr_1.fit()

    for e in range(2):
        p = res_pp["history"]["train"][e]
        s = res_1["history"]["train"][e]
        assert p["total_loss"] == pytest.approx(s["total_loss"], rel=3e-3)
        pv = res_pp["history"]["val"][e]
        sv = res_1["history"]["val"][e]
        assert pv["total_loss"] == pytest.approx(sv["total_loss"], rel=3e-3)
    # The best-model checkpoint written during fit is canonical.
    ck = tr_pp.load_checkpoint()
    assert "blocks_0" in ck["params"]["backbone"]


# --- 3-D mesh: dp x pp x tp ----------------------------------------------

def test_pipeline_3d_forward_matches_sequential(setup):
    """dp=2 x pp=2 x tp=2: blocks sharded over BOTH depth ("pipe") and the
    Megatron model dim ("model", GSPMD-auto inside the partial-manual
    shard_map); output must still match the plain sequential forward."""
    model, params, x = setup
    mesh = make_pipeline_mesh(data=2, pipe=2, model=2)
    assert mesh.axis_names == ("data", "pipe", "model")
    split = shard_pipeline_params(split_params(params), mesh)
    qkv = split["backbone"]["blocks"]["attn"]["qkv"]["kernel"]
    assert qkv.sharding.spec == ("pipe", None, "model")
    fc2 = split["backbone"]["blocks"]["mlp"]["fc2"]["kernel"]
    assert fc2.sharding.spec == ("pipe", "model", None)

    got = jax.jit(lambda s, xx: pipelined_forward(
        model, s, xx, mesh, n_micro=2))(split, x)
    want = model.apply({"params": params}, x, deterministic=True)
    for k in ("features", "cls_logits", "ordinal_logits", "mu",
              "log_var", "kan_severity"):
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                   atol=2e-4, rtol=1e-3, err_msg=k)


def test_pipeline_3d_grad_matches_sequential(setup):
    model, params, x = setup
    mesh = make_pipeline_mesh(data=2, pipe=2, model=2)
    labels = jnp.arange(8) % 4

    def loss_pipe(split, xx):
        out = pipelined_forward(model, split, xx, mesh, n_micro=2)
        return jnp.mean(
            optax.softmax_cross_entropy_with_integer_labels(
                out["cls_logits"], labels)) + jnp.mean(out["kan_severity"])

    def loss_plain(p, xx):
        out = model.apply({"params": p}, xx, deterministic=True)
        return jnp.mean(
            optax.softmax_cross_entropy_with_integer_labels(
                out["cls_logits"], labels)) + jnp.mean(out["kan_severity"])

    split = shard_pipeline_params(split_params(params), mesh)
    g_pipe = merge_params(jax.jit(jax.grad(loss_pipe))(split, x))
    g_plain = jax.grad(loss_plain)(params, x)
    flat_pipe = jax.tree_util.tree_leaves_with_path(g_pipe)
    flat_plain = jax.tree.leaves(g_plain)
    for (path, a), b in zip(flat_pipe, flat_plain):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-3,
            err_msg=jax.tree_util.keystr(path))


def test_trainer_3d_step_matches_plain():
    """Full Trainer step (augment + mixup + joint loss + EMA-less AdamW)
    on the 3-D mesh: param AND Adam-moment leaves sharded over pipe+model,
    losses matching the plain 1-device Trainer step-for-step."""
    from rovit_kan_tpu.parallel.mesh import make_mesh, shard_batch
    from rovit_kan_tpu.training.trainer import Trainer

    cfg, tr_pipe, tr_plain = _trainer_pair()
    mesh3 = make_pipeline_mesh(data=2, pipe=2, model=2)
    tr_3d = Trainer(tr_pipe.model, None, None, cfg, mesh=mesh3, seed=0)
    assert tr_3d.pipelined

    s_3d = tr_3d.init_state()
    s_plain = tr_plain.init_state()
    qkv = s_3d.params["backbone"]["blocks"]["attn"]["qkv"]["kernel"]
    assert qkv.sharding.spec == ("pipe", None, "model")
    # Adam moments carry the combined sharding too.
    from jax.tree_util import tree_flatten_with_path
    mus = [leaf for path, leaf in tree_flatten_with_path(s_3d.opt_state)[0]
           if ".mu" in jax.tree_util.keystr(path)
           and "qkv" in jax.tree_util.keystr(path)
           and "kernel" in jax.tree_util.keystr(path)]
    assert mus and all(m.sharding.spec == ("pipe", None, "model")
                       for m in mus)

    args = (jnp.int32(4), jnp.float32(1.0), jnp.float32(1.0))
    for i in range(2):
        b = _batch(i)
        s_3d, m_3d = tr_3d.train_step(
            s_3d, shard_batch(b, mesh3), *args)
        s_plain, m_plain = tr_plain.train_step(
            s_plain, shard_batch(b, tr_plain.mesh), *args)
        np.testing.assert_allclose(float(m_3d["total_loss"]),
                                   float(m_plain["total_loss"]),
                                   rtol=2e-3, atol=2e-3)
    merged = merge_params(s_3d.params)
    for (path, a), b in zip(jax.tree_util.tree_leaves_with_path(merged),
                            jax.tree.leaves(s_plain.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-3,
            err_msg=jax.tree_util.keystr(path))
