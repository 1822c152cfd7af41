"""Pipeline parallelism: the GPipe shard_map schedule must match the plain
sequential forward bit-for-tolerance, its gradients must match, and a full
dp x pp training step must run with block params actually sharded over the
"pipe" axis."""
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
    assert jax.tree.leaves(split["blocks"])[0].shape[0] == 4
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
    split = split_params(params)
    key = jax.random.PRNGKey(1)
    tokens = jax.random.normal(key, (8, 5, 32), jnp.float32)

    got = pipeline_blocks(tokens, split["blocks"], mesh, heads=2, n_micro=2)
    want = tokens
    for i in range(4):
        want = _block_xla(
            want, _flat_block(
                jax.tree.map(lambda v: v[i], split["blocks"])), 2)
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
    leaf = jax.tree.leaves(split["blocks"])[0]
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
    leaf2 = jax.tree.leaves(split2["blocks"])[0]
    assert not np.allclose(np.asarray(leaf), np.asarray(leaf2))
    assert leaf2.sharding.spec[0] == "pipe"
    # Loss drops over a few steps on the fixed batch.
    for _ in range(3):
        split2, opt_state, losses = step(split2, opt_state, batch)
    assert float(losses["total_loss"]) < l0
