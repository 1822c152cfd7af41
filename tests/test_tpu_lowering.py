"""Cross-platform TPU (Mosaic) lowering regression tests.

Every Pallas kernel in this repo auto-detects the backend and runs in
interpret mode on CPU — which means the CPU test suite exercises kernel
*math* but never Mosaic's lowering rules.  Round 3 shipped an augment
kernel whose (1, 8) factors BlockSpec and u8->f32 cast are both
Mosaic-illegal; it passed every CPU test and then crashed the very first
real-TPU train step (BENCH_r03/r4 partial JSON).

These tests close that hole without TPU hardware: ``jax.jit(f).trace(...)
.lower(lowering_platforms=("tpu",))`` runs the full Mosaic lowering
pipeline (block-mapping legality, cast support, VMEM layout rules) on any
host.  ``jax.default_backend`` is monkeypatched to "tpu" so the kernels'
interpret auto-detection and the model/trainer "auto" kernel policies
resolve exactly as they do on a real chip — the train-step test therefore
also covers TPU-only policy code (e.g. the config.flags.mixed_precision
attribute crash fixed in round 4).

Lowering stops before the TPU backend compile, so no device is needed;
it is still the strongest single-host proxy for "the driver's bench will
not crash at compile time".
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rovit_kan_tpu.config import get_config


@pytest.fixture
def tpu_backend(monkeypatch):
    """Make trace-time backend checks resolve as on a real chip."""
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")


def _lower_tpu(fn, *args):
    return jax.jit(fn).trace(*args).lower(lowering_platforms=("tpu",))


def test_augment_kernel_lowers(tpu_backend):
    from rovit_kan_tpu.ops.augment_kernel import (_draw_factors,
                                                  _fused_augment_impl)
    imgs = jnp.zeros((8, 224, 224, 3), jnp.uint8)
    factors = _draw_factors(jax.random.PRNGKey(0), 8, 0.2, 0.2, 0.2)
    for cd in (jnp.bfloat16, jnp.float32):
        _lower_tpu(lambda x, f: _fused_augment_impl(
            x, f, jnp.float32, cd, False), imgs, factors)


def test_attention_kernel_lowers_fwd_and_bwd(tpu_backend):
    from rovit_kan_tpu.ops.attention import fused_attention
    q = jnp.zeros((2, 3, 197, 64), jnp.bfloat16)

    def loss(q, k, v):
        return jnp.sum(fused_attention(q, k, v).astype(jnp.float32))

    _lower_tpu(jax.grad(loss, argnums=(0, 1, 2)), q, q, q)


def test_block_kernel_lowers_fwd_and_bwd(tpu_backend):
    from rovit_kan_tpu.ops.block_kernel import _PKEYS, fused_vit_block
    D, H = 192, 768
    shapes = {"ln1_scale": (D,), "ln1_bias": (D,), "wqkv": (D, 3 * D),
              "bqkv": (3 * D,), "wproj": (D, D), "bproj": (D,),
              "ln2_scale": (D,), "ln2_bias": (D,), "w1": (D, H),
              "b1": (H,), "w2": (H, D), "b2": (D,)}
    params = {k: jnp.zeros(shapes[k], jnp.float32) for k in _PKEYS}
    x = jnp.zeros((4, 197, D), jnp.bfloat16)

    def loss(x, p):
        return jnp.sum(fused_vit_block(x, p, 3).astype(jnp.float32))

    _lower_tpu(jax.grad(loss, argnums=(0, 1)), x, params)


def test_kan_module_lowers_fwd_and_bwd(tpu_backend):
    from rovit_kan_tpu.ops.kan_kernel import fused_kan_module
    dims = (192, 64, 16, 1)
    knots = tuple(np.linspace(-1.0, 1.0, 11).tolist())
    flat = []
    for din, dout in zip(dims[:-1], dims[1:]):
        flat += [jnp.zeros((din, dout, 7), jnp.float32),
                 jnp.zeros((din, dout), jnp.float32),
                 jnp.zeros((dout,), jnp.float32)]

    def loss(x, flat_params):
        out = fused_kan_module(x, flat_params, dims, knots, 3)
        return jnp.sum(out.astype(jnp.float32))

    x = jnp.zeros((8, 192), jnp.bfloat16)
    _lower_tpu(jax.grad(loss, argnums=(0, 1)), x, tuple(flat))


def test_full_train_step_lowers_for_tpu(tpu_backend):
    """THE driver-crash regression: the exact flagship bf16 training build
    bench.py compiles on the real chip (fused augment + fused blocks +
    fused KAN + mixup + optimizer), lowered end-to-end for Mosaic."""
    from rovit_kan_tpu.models.rovit_kan import build_model
    from rovit_kan_tpu.training.optimizer import (build_optimizer,
                                                  set_hyperparams)
    from rovit_kan_tpu.training.trainer import TrainState, make_train_step

    config = get_config()
    assert config.flags.mixed_precision
    model = build_model(config, dtype=jnp.bfloat16)
    tx = build_optimizer(config)
    train_step, _ = make_train_step(model, tx, config)

    # Abstract state: flax init EXECUTES the forward (illegal for a
    # non-interpret pallas_call on CPU) — eval_shape it instead; jit.trace
    # accepts ShapeDtypeStructs.
    def build_state():
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 224, 224, 3)))["params"]
        return TrainState(params=params, opt_state=set_hyperparams(
            tx.init(params), 5e-4, 0.1), rng=jax.random.PRNGKey(1),
            step=jnp.zeros((), jnp.int32))

    state = jax.eval_shape(build_state)
    B = 8
    sds = jax.ShapeDtypeStruct
    batch = {"images": sds((B, 224, 224, 3), jnp.uint8),
             "labels": sds((B,), jnp.int32),
             "severity": sds((B,), jnp.float32)}
    scalar = sds((), jnp.int32), sds((), jnp.float32), sds((), jnp.float32)
    # make_train_step returns the already-jitted step (bench.py calls
    # .lower on it directly) — trace/lower it the same way.
    lowered = train_step.trace(
        state, batch, *scalar).lower(lowering_platforms=("tpu",))
    text = lowered.as_text()
    # The bf16 TPU policy must actually engage the Pallas kernels —
    # otherwise this test silently stops covering them.
    assert "tpu_custom_call" in text


def test_inference_forward_lowers_for_tpu(tpu_backend):
    """The bench.py forward sections: inference build, bs=64 and bs=1."""
    from rovit_kan_tpu.models.rovit_kan import build_model

    config = get_config()
    model_inf = build_model(config, dtype=jnp.bfloat16, inference=True)
    params = jax.eval_shape(
        lambda: model_inf.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 224, 224, 3)))["params"])

    def fwd(p, x):
        return model_inf.apply({"params": p}, x, deterministic=True)

    for bs in (64, 1):
        x = jax.ShapeDtypeStruct((bs, 224, 224, 3), jnp.float32)
        lowered = _lower_tpu(fwd, params, x)
        assert "tpu_custom_call" in lowered.as_text()
