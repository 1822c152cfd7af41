"""Model structure tests: parameter-count parity with the reference
(5,706,394 total — reference outputs/ablation/full_model/test_metrics.json),
output shapes, ablation variants, ordinal conversions, attention parity."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rovit_kan_tpu.models import RoViTKAN
from rovit_kan_tpu.models.rovit_kan import count_parameters
from rovit_kan_tpu.ops.ordinal import (
    cumulative_to_class_probs,
    ordinal_expected_severity,
)


# Tiny config for shape tests (fast on 1-core CPU); full-size init only for
# the param-count parity test.
TINY = dict(image_size=32, patch_size=16, embed_dim=16, depth=2, num_heads=2,
            kan_layers=(16, 8, 1))


@pytest.fixture(scope="module")
def tiny_model_and_params():
    m = RoViTKAN(**TINY)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)))["params"]
    return m, params


def test_param_count_parity_full_model():
    m = RoViTKAN()
    params = jax.eval_shape(
        lambda k: m.init(k, jnp.zeros((1, 224, 224, 3))),
        jax.random.PRNGKey(0))["params"]
    c = {k: sum(int(np.prod(x.shape)) for x in jax.tree.leaves(v))
         for k, v in params.items()}
    assert c["backbone"] == 5_524_416
    assert c["classification_head"] == 25_220
    assert c["ordinal_head"] == 25_091
    assert c["uncertainty_head"] == 24_962
    assert c["kan_module"] == 106_705
    assert sum(c.values()) == 5_706_394


def test_ablation_variant_param_counts():
    # no_kan variant drops exactly the KAN module's 106,705 params.
    full = RoViTKAN()
    no_kan = RoViTKAN(with_kan=False)

    def n(m):
        p = jax.eval_shape(lambda k: m.init(k, jnp.zeros((1, 224, 224, 3))),
                           jax.random.PRNGKey(0))["params"]
        return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(p))

    assert n(full) - n(no_kan) == 106_705


def test_forward_output_shapes(tiny_model_and_params):
    m, params = tiny_model_and_params
    out = m.apply({"params": params}, jnp.zeros((2, 32, 32, 3)))
    assert out["features"].shape == (2, 16)
    assert out["cls_logits"].shape == (2, 4)
    assert out["ordinal_logits"].shape == (2, 3)
    assert out["mu"].shape == (2, 1)
    assert out["log_var"].shape == (2, 1)
    assert out["kan_severity"].shape == (2, 1)
    # KAN severity constrained to [0, 3].
    assert (np.asarray(out["kan_severity"]) >= 0).all()
    assert (np.asarray(out["kan_severity"]) <= 3).all()


def test_ablated_heads_emit_zeros():
    m = RoViTKAN(**TINY, with_ordinal=False, with_uncertainty=False,
                 with_kan=False)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)))["params"]
    assert "ordinal_head" not in params
    assert "kan_module" not in params
    out = m.apply({"params": params}, jnp.zeros((2, 32, 32, 3)))
    assert float(jnp.abs(out["ordinal_logits"]).sum()) == 0.0
    assert float(jnp.abs(out["kan_severity"]).sum()) == 0.0


def test_attention_maps_shape(tiny_model_and_params):
    m, params = tiny_model_and_params
    out = m.apply({"params": params}, jnp.zeros((2, 32, 32, 3)),
                  return_attention=True)
    # (depth, B, heads, N, N) with N = 4 patches + CLS = 5.
    assert out["attention"].shape == (2, 2, 2, 5, 5)
    # Rows are softmax-normalized.
    np.testing.assert_allclose(
        np.asarray(out["attention"]).sum(-1), 1.0, atol=1e-5)


def test_ordinal_probability_conversion():
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(8, 3).astype(np.float32))
    probs = np.asarray(cumulative_to_class_probs(logits))
    c = 1 / (1 + np.exp(-np.asarray(logits)))
    np.testing.assert_allclose(probs[:, 0], c[:, 0], rtol=1e-5)
    np.testing.assert_allclose(probs[:, 1], c[:, 1] - c[:, 0], rtol=1e-4,
                               atol=1e-6)
    np.testing.assert_allclose(probs[:, 3], 1 - c[:, 2], rtol=1e-5)
    # Probabilities sum to 1 (may be negative for non-monotone logits, as in
    # the reference's parameterization).
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)

    sev = np.asarray(ordinal_expected_severity(logits))
    want = (probs * np.arange(4)).sum(-1, keepdims=True)
    np.testing.assert_allclose(sev, want, rtol=1e-5, atol=1e-6)


def test_dropout_active_in_training_mode(tiny_model_and_params):
    m, params = tiny_model_and_params
    x = jnp.ones((4, 32, 32, 3))
    o1 = m.apply({"params": params}, x, deterministic=False,
                 rngs={"dropout": jax.random.PRNGKey(1)})
    o2 = m.apply({"params": params}, x, deterministic=False,
                 rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(o1["cls_logits"]),
                           np.asarray(o2["cls_logits"]))
    # Deterministic mode is reproducible.
    d1 = m.apply({"params": params}, x)
    d2 = m.apply({"params": params}, x)
    np.testing.assert_array_equal(np.asarray(d1["cls_logits"]),
                                  np.asarray(d2["cls_logits"]))


def test_three_class_model_end_to_end():
    """num_classes != 4 flows through heads, losses, ordinal math, and the
    evaluator (generality beyond the reference's fixed 4-class setup)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from rovit_kan_tpu.models.rovit_kan import RoViTKAN, predict
    from rovit_kan_tpu.training.losses import joint_loss

    model = RoViTKAN(embed_dim=32, depth=1, num_heads=2, image_size=32,
                     patch_size=16, num_classes=3, kan_layers=(32, 8, 1),
                     hidden_dim=16, use_pallas_attention=False,
                     use_pallas_kan=False)
    x = jnp.asarray(np.random.RandomState(0).randn(4, 32, 32, 3),
                    jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    out = model.apply({"params": params}, x, deterministic=True)
    assert out["cls_logits"].shape == (4, 3)
    assert out["ordinal_logits"].shape == (4, 2)        # K-1 thresholds

    labels = jnp.asarray([0, 1, 2, 1])
    losses = joint_loss(out, labels, labels.astype(jnp.float32), 4)
    assert np.isfinite(float(losses["total_loss"]))

    p = predict(model, params, x)
    np.testing.assert_allclose(np.asarray(p["ordinal_probs"]).sum(-1), 1.0,
                               atol=1e-5)
    assert p["cls_probs"].shape == (4, 3)


def test_auto_pallas_attention_policy(monkeypatch):
    """"auto" applies the measured v5e crossover: Pallas only for inference
    at >=512 tokens on TPU; training and short sequences stay XLA."""
    from rovit_kan_tpu.models.rovit_kan import _resolve_pallas_attention

    # Explicit bools pass through untouched.
    assert _resolve_pallas_attention(True, image_size=224, patch_size=16,
                                     inference=False) is True
    assert _resolve_pallas_attention(False, image_size=384, patch_size=16,
                                     inference=True) is False

    # Off-TPU: auto is always False (pin the backend — this suite may run
    # on a real TPU host).
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert _resolve_pallas_attention("auto", image_size=384, patch_size=16,
                                     inference=True) is False

    # On TPU: only bf16 inference at >=512 tokens flips on.
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    kw = dict(patch_size=16)
    assert _resolve_pallas_attention("auto", image_size=384, inference=True,
                                     **kw) is True      # 577 tokens
    assert _resolve_pallas_attention("auto", image_size=384, inference=False,
                                     **kw) is False     # training
    assert _resolve_pallas_attention("auto", image_size=224, inference=True,
                                     **kw) is False     # 197 tokens
    assert _resolve_pallas_attention("auto", image_size=384, inference=True,
                                     dtype=jnp.float32,
                                     **kw) is False     # unmeasured fp32


def test_build_model_auto_policy_defaults_to_xla_for_training():
    from rovit_kan_tpu.config import get_config
    from rovit_kan_tpu.models.rovit_kan import build_model

    cfg = get_config()
    assert cfg.tpu.use_pallas_attention == "auto"
    model = build_model(cfg)                     # training build, CPU
    assert model.use_pallas_attention is False


def test_scaled_presets_build_and_forward():
    """get_config presets: Small/Base widths build, forward, and keep the
    KAN input width tied to the embed dim (docs/VALIDATION.md validates
    the kernels + mesh recipes at these widths)."""
    import jax
    import jax.numpy as jnp
    from rovit_kan_tpu.config import get_config
    from rovit_kan_tpu.models.rovit_kan import build_model

    for preset, d, h in [("small", 384, 6), ("base", 768, 12)]:
        cfg = get_config(preset)
        assert cfg.model.embed_dim == d and cfg.model.num_heads == h
        assert cfg.model.kan_layers[0] == d
        cfg.data.image_size = 32          # tiny spatial size, real width
        cfg.flags.mixed_precision = False
        model = build_model(cfg)
        x = jnp.zeros((2, 32, 32, 3), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), x)["params"]
        out = model.apply({"params": params}, x, deterministic=True)
        assert out["cls_logits"].shape == (2, 4)
        assert out["features"].shape == (2, d)
    # Round-trip through the checkpoint dict keeps the preset widths.
    cfg2 = get_config("small")
    from rovit_kan_tpu.config import Config
    restored = Config.from_dict(cfg2.to_dict())
    assert restored.model.embed_dim == 384
    assert restored.model.kan_layers[0] == 384


def test_block_kernel_auto_policy_width_gate(monkeypatch):
    """'auto' keeps the fused block for inference at every width but gates
    TRAINING off above d=512 (the d=768 backward kernel exceeds the 16MB
    scoped-VMEM stack limit — docs/VALIDATION.md)."""
    import jax
    from rovit_kan_tpu.models.rovit_kan import _resolve_pallas_block
    import jax.numpy as jnp

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    for d in (192, 384, 768):
        assert _resolve_pallas_block("auto", inference=True,
                                     dtype=jnp.bfloat16, embed_dim=d)
    assert _resolve_pallas_block("auto", inference=False,
                                 dtype=jnp.bfloat16, embed_dim=192)
    assert _resolve_pallas_block("auto", inference=False,
                                 dtype=jnp.bfloat16, embed_dim=384)
    assert not _resolve_pallas_block("auto", inference=False,
                                     dtype=jnp.bfloat16, embed_dim=768)
    # fp32 stays XLA everywhere; explicit True/False override the table.
    assert not _resolve_pallas_block("auto", inference=True,
                                     dtype=jnp.float32, embed_dim=192)
    assert _resolve_pallas_block(True, inference=False,
                                 dtype=jnp.float32, embed_dim=768)
