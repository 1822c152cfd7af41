"""Explainability: rollout math vs a literal NumPy transcription of the
reference algorithm, Grad-CAM++ math goldens, KAN trajectory consistency,
figure generation."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rovit_kan_tpu.models.rovit_kan import RoViTKAN
from rovit_kan_tpu.models.kan import KANSeverityModule
from rovit_kan_tpu.explainability.attention_maps import (
    ViTAttentionRollout, attention_rollout)
from rovit_kan_tpu.explainability.gradcam import (
    GradCAMPlusPlus, _cam_from_grads)
from rovit_kan_tpu.explainability.kan_viz import KANVisualizer, kan_trajectory


def _tiny_model():
    return RoViTKAN(embed_dim=32, depth=2, num_heads=2, image_size=32,
                    patch_size=16, kan_layers=(32, 8, 1), hidden_dim=16,
                    use_pallas_attention=False, use_pallas_kan=False)


@pytest.fixture(scope="module")
def model_and_params():
    model = _tiny_model()
    params = model.init(jax.random.PRNGKey(0),
                        np.zeros((1, 32, 32, 3), np.float32))["params"]
    return model, params


def _rollout_numpy(attention, head_fusion="mean"):
    """Literal transcription of reference attention_maps.py:62-105 for one
    example (no resize/normalize)."""
    fused = []
    for layer in attention:               # (B, h, N, N)
        a = layer[0]
        if head_fusion == "mean":
            fused.append(a.mean(0))
        elif head_fusion == "max":
            fused.append(a.max(0))
        else:
            fused.append(a.min(0))
    n = fused[0].shape[0]
    rollout = np.eye(n)
    for a in fused:
        aw = a + np.eye(n)
        aw = aw / aw.sum(-1, keepdims=True)
        rollout = rollout @ aw
    return rollout[0, 1:]


@pytest.mark.parametrize("fusion", ["mean", "max", "min"])
def test_rollout_matches_reference_algorithm(fusion):
    rng = np.random.RandomState(0)
    depth, B, h, N = 3, 2, 2, 5
    logits = rng.randn(depth, B, h, N, N)
    attn = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)

    golden = _rollout_numpy(attn, fusion)                 # (N-1,) example 0
    g = int(np.sqrt(N - 1))
    golden_map = golden.reshape(g, g)
    golden_norm = (golden_map - golden_map.min()) / (
        golden_map.max() - golden_map.min() + 1e-8)

    got = attention_rollout(jnp.asarray(attn), head_fusion=fusion,
                            image_size=g)                 # no resize at g
    np.testing.assert_allclose(np.asarray(got[0]), golden_norm, atol=1e-5)


def test_rollout_end_to_end(model_and_params):
    model, params = model_and_params
    roller = ViTAttentionRollout(model, params)
    x = jnp.asarray(np.random.RandomState(1).randn(2, 32, 32, 3), jnp.float32)
    maps = roller.generate(x)
    assert maps.shape == (2, 32, 32)
    assert maps.min() >= 0.0 and maps.max() <= 1.0 + 1e-6
    # Different images -> different maps.
    assert not np.allclose(maps[0], maps[1])


def _gradcam_numpy(acts, grads):
    """Literal transcription of reference gradcam.py:71-104 (no resize)."""
    g2, g3 = grads ** 2, grads ** 3
    denom = 2 * g2 + (acts * g3).sum(1, keepdims=True)
    denom = np.where(denom != 0.0, denom, 1.0)
    alpha = g2 / denom
    weights = (alpha * np.maximum(grads, 0)).sum(2, keepdims=True)
    cam = (weights * acts).sum(2)[:, 1:]
    cam = np.maximum(cam, 0)
    n = int(np.sqrt(cam.shape[1]))
    cam = cam.reshape(-1, n, n)
    mn = cam.min((1, 2), keepdims=True)
    mx = cam.max((1, 2), keepdims=True)
    return np.where(mx > mn, (cam - mn) / (mx - mn + 1e-12), 0.0)


def test_gradcam_math_golden():
    rng = np.random.RandomState(2)
    acts = rng.randn(2, 5, 8).astype(np.float32)
    grads = rng.randn(2, 5, 8).astype(np.float32)
    golden = _gradcam_numpy(acts, grads)
    got = _cam_from_grads(jnp.asarray(acts), jnp.asarray(grads), 2)
    np.testing.assert_allclose(np.asarray(got), golden, atol=1e-5)


def test_gradcam_end_to_end(model_and_params):
    model, params = model_and_params
    gc = GradCAMPlusPlus(model, params)
    x = jnp.asarray(np.random.RandomState(3).randn(2, 32, 32, 3), jnp.float32)
    cams = gc.compute(x)
    assert cams.shape == (2, 32, 32)
    assert cams.min() >= 0.0 and cams.max() <= 1.0 + 1e-6
    # Explicit target class works too.
    cams_t = gc.compute(x, class_idx=np.array([1, 2]))
    assert cams_t.shape == (2, 32, 32)


def test_gradcam_perturbation_tap_is_true_gradient(model_and_params):
    """The zero-perturbation trick must give d(logit)/d(norm1_out): check by
    finite differences through the tap."""
    model, params = model_and_params
    x = jnp.asarray(np.random.RandomState(4).randn(1, 32, 32, 3), jnp.float32)
    N = (32 // 16) ** 2 + 1
    zeros = jnp.zeros((1, N, 32))

    def f(p):
        out = model.apply({"params": params}, x, deterministic=True,
                          gradcam_perturbation=p)
        return out["cls_logits"][0, 0]

    g = jax.grad(f)(zeros)
    eps = 1e-2   # large enough to beat fp32 rounding in the fwd pass
    probe = np.zeros((1, N, 32), np.float32)
    probe[0, 2, 5] = eps
    fd = (f(jnp.asarray(probe)) - f(-jnp.asarray(probe))) / (2 * eps)
    assert np.asarray(g)[0, 2, 5] == pytest.approx(float(fd), rel=5e-2,
                                                   abs=2e-4)


def test_kan_trajectory_matches_module():
    kan = KANSeverityModule((16, 8, 1), use_pallas=False)
    x = jnp.asarray(np.random.RandomState(5).randn(4, 16), jnp.float32)
    params = kan.init(jax.random.PRNGKey(0), x)["params"]
    golden = kan.apply({"params": params}, x,
                       method=KANSeverityModule.activation_trajectory)
    got = kan_trajectory(params, x)
    assert len(got) == len(golden)
    for a, b in zip(got, golden):
        np.testing.assert_allclose(a, np.asarray(b), atol=1e-5)
    # Final score bounded to [0, 3].
    assert got[-1].min() >= 0.0 and got[-1].max() <= 3.0


def test_kan_visualizer_figures(tmp_path):
    kan = KANSeverityModule((16, 8, 1), use_pallas=False)
    x = jnp.asarray(np.random.RandomState(6).randn(12, 16), jnp.float32)
    params = kan.init(jax.random.PRNGKey(0), x)["params"]
    viz = KANVisualizer(params, output_dir=tmp_path)
    sev = np.random.RandomState(7).randint(0, 4, 12)
    p1 = viz.plot_spline_activations()
    p2 = viz.plot_severity_trajectory(x, sev)
    p3 = viz.plot_severity_distribution(sev + 0.1, sev,
                                        ["a", "b", "c", "d"])
    p4 = viz.plot_spline_weights_heatmap()
    for p in (p1, p2, p3, p4):
        assert p.exists()
