"""Evaluator end-to-end on a tiny model + synthetic data."""
import numpy as np
import pytest

from rovit_kan_tpu.config import get_config
from rovit_kan_tpu.data.synthetic import generate_synthetic_dataset
from rovit_kan_tpu.data.dataset import RoseLeafDataset, Loader
from rovit_kan_tpu.models.rovit_kan import RoViTKAN
from rovit_kan_tpu.evaluation.evaluator import Evaluator

import jax


def _tiny_cfg(tmp):
    cfg = get_config()
    cfg.data.image_size = 32
    cfg.paths.results_dir = tmp / "results"
    return cfg


def _tiny_model(**kw):
    return RoViTKAN(embed_dim=32, depth=1, num_heads=2, image_size=32,
                    patch_size=16, kan_layers=(32, 8, 1), hidden_dim=16,
                    use_pallas_attention=False, use_pallas_kan=False, **kw)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("eval")
    cfg = _tiny_cfg(tmp)
    root = generate_synthetic_dataset(tmp / "orig", n_per_class=3, size=32)
    ds = RoseLeafDataset(root, cfg.data.class_names, cfg.data.severity_map,
                         image_size=32)
    loader = Loader(ds, batch_size=5)   # 12 images -> ragged last batch
    model = _tiny_model()
    params = model.init(jax.random.PRNGKey(0),
                        np.zeros((1, 32, 32, 3), np.float32))["params"]
    return cfg, model, params, loader, tmp


def test_evaluate_full(setup):
    cfg, model, params, loader, tmp = setup
    ev = Evaluator(model, params, loader, cfg, output_dir=tmp / "results")
    r = ev.evaluate(run_fps=False)
    assert 0.0 <= r["accuracy"] <= 1.0
    assert 0.0 <= r["macro_f1"] <= 1.0
    assert r["n_test"] == 12
    assert not r["severity_is_fallback"]
    assert len(r["per_class"]) == 4
    assert np.asarray(r["confusion_matrix"]).sum() == 12
    # KAN severity is bounded to [0, 3].
    assert 0.0 <= r["mae"] <= 3.0
    # Report files + figures exist.
    out = tmp / "results"
    for f in ("evaluation_results.txt", "test_metrics.json",
              "confusion_matrix.png", "confidence_histogram.png",
              "severity_scatter.png"):
        assert (out / f).exists(), f


def test_evaluate_on_device_matches_host(setup):
    cfg, model, params, loader, tmp = setup
    ev = Evaluator(model, params, loader, cfg, output_dir=tmp / "dev")
    host = ev.evaluate(run_fps=False, save=False)
    dev = ev.evaluate_on_device()
    for k in ("accuracy", "macro_f1", "mae", "spearman_rho",
              "brier_score", "ece"):
        assert dev[k] == pytest.approx(host[k], abs=1e-5), k


def test_severity_fallback_artifact(setup):
    """No-KAN model reproduces the reference's MAE=0/rho=1 artifact
    (reference evaluator.py:50-53)."""
    cfg, _, _, loader, tmp = setup
    model = _tiny_model(with_kan=False)
    params = model.init(jax.random.PRNGKey(1),
                        np.zeros((1, 32, 32, 3), np.float32))["params"]
    ev = Evaluator(model, params, loader, cfg, output_dir=tmp / "nk")
    r = ev.evaluate(run_fps=False, save=False)
    assert r["severity_is_fallback"]
    assert r["mae"] == pytest.approx(0.0)
    assert r["spearman_rho"] == pytest.approx(1.0)


def test_severity_fallback_on_device_path(setup):
    """evaluate_on_device must apply the same severity_fallback convention
    as evaluate() — a no-KAN model reports MAE=0/rho=1 (flagged) on BOTH
    eval paths, never a contradictory pair."""
    cfg, _, _, loader, tmp = setup
    model = _tiny_model(with_kan=False)
    params = model.init(jax.random.PRNGKey(1),
                        np.zeros((1, 32, 32, 3), np.float32))["params"]
    ev = Evaluator(model, params, loader, cfg, output_dir=tmp / "nkd")
    dev = ev.evaluate_on_device()
    assert dev["severity_is_fallback"]
    assert dev["mae"] == pytest.approx(0.0)
    assert dev["spearman_rho"] == pytest.approx(1.0)
    # Explicit opt-out scores the real (zero) predictor.
    raw = ev.evaluate_on_device(severity_fallback=False)
    assert not raw["severity_is_fallback"]
    assert raw["mae"] > 0.0


def test_load_at_different_resolution(setup, tmp_path):
    """image_size override: pos-embed bilinearly transferred to the new
    grid; the rebuilt model runs at the new resolution."""
    import jax.numpy as jnp
    from rovit_kan_tpu.utils.checkpoint import save_checkpoint
    from rovit_kan_tpu.evaluation.evaluator import load_model_for_evaluation

    cfg, model, params, _, _ = setup
    cfg2 = _tiny_cfg(tmp_path)
    cfg2.model.embed_dim = 32
    cfg2.model.depth = 1
    cfg2.model.num_heads = 2
    cfg2.model.kan_layers = [32, 8, 1]
    cfg2.model.hidden_dim = 16
    save_checkpoint(tmp_path / "ck", params, config=cfg2)

    m64, p64 = load_model_for_evaluation(tmp_path / "ck", image_size=64)
    assert m64.image_size == 64
    # 32px/16 -> 2x2 grid (5 tokens); 64px -> 4x4 grid (17 tokens).
    assert p64["backbone"]["pos_embed"].shape == (1, 17, 32)
    out = m64.apply({"params": p64},
                    jnp.zeros((2, 64, 64, 3), jnp.float32),
                    deterministic=True)
    assert out["cls_logits"].shape == (2, 4)

    # Native load unchanged.
    m32, p32 = load_model_for_evaluation(tmp_path / "ck")
    assert m32.image_size == 32
    np.testing.assert_array_equal(p32["backbone"]["pos_embed"],
                                  np.asarray(params["backbone"]["pos_embed"]))
