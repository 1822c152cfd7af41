"""Inference engine: padding invariance, splitting, mesh serving."""
import numpy as np
import pytest

import jax

from rovit_kan_tpu.models.rovit_kan import RoViTKAN
from rovit_kan_tpu.serving import InferenceEngine
from rovit_kan_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def engine():
    model = RoViTKAN(embed_dim=32, depth=1, num_heads=2, image_size=32,
                     patch_size=16, kan_layers=(32, 8, 1), hidden_dim=16,
                     use_pallas_attention=False, use_pallas_kan=False)
    params = model.init(jax.random.PRNGKey(0),
                        np.zeros((1, 32, 32, 3), np.float32))["params"]
    eng = InferenceEngine(model, params, batch_size=8)
    eng.warmup()
    return eng


def _imgs(n, seed=0):
    return np.random.RandomState(seed).randint(
        0, 256, (n, 32, 32, 3)).astype(np.uint8)


def test_partial_batch_matches_full(engine):
    imgs = _imgs(8)
    full = engine.predict(imgs)
    partial = engine.predict(imgs[:3])
    for k in full:
        np.testing.assert_allclose(partial[k], full[k][:3], atol=1e-5,
                                   err_msg=k)
    assert partial["cls_probs"].shape == (3, 4)


def test_oversize_request_splits(engine):
    imgs = _imgs(19, seed=1)
    out = engine.predict(imgs)
    assert out["cls_pred"].shape == (19,)
    assert out["ordinal_severity"].shape == (19,)
    # Consistent with per-chunk predictions.
    first = engine.predict(imgs[:8])
    np.testing.assert_allclose(out["kan_severity"][:8],
                               first["kan_severity"], atol=1e-5)


def test_stats(engine):
    engine.predict(_imgs(8))
    s = engine.stats()
    assert s["requests"] >= 1
    assert s["images_per_sec"] > 0


def test_mesh_serving_matches_single_device():
    model = RoViTKAN(embed_dim=32, depth=1, num_heads=2, image_size=32,
                     patch_size=16, kan_layers=(32, 8, 1), hidden_dim=16,
                     use_pallas_attention=False, use_pallas_kan=False)
    params = model.init(jax.random.PRNGKey(0),
                        np.zeros((1, 32, 32, 3), np.float32))["params"]
    imgs = _imgs(16, seed=2)
    single = InferenceEngine(model, params, batch_size=16).predict(imgs)
    meshed = InferenceEngine(model, params, batch_size=16,
                             mesh=make_mesh(8)).predict(imgs)
    for k in single:
        np.testing.assert_allclose(meshed[k], single[k], atol=1e-5,
                                   err_msg=k)
