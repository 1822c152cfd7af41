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


# ---------------------------------------------------------------------------
# AOT export (rovit_kan_tpu/export.py): StableHLO serving artifacts
# ---------------------------------------------------------------------------

def _tiny_model_params():
    model = RoViTKAN(embed_dim=32, depth=1, num_heads=2, image_size=32,
                     patch_size=16, kan_layers=(32, 8, 1), hidden_dim=16,
                     use_pallas_attention=False, use_pallas_kan=False)
    params = model.init(jax.random.PRNGKey(0),
                        np.zeros((1, 32, 32, 3), np.float32))["params"]
    return model, params


def test_moe_model_serves_and_exports():
    """The opt-in MoE variant (models/moe.py) rides the same serving and
    AOT-export paths: top_k / one-hot dispatch are plain XLA ops, so the
    StableHLO artifact needs nothing extra."""
    from rovit_kan_tpu.export import export_serving
    from rovit_kan_tpu.serving import build_serving_forward

    model = RoViTKAN(embed_dim=32, depth=2, num_heads=2, image_size=32,
                     patch_size=16, kan_layers=(32, 8, 1), hidden_dim=16,
                     use_pallas_attention=False, use_pallas_kan=False,
                     moe_experts=4, moe_every=2)
    params = model.init(jax.random.PRNGKey(0),
                        np.zeros((1, 32, 32, 3), np.float32))["params"]
    eng = InferenceEngine(model, params, batch_size=4)
    eng.warmup()
    out = eng.predict(_imgs(3, seed=5))
    assert out["cls_probs"].shape == (3, 4)
    assert np.all(np.isfinite(out["kan_severity"]))

    blob = export_serving(model, params, batch_size=2)
    exported = jax.export.deserialize(bytearray(blob))
    x = _imgs(2, seed=6)
    got = exported.call(x)
    want = jax.jit(build_serving_forward(model))(params, x)
    np.testing.assert_allclose(np.asarray(got["cls_probs"]),
                               np.asarray(want["cls_probs"]),
                               rtol=1e-5, atol=1e-6)


def test_export_roundtrip(tmp_path):
    """Serialize -> reload from bytes on disk -> outputs equal the live
    jitted serving function (weights baked into the artifact)."""
    from rovit_kan_tpu.export import save_exported, load_exported
    from rovit_kan_tpu.serving import build_serving_forward

    model, params = _tiny_model_params()
    path = tmp_path / "model.stablehlo"
    n_bytes = save_exported(path, model, params, batch_size=4)
    assert n_bytes == path.stat().st_size > 1000

    x = _imgs(4, seed=3)
    got = load_exported(path)(x)
    want = jax.jit(build_serving_forward(model))(params, x)
    assert sorted(got.keys()) == sorted(want.keys())
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                   rtol=1e-5, atol=1e-6)


def test_export_fixed_shape_contract(tmp_path):
    """The artifact is fixed-shape: a wrong batch size must raise, not
    silently recompile (that's the serving contract)."""
    from rovit_kan_tpu.export import export_serving, load_serving

    model, params = _tiny_model_params()
    fn = load_serving(export_serving(model, params, batch_size=4))
    with pytest.raises(Exception):
        fn(_imgs(2))


def test_exported_artifact_needs_no_model_code(tmp_path):
    """Loading uses only jax.export.deserialize — no config, checkpoint,
    or model class. (Guards against accidentally capturing host state.)"""
    from rovit_kan_tpu.export import export_serving

    model, params = _tiny_model_params()
    blob = export_serving(model, params, batch_size=2)
    exported = jax.export.deserialize(bytearray(blob))
    out = exported.call(_imgs(2, seed=7))
    assert np.asarray(out["cls_probs"]).shape == (2, 4)
    assert np.all(np.isfinite(np.asarray(out["kan_severity"])))


def test_http_server_roundtrip(engine):
    """scripts/serve.py: POST .npy images -> JSON predictions; /healthz
    readiness; malformed bodies get 400 not a crash."""
    import io
    import json
    import sys
    import threading
    import urllib.request
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent.parent / "scripts"))
    from serve import make_server

    server = make_server(engine, host="127.0.0.1", port=0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"
        buf = io.BytesIO()
        np.save(buf, _imgs(3, seed=9))
        got = json.loads(urllib.request.urlopen(
            urllib.request.Request(f"{base}/predict", buf.getvalue()),
            timeout=30).read())
        assert len(got["cls_pred"]) == 3
        assert len(got["cls_probs"][0]) == 4
        want = engine.predict(_imgs(3, seed=9))
        np.testing.assert_allclose(got["cls_probs"], want["cls_probs"],
                                   atol=1e-6)

        health = json.loads(urllib.request.urlopen(
            f"{base}/healthz", timeout=30).read())
        assert health["requests"] >= 1

        bad = urllib.request.Request(f"{base}/predict", b"not npy")
        try:
            urllib.request.urlopen(bad, timeout=30)
            assert False, "malformed body should 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400

        # Wrong resolution must be a 400 (fixed-shape serving program),
        # not a retrace-then-500.
        buf2 = io.BytesIO()
        np.save(buf2, np.zeros((1, 16, 16, 3), np.uint8))
        wrong = urllib.request.Request(f"{base}/predict", buf2.getvalue())
        try:
            urllib.request.urlopen(wrong, timeout=30)
            assert False, "wrong resolution should 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        server.shutdown()
        server.server_close()
