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
# MicroBatcher: dynamic request coalescing (rovit_kan_tpu/serving.py)
# ---------------------------------------------------------------------------

def test_microbatcher_matches_direct(engine):
    """Concurrent submits resolve to exactly the per-request predictions."""
    from rovit_kan_tpu.serving import MicroBatcher
    batcher = MicroBatcher(engine)
    try:
        reqs = [_imgs(n, seed=10 + n) for n in (1, 3, 2, 5, 1)]
        futs = [batcher.submit(r) for r in reqs]
        for req, fut in zip(reqs, futs):
            got = fut.result(timeout=60)
            want = engine.predict(req)
            assert got["cls_pred"].shape == (req.shape[0],)
            for k in want:
                np.testing.assert_allclose(got[k], want[k], atol=1e-5,
                                           err_msg=k)
    finally:
        batcher.close()


def test_microbatcher_coalesces(engine):
    """With a linger window, back-to-back small requests share ONE padded-
    batch program instead of six."""
    from rovit_kan_tpu.serving import MicroBatcher
    batcher = MicroBatcher(engine, window_ms=300.0)
    try:
        futs = [batcher.submit(_imgs(1, seed=20 + i)) for i in range(6)]
        for f in futs:
            f.result(timeout=60)
        s = batcher.stats()
        assert s["requests_coalesced"] == 6
        assert s["batches_run"] <= 2           # nominally 1
        assert s["mean_requests_per_batch"] >= 3
    finally:
        batcher.close()


def test_microbatcher_large_request_and_close(engine):
    """A request bigger than the engine batch passes through whole (the
    engine splits internally); close() drains, then rejects new work."""
    from rovit_kan_tpu.serving import MicroBatcher
    batcher = MicroBatcher(engine)
    imgs = _imgs(19, seed=30)
    fut = batcher.submit(imgs)
    batcher.close()                            # must drain the in-flight work
    out = fut.result(timeout=0)                # already resolved by close()
    np.testing.assert_allclose(out["kan_severity"],
                               engine.predict(imgs)["kan_severity"],
                               atol=1e-5)
    with pytest.raises(RuntimeError):
        batcher.submit(imgs)


def test_microbatcher_error_isolated_per_batch():
    """An engine failure rejects that batch's futures (no hang, no worker
    death) and later requests still succeed."""
    from rovit_kan_tpu.serving import MicroBatcher

    class FlakyEngine:
        batch_size = 8

        def __init__(self):
            self.calls = 0

        def predict(self, imgs):
            self.calls += 1
            if self.calls == 1:
                raise RuntimeError("boom")
            return {"cls_pred": np.zeros(imgs.shape[0], np.int32)}

        def stats(self):
            return {}

    batcher = MicroBatcher(FlakyEngine())
    try:
        bad = batcher.submit(_imgs(2, seed=40))
        with pytest.raises(RuntimeError, match="boom"):
            bad.result(timeout=60)
        ok = batcher.submit(_imgs(2, seed=41))
        assert ok.result(timeout=60)["cls_pred"].shape == (2,)
        with pytest.raises(ValueError):
            batcher.submit(np.zeros((32, 32, 3), np.uint8))   # ndim != 4
    finally:
        batcher.close()


class _RecordingEngine:
    """Stub engine: records per-call batch sizes, returns identity preds."""
    batch_size = 8
    model = None

    def __init__(self):
        self.call_sizes = []

    def predict(self, imgs):
        self.call_sizes.append(imgs.shape[0])
        return {"cls_pred": np.arange(imgs.shape[0], dtype=np.int32)}

    def stats(self):
        return {}


def test_microbatcher_fifo_carry():
    """A request that doesn't fit the remaining capacity LEADS the next
    batch instead of being re-queued behind newer arrivals (starvation)."""
    import threading
    from rovit_kan_tpu.serving import MicroBatcher

    all_queued = threading.Event()

    class GatedRecorder(_RecordingEngine):
        def predict(self, imgs):
            all_queued.wait(timeout=60)   # hold batch 1 until C is queued
            return super().predict(imgs)

    eng = GatedRecorder()
    batcher = MicroBatcher(eng, window_ms=300.0)
    try:
        a = batcher.submit(_imgs(4, seed=60))
        b = batcher.submit(_imgs(5, seed=61))
        c = batcher.submit(_imgs(1, seed=62))
        all_queued.set()
        for f in (a, b, c):
            f.result(timeout=60)
        # A runs alone (B doesn't fit 4+5>8 and must NOT be jumped by C);
        # B then leads the next batch and C coalesces behind it.
        assert eng.call_sizes == [4, 6], eng.call_sizes
    finally:
        all_queued.set()
        batcher.close()


def test_microbatcher_window_does_not_delay_inflight_results():
    """With a large linger window, the worker must still deliver an
    in-flight batch's results as soon as they're ready — the window only
    gates how long a batch WAITS TO FILL when the device is idle."""
    import threading
    import time as _time
    from rovit_kan_tpu.serving import MicroBatcher

    first_dispatched, b_submitted = threading.Event(), threading.Event()

    class AsyncStub:
        batch_size = 8
        model = None

        def dispatch(self, imgs):
            if not first_dispatched.is_set():
                first_dispatched.set()
                b_submitted.wait(timeout=60)  # guarantee B is queued
            return imgs

        def fetch(self, imgs):
            return {"cls_pred": np.zeros(imgs.shape[0], np.int32)}

        def stats(self):
            return {}

    batcher = MicroBatcher(AsyncStub(), window_ms=2000.0)
    try:
        a = batcher.submit(_imgs(5, seed=97))
        assert first_dispatched.wait(timeout=60)
        b = batcher.submit(_imgs(5, seed=98))   # can't coalesce with A
        b_submitted.set()
        t0 = _time.perf_counter()
        a.result(timeout=60)
        # Collecting B (already queued) must not park in the 2 s window
        # before A's ready results are fetched and delivered.
        assert _time.perf_counter() - t0 < 1.0
        b.result(timeout=60)
    finally:
        b_submitted.set()
        batcher.close()


def test_microbatcher_cancelled_future_does_not_kill_worker():
    """A client-side cancel() of a queued request is dropped by the worker
    (set_running_or_notify_cancel) — later requests still serve."""
    import threading
    from rovit_kan_tpu.serving import MicroBatcher

    entered, release = threading.Event(), threading.Event()

    class GatedEngine(_RecordingEngine):
        def predict(self, imgs):
            entered.set()            # worker is now provably busy
            release.wait(timeout=60)
            return super().predict(imgs)

    eng = GatedEngine()
    batcher = MicroBatcher(eng)
    try:
        first = batcher.submit(_imgs(1, seed=70))   # occupies the worker
        assert entered.wait(timeout=60)
        doomed = batcher.submit(_imgs(1, seed=71))  # queued behind it
        assert doomed.cancel()                      # still queued -> cancels
        release.set()
        assert first.result(timeout=60)["cls_pred"].shape == (1,)
        ok = batcher.submit(_imgs(2, seed=72))
        assert ok.result(timeout=60)["cls_pred"].shape == (2,)
        assert doomed.cancelled()
    finally:
        release.set()
        batcher.close()


def test_microbatcher_rejects_mismatched_request(engine):
    """Shape/dtype validation happens at submit() so one malformed request
    can't poison the batch it would coalesce into."""
    from rovit_kan_tpu.serving import MicroBatcher
    batcher = MicroBatcher(engine)
    try:
        with pytest.raises(ValueError, match="32x32"):
            batcher.submit(np.zeros((1, 16, 16, 3), np.uint8))
        with pytest.raises(ValueError, match="uint8"):
            batcher.submit(np.zeros((1, 32, 32, 3), np.float32))
        ok = batcher.submit(_imgs(2, seed=80))
        assert ok.result(timeout=60)["cls_pred"].shape == (2,)
    finally:
        batcher.close()


def test_microbatcher_pipelines_dispatch_before_fetch():
    """The worker dispatches batch k+1 to the device BEFORE fetching batch
    k (depth-2 pipeline): host collection/H2D overlap device compute."""
    import threading
    from rovit_kan_tpu.serving import MicroBatcher

    both_queued = threading.Event()
    events = []

    class AsyncStub:
        batch_size = 8
        model = None

        def dispatch(self, imgs):
            both_queued.wait(timeout=60)   # hold batch 1 until 2 is queued
            events.append(("dispatch", imgs.shape[0]))
            return imgs

        def fetch(self, imgs):
            events.append(("fetch", imgs.shape[0]))
            return {"cls_pred": np.zeros(imgs.shape[0], np.int32)}

        def stats(self):
            return {}

    batcher = MicroBatcher(AsyncStub())
    try:
        # 5+5 > 8 so the two requests can never coalesce into one batch.
        a = batcher.submit(_imgs(5, seed=95))
        b = batcher.submit(_imgs(5, seed=96))
        both_queued.set()
        a.result(timeout=60)
        b.result(timeout=60)
        assert events == [("dispatch", 5), ("dispatch", 5),
                          ("fetch", 5), ("fetch", 5)], events
    finally:
        both_queued.set()
        batcher.close()


def test_microbatcher_stress_random_sizes():
    """Fuzz: 60 requests of random sizes from 4 threads, a jittery engine
    — every future resolves with exactly ITS rows (identity encoded in
    the pixel values), nothing drops, nothing cross-slices."""
    import threading
    import time as _time
    from rovit_kan_tpu.serving import MicroBatcher

    rng = np.random.RandomState(0)

    class EchoEngine:
        batch_size = 8
        model = None

        def predict(self, imgs):
            _time.sleep(rng.uniform(0, 0.003))   # jitter the device time
            # Echo each row's identity byte back as its prediction.
            return {"cls_pred": imgs[:, 0, 0, 0].astype(np.int32)}

        def stats(self):
            return {}

    batcher = MicroBatcher(EchoEngine(), window_ms=2.0)
    sizes = [int(s) for s in np.random.RandomState(1).randint(1, 13, 60)]
    results: dict = {}

    def client(ids):
        for i in ids:
            req = np.full((sizes[i], 8, 8, 3), i % 251, np.uint8)
            results[i] = (i % 251, batcher.submit(req))

    try:
        threads = [threading.Thread(target=client,
                                    args=(range(t, 60, 4),))
                   for t in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert len(results) == 60
        for i, (ident, fut) in results.items():
            out = fut.result(timeout=60)["cls_pred"]
            assert out.shape == (sizes[i],)
            assert np.all(out == ident), (i, ident, out)
    finally:
        batcher.close()


def test_microbatcher_close_drains_carry():
    """close() resolves a carried (didn't-fit) request, not just queued
    ones."""
    from rovit_kan_tpu.serving import MicroBatcher
    eng = _RecordingEngine()
    batcher = MicroBatcher(eng, window_ms=200.0)
    a = batcher.submit(_imgs(4, seed=90))
    b = batcher.submit(_imgs(5, seed=91))   # becomes the carry after A
    batcher.close()
    assert a.result(timeout=0)["cls_pred"].shape == (4,)
    assert b.result(timeout=0)["cls_pred"].shape == (5,)


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

        metrics = urllib.request.urlopen(
            f"{base}/metrics", timeout=30).read().decode()
        assert "# TYPE rovit_serving_requests counter" in metrics
        assert "rovit_serving_images_per_sec" in metrics

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
        server.batcher.close()


def test_http_concurrent_requests_coalesce(engine):
    """Six parallel single-image POSTs ride ONE (or two) padded-batch
    programs through the MicroBatcher, and every client gets its own
    correct slice back."""
    import io
    import json
    import sys
    import threading
    import urllib.request
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent.parent / "scripts"))
    from serve import make_server

    server = make_server(engine, host="127.0.0.1", port=0,
                         batch_window_ms=300.0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{port}"
        results = {}

        def post(i):
            buf = io.BytesIO()
            np.save(buf, _imgs(1, seed=50 + i))
            results[i] = json.loads(urllib.request.urlopen(
                urllib.request.Request(f"{base}/predict", buf.getvalue()),
                timeout=60).read())

        threads = [threading.Thread(target=post, args=(i,))
                   for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        for i in range(6):
            want = engine.predict(_imgs(1, seed=50 + i))
            np.testing.assert_allclose(results[i]["cls_probs"],
                                       want["cls_probs"], atol=1e-5)

        health = json.loads(urllib.request.urlopen(
            f"{base}/healthz", timeout=30).read())
        assert health["requests_coalesced"] >= 6
        assert health["batches_run"] <= health["requests_coalesced"] - 3
    finally:
        server.shutdown()
        server.server_close()
        server.batcher.close()


def test_temperature_scales_served_confidences(engine):
    """Calibrated engine: cls_probs = softmax(logits/T). The identity
    softmax(z/T) == normalize(softmax(z)^(1/T)) checks it against the raw
    engine without re-deriving logits; argmax and every non-confidence
    output are invariant (positive scalar divide)."""
    cal = InferenceEngine(engine.model, engine.params, batch_size=8,
                          temperature=2.0)
    imgs = _imgs(8, seed=3)
    raw = engine.predict(imgs)
    out = cal.predict(imgs)
    want = raw["cls_probs"].astype(np.float64) ** 0.5
    want /= want.sum(axis=1, keepdims=True)
    np.testing.assert_allclose(out["cls_probs"], want, atol=1e-5)
    np.testing.assert_array_equal(out["cls_pred"], raw["cls_pred"])
    np.testing.assert_allclose(out["kan_severity"], raw["kan_severity"],
                               atol=1e-6)
    np.testing.assert_allclose(out["ordinal_probs"], raw["ordinal_probs"],
                               atol=1e-6)


def test_invalid_temperature_rejected(engine):
    """A corrupted/hand-edited sidecar (T=0, negative, NaN, inf) must fail
    loudly at engine construction: T=0 would divide by zero and T<0 would
    silently serve cls_probs whose argmax contradicts cls_pred."""
    from rovit_kan_tpu.serving import build_serving_forward

    for bad in (0.0, -1.0, float("nan"), float("inf")):
        with pytest.raises(ValueError, match="temperature"):
            build_serving_forward(engine.model, temperature=bad)
        with pytest.raises(ValueError, match="temperature"):
            InferenceEngine(engine.model, engine.params, batch_size=4,
                            temperature=bad)
    assert callable(build_serving_forward(engine.model, temperature=1.0))


def test_load_engine_adopts_sidecar_temperature(tmp_path):
    """evaluate.py --store_temperature writes T into the checkpoint meta
    sidecar (update_meta); load_engine adopts it by default, an explicit
    argument overrides, and the sidecar merge preserves existing fields."""
    from rovit_kan_tpu.config import get_config
    from rovit_kan_tpu.serving import load_engine
    from rovit_kan_tpu.utils.checkpoint import (
        load_meta, save_checkpoint, update_meta)

    model, params = _tiny_model_params()
    cfg = get_config()
    cfg.data.image_size = 32
    cfg.model.embed_dim = 32
    cfg.model.depth = 1
    cfg.model.num_heads = 2
    cfg.model.kan_layers = [32, 8, 1]
    cfg.model.hidden_dim = 16
    save_checkpoint(tmp_path / "ck", params, epoch=7, config=cfg)

    eng = load_engine(tmp_path / "ck", batch_size=4)
    assert eng.temperature == 1.0          # no sidecar entry -> raw

    merged = update_meta(tmp_path / "ck", temperature=1.7)
    assert merged["epoch"] == 7            # merge, not overwrite
    meta = load_meta(tmp_path / "ck")
    assert meta["temperature"] == pytest.approx(1.7)
    assert meta["epoch"] == 7

    eng2 = load_engine(tmp_path / "ck", batch_size=4)
    assert eng2.temperature == pytest.approx(1.7)
    eng3 = load_engine(tmp_path / "ck", batch_size=4, temperature=1.0)
    assert eng3.temperature == 1.0         # explicit override wins

    imgs = _imgs(4, seed=5)
    hot = eng2.predict(imgs)["cls_probs"]
    cold = eng3.predict(imgs)["cls_probs"]
    # T>1 softens: calibrated max-confidence strictly below raw.
    assert (hot.max(axis=1) < cold.max(axis=1)).all()


def test_export_bakes_temperature(tmp_path):
    """export_serving(temperature=T) bakes the calibration divide into the
    StableHLO artifact."""
    from rovit_kan_tpu.export import export_serving, load_serving
    from rovit_kan_tpu.serving import build_serving_forward

    model, params = _tiny_model_params()
    fn = load_serving(export_serving(model, params, batch_size=4,
                                     temperature=3.0))
    x = _imgs(4, seed=6)
    got = fn(x)
    want = jax.jit(build_serving_forward(model, temperature=3.0))(params, x)
    np.testing.assert_allclose(np.asarray(got["cls_probs"]),
                               np.asarray(want["cls_probs"]),
                               rtol=1e-5, atol=1e-6)
    raw = jax.jit(build_serving_forward(model))(params, x)
    assert not np.allclose(np.asarray(got["cls_probs"]),
                           np.asarray(raw["cls_probs"]), atol=1e-4)
