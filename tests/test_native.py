"""Native C++ preprocessing engine vs NumPy oracles."""
import numpy as np
import pytest

from rovit_kan_tpu import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain")


def _bilinear_oracle(img, dh, dw):
    """Half-pixel-center bilinear resize (align_corners=False), float path
    then round — the spec the C++ engine implements."""
    sh, sw, _ = img.shape
    ys = np.clip((np.arange(dh) + 0.5) * sh / dh - 0.5, 0, sh - 1)
    xs = np.clip((np.arange(dw) + 0.5) * sw / dw - 0.5, 0, sw - 1)
    y0 = ys.astype(int)
    x0 = xs.astype(int)
    y1 = np.minimum(y0 + 1, sh - 1)
    x1 = np.minimum(x0 + 1, sw - 1)
    fy = (ys - y0)[:, None, None]
    fx = (xs - x0)[None, :, None]
    img = img.astype(np.float32)
    top = img[y0][:, x0] * (1 - fx) + img[y0][:, x1] * fx
    bot = img[y1][:, x0] * (1 - fx) + img[y1][:, x1] * fx
    return np.uint8(top * (1 - fy) + bot * fy + 0.5)


def test_resize_matches_oracle():
    rng = np.random.RandomState(0)
    imgs = [rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
            for h, w in [(100, 80), (224, 224), (37, 61), (400, 300)]]
    got = native.resize_batch(imgs, 64)
    assert got.shape == (4, 64, 64, 3)
    for i, im in enumerate(imgs):
        want = _bilinear_oracle(im, 64, 64)
        # Allow off-by-one from float rounding order.
        diff = np.abs(got[i].astype(int) - want.astype(int))
        assert diff.max() <= 1, f"image {i}: max diff {diff.max()}"


def test_resize_identity():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (64, 64, 3), dtype=np.uint8)
    got = native.resize_batch([img], 64)
    np.testing.assert_array_equal(got[0], img)


def test_normalize_matches_numpy():
    rng = np.random.RandomState(2)
    batch = rng.randint(0, 256, (3, 32, 32, 3), dtype=np.uint8)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    got = native.normalize_batch(batch, mean, std)
    want = (batch.astype(np.float32) / 255.0 - mean) / std
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_threaded_equals_single_thread():
    rng = np.random.RandomState(3)
    imgs = [rng.randint(0, 256, (123, 77, 3), dtype=np.uint8)
            for _ in range(16)]
    a = native.resize_batch(imgs, 48, n_threads=1)
    b = native.resize_batch(imgs, 48, n_threads=8)
    np.testing.assert_array_equal(a, b)
