"""Fused augmentation kernel vs the XLA pipeline (ops/preprocess.py).

Both paths draw identical randomness (same key splits), so outputs are
directly comparable per sample: exact-math parity at f32 compute, bf16
rounding only at the default bf16 compute.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rovit_kan_tpu.ops.augment_kernel import fused_augment_batch
from rovit_kan_tpu.ops.preprocess import augment_batch

# Small geometry keeps interpret mode fast; W*3 exercises the flat-lane
# layout with a non-trivial lane count.
B, H, W = 4, 32, 32


def _u8(seed=0):
    return jnp.asarray(np.random.RandomState(seed).randint(
        0, 256, (B, H, W, 3)), jnp.uint8)


def test_f32_compute_matches_xla_path():
    key = jax.random.PRNGKey(3)
    x = _u8()
    want = augment_batch(key, x)
    got = fused_augment_batch(key, x, compute_dtype=jnp.float32,
                              interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)


def test_bf16_compute_close_to_xla_path():
    key = jax.random.PRNGKey(4)
    x = _u8(1)
    want = np.asarray(augment_batch(key, x))
    got = np.asarray(fused_augment_batch(key, x, interpret=True))
    # bf16 has ~2-3 decimal digits; normalized space spans ~[-2.6, 2.6].
    np.testing.assert_allclose(got, want, atol=0.08)
    # and the error must be rounding, not structure: high correlation.
    assert np.corrcoef(got.ravel(), want.ravel())[0, 1] > 0.999


def test_flips_actually_applied():
    """With a key where some flip coin lands 1, the fused output must
    reflect the same flip the XLA path applied — check via argmax pixel
    position of a delta image."""
    key = jax.random.PRNGKey(11)
    img = np.zeros((B, H, W, 3), np.uint8)
    img[:, 2, 3, :] = 255  # single bright pixel off-center
    want = np.asarray(augment_batch(key, jnp.asarray(img)))
    got = np.asarray(fused_augment_batch(key, jnp.asarray(img),
                                         compute_dtype=jnp.float32,
                                         interpret=True))
    for b in range(B):
        pw = np.unravel_index(np.argmax(want[b].sum(-1)), (H, W))
        pg = np.unravel_index(np.argmax(got[b].sum(-1)), (H, W))
        assert pw == pg


def test_out_dtype_bf16():
    key = jax.random.PRNGKey(5)
    out = fused_augment_batch(key, _u8(2), out_dtype=jnp.bfloat16,
                              interpret=True)
    assert out.dtype == jnp.bfloat16
    assert out.shape == (B, H, W, 3)
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())


def test_batch_independence():
    """Image i's augmented output depends only on image i's pixels (the
    per-image grid must not leak across programs)."""
    key = jax.random.PRNGKey(6)
    base = np.asarray(_u8(3))
    alt = base.copy()
    alt[0] = 255 - alt[0]
    a = np.asarray(fused_augment_batch(key, jnp.asarray(base),
                                       compute_dtype=jnp.float32,
                                       interpret=True))
    b = np.asarray(fused_augment_batch(key, jnp.asarray(alt),
                                       compute_dtype=jnp.float32,
                                       interpret=True))
    assert not np.allclose(a[0], b[0])
    np.testing.assert_array_equal(a[1:], b[1:])
