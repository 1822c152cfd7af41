"""Whole-augmentation-pipeline fused Pallas kernel.

The round-3 train-step profile put the augmentation chain at ~29% of the
bs64 fused train step (3.4 ms of 11.7 ms): `ops/preprocess.augment_batch`
is ~10 elementwise/select passes over a (B, 224, 224, 3) fp32 tensor
(u8->f32, two reverse+select flips, brightness, a contrast pass split by
its per-image mean reduction, grayscale + saturation blend, normalize),
each bounded by HBM bandwidth, with fusion barriers at the reduction.

This kernel does the whole chain in ONE pass: read the uint8 batch once
(9.6 MB at bs64), keep the image in VMEM through every stage, write the
normalized result once. The TPU-native formulation flattens each image to
a (H, W*3) tile — W*3 = 672 lanes, perfectly divisible layout — and turns
the two data-movement ops into MXU matmuls with constant matrices:

    horizontal flip   x @ P_h    P_h[p*3+c, (W-1-p)*3+c] = 1
    vertical flip     P_v @ x    P_v[i, H-1-i] = 1
    grayscale         x @ M      M[3p+c, 3p+c'] = w_c  (ITU-R 601 weights)

(A (224, 672) @ (672, 672) permutation costs 0.2 GFLOP — noise for the
MXU — and sidesteps Mosaic's lack of a lane-reversal primitive.) The
contrast pivot (mean of the grayscale image) collapses to one weighted
f32 reduction with a (1, W*3) weight row, so no separate grayscale pass
is needed for it. Per-image random factors (flip coins, jitter factors)
are drawn OUTSIDE the kernel with byte-identical key splits to
`augment_batch`, so both paths consume the same randomness and can be
compared sample-for-sample.

Compute dtype: bf16 by default (the training policy that engages this
kernel is the bf16 one; u8 pixels are exact in bf16 and jitter factors
are data noise by definition), f32 available for tight-parity tests.

Replaces the torchvision CPU transform stack the reference runs per
sample per epoch (`/root/reference/data/dataset.py:15-76`, README.md:139).
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rovit_kan_tpu.ops.preprocess import IMAGENET_MEAN, IMAGENET_STD

_GRAY_W = (0.299, 0.587, 0.114)


@functools.lru_cache(maxsize=4)
def _constants(H: int, W: int):
    """Static numpy matrices for one (H, W) image geometry."""
    W3 = W * 3
    ph = np.zeros((W3, W3), np.float32)
    for p in range(W):
        for c in range(3):
            ph[p * 3 + c, (W - 1 - p) * 3 + c] = 1.0
    pv = np.zeros((H, H), np.float32)
    pv[np.arange(H), H - 1 - np.arange(H)] = 1.0
    m = np.zeros((W3, W3), np.float32)
    for p in range(W):
        for c in range(3):
            for c2 in range(3):
                m[p * 3 + c, p * 3 + c2] = _GRAY_W[c]
    mean = np.tile(np.asarray(IMAGENET_MEAN, np.float32), W)[None]
    inv_std = 1.0 / np.tile(np.asarray(IMAGENET_STD, np.float32), W)[None]
    wmean = np.tile(np.asarray(_GRAY_W, np.float32), W)[None] / (H * W)
    return ph, pv, m, mean, inv_std, wmean


def _augment_kernel(x_ref, f_ref, ph_ref, pv_ref, m_ref, mean_ref,
                    istd_ref, wmean_ref, o_ref, *, compute_dtype):
    cd = compute_dtype
    # Per-image factors live in SMEM as the full (B, 8) array (a per-image
    # (1, 8) VMEM block is Mosaic-illegal: sublane dim 1 is neither a
    # multiple of 8 nor the full array dim) — index the grid row directly.
    i = pl.program_id(0)
    fh, fv = f_ref[i, 0], f_ref[i, 1]
    fb, fc, fs = (f_ref[i, 2].astype(cd), f_ref[i, 3].astype(cd),
                  f_ref[i, 4].astype(cd))

    # Mosaic has no unsigned->float cast; u8 pixels (0..255) are exact
    # through the supported i32 hop.
    x = (x_ref[0].astype(jnp.int32).astype(jnp.float32)
         * (1.0 / 255.0)).astype(cd)

    xh = jax.lax.dot(x, ph_ref[:], preferred_element_type=jnp.float32)
    x = jnp.where(fh > 0, xh.astype(cd), x)
    xv = jax.lax.dot(pv_ref[:], x, preferred_element_type=jnp.float32)
    x = jnp.where(fv > 0, xv.astype(cd), x)

    one = jnp.asarray(1.0, cd)
    zero = jnp.asarray(0.0, cd)
    x = jnp.clip(x * fb, zero, one)

    pivot = jnp.sum(x.astype(jnp.float32) * wmean_ref[:]).astype(cd)
    x = jnp.clip((x - pivot) * fc + pivot, zero, one)

    g = jax.lax.dot(x, m_ref[:],
                    preferred_element_type=jnp.float32).astype(cd)
    x = jnp.clip((x - g) * fs + g, zero, one)

    out = (x.astype(jnp.float32) - mean_ref[:]) * istd_ref[:]
    o_ref[0] = out.astype(o_ref.dtype)


def _draw_factors(key: jax.Array, B: int, brightness: float,
                  contrast: float, saturation: float) -> jnp.ndarray:
    """(B, 8) per-image random factors with byte-identical key splits to
    `preprocess.augment_batch` (flips: kf->(kh,kv); jitter:
    kj->(kb,kc,ks)), so both paths draw the same augmentation."""
    kf, kj = jax.random.split(key)
    kh, kv = jax.random.split(kf)
    fh = jax.random.bernoulli(kh, 0.5, (B,)).astype(jnp.float32)
    fv = jax.random.bernoulli(kv, 0.5, (B,)).astype(jnp.float32)
    kb, kc, ks = jax.random.split(kj, 3)
    fb = jax.random.uniform(kb, (B, 1, 1, 1), minval=1 - brightness,
                            maxval=1 + brightness).reshape(B)
    fc = jax.random.uniform(kc, (B, 1, 1, 1), minval=1 - contrast,
                            maxval=1 + contrast).reshape(B)
    fs = jax.random.uniform(ks, (B, 1, 1, 1), minval=1 - saturation,
                            maxval=1 + saturation).reshape(B)
    pad = jnp.zeros((B,), jnp.float32)
    return jnp.stack([fh, fv, fb, fc, fs, pad, pad, pad], axis=1)


@functools.partial(jax.jit, static_argnames=("out_dtype", "compute_dtype",
                                             "interpret"))
def _fused_augment_impl(images_u8, factors, out_dtype, compute_dtype,
                        interpret: bool):
    B, H, W, _ = images_u8.shape
    W3 = W * 3
    ph, pv, m, mean, istd, wmean = _constants(H, W)
    x = images_u8.reshape(B, H, W3)

    row = pl.BlockSpec((1, H, W3), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    const = (lambda a: pl.BlockSpec(
        a.shape, (lambda nd: lambda i: (0,) * nd)(a.ndim),
        memory_space=pltpu.VMEM))
    fac = pl.BlockSpec((B, 8), lambda i: (0, 0), memory_space=pltpu.SMEM)

    # Matmul constants travel pre-cast to the compute dtype (exact for
    # the 0/1 permutations; the ITU-R weights round once); the normalize/
    # pivot rows stay f32 for the f32 stages.
    consts = [jnp.asarray(ph, compute_dtype), jnp.asarray(pv, compute_dtype),
              jnp.asarray(m, compute_dtype)] + \
             [jnp.asarray(a) for a in (mean, istd, wmean)]
    kern = functools.partial(_augment_kernel, compute_dtype=compute_dtype)
    out = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[row, fac] + [const(a) for a in consts],
        out_specs=row,
        out_shape=jax.ShapeDtypeStruct((B, H, W3), out_dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W3 * (2 * W3 + H),
            bytes_accessed=B * H * W3 * (1 + jnp.dtype(out_dtype).itemsize),
            transcendentals=0,
        ),
    )(x, factors, *consts)
    return out.reshape(B, H, W, 3)


def fused_augment_batch(key: jax.Array, images_u8: jnp.ndarray,
                        out_dtype=jnp.float32, compute_dtype=jnp.bfloat16,
                        interpret=None) -> jnp.ndarray:
    """Drop-in fused replacement for `preprocess.augment_batch`:
    uint8 (B, H, W, 3) -> normalized float (B, H, W, 3) in one kernel.

    Draws the SAME random augmentation as the XLA path (identical key
    splits). With compute_dtype=f32 the result matches `augment_batch`
    to float tolerance; the default bf16 compute differs by bf16
    rounding only (the training policy that engages this kernel runs the
    model in bf16 anyway)."""
    B = images_u8.shape[0]
    factors = _draw_factors(key, B, 0.2, 0.2, 0.2)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _fused_augment_impl(images_u8, factors, out_dtype,
                               compute_dtype, interpret)
