"""Whole-transformer-block fused Pallas kernel.

Round-2's measurement (docs/VALIDATION.md "Pallas vs XLA") showed why an
attention-only kernel loses at the flagship's 197-token scale: DeiT-Tiny's
d=192 matmuls are small enough that the XLA forward is HBM-bandwidth- and
dispatch-bound, and fusing *only* attention adds q/k/v pad/reshape traffic
around a kernel that removes too little. The fix is altitude: fuse the
ENTIRE pre-LN block

    x = x + proj(MHA(LN1(x)));  x = x + MLP(LN2(x))

into one kernel. Per image-chunk the kernel reads x once (C, N, D), keeps
every intermediate — LN statistics, the (C*N, 3D) qkv, all (N, N)
attention scores, the (C*N, 4D) MLP hidden — in VMEM, and writes x' once.
HBM traffic per block drops from ~7 intermediate round-trips to
in + out + weights (~0.45M params = 0.9 MB bf16), and 12 XLA
dispatch groups collapse to one kernel launch per block.

Matmul layout: qkv / proj / fc1 / fc2 run on the flattened (C*N, ·) chunk
(M = C*200 rows — MXU-efficient); only the O(N^2) attention core loops
per (image, head) with whole (N, N) score tiles resident (same recipe as
ops/attention.py, which stays for the attention-only configuration).

The custom VJP recomputes through the XLA block math, so training with
the fused forward is supported but not advantaged; the measured policy
(models/rovit_kan.py) selects this kernel for inference builds.

Replaces (with ops/attention.py) the timm CUDA fast-path the reference
gets for free (`/root/reference/models/backbone.py:12-18`).
"""
from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _erf(x):
    """Abramowitz-Stegun 7.1.26 rational erf (|err| < 1.5e-7) — Pallas TPU
    has no erf/erfc lowering, and exp is the only transcendental needed."""
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
                + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-a * a))


def _gelu_exact(x):
    """Exact (erf) GELU to float precision — matches jax.nn.gelu(
    approximate=False) far below bf16 rounding."""
    return 0.5 * x * (1.0 + _erf(x * (2.0 ** -0.5)))


def _ln(x, g, b, eps=1e-6):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * g + b


def _vit_block_kernel(x_ref, ln1g_ref, ln1b_ref, wqkv_ref, bqkv_ref,
                      wproj_ref, bproj_ref, ln2g_ref, ln2b_ref,
                      w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *,
                      n_valid: int, heads: int, compute_dtype):
    C, n_pad, D = x_ref.shape
    hd = D // heads
    scale = hd ** -0.5

    x = x_ref[:].astype(jnp.float32)                 # (C, Np, D)
    y = _ln(x, ln1g_ref[:], ln1b_ref[:])
    y2 = y.reshape(C * n_pad, D).astype(compute_dtype)

    qkv = jnp.dot(y2, wqkv_ref[:],
                  preferred_element_type=jnp.float32) + bqkv_ref[:]
    qkv = qkv.astype(compute_dtype)                  # (C*Np, 3D)

    # Attention core: whole (Np, Np) score matrix per (image, head) stays
    # VMEM-resident; loop unrolls at trace time (C * heads iterations).
    per_image = []
    for i in range(C):
        rows = qkv[i * n_pad:(i + 1) * n_pad]
        head_outs = []
        for h in range(heads):
            q = rows[:, h * hd:(h + 1) * hd]
            k = rows[:, D + h * hd: D + (h + 1) * hd]
            v = rows[:, 2 * D + h * hd: 2 * D + (h + 1) * hd]
            s = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            if n_valid < n_pad:
                col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                s = jnp.where(col < n_valid, s, -1e30)
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(compute_dtype)
            head_outs.append(jnp.dot(p, v,
                                     preferred_element_type=jnp.float32))
        per_image.append(jnp.concatenate(head_outs, axis=-1))
    attn = jnp.stack(per_image, axis=0).reshape(C * n_pad, D)

    proj = jnp.dot(attn.astype(compute_dtype), wproj_ref[:],
                   preferred_element_type=jnp.float32) + bproj_ref[:]
    # Residual in fp32 (the XLA path adds in compute dtype; fp32 here is a
    # strict accuracy upgrade and free in VMEM).
    x1 = x.reshape(C * n_pad, D) + proj

    z = _ln(x1, ln2g_ref[:], ln2b_ref[:]).astype(compute_dtype)
    h1 = jnp.dot(z, w1_ref[:],
                 preferred_element_type=jnp.float32) + b1_ref[:]
    h1 = _gelu_exact(h1).astype(compute_dtype)
    out = x1 + (jnp.dot(h1, w2_ref[:],
                        preferred_element_type=jnp.float32) + b2_ref[:])

    if n_valid < n_pad:
        row_tok = jax.lax.broadcasted_iota(
            jnp.int32, (C * n_pad, 1), 0) % n_pad
        out = jnp.where(row_tok < n_valid, out, 0.0)
    o_ref[:] = out.reshape(C, n_pad, D).astype(o_ref.dtype)


def _chunk_images(B: int, n_pad: int, D: int, itemsize: int) -> int:
    """Images per program: biggest power-of-two C whose working set
    (x/y/out fp32+bf16 tiles, qkv, MLP hidden, score temps, weights)
    stays within ~10 MB of VMEM. C=8 at DeiT-Tiny (224px bf16)."""
    budget = 10 * 1024 * 1024
    weights = (3 * D * D * 3 + 8 * D * D) * itemsize   # qkv+proj+fc1+fc2
    c = 8
    while c > 1:
        rows = c * n_pad
        work = (rows * D * (4 + 4 + itemsize)          # x fp32, x1, out
                + rows * 3 * D * itemsize              # qkv
                + rows * 4 * D * (4 + itemsize)        # fc1 out + gelu
                + 2 * n_pad * n_pad * 4)               # score temps
        if weights + work <= budget:
            break
        c //= 2
    # Keep the grid >= ~8 programs so x-tile DMA pipelines against compute
    # (the weight blocks map to index 0 every iteration, so Pallas fetches
    # them once); a single-program launch leaves the DMA engine serial.
    while c > 1 and B // c < 8:
        c //= 2
    while B % c:
        c //= 2
    return c


@functools.partial(jax.jit, static_argnames=("heads", "interpret"))
def _fused_block_impl(x, ln1g, ln1b, wqkv, bqkv, wproj, bproj,
                      ln2g, ln2b, w1, b1, w2, b2, heads: int,
                      interpret: bool):
    B, N, D = x.shape
    n_pad = _round_up(N, 8)        # 8-aligned row slices per image
    compute_dtype = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32
    C = _chunk_images(B, n_pad, D, jnp.dtype(compute_dtype).itemsize)

    xp = jnp.pad(x, ((0, 0), (0, n_pad - N), (0, 0)))

    def row(v):
        return v.reshape(1, -1)

    cast = (lambda w: w.astype(compute_dtype))
    inputs = [xp, row(ln1g), row(ln1b), cast(wqkv), row(bqkv),
              cast(wproj), row(bproj), row(ln2g), row(ln2b),
              cast(w1), row(b1), cast(w2), row(b2)]
    xspec = pl.BlockSpec((C, n_pad, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    wspecs = [pl.BlockSpec(p.shape, (lambda nd: lambda i: (0,) * nd)(p.ndim),
                           memory_space=pltpu.VMEM) for p in inputs[1:]]

    kern = functools.partial(_vit_block_kernel, n_valid=N, heads=heads,
                             compute_dtype=compute_dtype)
    hidden = w1.shape[1]
    flops = 2 * B * n_pad * D * (3 * D + D + 2 * hidden) \
        + 2 * 2 * B * heads * n_pad * n_pad * (D // heads)
    out = pl.pallas_call(
        kern,
        grid=(B // C,),
        in_specs=[xspec] + wspecs,
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((B, n_pad, D), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * B * n_pad * D * x.dtype.itemsize
            + (B // C) * sum(int(p.size) * p.dtype.itemsize
                             for p in inputs[1:]),
            transcendentals=B * heads * n_pad * n_pad
            + B * n_pad * hidden,
        ),
    )(*inputs)
    return out[:, :N, :]


def _block_xla(x, p, heads: int):
    """Reference XLA formulation of the same block (backward + goldens).
    Mirrors models/vit.py::Block exactly (fp32 LN, compute-dtype matmuls,
    exact GELU)."""
    dtype = x.dtype
    y = _ln(x.astype(jnp.float32), p["ln1_scale"], p["ln1_bias"])
    y = y.astype(dtype)
    B, N, D = x.shape
    hd = D // heads
    qkv = (y @ p["wqkv"].astype(dtype)
           + p["bqkv"].astype(dtype)).reshape(B, N, 3, heads, hd)
    qkv = qkv.transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    s = jnp.einsum("bhqd,bhkd->bhqk", q * (hd ** -0.5), k,
                   preferred_element_type=jnp.float32)
    pa = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhqk,bhkd->bhqd", pa.astype(dtype), v,
                   preferred_element_type=jnp.float32)
    o = o.astype(dtype).transpose(0, 2, 1, 3).reshape(B, N, D)
    x = x + (o @ p["wproj"].astype(dtype) + p["bproj"].astype(dtype))
    z = _ln(x.astype(jnp.float32), p["ln2_scale"], p["ln2_bias"])
    h = jax.nn.gelu(z.astype(dtype) @ p["w1"].astype(dtype)
                    + p["b1"].astype(dtype), approximate=False)
    return x + (h.astype(dtype) @ p["w2"].astype(dtype)
                + p["b2"].astype(dtype))


_PKEYS = ("ln1_scale", "ln1_bias", "wqkv", "bqkv", "wproj", "bproj",
          "ln2_scale", "ln2_bias", "w1", "b1", "w2", "b2")


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_vit_block(x: jnp.ndarray, params: Dict[str, Any],
                    heads: int = 3) -> jnp.ndarray:
    """One pre-LN ViT block, fully fused.

    Args:
        x: ``(B, N, D)`` token sequence (bf16 or fp32).
        params: dict with keys ``ln1_scale, ln1_bias, wqkv (D, 3D),
            bqkv, wproj (D, D), bproj, ln2_scale, ln2_bias,
            w1 (D, H), b1, w2 (H, D), b2`` — fp32 leaves.
        heads: attention head count (must divide D).

    Returns:
        ``(B, N, D)`` in ``x.dtype``.
    """
    interpret = jax.default_backend() != "tpu"
    return _fused_block_impl(
        x, *(params[k] for k in _PKEYS), heads=heads, interpret=interpret)


def _fused_block_fwd(x, params, heads):
    return fused_vit_block(x, params, heads), (x, params)


def _fused_block_bwd(heads, res, g):
    x, params = res
    _, vjp = jax.vjp(lambda xx, pp: _block_xla(xx, pp, heads), x, params)
    return vjp(g.astype(x.dtype))


fused_vit_block.defvjp(_fused_block_fwd, _fused_block_bwd)
