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

The custom VJP is a fused Pallas kernel too: the backward
(_vit_block_bwd_kernel) RECOMPUTES the forward chain in VMEM and then
walks the cotangent chain, accumulating all 12 weight grads across the
sequential grid. A saved-residual alternative exists
(_vit_block_res_kernel spills qkv / attention-output / fc1 pre-activation
to HBM; _vit_block_bwd_res_kernel reads them back) — motivated by the
round-3 profile showing 0.07-0.14 HBM utilization while ~20% of executed
FLOPs were recompute — but the on-chip 3-arm A/B
(outputs/ab_resid_bwd_197.json) measured it at 2,525 train img/s vs
recompute's 5,320 and XLA's 3,889 at the flagship scale: residuals plus
fp32 cotangents shrink the VMEM image-chunk to C=1, and the shorter
matmuls + shallower pipeline cost far more than the saved FLOPs. The
recompute backward is therefore the default; ROVIT_BLOCK_RESIDUAL_BWD=1
opts into the residual pair for experiments. The measured policy
(models/rovit_kan.py) decides where each direction is engaged.

Replaces (with ops/attention.py) the timm CUDA fast-path the reference
gets for free (`/root/reference/models/backbone.py:12-18`).
"""
from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _vmem_budget_mb(env: str, default: int) -> int:
    """Planning budget (MB) for the chunk sizers, overridable via env for
    on-chip A/B tuning (v5e VMEM is 128 MB total; the default leaves
    headroom for Mosaic's own temporaries and double-buffered DMA)."""
    import os
    try:
        return int(os.environ.get(env, default))
    except ValueError:
        return default


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
    stays within ~10 MB of VMEM. C=4 at DeiT-Tiny (224px bf16),
    C=2 at d=384, C=1 at d=768."""
    budget = _vmem_budget_mb("ROVIT_BLOCK_FWD_BUDGET_MB", 10) * 1024 * 1024
    # qkv (3D^2) + proj (D^2) + fc1 (4D^2) + fc2 (4D^2) = 12 D^2.
    weights = 12 * D * D * itemsize
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


def _vit_block_res_kernel(x_ref, ln1g_ref, ln1b_ref, wqkv_ref, bqkv_ref,
                          wproj_ref, bproj_ref, ln2g_ref, ln2b_ref,
                          w1_ref, b1_ref, w2_ref, b2_ref,
                          o_ref, qkv_ref, attn_ref, a1_ref, *,
                          n_valid: int, heads: int, compute_dtype):
    """Forward for the TRAINING build: same math as _vit_block_kernel but
    additionally spills the three recompute-expensive intermediates to HBM
    — qkv (rows, 3D), the pre-proj attention output (rows, D) and the fc1
    pre-activation a1 (rows, 4D), all in compute dtype — so the backward
    kernel can skip the forward recompute (the matmuls qkv/fc1 and the
    whole attention forward, ~20% of the step's executed FLOPs). HBM has
    the headroom: the fused train step measures 0.07-0.14 bandwidth
    utilization (docs/VALIDATION.md round-3 profile)."""
    C, n_pad, D = x_ref.shape
    hd = D // heads
    scale = hd ** -0.5

    x = x_ref[:].astype(jnp.float32)                 # (C, Np, D)
    y = _ln(x, ln1g_ref[:], ln1b_ref[:])
    y2 = y.reshape(C * n_pad, D).astype(compute_dtype)

    qkv = jnp.dot(y2, wqkv_ref[:],
                  preferred_element_type=jnp.float32) + bqkv_ref[:]
    qkv = qkv.astype(compute_dtype)                  # (C*Np, 3D)
    qkv_ref[:] = qkv.reshape(C, n_pad, 3 * D)

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
    attn = jnp.stack(per_image, axis=0).reshape(C * n_pad, D) \
        .astype(compute_dtype)
    attn_ref[:] = attn.reshape(C, n_pad, D)

    proj = jnp.dot(attn, wproj_ref[:],
                   preferred_element_type=jnp.float32) + bproj_ref[:]
    x1 = x.reshape(C * n_pad, D) + proj

    z = _ln(x1, ln2g_ref[:], ln2b_ref[:]).astype(compute_dtype)
    a1 = jnp.dot(z, w1_ref[:],
                 preferred_element_type=jnp.float32) + b1_ref[:]
    a1_ref[:] = a1.astype(compute_dtype).reshape(C, n_pad, w1_ref.shape[1])
    h1 = _gelu_exact(a1).astype(compute_dtype)
    out = x1 + (jnp.dot(h1, w2_ref[:],
                        preferred_element_type=jnp.float32) + b2_ref[:])

    if n_valid < n_pad:
        row_tok = jax.lax.broadcasted_iota(
            jnp.int32, (C * n_pad, 1), 0) % n_pad
        out = jnp.where(row_tok < n_valid, out, 0.0)
    o_ref[:] = out.reshape(C, n_pad, D).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads", "interpret"))
def _fused_block_res_impl(x, ln1g, ln1b, wqkv, bqkv, wproj, bproj,
                          ln2g, ln2b, w1, b1, w2, b2, heads: int,
                          interpret: bool):
    """Forward returning (out, qkv, attn, a1) for the residual-saving
    backward. Only reached under differentiation with
    ROVIT_BLOCK_RESIDUAL_BWD=1 (the A/B-losing experimental path — see
    module docstring); inference and the default training path keep the
    single-output kernel and pay no extra HBM writes."""
    B, N, D = x.shape
    n_pad = _round_up(N, 8)
    compute_dtype = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32
    it = jnp.dtype(compute_dtype).itemsize
    # Same sizer as the plain forward but charge the residual spills
    # (qkv 3D + attn D + a1 4D per row) against the budget.
    budget = _vmem_budget_mb("ROVIT_BLOCK_FWD_BUDGET_MB", 10) * 1024 * 1024
    weights = 12 * D * D * it
    C = 8
    while C > 1:
        rows = C * n_pad
        work = (rows * D * (4 + 4 + it)
                + rows * 3 * D * it
                + rows * 4 * D * (4 + it)
                + 2 * n_pad * n_pad * 4
                + rows * 8 * D * it)            # residual out blocks
        if weights + work <= budget:
            break
        C //= 2
    while C > 1 and B // C < 8:
        C //= 2
    while B % C:
        C //= 2

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

    def chunk_spec(width):
        return pl.BlockSpec((C, n_pad, width), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    kern = functools.partial(_vit_block_res_kernel, n_valid=N, heads=heads,
                             compute_dtype=compute_dtype)
    hidden = w1.shape[1]
    flops = 2 * B * n_pad * D * (3 * D + D + 2 * hidden) \
        + 2 * 2 * B * heads * n_pad * n_pad * (D // heads)
    out, qkv, attn, a1 = pl.pallas_call(
        kern,
        grid=(B // C,),
        in_specs=[xspec] + wspecs,
        out_specs=(xspec, chunk_spec(3 * D), chunk_spec(D),
                   chunk_spec(hidden)),
        out_shape=(jax.ShapeDtypeStruct((B, n_pad, D), x.dtype),
                   jax.ShapeDtypeStruct((B, n_pad, 3 * D), compute_dtype),
                   jax.ShapeDtypeStruct((B, n_pad, D), compute_dtype),
                   jax.ShapeDtypeStruct((B, n_pad, hidden), compute_dtype)),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * B * n_pad * D * x.dtype.itemsize
            + B * n_pad * 8 * D * it
            + (B // C) * sum(int(p.size) * p.dtype.itemsize
                             for p in inputs[1:]),
            transcendentals=B * heads * n_pad * n_pad
            + B * n_pad * hidden,
        ),
    )(*inputs)
    return out[:, :N, :], qkv, attn, a1


def _gelu_grad(x):
    """d/dx gelu_exact(x) = Phi(x) + x * phi(x)."""
    inv_sqrt2pi = 0.3989422804014327
    return (0.5 * (1.0 + _erf(x * (2.0 ** -0.5)))
            + x * inv_sqrt2pi * jnp.exp(-0.5 * x * x))


def _ln_fwd_stats(x, g, b, eps=1e-6):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = (x - mu) * inv
    return xhat * g + b, xhat, inv


def _ln_bwd(dz, xhat, inv, g):
    """Input-gradient of LayerNorm given upstream dz (per-row stats)."""
    dxhat = dz * g
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    return inv * (dxhat - m1 - xhat * m2)


def _vit_block_bwd_kernel(x_ref, g_ref, ln1g_ref, ln1b_ref, wqkv_ref,
                          bqkv_ref, wproj_ref, bproj_ref, ln2g_ref,
                          ln2b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                          dx_ref, dln1g_ref, dln1b_ref, dwqkv_ref,
                          dbqkv_ref, dwproj_ref, dbproj_ref, dln2g_ref,
                          dln2b_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, *,
                          n_valid: int, heads: int, compute_dtype):
    """Whole-block backward: recompute the forward in VMEM, then walk
    MLP -> LN2 -> proj -> attention (softmax recompute, five matmuls per
    (image, head)) -> qkv -> LN1. Weight grads accumulate across the
    sequential batch grid; padded token rows carry zero cotangent so they
    contribute nothing."""
    C, n_pad, D = x_ref.shape
    hd = D // heads
    scale = hd ** -0.5
    rows = C * n_pad
    f32 = jnp.float32

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in (dln1g_ref, dln1b_ref, dwqkv_ref, dbqkv_ref, dwproj_ref,
                  dbproj_ref, dln2g_ref, dln2b_ref, dw1_ref, db1_ref,
                  dw2_ref, db2_ref):
            r[:] = jnp.zeros(r.shape, r.dtype)

    # ---- forward recompute ------------------------------------------------
    x2 = x_ref[:].astype(f32).reshape(rows, D)
    y, yhat1, inv1 = _ln_fwd_stats(x2, ln1g_ref[:], ln1b_ref[:])
    yb = y.astype(compute_dtype)
    qkv = (jnp.dot(yb, wqkv_ref[:], preferred_element_type=f32)
           + bqkv_ref[:]).astype(compute_dtype)

    attn_rows = []
    for i in range(C):
        r0 = i * n_pad
        blk = qkv[r0:r0 + n_pad]
        houts = []
        for h in range(heads):
            q = blk[:, h * hd:(h + 1) * hd]
            k = blk[:, D + h * hd: D + (h + 1) * hd]
            v = blk[:, 2 * D + h * hd: 2 * D + (h + 1) * hd]
            s = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=f32) * scale
            if n_valid < n_pad:
                col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                s = jnp.where(col < n_valid, s, -1e30)
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            p = (e / jnp.sum(e, axis=-1, keepdims=True))
            houts.append(jnp.dot(p.astype(compute_dtype), v,
                                 preferred_element_type=f32))
        attn_rows.append(jnp.concatenate(houts, axis=-1))
    attn = jnp.stack(attn_rows, axis=0).reshape(rows, D) \
        .astype(compute_dtype)

    x1 = x2 + (jnp.dot(attn, wproj_ref[:], preferred_element_type=f32)
               + bproj_ref[:])
    z, xhat2, inv2 = _ln_fwd_stats(x1, ln2g_ref[:], ln2b_ref[:])
    zb = z.astype(compute_dtype)
    a1 = jnp.dot(zb, w1_ref[:], preferred_element_type=f32) + b1_ref[:]
    h1 = _gelu_exact(a1).astype(compute_dtype)

    # ---- backward ---------------------------------------------------------
    g = g_ref[:].astype(f32).reshape(rows, D)
    gb = g.astype(compute_dtype)

    dw2_ref[:] += jax.lax.dot_general(
        h1, gb, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32)
    db2_ref[:] += jnp.sum(g, axis=0, keepdims=True)
    da1 = jax.lax.dot_general(
        gb, w2_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32) * _gelu_grad(a1)
    da1b = da1.astype(compute_dtype)
    dw1_ref[:] += jax.lax.dot_general(
        zb, da1b, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32)
    db1_ref[:] += jnp.sum(da1, axis=0, keepdims=True)
    dz = jax.lax.dot_general(
        da1b, w1_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32)

    dln2g_ref[:] += jnp.sum(dz * xhat2, axis=0, keepdims=True)
    dln2b_ref[:] += jnp.sum(dz, axis=0, keepdims=True)
    dx1 = g + _ln_bwd(dz, xhat2, inv2, ln2g_ref[:])
    dx1b = dx1.astype(compute_dtype)

    dwproj_ref[:] += jax.lax.dot_general(
        attn, dx1b, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32)
    dbproj_ref[:] += jnp.sum(dx1, axis=0, keepdims=True)
    dattn = jax.lax.dot_general(
        dx1b, wproj_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32).astype(compute_dtype)

    # Attention backward per (image, head): recompute P, then
    # dV = P^T gO, dP = gO V^T, dS = P(dP - rowsum(P dP)) * scale,
    # dQ = dS K, dK = dS^T Q  (same math as ops/attention.py).
    dqkv_rows = []
    for i in range(C):
        r0 = i * n_pad
        blk = qkv[r0:r0 + n_pad]
        go_blk = dattn[r0:r0 + n_pad]
        dqs, dks, dvs = [], [], []
        for h in range(heads):
            q = blk[:, h * hd:(h + 1) * hd]
            k = blk[:, D + h * hd: D + (h + 1) * hd]
            v = blk[:, 2 * D + h * hd: 2 * D + (h + 1) * hd]
            go = go_blk[:, h * hd:(h + 1) * hd]
            s = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=f32) * scale
            if n_valid < n_pad:
                col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                s = jnp.where(col < n_valid, s, -1e30)
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            p = e / jnp.sum(e, axis=-1, keepdims=True)
            p_lo = p.astype(compute_dtype)
            dvs.append(jax.lax.dot_general(
                p_lo, go, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=f32))
            dp = jax.lax.dot_general(
                go, v, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=f32)
            ds = (p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True))
                  * scale).astype(compute_dtype)
            dqs.append(jnp.dot(ds, k, preferred_element_type=f32))
            dks.append(jax.lax.dot_general(
                ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=f32))
        dqkv_rows.append(jnp.concatenate(dqs + dks + dvs, axis=-1))
    dqkv = jnp.stack(dqkv_rows, axis=0).reshape(rows, 3 * D)
    dqkvb = dqkv.astype(compute_dtype)

    dbqkv_ref[:] += jnp.sum(dqkv, axis=0, keepdims=True)
    dwqkv_ref[:] += jax.lax.dot_general(
        yb, dqkvb, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32)
    dy = jax.lax.dot_general(
        dqkvb, wqkv_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32)

    dln1g_ref[:] += jnp.sum(dy * yhat1, axis=0, keepdims=True)
    dln1b_ref[:] += jnp.sum(dy, axis=0, keepdims=True)
    dx = dx1 + _ln_bwd(dy, yhat1, inv1, ln1g_ref[:])
    dx_ref[:] = dx.reshape(C, n_pad, D).astype(dx_ref.dtype)


def _vit_block_bwd_res_kernel(x_ref, g_ref, qkv_ref, attn_ref, a1_ref,
                              ln1g_ref, ln1b_ref, wqkv_ref, bqkv_ref,
                              wproj_ref, bproj_ref, ln2g_ref, ln2b_ref,
                              w1_ref, b1_ref, w2_ref, b2_ref,
                              dx_ref, dln1g_ref, dln1b_ref, dwqkv_ref,
                              dbqkv_ref, dwproj_ref, dbproj_ref, dln2g_ref,
                              dln2b_ref, dw1_ref, db1_ref, dw2_ref,
                              db2_ref, *, n_valid: int, heads: int,
                              compute_dtype):
    """Whole-block backward from SAVED residuals: reads qkv / attn / a1
    spilled by _vit_block_res_kernel instead of recomputing the forward.
    Drops the qkv and fc1 matmuls and the whole attention forward
    (scores + softmax + P·V per head was previously executed twice here);
    only the cheap pieces are rebuilt in VMEM — LN statistics (VPU), one
    proj matmul for x1, and one scores+softmax pass feeding dS. Weight
    grads accumulate across the sequential batch grid exactly as in
    _vit_block_bwd_kernel."""
    C, n_pad, D = x_ref.shape
    hd = D // heads
    scale = hd ** -0.5
    rows = C * n_pad
    f32 = jnp.float32

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in (dln1g_ref, dln1b_ref, dwqkv_ref, dbqkv_ref, dwproj_ref,
                  dbproj_ref, dln2g_ref, dln2b_ref, dw1_ref, db1_ref,
                  dw2_ref, db2_ref):
            r[:] = jnp.zeros(r.shape, r.dtype)

    # ---- cheap recomputes (VPU + one proj matmul) --------------------------
    x2 = x_ref[:].astype(f32).reshape(rows, D)
    y, yhat1, inv1 = _ln_fwd_stats(x2, ln1g_ref[:], ln1b_ref[:])
    yb = y.astype(compute_dtype)
    qkv = qkv_ref[:].reshape(rows, 3 * D)
    attn = attn_ref[:].reshape(rows, D)
    x1 = x2 + (jnp.dot(attn, wproj_ref[:], preferred_element_type=f32)
               + bproj_ref[:])
    z, xhat2, inv2 = _ln_fwd_stats(x1, ln2g_ref[:], ln2b_ref[:])
    zb = z.astype(compute_dtype)
    a1 = a1_ref[:].reshape(rows, w1_ref.shape[1]).astype(f32)
    h1 = _gelu_exact(a1).astype(compute_dtype)

    # ---- backward ---------------------------------------------------------
    g = g_ref[:].astype(f32).reshape(rows, D)
    gb = g.astype(compute_dtype)

    dw2_ref[:] += jax.lax.dot_general(
        h1, gb, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32)
    db2_ref[:] += jnp.sum(g, axis=0, keepdims=True)
    da1 = jax.lax.dot_general(
        gb, w2_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32) * _gelu_grad(a1)
    da1b = da1.astype(compute_dtype)
    dw1_ref[:] += jax.lax.dot_general(
        zb, da1b, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32)
    db1_ref[:] += jnp.sum(da1, axis=0, keepdims=True)
    dz = jax.lax.dot_general(
        da1b, w1_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32)

    dln2g_ref[:] += jnp.sum(dz * xhat2, axis=0, keepdims=True)
    dln2b_ref[:] += jnp.sum(dz, axis=0, keepdims=True)
    dx1 = g + _ln_bwd(dz, xhat2, inv2, ln2g_ref[:])
    dx1b = dx1.astype(compute_dtype)

    dwproj_ref[:] += jax.lax.dot_general(
        attn, dx1b, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32)
    dbproj_ref[:] += jnp.sum(dx1, axis=0, keepdims=True)
    dattn = jax.lax.dot_general(
        dx1b, wproj_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32).astype(compute_dtype)

    # Attention backward per (image, head) from the saved qkv: ONE
    # scores+softmax rebuild (the recompute kernel needed two), then
    # dV = P^T gO, dP = gO V^T, dS = P(dP - rowsum(P dP)) * scale,
    # dQ = dS K, dK = dS^T Q.
    dqkv_rows = []
    for i in range(C):
        r0 = i * n_pad
        blk = qkv[r0:r0 + n_pad]
        go_blk = dattn[r0:r0 + n_pad]
        dqs, dks, dvs = [], [], []
        for h in range(heads):
            q = blk[:, h * hd:(h + 1) * hd]
            k = blk[:, D + h * hd: D + (h + 1) * hd]
            v = blk[:, 2 * D + h * hd: 2 * D + (h + 1) * hd]
            go = go_blk[:, h * hd:(h + 1) * hd]
            s = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=f32) * scale
            if n_valid < n_pad:
                col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                s = jnp.where(col < n_valid, s, -1e30)
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            p = e / jnp.sum(e, axis=-1, keepdims=True)
            p_lo = p.astype(compute_dtype)
            dvs.append(jax.lax.dot_general(
                p_lo, go, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=f32))
            dp = jax.lax.dot_general(
                go, v, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=f32)
            ds = (p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True))
                  * scale).astype(compute_dtype)
            dqs.append(jnp.dot(ds, k, preferred_element_type=f32))
            dks.append(jax.lax.dot_general(
                ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=f32))
        dqkv_rows.append(jnp.concatenate(dqs + dks + dvs, axis=-1))
    dqkv = jnp.stack(dqkv_rows, axis=0).reshape(rows, 3 * D)
    dqkvb = dqkv.astype(compute_dtype)

    dbqkv_ref[:] += jnp.sum(dqkv, axis=0, keepdims=True)
    dwqkv_ref[:] += jax.lax.dot_general(
        yb, dqkvb, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32)
    dy = jax.lax.dot_general(
        dqkvb, wqkv_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32)

    dln1g_ref[:] += jnp.sum(dy * yhat1, axis=0, keepdims=True)
    dln1b_ref[:] += jnp.sum(dy, axis=0, keepdims=True)
    dx = dx1 + _ln_bwd(dy, yhat1, inv1, ln1g_ref[:])
    dx_ref[:] = dx.reshape(C, n_pad, D).astype(dx_ref.dtype)


def _bwd_res_chunk_images(B: int, n_pad: int, D: int, itemsize: int) -> int:
    """Images per residual-consuming backward program. The working set is
    noticeably smaller than the recompute kernel's (no forward chain held
    live), but the fp32 cotangent temps (da1/dqkv) still dominate — C=1
    at DeiT-Tiny under the 10 MB default; raise
    ROVIT_BLOCK_BWD_RES_BUDGET_MB for on-chip C=2/4 A/Bs. The knob is
    separate from the recompute kernel's ROVIT_BLOCK_BWD_BUDGET_MB so an
    A/B on one sizer never silently reshapes the other."""
    budget = _vmem_budget_mb("ROVIT_BLOCK_BWD_RES_BUDGET_MB", 10) * 1024 * 1024
    weights = 12 * D * D * (itemsize + 4)   # bf16 weights + fp32 grads
    c = 8
    while c > 1:
        rows = c * n_pad
        work = (rows * D * (8 * 4 + 5 * itemsize)      # x/g/dx chains
                + rows * 3 * D * (4 + 2 * itemsize)    # qkv in, dqkv
                + rows * 4 * D * (2 * 4 + 2 * itemsize)  # a1/da1, h1
                + 3 * n_pad * n_pad * 4)               # score temps
        if weights + work <= budget:
            break
        c //= 2
    while c > 1 and B // c < 8:
        c //= 2
    while B % c:
        c //= 2
    return c


@functools.partial(jax.jit, static_argnames=("heads", "interpret"))
def _fused_block_bwd_res_impl(x, g, qkv, attn, a1, ln1g, ln1b, wqkv, bqkv,
                              wproj, bproj, ln2g, ln2b, w1, b1, w2, b2,
                              heads: int, interpret: bool):
    B, N, D = x.shape
    n_pad = _round_up(N, 8)
    compute_dtype = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32
    C = _bwd_res_chunk_images(B, n_pad, D,
                              jnp.dtype(compute_dtype).itemsize)

    xp = jnp.pad(x, ((0, 0), (0, n_pad - N), (0, 0)))
    gp = jnp.pad(g.astype(jnp.float32), ((0, 0), (0, n_pad - N), (0, 0)))

    def row(v):
        return v.reshape(1, -1)

    cast = (lambda w: w.astype(compute_dtype))
    hidden = w1.shape[1]
    inputs = [xp, gp, qkv, attn, a1, row(ln1g), row(ln1b), cast(wqkv),
              row(bqkv), cast(wproj), row(bproj), row(ln2g), row(ln2b),
              cast(w1), row(b1), cast(w2), row(b2)]
    xspec = pl.BlockSpec((C, n_pad, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)

    def chunk_spec(width):
        return pl.BlockSpec((C, n_pad, width), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [xspec, xspec, chunk_spec(3 * D), chunk_spec(D),
                chunk_spec(hidden)] + [
        pl.BlockSpec(p.shape, (lambda nd: lambda i: (0,) * nd)(p.ndim),
                     memory_space=pltpu.VMEM) for p in inputs[5:]]

    grad_shapes = [(1, D), (1, D), (D, 3 * D), (1, 3 * D), (D, D), (1, D),
                   (1, D), (1, D), (D, hidden), (1, hidden), (hidden, D),
                   (1, D)]
    out_specs = [xspec] + [
        pl.BlockSpec(s, (lambda nd: lambda i: (0,) * nd)(len(s)),
                     memory_space=pltpu.VMEM) for s in grad_shapes]
    out_shapes = [jax.ShapeDtypeStruct((B, n_pad, D), x.dtype)] + [
        jax.ShapeDtypeStruct(s, jnp.float32) for s in grad_shapes]

    kern = functools.partial(_vit_block_bwd_res_kernel, n_valid=N,
                             heads=heads, compute_dtype=compute_dtype)
    # Executed FLOPs: the useful backward matmuls + one proj recompute +
    # one scores rebuild — vs 3x-forward for the recompute kernel.
    flops = (2 * (2 * B * n_pad * D * (3 * D + D + 2 * hidden)
                  + 4 * B * heads * n_pad * n_pad * (D // heads))
             + 2 * B * n_pad * D * D
             + 2 * B * heads * n_pad * n_pad * (D // heads))
    it = jnp.dtype(compute_dtype).itemsize
    outs = pl.pallas_call(
        kern,
        grid=(B // C,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=3 * B * n_pad * D * 4
            + B * n_pad * 8 * D * it
            + (B // C) * sum(int(p.size) * p.dtype.itemsize
                             for p in inputs[5:]),
            transcendentals=B * heads * n_pad * n_pad
            + 2 * B * n_pad * hidden,
        ),
    )(*inputs)

    dx = outs[0][:, :N, :]
    (dln1g, dln1b, dwqkv, dbqkv, dwproj, dbproj, dln2g, dln2b,
     dw1, db1, dw2, db2) = outs[1:]
    dparams = {
        "ln1_scale": dln1g[0], "ln1_bias": dln1b[0],
        "wqkv": dwqkv, "bqkv": dbqkv[0],
        "wproj": dwproj, "bproj": dbproj[0],
        "ln2_scale": dln2g[0], "ln2_bias": dln2b[0],
        "w1": dw1, "b1": db1[0], "w2": dw2, "b2": db2[0],
    }
    return dx, dparams


def _bwd_chunk_images(B: int, n_pad: int, D: int, itemsize: int) -> int:
    """Images per backward program: the working set is ~3x the forward's
    (forward recompute + cotangent chain + fp32 (rows, 4D) MLP temps), so
    the chunk is smaller — C=1 at DeiT-Tiny shapes.

    The VMEM ceiling sits just above C=2: Mosaic's scoped-VMEM
    stack limit is 16 MB on v5e, and the C=4 kernel (selected by
    ROVIT_BLOCK_BWD_BUDGET_MB=20 at bs64/197 tokens) fails compilation
    needing 16.78 MB; the limit flag can't be raised through this
    stack. C=2 (budget 12 under this sizer) was measured on-chip in
    round 4 and WINS: full train step 5,549 vs 5,443 img/s at bs64
    (+1.9%) and 6,439 vs 6,178 at bs256 (+4.2%) over C=1
    (outputs/ab_bwdchunk_{c1,c2,xla}.json), so 12 MB is the default.
    The flip only affects d=192: at d=384 the weight tiles alone are
    10.6 MB so this sizer picks C=1 under either budget, and at d=768
    even C=1 needs ~27 MB — which is why the "auto" policy gates the
    fused kernel off for TRAINING at d>512 (models/rovit_kan.py)."""
    budget = _vmem_budget_mb("ROVIT_BLOCK_BWD_BUDGET_MB", 12) * 1024 * 1024
    weights = 12 * D * D * (itemsize + 4)   # bf16 weights + fp32 grads
    c = 8
    while c > 1:
        rows = c * n_pad
        work = (rows * D * (9 * 4 + 5 * itemsize)      # fp32 + bf16 chains
                + rows * 3 * D * (4 + itemsize)        # qkv / dqkv
                + rows * 4 * D * (2 * 4 + itemsize)    # a1, da1, h1
                + 3 * n_pad * n_pad * 4)               # score temps
        if weights + work <= budget:
            break
        c //= 2
    while c > 1 and B // c < 8:
        c //= 2
    while B % c:
        c //= 2
    return c


@functools.partial(jax.jit, static_argnames=("heads", "interpret"))
def _fused_block_bwd_impl(x, g, ln1g, ln1b, wqkv, bqkv, wproj, bproj,
                          ln2g, ln2b, w1, b1, w2, b2, heads: int,
                          interpret: bool):
    B, N, D = x.shape
    n_pad = _round_up(N, 8)
    compute_dtype = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32
    C = _bwd_chunk_images(B, n_pad, D, jnp.dtype(compute_dtype).itemsize)

    xp = jnp.pad(x, ((0, 0), (0, n_pad - N), (0, 0)))
    gp = jnp.pad(g.astype(jnp.float32), ((0, 0), (0, n_pad - N), (0, 0)))

    def row(v):
        return v.reshape(1, -1)

    cast = (lambda w: w.astype(compute_dtype))
    hidden = w1.shape[1]
    inputs = [xp, gp, row(ln1g), row(ln1b), cast(wqkv), row(bqkv),
              cast(wproj), row(bproj), row(ln2g), row(ln2b),
              cast(w1), row(b1), cast(w2), row(b2)]
    xspec = pl.BlockSpec((C, n_pad, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    in_specs = [xspec, xspec] + [
        pl.BlockSpec(p.shape, (lambda nd: lambda i: (0,) * nd)(p.ndim),
                     memory_space=pltpu.VMEM) for p in inputs[2:]]

    grad_shapes = [(1, D), (1, D), (D, 3 * D), (1, 3 * D), (D, D), (1, D),
                   (1, D), (1, D), (D, hidden), (1, hidden), (hidden, D),
                   (1, D)]
    out_specs = [xspec] + [
        pl.BlockSpec(s, (lambda nd: lambda i: (0,) * nd)(len(s)),
                     memory_space=pltpu.VMEM) for s in grad_shapes]
    out_shapes = [jax.ShapeDtypeStruct((B, n_pad, D), x.dtype)] + [
        jax.ShapeDtypeStruct(s, jnp.float32) for s in grad_shapes]

    kern = functools.partial(_vit_block_bwd_kernel, n_valid=N, heads=heads,
                             compute_dtype=compute_dtype)
    flops = 3 * (2 * B * n_pad * D * (3 * D + D + 2 * hidden)
                 + 4 * B * heads * n_pad * n_pad * (D // heads))
    outs = pl.pallas_call(
        kern,
        grid=(B // C,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=3 * B * n_pad * D * 4
            + (B // C) * sum(int(p.size) * p.dtype.itemsize
                             for p in inputs[2:]),
            transcendentals=3 * B * heads * n_pad * n_pad
            + 2 * B * n_pad * hidden,
        ),
    )(*inputs)

    dx = outs[0][:, :N, :]
    (dln1g, dln1b, dwqkv, dbqkv, dwproj, dbproj, dln2g, dln2b,
     dw1, db1, dw2, db2) = outs[1:]
    dparams = {
        "ln1_scale": dln1g[0], "ln1_bias": dln1b[0],
        "wqkv": dwqkv, "bqkv": dbqkv[0],
        "wproj": dwproj, "bproj": dbproj[0],
        "ln2_scale": dln2g[0], "ln2_bias": dln2b[0],
        "w1": dw1, "b1": db1[0], "w2": dw2, "b2": db2[0],
    }
    return dx, dparams


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


def _residual_bwd() -> bool:
    """Opt-in (read at trace time): ROVIT_BLOCK_RESIDUAL_BWD=1 switches to
    the saved-residual backward. The on-chip 3-arm A/B
    (outputs/ab_resid_bwd_197.json, bs64/197 tokens/bf16) measured it at
    2,525 train img/s vs the recompute backward's 5,320 and pure XLA's
    3,889 — holding spilled residuals AND fp32 cotangents shrinks the
    VMEM image-chunk to C=1 (vs C=2 for recompute), and the lost matmul
    efficiency + pipeline depth costs ~2x more than the ~20% recompute
    FLOPs it saves. Kept as an experiment hook, not a production path."""
    import os
    return os.environ.get("ROVIT_BLOCK_RESIDUAL_BWD", "0") == "1"


def _fused_block_fwd(x, params, heads):
    interpret = jax.default_backend() != "tpu"
    if not _residual_bwd():
        return fused_vit_block(x, params, heads), (x, params, None)
    out, qkv, attn, a1 = _fused_block_res_impl(
        x, *(params[k] for k in _PKEYS), heads=heads, interpret=interpret)
    return out, (x, params, (qkv, attn, a1))


def _fused_block_bwd(heads, res, g):
    x, params, saved = res
    interpret = jax.default_backend() != "tpu"
    if saved is None:
        dx, dparams = _fused_block_bwd_impl(
            x, g, *(params[k] for k in _PKEYS), heads=heads,
            interpret=interpret)
    else:
        qkv, attn, a1 = saved
        dx, dparams = _fused_block_bwd_res_impl(
            x, g, qkv, attn, a1, *(params[k] for k in _PKEYS),
            heads=heads, interpret=interpret)
    # Tangent structure must mirror the primal params dict exactly.
    return dx, {k: dparams[k].astype(params[k].dtype) for k in params}


fused_vit_block.defvjp(_fused_block_fwd, _fused_block_bwd)
