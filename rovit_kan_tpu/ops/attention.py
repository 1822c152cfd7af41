"""Fused multi-head attention Pallas kernel for the ViT backbone.

The backbone's attention is over a fixed 197-token sequence (196 patches +
CLS) with head_dim 64. At this size a flash-style streaming kernel is
unnecessary — the entire (N, N) score matrix for one (batch, head) pair is
~256KB fp32 and fits comfortably in VMEM. The win over the unfused XLA path
is keeping QK^T -> mask -> softmax -> PV resident in VMEM with zero HBM
round-trips for the intermediates.

Design:
- Grid over flattened (batch * heads); each program owns one full head.
- Sequence padded to a multiple of 128 lanes outside the kernel; padded key
  columns are masked to -inf before the softmax (padded query rows compute
  garbage that the caller slices off).
- fp32 accumulation regardless of input dtype (bf16 in mixed precision).
- Falls back to interpret mode automatically off-TPU so the same code path
  is exercised by CPU tests and the multi-chip dry run.

Replaces the reference's reliance on timm's fused CUDA attention
(`/root/reference/models/backbone.py:12-18` delegates everything to timm).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attention_kernel(q_ref, k_ref, v_ref, o_ref, *, n_valid: int):
    # Inputs stay in their storage dtype (bf16 under mixed precision): the
    # MXU's fast path is low-precision operands with fp32 accumulation via
    # preferred_element_type — upcasting operands first would force full
    # fp32 matmuls. The block may carry G heads (heads_per_program); the
    # unrolled loop amortizes per-program dispatch/DMA overhead, which is
    # what dominates at short sequence lengths.
    for g in range(q_ref.shape[0]):
        q = q_ref[g]                                  # (N_pad, d)
        k = k_ref[g]
        v = v_ref[g]
        n_pad = q.shape[0]

        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)       # (N_pad, N_pad) fp32

        if n_valid < n_pad:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1)
            s = jnp.where(col < n_valid, s, -1e30)

        # Softmax statistics in fp32 regardless of input dtype.
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        o_ref[g] = jnp.dot(p.astype(v.dtype), v,
                           preferred_element_type=jnp.float32)


def _heads_per_program(n_pad: int, d: int, itemsize: int) -> int:
    """Largest power-of-two G whose VMEM working set (3 G input tiles, one
    G fp32 output tile, one (N, N) fp32 score matrix live at a time)
    stays well under the ~16 MB/core budget. Measured values with d=64
    bf16: G=8 at both 197 tokens (n_pad=256, ~3.6 MB working set) and 577
    tokens (n_pad=640, ~6.5 MB); the formula only degrades below 8 past
    ~1000 tokens, where the (N, N) fp32 score temps dominate."""
    budget = 10 * 1024 * 1024
    score = n_pad * n_pad * 4 * 2          # s + one temp live
    g = 8
    while g > 1 and score + g * n_pad * d * (3 * itemsize + 4) > budget:
        g //= 2
    return g


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_attention_impl(q, k, v, interpret: bool):
    B, h, N, d = q.shape
    n_pad = _round_up(N, 128)
    # Sequence padding only: ViT head_dim (64) stays unpadded in HBM — the
    # MXU internally masks a 64-wide contraction either way, but explicit
    # jnp.pad to 128 would DOUBLE the HBM bytes moved for q/k/v and the
    # output, plus the VMEM footprint per program. (Verified: padding d was
    # the round-1 design; this halves kernel HBM traffic at equal FLOPs.)
    G = _heads_per_program(n_pad, d, q.dtype.itemsize)
    while (B * h) % G:
        G //= 2

    def prep(x):
        x = x.reshape(B * h, N, d)
        return jnp.pad(x, ((0, 0), (0, n_pad - N), (0, 0)))

    q2, k2, v2 = prep(q), prep(k), prep(v)

    kernel = functools.partial(_attention_kernel, n_valid=N)
    spec = pl.BlockSpec((G, n_pad, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(B * h // G,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B * h, n_pad, d), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * (B * h) * n_pad * n_pad * d,
            bytes_accessed=(B * h) * n_pad * d * (3 * q.dtype.itemsize + 4),
            transcendentals=(B * h) * n_pad * n_pad,
        ),
    )(q2, k2, v2)

    out = out[:, :N, :].reshape(B, h, N, d)
    return out


def _attention_bwd_kernel(q_ref, k_ref, v_ref, g_ref,
                          dq_ref, dk_ref, dv_ref, *, n_valid: int):
    """Whole-head attention backward: recompute P in VMEM, then the five
    backward matmuls (dV = P^T g, dP = g V^T, dS = P(dP - rowsum(P dP)),
    dQ = dS K, dK = dS^T Q) without ever spilling an (N, N) intermediate
    to HBM. Like the forward, the block carries G heads (see
    _bwd_heads_per_program) — the round-2 one-head-per-program version was
    dispatch/DMA-bound at 197 tokens and lost to XLA everywhere."""
    for gi in range(q_ref.shape[0]):
        q = q_ref[gi]                                 # (N_pad, d), input dtype
        k = k_ref[gi]
        v = v_ref[gi]
        g = g_ref[gi].astype(q.dtype)                 # cotangent is fp32

        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)       # (N_pad, N_pad) fp32
        n_pad = s.shape[0]
        if n_valid < n_pad:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1)
            s = jnp.where(col < n_valid, s, -1e30)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)    # fp32

        p_lo = p.astype(q.dtype)
        # dV = P^T g  — padded query rows have g = 0, contribute nothing.
        dv_ref[gi] = jax.lax.dot_general(
            p_lo, g, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # dP = g V^T
        dp = jax.lax.dot_general(
            g, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        # dS = P * (dP - rowsum(P * dP)); masked columns: P = 0 -> dS = 0.
        ds = p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True))
        ds_lo = ds.astype(q.dtype)
        dq_ref[gi] = jnp.dot(ds_lo, k, preferred_element_type=jnp.float32)
        dk_ref[gi] = jax.lax.dot_general(
            ds_lo, q, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)


def _bwd_heads_per_program(n_pad: int, d: int, itemsize: int) -> int:
    """Largest power-of-two G for the backward block. Working set per
    program: ~3 live (N, N) fp32 temps (P, dP, dS) plus G tiles of q/k/v
    (input dtype), g (fp32 cotangent) and three fp32 output tiles. With
    d=64 bf16 this gives G=8 at n_pad=256 (~3.7 MB) and G=4 at n_pad=640
    (~8.5 MB)."""
    budget = 10 * 1024 * 1024
    score = n_pad * n_pad * 4 * 3
    g = 8
    while g > 1 and score + g * n_pad * d * (3 * itemsize + 4 + 12) > budget:
        g //= 2
    return g


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_attention_bwd_impl(q, k, v, g, interpret: bool):
    B, h, N, d = q.shape
    n_pad = _round_up(N, 128)

    def prep(x):
        x = x.reshape(B * h, N, d)
        return jnp.pad(x, ((0, 0), (0, n_pad - N), (0, 0)))

    q2, k2, v2, g2 = prep(q), prep(k), prep(v), prep(g)
    G = _bwd_heads_per_program(n_pad, d, q.dtype.itemsize)
    while (B * h) % G:
        G //= 2
    spec = pl.BlockSpec((G, n_pad, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    kernel = functools.partial(_attention_bwd_kernel, n_valid=N)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(B * h // G,),
        in_specs=[spec] * 4,
        out_specs=(spec, spec, spec),
        out_shape=tuple(
            jax.ShapeDtypeStruct((B * h, n_pad, d), jnp.float32)
            for _ in range(3)),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 5 * (B * h) * n_pad * n_pad * d,
            bytes_accessed=(B * h) * n_pad * d
            * (3 * q.dtype.itemsize + 4 * 4),
            transcendentals=(B * h) * n_pad * n_pad,
        ),
    )(q2, k2, v2, g2)

    def post(x, dt):
        return x[:, :N, :].reshape(B, h, N, d).astype(dt)

    return post(dq, q.dtype), post(dk, k.dtype), post(dv, v.dtype)


def _attention_xla(q, k, v):
    """Pure-XLA reference path (fallback backward + golden tests)."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32), preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32),
                      preferred_element_type=jnp.float32)


@jax.custom_vjp
def fused_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Softmax attention ``softmax(q k^T) v`` with q pre-scaled.

    Forward and backward both run fused Pallas kernels: attention
    probabilities are recomputed in VMEM during the backward (cheaper than
    materializing the (N, N) matrix to HBM at any sequence length this
    model sees), and all five backward matmuls stay VMEM-resident.

    Args:
        q, k, v: ``(B, heads, N, head_dim)``; q already multiplied by
            ``head_dim**-0.5``.

    Returns:
        ``(B, heads, N, head_dim)`` in fp32.
    """
    interpret = jax.default_backend() != "tpu"
    return _fused_attention_impl(q, k, v, interpret)


def _fused_attention_fwd(q, k, v):
    return fused_attention(q, k, v), (q, k, v)


def _fused_attention_bwd(res, g):
    q, k, v = res
    interpret = jax.default_backend() != "tpu"
    return _fused_attention_bwd_impl(q, k, v, g, interpret)


fused_attention.defvjp(_fused_attention_fwd, _fused_attention_bwd)
