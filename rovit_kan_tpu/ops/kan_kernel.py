"""Fused KAN layer Pallas kernel: tanh -> B-spline basis -> coefficient
contraction -> + dense residual, all VMEM-resident.

Why fuse: the XLA path (ops/spline.py:kan_layer_apply) must materialize the
``(B, in, 7)`` basis tensor as a matmul operand — XLA cannot fuse an
elementwise producer *into* a dot operand, so for the 192->64 layer that is a
(B, 1344) fp32 HBM round-trip per call. Here the basis functions are
evaluated on the VPU and contracted on the MXU without leaving VMEM.

Formulation: instead of reshaping to ``(B, in*K) @ (in*K, out)``, compute

    out = x @ W_lin + b + sum_k  basis_k(tanh(x)) @ W_spline[:, :, k]

i.e. K+1 = 8 small matmuls with no in-kernel reshapes. Zero-padding of the
feature dims is harmless (padded weights are zero), so no masking is needed.

Backward differentiates the XLA formulation via custom_vjp (recompute-based).

Reference hot spot being replaced: the Python double loop at
`/root/reference/models/kan.py:83-89`.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rovit_kan_tpu.ops.spline import bspline_basis_list, kan_layer_apply


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kan_kernel(x_ref, wspl_ref, wlin_ref, b_ref, o_ref, *,
                knots: tuple, degree: int):
    x = x_ref[:].astype(jnp.float32)                  # (BB, in_pad)
    xt = jnp.tanh(x)
    basis = bspline_basis_list(xt, np.asarray(knots, np.float32), degree)

    acc = jnp.dot(x, wlin_ref[:], preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    acc = acc + b_ref[:]
    for k, bk in enumerate(basis):
        acc = acc + jnp.dot(bk, wspl_ref[k],
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
    o_ref[:] = acc


@functools.partial(jax.jit,
                   static_argnames=("knots_t", "degree", "interpret"))
def _fused_kan_impl(x, spline_weights, kernel, bias, knots_t, degree,
                    interpret):
    B, in_f = x.shape
    out_f = kernel.shape[1]
    K = spline_weights.shape[2]

    in_pad = _round_up(in_f, 128)
    out_pad = _round_up(out_f, 128)
    bb = 256 if B > 256 else _round_up(B, 8)
    b_pad = _round_up(B, bb)

    x2 = jnp.pad(x.astype(jnp.float32),
                 ((0, b_pad - B), (0, in_pad - in_f)))
    # (K, in_pad, out_pad) — per-basis coefficient matrices.
    wspl = jnp.pad(spline_weights.transpose(2, 0, 1),
                   ((0, 0), (0, in_pad - in_f), (0, out_pad - out_f)))
    wlin = jnp.pad(kernel, ((0, in_pad - in_f), (0, out_pad - out_f)))
    b2 = jnp.pad(bias, (0, out_pad - out_f)).reshape(1, out_pad)

    kern = functools.partial(_kan_kernel, knots=knots_t, degree=degree)
    out = pl.pallas_call(
        kern,
        grid=(b_pad // bb,),
        in_specs=[
            pl.BlockSpec((bb, in_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, in_pad, out_pad), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((in_pad, out_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, out_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, out_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, out_pad), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * (K + 1) * b_pad * in_pad * out_pad,
            bytes_accessed=4 * (b_pad * in_pad + (K + 1) * in_pad * out_pad
                                + b_pad * out_pad),
            transcendentals=b_pad * in_pad,
        ),
    )(x2, wspl, wlin, b2)
    return out[:B, :out_f]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_kan_layer(x, spline_weights, kernel, bias, knots, degree=3):
    """Fused KAN layer, drop-in for ``ops.spline.kan_layer_apply``.

    Args:
        x: ``(B, in_features)`` fp32.
        spline_weights: ``(in, out, K)``.
        kernel / bias: dense residual path params.
        knots: static NumPy knot vector.
    """
    interpret = jax.default_backend() != "tpu"
    return _fused_kan_impl(x, spline_weights, kernel, bias,
                           tuple(float(t) for t in np.asarray(knots)),
                           degree, interpret)


def _fused_kan_fwd(x, spline_weights, kernel, bias, knots, degree):
    out = fused_kan_layer(x, spline_weights, kernel, bias, knots, degree)
    return out, (x, spline_weights, kernel, bias)


def _fused_kan_bwd(knots, degree, res, g):
    x, spline_weights, kernel, bias = res
    _, vjp = jax.vjp(
        lambda *a: kan_layer_apply(*a, knots=knots, degree=degree),
        x, spline_weights, kernel, bias)
    return vjp(g)


fused_kan_layer.defvjp(_fused_kan_fwd, _fused_kan_bwd)


# ------------------------------------------------------------------------
# Whole-module fusion: all KAN layers + inter-layer ReLU + the final
# 3*sigmoid squash in ONE kernel. The full weight set for the [192,64,16,1]
# stack is ~0.5 MB fp32 — everything (weights, activations, bases) stays
# VMEM-resident for the whole module: one kernel launch instead of three,
# and the (B, 64)/(B, 16) intermediates never touch HBM.
# ------------------------------------------------------------------------

def _kan_module_kernel(x_ref, *refs, knots: tuple, degree: int,
                       n_layers: int, out_dims: tuple):
    # refs layout: [wspl_0, wlin_0, b_0, wspl_1, wlin_1, b_1, ..., o_ref]
    o_ref = refs[-1]
    x = x_ref[:].astype(jnp.float32)                 # (BB, d0_pad)
    for layer in range(n_layers):
        wspl = refs[3 * layer][:]                    # (K, din_pad, dout_pad)
        wlin = refs[3 * layer + 1][:]
        b = refs[3 * layer + 2][:]
        basis = bspline_basis_list(jnp.tanh(x),
                                   np.asarray(knots, np.float32), degree)
        acc = jnp.dot(x, wlin, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST) + b
        for k, bk in enumerate(basis):
            acc = acc + jnp.dot(bk, wspl[k],
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)
        # Zero the padded output columns: the next layer's tanh(pad) would
        # otherwise contribute through its nonzero basis functions.
        cols = jax.lax.broadcasted_iota(jnp.int32, acc.shape, dimension=1)
        acc = jnp.where(cols < out_dims[layer], acc, 0.0)
        x = jnp.maximum(acc, 0.0) if layer < n_layers - 1 else acc
    o_ref[:] = 3.0 * jax.nn.sigmoid(x)


@functools.partial(jax.jit, static_argnames=("dims", "knots_t", "degree",
                                             "interpret"))
def _fused_kan_module_impl(x, flat_params, dims, knots_t, degree, interpret):
    B = x.shape[0]
    n_layers = len(dims) - 1
    K = flat_params[0].shape[2]

    bb = 256 if B > 256 else _round_up(B, 8)
    b_pad = _round_up(B, bb)
    pads = [_round_up(d, 128) for d in dims]

    x2 = jnp.pad(x.astype(jnp.float32),
                 ((0, b_pad - B), (0, pads[0] - dims[0])))
    inputs = [x2]
    in_specs = [pl.BlockSpec((bb, pads[0]), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    flops = 0
    for layer in range(n_layers):
        wspl, wlin, bias = flat_params[3 * layer: 3 * layer + 3]
        din, dout = pads[layer], pads[layer + 1]
        inputs.append(jnp.pad(wspl.transpose(2, 0, 1),
                              ((0, 0), (0, din - wspl.shape[0]),
                               (0, dout - wspl.shape[1]))))
        inputs.append(jnp.pad(wlin, ((0, din - wlin.shape[0]),
                                     (0, dout - wlin.shape[1]))))
        inputs.append(jnp.pad(bias, (0, dout - bias.shape[0]))
                      .reshape(1, dout))
        in_specs += [
            pl.BlockSpec((K, din, dout), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((din, dout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        flops += 2 * (K + 1) * b_pad * din * dout

    kern = functools.partial(_kan_module_kernel, knots=knots_t,
                             degree=degree, n_layers=n_layers,
                             out_dims=tuple(dims[1:]))
    out = pl.pallas_call(
        kern,
        grid=(b_pad // bb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bb, pads[-1]), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, pads[-1]), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * (b_pad * pads[0] + b_pad * pads[-1])
            + 4 * sum(int(p.size) for p in flat_params),
            transcendentals=b_pad * sum(pads[:-1]),
        ),
    )(*inputs)
    return out[:B, :dims[-1]]


def _kan_module_xla(x, flat_params, dims, knots, degree):
    """Reference XLA formulation (forward for the custom VJP backward)."""
    n_layers = len(dims) - 1
    for layer in range(n_layers):
        wspl, wlin, bias = flat_params[3 * layer: 3 * layer + 3]
        x = kan_layer_apply(x, wspl, wlin, bias, knots, degree)
        if layer < n_layers - 1:
            x = jax.nn.relu(x)
    return 3.0 * jax.nn.sigmoid(x)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def fused_kan_module(x, flat_params, dims, knots, degree=3):
    """Entire KAN severity module in one Pallas kernel.

    Args:
        x: ``(B, dims[0])`` features.
        flat_params: flat tuple ``(wspl_0, wlin_0, b_0, wspl_1, ...)``.
        dims: static layer widths, e.g. ``(192, 64, 16, 1)``.
        knots: static knot vector (tuple or ndarray).

    Returns:
        ``(B, dims[-1])`` severity in [0, 3].
    """
    interpret = jax.default_backend() != "tpu"
    return _fused_kan_module_impl(
        x, tuple(flat_params), tuple(int(d) for d in dims),
        tuple(float(t) for t in np.asarray(knots)), degree, interpret)


def _fused_kan_module_fwd(x, flat_params, dims, knots, degree):
    out = fused_kan_module(x, flat_params, dims, knots, degree)
    return out, (x, tuple(flat_params))


def _fused_kan_module_bwd(dims, knots, degree, res, g):
    x, flat_params = res
    knots_np = np.asarray(knots, np.float32)
    _, vjp = jax.vjp(
        lambda xx, pp: _kan_module_xla(xx, pp, dims, knots_np, degree),
        x, flat_params)
    return vjp(g)


fused_kan_module.defvjp(_fused_kan_module_fwd, _fused_kan_module_bwd)
