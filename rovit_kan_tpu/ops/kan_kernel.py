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

Backward is a hand-written fused Pallas kernel too (round-2's XLA-recompute
backward made training with the fused forward strictly wasteful — it paid
the fused forward PLUS a full unfused forward+backward): spline derivatives
come from the (value, tangent) Cox-de Boor recursion in
ops/spline.py::bspline_basis_and_deriv_list, weight gradients accumulate
across batch-grid steps in VMEM-resident output blocks.

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

from rovit_kan_tpu.ops.spline import (
    bspline_basis_and_deriv_list,
    bspline_basis_list,
    kan_layer_apply,
)


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


def _kan_layer_bwd_kernel(x_ref, wspl_ref, wlin_ref, g_ref,
                          dx_ref, dwspl_ref, dwlin_ref, db_ref, *,
                          knots: tuple, degree: int):
    """Fused KAN layer backward: recompute tanh/basis in VMEM, then
    dW_spline[k] = basis_k^T g, dW_lin = x^T g, db = colsum g,
    dx = g W_lin^T + (sum_k (g W_spline[k]^T) * basis_k'(t)) * (1 - t^2).
    Weight gradients accumulate across the sequential batch grid (init at
    program 0); padded rows/cols are sliced off by the caller."""
    kn = np.asarray(knots, np.float32)
    hi = jax.lax.Precision.HIGHEST

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dwspl_ref[:] = jnp.zeros(dwspl_ref.shape, dwspl_ref.dtype)
        dwlin_ref[:] = jnp.zeros(dwlin_ref.shape, dwlin_ref.dtype)
        db_ref[:] = jnp.zeros(db_ref.shape, db_ref.dtype)

    x = x_ref[:].astype(jnp.float32)
    g = g_ref[:].astype(jnp.float32)
    t = jnp.tanh(x)
    basis, dbasis = bspline_basis_and_deriv_list(t, kn, degree)

    db_ref[:] += jnp.sum(g, axis=0, keepdims=True)
    dwlin_ref[:] += jax.lax.dot_general(
        x, g, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=hi)
    dspl = jnp.zeros_like(x)
    for k in range(len(basis)):
        dwspl_ref[k] += jax.lax.dot_general(
            basis[k], g, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=hi)
        dspl = dspl + jax.lax.dot_general(
            g, wspl_ref[k], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=hi) * dbasis[k]
    dx_ref[:] = jax.lax.dot_general(
        g, wlin_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=hi) \
        + dspl * (1.0 - t * t)


@functools.partial(jax.jit, static_argnames=("knots_t", "degree", "interpret"))
def _fused_kan_bwd_impl(x, spline_weights, kernel, g, knots_t, degree,
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
    g2 = jnp.pad(g.astype(jnp.float32),
                 ((0, b_pad - B), (0, out_pad - out_f)))
    wspl = jnp.pad(spline_weights.transpose(2, 0, 1),
                   ((0, 0), (0, in_pad - in_f), (0, out_pad - out_f)))
    wlin = jnp.pad(kernel, ((0, in_pad - in_f), (0, out_pad - out_f)))

    kern = functools.partial(_kan_layer_bwd_kernel, knots=knots_t,
                             degree=degree)
    bspec = pl.BlockSpec((bb, in_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    gspec = pl.BlockSpec((bb, out_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    wspl_spec = pl.BlockSpec((K, in_pad, out_pad), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    wlin_spec = pl.BlockSpec((in_pad, out_pad), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    db_spec = pl.BlockSpec((1, out_pad), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    dx, dwspl, dwlin, db = pl.pallas_call(
        kern,
        grid=(b_pad // bb,),
        in_specs=[bspec, wspl_spec, wlin_spec, gspec],
        out_specs=(bspec, wspl_spec, wlin_spec, db_spec),
        out_shape=(
            jax.ShapeDtypeStruct((b_pad, in_pad), jnp.float32),
            jax.ShapeDtypeStruct((K, in_pad, out_pad), jnp.float32),
            jax.ShapeDtypeStruct((in_pad, out_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, out_pad), jnp.float32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 3 * (K + 1) * b_pad * in_pad * out_pad,
            bytes_accessed=4 * (2 * b_pad * in_pad + b_pad * out_pad
                                + 2 * (K + 1) * in_pad * out_pad),
            transcendentals=b_pad * in_pad,
        ),
    )(x2, wspl, wlin, g2)

    return (dx[:B, :in_f],
            dwspl[:, :in_f, :out_f].transpose(1, 2, 0),
            dwlin[:in_f, :out_f],
            db[0, :out_f])


def _fused_kan_fwd(x, spline_weights, kernel, bias, knots, degree):
    out = fused_kan_layer(x, spline_weights, kernel, bias, knots, degree)
    return out, (x, spline_weights, kernel)


def _fused_kan_bwd(knots, degree, res, g):
    x, spline_weights, kernel = res
    interpret = jax.default_backend() != "tpu"
    dx, dwspl, dwlin, db = _fused_kan_bwd_impl(
        x, spline_weights, kernel, g,
        tuple(float(t) for t in np.asarray(knots)), degree, interpret)
    return dx, dwspl, dwlin, db


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
    """Reference XLA formulation — the executable spec the fused kernels
    (forward AND the hand-written backward) are validated against; kept
    for goldens and for debugging kernel regressions on new shapes."""
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


def _kan_module_bwd_kernel(*refs, knots: tuple, degree: int, n_layers: int,
                           out_dims: tuple):
    """Whole-module KAN backward in one kernel: recompute the forward
    (activations stay VMEM-local), then walk the layers in reverse chaining
    through the 3*sigmoid squash, the inter-layer ReLUs, the spline
    derivative (bspline_basis_and_deriv_list) and the tanh. Weight
    gradients accumulate across the sequential batch grid."""
    # refs: x, [wspl_l, wlin_l, b_l]*L, g | dx, [dwspl_l, dwlin_l, db_l]*L
    x_ref = refs[0]
    w_refs = refs[1:1 + 3 * n_layers]
    g_ref = refs[1 + 3 * n_layers]
    dx_ref = refs[2 + 3 * n_layers]
    dw_refs = refs[3 + 3 * n_layers:]
    kn = np.asarray(knots, np.float32)
    hi = jax.lax.Precision.HIGHEST

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in dw_refs:
            r[:] = jnp.zeros(r.shape, r.dtype)

    # Forward recompute, stashing inputs h_l and pre-activations a_l.
    hs = [x_ref[:].astype(jnp.float32)]
    accs = []
    for layer in range(n_layers):
        wspl = w_refs[3 * layer][:]
        wlin = w_refs[3 * layer + 1][:]
        b = w_refs[3 * layer + 2][:]
        basis = bspline_basis_list(jnp.tanh(hs[-1]), kn, degree)
        acc = jnp.dot(hs[-1], wlin, preferred_element_type=jnp.float32,
                      precision=hi) + b
        for k, bk in enumerate(basis):
            acc = acc + jnp.dot(bk, wspl[k],
                                preferred_element_type=jnp.float32,
                                precision=hi)
        cols = jax.lax.broadcasted_iota(jnp.int32, acc.shape, dimension=1)
        acc = jnp.where(cols < out_dims[layer], acc, 0.0)
        accs.append(acc)
        hs.append(jnp.maximum(acc, 0.0) if layer < n_layers - 1 else acc)

    sig = jax.nn.sigmoid(accs[-1])
    gcur = g_ref[:].astype(jnp.float32) * 3.0 * sig * (1.0 - sig)
    for layer in range(n_layers - 1, -1, -1):
        h = hs[layer]
        t = jnp.tanh(h)
        basis, dbasis = bspline_basis_and_deriv_list(t, kn, degree)
        wspl = w_refs[3 * layer][:]
        wlin = w_refs[3 * layer + 1][:]
        dw_refs[3 * layer + 2][:] += jnp.sum(gcur, axis=0, keepdims=True)
        dw_refs[3 * layer + 1][:] += jax.lax.dot_general(
            h, gcur, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=hi)
        dspl = jnp.zeros_like(h)
        for k in range(len(basis)):
            dw_refs[3 * layer][k] += jax.lax.dot_general(
                basis[k], gcur, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=hi)
            dspl = dspl + jax.lax.dot_general(
                gcur, wspl[k], dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=hi) * dbasis[k]
        dh = jax.lax.dot_general(
            gcur, wlin, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=hi) \
            + dspl * (1.0 - t * t)
        if layer > 0:
            # relu'(0) = 0, matching jax.nn.relu's custom JVP.
            gcur = dh * (accs[layer - 1] > 0.0).astype(jnp.float32)
        else:
            dx_ref[:] = dh


@functools.partial(jax.jit, static_argnames=("dims", "knots_t", "degree",
                                             "interpret"))
def _fused_kan_module_bwd_impl(x, flat_params, g, dims, knots_t, degree,
                               interpret):
    B = x.shape[0]
    n_layers = len(dims) - 1
    K = flat_params[0].shape[2]

    bb = 256 if B > 256 else _round_up(B, 8)
    b_pad = _round_up(B, bb)
    pads = [_round_up(d, 128) for d in dims]

    x2 = jnp.pad(x.astype(jnp.float32),
                 ((0, b_pad - B), (0, pads[0] - dims[0])))
    g2 = jnp.pad(g.astype(jnp.float32),
                 ((0, b_pad - B), (0, pads[-1] - dims[-1])))

    inputs = [x2]
    in_specs = [pl.BlockSpec((bb, pads[0]), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    w_specs = []
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
        layer_specs = [
            pl.BlockSpec((K, din, dout), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((din, dout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        in_specs += layer_specs
        w_specs.append(layer_specs)
        flops += 2 * 3 * (K + 1) * b_pad * din * dout
    inputs.append(g2)
    in_specs.append(pl.BlockSpec((bb, pads[-1]), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM))

    out_specs = [pl.BlockSpec((bb, pads[0]), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)]
    out_shapes = [jax.ShapeDtypeStruct((b_pad, pads[0]), jnp.float32)]
    for layer in range(n_layers):
        din, dout = pads[layer], pads[layer + 1]
        out_specs += w_specs[layer]
        out_shapes += [
            jax.ShapeDtypeStruct((K, din, dout), jnp.float32),
            jax.ShapeDtypeStruct((din, dout), jnp.float32),
            jax.ShapeDtypeStruct((1, dout), jnp.float32),
        ]

    kern = functools.partial(_kan_module_bwd_kernel, knots=knots_t,
                             degree=degree, n_layers=n_layers,
                             out_dims=tuple(dims[1:]))
    outs = pl.pallas_call(
        kern,
        grid=(b_pad // bb,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * (2 * b_pad * pads[0] + b_pad * pads[-1])
            + 8 * sum(int(p.size) for p in flat_params),
            transcendentals=3 * b_pad * sum(pads[:-1]),
        ),
    )(*inputs)

    dx = outs[0][:B, :dims[0]]
    dparams = []
    for layer in range(n_layers):
        wspl, wlin, bias = flat_params[3 * layer: 3 * layer + 3]
        dwspl, dwlin, db = outs[1 + 3 * layer: 4 + 3 * layer]
        dparams.append(dwspl[:, :wspl.shape[0], :wspl.shape[1]]
                       .transpose(1, 2, 0))
        dparams.append(dwlin[:wlin.shape[0], :wlin.shape[1]])
        dparams.append(db[0, :bias.shape[0]])
    return dx, tuple(dparams)


def _fused_kan_module_fwd(x, flat_params, dims, knots, degree):
    out = fused_kan_module(x, flat_params, dims, knots, degree)
    return out, (x, tuple(flat_params))


def _fused_kan_module_bwd(dims, knots, degree, res, g):
    x, flat_params = res
    interpret = jax.default_backend() != "tpu"
    return _fused_kan_module_bwd_impl(
        x, flat_params, g, tuple(int(d) for d in dims),
        tuple(float(t) for t in np.asarray(knots)), degree, interpret)


fused_kan_module.defvjp(_fused_kan_module_fwd, _fused_kan_module_bwd)
