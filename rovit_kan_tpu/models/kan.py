"""KAN (Kolmogorov-Arnold) severity module — flax wrapper over the
vectorized spline numerics in `ops/spline.py` (and, on TPU, the fused Pallas
kernel in `ops/kan_kernel.py`).

Capability parity with `/root/reference/models/kan.py:47-170`:
- KANLayer: learnable spline coefficients (in, out, 7) init N(0, 0.1^2) plus
  a dense residual path; splines evaluated on tanh(x) over a static uniform
  knot vector linspace(-1, 1, 11).
- KANSeverityModule: stack [192, 64, 16, 1] with ReLU between hidden layers
  and a final ``3 * sigmoid(x)`` squash onto the [0, 3] severity range.
- get_activation_trajectory / spline weight access are pure functions of the
  params (no module state).

Where the reference spends 12k+ Python interpreter iterations per forward in
its double loop (models/kan.py:83-89), this layer is two MXU matmuls plus a
trace-time-unrolled basis evaluation.
"""
from __future__ import annotations

from typing import Any, List, Sequence

import jax.numpy as jnp
import flax.linen as nn

from rovit_kan_tpu.ops.spline import (
    make_knots,
    num_basis_functions,
    kan_layer_apply,
)
from rovit_kan_tpu.ops.kan_kernel import fused_kan_layer, fused_kan_module


class KANLayer(nn.Module):
    in_features: int
    out_features: int
    num_knots: int = 5
    degree: int = 3
    use_pallas: bool = False

    def setup(self):
        num_basis = num_basis_functions(self.num_knots, self.degree)
        # N(0, 0.1^2) init, matching reference models/kan.py:63-65.
        self.spline_weights = self.param(
            "spline_weights", nn.initializers.normal(0.1),
            (self.in_features, self.out_features, num_basis), jnp.float32)
        self.kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.in_features, self.out_features), jnp.float32)
        self.bias = self.param("bias", nn.initializers.zeros,
                               (self.out_features,), jnp.float32)

    def param_tuple(self):
        """(spline_weights, kernel, bias) — consumed by the module-level
        fused kernel."""
        return self.spline_weights, self.kernel, self.bias

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        knots = make_knots(self.num_knots, self.degree)
        fn = fused_kan_layer if self.use_pallas else kan_layer_apply
        return fn(x, self.spline_weights, self.kernel, self.bias, knots,
                  self.degree)


class KANSeverityModule(nn.Module):
    layer_dims: Sequence[int] = (192, 64, 16, 1)
    num_knots: int = 5
    degree: int = 3
    use_pallas: bool = False

    def setup(self):
        dims = list(self.layer_dims)
        self.kan_layers = [
            KANLayer(dims[i], dims[i + 1], self.num_knots, self.degree,
                     use_pallas=self.use_pallas, name=f"kan_layers_{i}")
            for i in range(len(dims) - 1)
        ]

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.use_pallas:
            # Whole-module fusion: one kernel launch, all layers + ReLUs +
            # the final squash VMEM-resident (ops/kan_kernel.py).
            flat = []
            for layer in self.kan_layers:
                flat.extend(layer.param_tuple())
            return fused_kan_module(
                x, tuple(flat), tuple(self.layer_dims),
                make_knots(self.num_knots, self.degree), self.degree)
        for layer in self.kan_layers[:-1]:
            x = nn.relu(layer(x))
        x = self.kan_layers[-1](x)
        return 3.0 * nn.sigmoid(x)

    def activation_trajectory(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        """Per-layer activations incl. input and final score (reference
        models/kan.py:154-167)."""
        acts = [x]
        for layer in self.kan_layers[:-1]:
            x = nn.relu(layer(x))
            acts.append(x)
        x = 3.0 * nn.sigmoid(self.kan_layers[-1](x))
        acts.append(x)
        return acts


def get_spline_weights(kan_params: Any) -> List[jnp.ndarray]:
    """Extract per-layer spline coefficient tensors from a KAN param subtree
    (reference models/kan.py:151-152)."""
    out = []
    i = 0
    while f"kan_layers_{i}" in kan_params:
        out.append(kan_params[f"kan_layers_{i}"]["spline_weights"])
        i += 1
    return out
