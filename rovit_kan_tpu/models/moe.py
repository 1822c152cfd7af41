"""Mixture-of-Experts MLP with expert-choice routing (opt-in).

The reference has no MoE anywhere (its MLP is timm's dense two-layer FFN,
`/root/reference/models/backbone.py:12-18`); this module exists to complete
the framework's parallelism portfolio with the *expert* axis: a scaled-up
deployment can widen the FFN sparsely and shard the experts over their own
mesh axis (`parallel/tensor.py::make_moe_mesh` / `moe_param_specs`), with
GSPMD inserting the token all-to-alls. The flagship stays dense —
``ModelConfig.moe_experts = 0`` by default.

TPU-first design choices:

- **Expert-choice routing** (each expert picks its top-C tokens) instead of
  token-choice top-k: perfectly load-balanced *by construction*, so no
  auxiliary balancing loss has to be plumbed through the curriculum loss
  stack, and every shape is static — ``top_k`` over a fixed token dim, a
  one-hot dispatch tensor, three einsums. Nothing data-dependent ever
  changes a shape, so the whole layer jits into plain MXU work.
- **Stacked expert params**: one ``(E, D, H)`` tensor per projection, not E
  modules. The leading dim is the sharding handle — ``P("expert", ...)``
  puts one expert (or a group) per device and the dispatch/combine einsums
  become all-to-alls over the expert axis under GSPMD.
- **fp32 gate**: routing scores and their softmax run in fp32 regardless of
  the compute dtype (picking the wrong expert is a worse failure mode than
  a slightly slower gate), expert FFN math in ``dtype`` (bf16 on TPU).
- Tokens not selected by any expert contribute zero — the residual stream
  carries them (standard expert-choice semantics). Sequence-parallel
  filler tokens (``n_valid``, models/vit.py) are masked out of the gate
  scores so they can never displace a real token from an expert's
  capacity; real-token outputs are therefore independent of the padding.
"""
from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn


def expert_capacity(num_tokens: int, num_experts: int,
                    capacity_factor: float) -> int:
    """Tokens each expert processes: ceil(S * cf / E), clipped to [1, S]."""
    c = math.ceil(num_tokens * capacity_factor / num_experts)
    return max(1, min(c, num_tokens))


class MoEMlp(nn.Module):
    """Expert-choice MoE FFN: drop-in for ``vit.Mlp`` at the call site.

    Per batch row (routing never mixes examples, so data parallelism and
    the GSPMD expert axis compose without cross-row shuffles):

    1. gate probs  ``p = softmax(x @ Wg)``            (B, S, E), fp32
    2. each expert e takes its top-C tokens of ``p[..., e]`` -> one-hot
       dispatch ``(B, E, C, S)``
    3. FFN on the gathered tokens: two stacked-expert einsums on the MXU
    4. combine back to token rows, weighted by the chosen gate probs.

    With ``num_experts=1`` and ``capacity_factor >= num_experts`` (C = S)
    this reduces EXACTLY to the dense ``Mlp`` (gate prob is 1.0 and the
    dispatch is a permutation) — tested in tests/test_moe.py.
    """
    dim: int = 192
    hidden: int = 768
    num_experts: int = 8
    capacity_factor: float = 2.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 n_valid: Optional[int] = None) -> jnp.ndarray:
        B, S, D = x.shape
        E = self.num_experts
        C = expert_capacity(S if n_valid is None else n_valid,
                            E, self.capacity_factor)

        # Routing in fp32 (param_dtype fp32, no dtype cast on the Dense).
        gate = nn.Dense(E, dtype=jnp.float32, param_dtype=jnp.float32,
                        use_bias=False, name="gate")(x.astype(jnp.float32))
        probs = jax.nn.softmax(gate, axis=-1)          # (B, S, E)
        scores = probs.transpose(0, 2, 1)              # (B, E, S)
        if n_valid is not None and n_valid < S:
            # Sequence-parallel filler tokens must never win a capacity
            # slot (they would displace real tokens and make real-token
            # outputs depend on the padding).
            valid = (jnp.arange(S) < n_valid)[None, None, :]
            scores = jnp.where(valid, scores, -jnp.inf)

        _, idx = jax.lax.top_k(scores, C)              # (B, E, C)
        disp = jax.nn.one_hot(idx, S, dtype=self.dtype)  # (B, E, C, S)
        # Combine weight of each chosen (expert, slot): its gate prob.
        w = jnp.take_along_axis(scores, idx, axis=-1)  # (B, E, C) fp32

        # batch_axis=0: the expert dim is a batch of independent Dense
        # layers, NOT receptive field — plain lecun_normal on (E, D, H)
        # would count fan_in = E*D and under-scale every expert by
        # sqrt(E) relative to the dense Mlp this is a drop-in for.
        init = nn.initializers.lecun_normal(batch_axis=0)
        w1 = self.param("w1", init, (E, D, self.hidden), jnp.float32)
        b1 = self.param("b1", nn.initializers.zeros,
                        (E, self.hidden), jnp.float32)
        w2 = self.param("w2", init, (E, self.hidden, D), jnp.float32)
        b2 = self.param("b2", nn.initializers.zeros, (E, D), jnp.float32)

        xin = jnp.einsum("becs,bsd->becd", disp, x.astype(self.dtype))
        h = jnp.einsum("becd,edh->bech", xin, w1.astype(self.dtype),
                       preferred_element_type=jnp.float32)
        h = nn.gelu(h + b1[None, :, None, :], approximate=False)
        out = jnp.einsum("bech,ehd->becd", h.astype(self.dtype),
                         w2.astype(self.dtype),
                         preferred_element_type=jnp.float32)
        out = out + b2[None, :, None, :]
        # Scatter back: token s accumulates every expert slot that chose it.
        out = jnp.einsum("becs,bec,becd->bsd", disp,
                         w.astype(out.dtype), out)
        return out.astype(self.dtype)
