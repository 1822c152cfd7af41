"""Cumulative-link ordinal regression math, vectorized.

Reference semantics (`/root/reference/models/heads.py:45-77`): the head emits
K-1 cumulative logits; sigmoid gives cumulative probabilities ``c_k``, which
convert to per-class probabilities as

    P(y=0)   = c_0
    P(y=k)   = c_k - c_{k-1}      (0 < k < K-1)
    P(y=K-1) = 1 - c_{K-2}

(The reference's comments call c_k "P(y<=k)" but trains them against binary
targets ``[y > k]`` — see training/losses.py:48-72 there. We reproduce the
math as implemented, not the comment.)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def cumulative_to_class_probs(cum_logits: jnp.ndarray) -> jnp.ndarray:
    """Convert ``(B, K-1)`` cumulative logits to ``(B, K)`` class probs.

    Vectorized form of reference ``OrdinalHead.predict_probabilities``
    (models/heads.py:45-67): first class = c_0, middle classes = adjacent
    differences, last class = 1 - c_{K-2}.
    """
    c = jax.nn.sigmoid(cum_logits)                        # (B, K-1)
    first = c[:, :1]
    middle = c[:, 1:] - c[:, :-1]                         # (B, K-2)
    last = 1.0 - c[:, -1:]
    return jnp.concatenate([first, middle, last], axis=-1)


def ordinal_expected_severity(cum_logits: jnp.ndarray) -> jnp.ndarray:
    """Expected severity E[y] = sum_k k * P(y=k), shape ``(B, 1)``.

    Reference ``OrdinalHead.predict_severity`` (models/heads.py:69-77).
    """
    probs = cumulative_to_class_probs(cum_logits)
    levels = jnp.arange(probs.shape[-1], dtype=probs.dtype)
    return jnp.sum(probs * levels, axis=-1, keepdims=True)
