"""Task heads on the 192-d CLS embedding.

Capability parity with `/root/reference/models/heads.py`:
- ClassificationHead: Linear(192->128) -> ReLU -> Dropout(0.3) -> Linear(128->4)
  (reference lines 7-22).
- OrdinalHead: same trunk to K-1=3 cumulative-link logits (lines 25-43); the
  prob/severity conversions live in `ops/ordinal.py` as pure functions.
- UncertaintyHead: shared trunk, two Linear(128->1) emitting (mu, log_var),
  log_var clamped to [-10, 10] (lines 80-102); Gaussian sampling is a pure
  function of (mu, log_var, key).

Heads run in fp32 — they are a negligible fraction of the FLOPs and keep the
loss math exact.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

_PREC = jax.lax.Precision.HIGHEST


class _MlpTrunk(nn.Module):
    hidden_dim: int = 128
    dropout: float = 0.3

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = nn.Dense(self.hidden_dim, name="fc1", precision=_PREC)(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return x


class ClassificationHead(nn.Module):
    hidden_dim: int = 128
    num_classes: int = 4
    dropout: float = 0.3

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = _MlpTrunk(self.hidden_dim, self.dropout, name="trunk")(x, deterministic)
        return nn.Dense(self.num_classes, name="fc2", precision=_PREC)(x)


class OrdinalHead(nn.Module):
    hidden_dim: int = 128
    num_classes: int = 4
    dropout: float = 0.3

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = _MlpTrunk(self.hidden_dim, self.dropout, name="trunk")(x, deterministic)
        return nn.Dense(self.num_classes - 1, name="fc2", precision=_PREC)(x)   # (B, K-1)


class UncertaintyHead(nn.Module):
    hidden_dim: int = 128
    dropout: float = 0.3

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 deterministic: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x = _MlpTrunk(self.hidden_dim, self.dropout, name="trunk")(x, deterministic)
        mu = nn.Dense(1, name="fc_mu", precision=_PREC)(x)
        log_var = nn.Dense(1, name="fc_logvar", precision=_PREC)(x)
        log_var = jnp.clip(log_var, -10.0, 10.0)
        return mu, log_var


def uncertainty_samples(mu: jnp.ndarray, log_var: jnp.ndarray,
                        key: jax.Array, num_samples: int = 100) -> jnp.ndarray:
    """Draw N(mu, sigma^2) samples — functional analogue of reference
    ``UncertaintyHead.sample`` (models/heads.py:104-112)."""
    std = jnp.exp(0.5 * log_var)
    eps = jax.random.normal(key, (mu.shape[0], num_samples))
    return mu + std * eps
