"""CLAM attention heads.

Math parity with the reference attention networks
(reference: ``downstream_survival/models/clam_mlp.py:8-49``):

- AttnNet:      score = W2( tanh(W1 x) )
- AttnNetGated: score = W_c( tanh(W_a x) * sigmoid(W_b x) )

Scores are computed per instance over the (padded) bag axis; softmax over the
bag happens in the caller with the validity mask.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import nnx

from multimodal_fusion_tpu.models.common import dropout, split_keys, torch_linear


class AttnNet(nnx.Module):
    """Plain attention scorer: Linear -> tanh -> [dropout] -> Linear."""

    def __init__(self, L: int, D: int, n_classes: int, dropout_rate: float, rngs: nnx.Rngs):
        self.fc1 = torch_linear(L, D, rngs)
        self.fc2 = torch_linear(D, n_classes, rngs)
        self.dropout_rate = dropout_rate

    def __call__(
        self, x: jax.Array, *, key: Optional[jax.Array] = None, train: bool = False
    ) -> Tuple[jax.Array, jax.Array]:
        a = jnp.tanh(self.fc1(x))
        a = dropout(a, self.dropout_rate, key, train)
        return self.fc2(a), x


class AttnNetGated(nnx.Module):
    """Gated attention scorer: (tanh branch * sigmoid branch) -> Linear."""

    def __init__(self, L: int, D: int, n_classes: int, dropout_rate: float, rngs: nnx.Rngs):
        self.fc_a = torch_linear(L, D, rngs)
        self.fc_b = torch_linear(L, D, rngs)
        self.fc_c = torch_linear(D, n_classes, rngs)
        self.dropout_rate = dropout_rate

    def __call__(
        self, x: jax.Array, *, key: Optional[jax.Array] = None, train: bool = False
    ) -> Tuple[jax.Array, jax.Array]:
        ka, kb = split_keys(key, 2)
        a = jnp.tanh(self.fc_a(x))
        a = dropout(a, self.dropout_rate, ka, train)
        b = jax.nn.sigmoid(self.fc_b(x))
        b = dropout(b, self.dropout_rate, kb, train)
        return self.fc_c(a * b), x
