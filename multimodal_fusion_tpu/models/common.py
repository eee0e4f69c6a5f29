"""Shared model building blocks (flax.nnx).

Conventions for the whole zoo:

- Modules hold **parameters only**; all stochasticity (dropout, random
  modality dropping) flows through explicit ``key`` arguments with a
  ``train`` flag, so case-level ``jax.vmap`` stays trivial.
- Linear layers use torch-style fan-in uniform init (bound = 1/sqrt(fan_in))
  so training dynamics are comparable with the reference stack.
- Ragged bags arrive padded with a boolean validity mask.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx


def torch_linear(in_dim: int, out_dim: int, rngs: nnx.Rngs) -> nnx.Linear:
    """nnx.Linear with torch.nn.Linear's default init scale.

    Init values are drawn on host via numpy seeded from the nnx key —
    deterministic given the key, and avoids compiling one tiny XLA kernel
    per layer at model construction (which dominated model-create time)."""
    bound = 1.0 / (in_dim**0.5)

    def _np_uniform(key, shape, dtype):
        seed = np.asarray(jax.random.key_data(key)).ravel()
        rng = np.random.default_rng(seed.astype(np.uint32))
        return jnp.asarray(rng.uniform(-bound, bound, shape), dtype)

    return nnx.Linear(
        in_dim, out_dim, kernel_init=_np_uniform, bias_init=_np_uniform, rngs=rngs
    )


def dropout(
    x: jax.Array, rate: float, key: Optional[jax.Array], train: bool
) -> jax.Array:
    """Inverted dropout; identity when not training or rate == 0."""
    if not train or rate <= 0.0 or key is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


class MLP(nnx.Module):
    """Sequential Linear stack with optional activations between layers."""

    def __init__(
        self,
        dims: Sequence[int],
        rngs: nnx.Rngs,
        activation: Optional[Callable] = None,
        final_activation: Optional[Callable] = None,
    ):
        self.layers = nnx.List([torch_linear(dims[i], dims[i + 1], rngs) for i in range(len(dims) - 1)])
        self.activation = activation
        self.final_activation = final_activation

    def __call__(self, x: jax.Array) -> jax.Array:
        for i, layer in enumerate(self.layers):
            x = layer(x)
            if i < len(self.layers) - 1 and self.activation is not None:
                x = self.activation(x)
        if self.final_activation is not None:
            x = self.final_activation(x)
        return x


def split_keys(key: Optional[jax.Array], n: int):
    """Split a possibly-None key into n subkeys (all None if key is None)."""
    if key is None:
        return [None] * n
    return list(jax.random.split(key, n))
