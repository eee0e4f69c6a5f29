"""Deterministic seeding utilities.

The reference seeds python/numpy/torch + cudnn.deterministic (reference:
``downstream_survival/main.py:244-255``).  In JAX, determinism is the default:
all stochasticity flows through explicit ``jax.random`` keys.  We still seed
python/numpy for the host-side components (splitters, samplers, fixtures).
"""

from __future__ import annotations

import random
from typing import Iterator

import jax
import numpy as np


def seed_everything(seed: int) -> jax.Array:
    """Seed host RNGs and return a root JAX PRNG key."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.key(seed)


def rng_seq(key: jax.Array) -> Iterator[jax.Array]:
    """Infinite stream of fresh PRNG keys derived from ``key``."""
    while True:
        key, sub = jax.random.split(key)
        yield sub
