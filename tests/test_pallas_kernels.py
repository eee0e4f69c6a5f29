"""Pallas kernels vs XLA oracles (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from multimodal_fusion_tpu.ops.pallas_similarity import pallas_combined_similarity
from multimodal_fusion_tpu.ops.similarity import combined_similarity


def test_pallas_similarity_matches_oracle():
    rng = np.random.default_rng(0)
    f = jnp.asarray(rng.standard_normal((300, 70)) * 0.2, jnp.float32)
    p = jnp.asarray(rng.standard_normal((300, 2)), jnp.float32)
    want = np.asarray(combined_similarity(f, p, 0.7, 0.3))
    got = np.asarray(
        pallas_combined_similarity(f, p, 0.7, 0.3, tile_m=128, tile_n=128, interpret=True)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_pallas_similarity_odd_sizes():
    rng = np.random.default_rng(1)
    f = jnp.asarray(rng.standard_normal((65, 130)) * 0.2, jnp.float32)
    p = jnp.asarray(rng.standard_normal((65, 3)), jnp.float32)
    want = np.asarray(combined_similarity(f, p, 1.0, 1.0))
    got = np.asarray(
        pallas_combined_similarity(f, p, 1.0, 1.0, tile_m=64, tile_n=64, interpret=True)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
