"""Similarity kernels vs NumPy oracles (math transcribed from
reference build_hypergraph/similarity_kernel.py:17-124)."""

import numpy as np
import jax.numpy as jnp

from multimodal_fusion_tpu.ops.similarity import (
    pairwise_sq_dists,
    morphological_similarity,
    spatial_similarity,
    combined_similarity,
    cross_similarity,
    median_offdiag,
    threshold_edge_mask,
    mean_pool,
)


def _np_sq_dists(a, b):
    return ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)


def test_pairwise_sq_dists(rng):
    a = rng.standard_normal((17, 8)).astype(np.float32)
    b = rng.standard_normal((9, 8)).astype(np.float32)
    got = np.asarray(pairwise_sq_dists(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, _np_sq_dists(a, b), rtol=1e-4, atol=1e-4)


def test_pairwise_sq_dists_direct_lowdim(rng):
    """D <= 4 inputs (positions) use fused per-coordinate differences (r5):
    no norm-expansion cancellation, so slide-scale coordinates stay
    accurate, exact zeros on the diagonal, and no [N,M] matmul
    intermediate round-trips HBM in the blockwise stripe scans."""
    p = rng.uniform(0, 5e4, (33, 2)).astype(np.float32)
    got = np.asarray(pairwise_sq_dists(jnp.asarray(p)))
    p64 = p.astype(np.float64)
    want = ((p64[:, None, :] - p64[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    assert (np.diagonal(got) == 0.0).all()
    assert (got >= 0.0).all()
    # rectangular + 3-D variant
    a = rng.standard_normal((7, 3)).astype(np.float32)
    b = rng.standard_normal((5, 3)).astype(np.float32)
    got = np.asarray(pairwise_sq_dists(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, _np_sq_dists(a, b), rtol=1e-5, atol=1e-6)


def test_morphological_similarity(rng):
    x = rng.standard_normal((12, 16)).astype(np.float32) * 0.3
    lam = 0.7
    want = np.exp(-lam * _np_sq_dists(x, x))
    got = np.asarray(morphological_similarity(jnp.asarray(x), lam))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_combined_equals_product(rng):
    f = rng.standard_normal((10, 8)).astype(np.float32) * 0.3
    p = rng.standard_normal((10, 2)).astype(np.float32)
    kh = np.asarray(morphological_similarity(jnp.asarray(f), 0.5))
    kg = np.asarray(spatial_similarity(jnp.asarray(p), 0.2))
    k = np.asarray(combined_similarity(jnp.asarray(f), jnp.asarray(p), 0.5, 0.2))
    np.testing.assert_allclose(k, kh * kg, rtol=1e-4, atol=1e-5)


def test_cross_similarity(rng):
    a = rng.standard_normal((6, 8)).astype(np.float32) * 0.2
    b = rng.standard_normal((4, 8)).astype(np.float32) * 0.2
    want = np.exp(-1.3 * _np_sq_dists(a, b))
    got = np.asarray(cross_similarity(jnp.asarray(a), jnp.asarray(b), 1.3))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_median_offdiag(rng):
    x = rng.standard_normal((9, 4)).astype(np.float32) * 0.3
    K = np.asarray(morphological_similarity(jnp.asarray(x), 1.0))
    off = np.sort(K[~np.eye(9, dtype=bool)])
    want = off[(off.size - 1) // 2]  # torch.median: LOWER middle
    import torch as _t

    assert abs(want - float(_t.median(_t.tensor(off)))) < 1e-7
    got = float(median_offdiag(jnp.asarray(K)))
    assert abs(got - want) < 1e-6


def test_median_offdiag_padded(rng):
    x = rng.standard_normal((6, 4)).astype(np.float32) * 0.3
    K6 = np.asarray(morphological_similarity(jnp.asarray(x), 1.0))
    off6 = np.sort(K6[~np.eye(6, dtype=bool)])
    want = off6[(off6.size - 1) // 2]  # torch.median semantics
    # pad to 10 with garbage
    Kp = np.full((10, 10), 7.7, np.float32)
    Kp[:6, :6] = K6
    got = float(median_offdiag(jnp.asarray(Kp), n_valid=jnp.asarray(6)))
    assert abs(got - want) < 1e-6


def test_threshold_edge_mask_keeps_diag_and_both_directions(rng):
    x = rng.standard_normal((7, 4)).astype(np.float32)
    K = np.asarray(morphological_similarity(jnp.asarray(x), 1.0))
    thr = float(np.median(K[~np.eye(7, dtype=bool)]))
    m = np.asarray(threshold_edge_mask(jnp.asarray(K), thr))
    assert m.diagonal().all()  # self-similarity 1.0 >= thr
    np.testing.assert_array_equal(m, K >= thr)


def test_mean_pool_masked(rng):
    x = rng.standard_normal((8, 5)).astype(np.float32)
    mask = np.array([1, 1, 1, 0, 0, 0, 0, 0], bool)
    got = np.asarray(mean_pool(jnp.asarray(x), jnp.asarray(mask)))
    np.testing.assert_allclose(got, x[:3].mean(0, keepdims=True), rtol=1e-5, atol=1e-6)


def test_large_magnitude_positions_no_inf():
    """Slide coordinates up to 5e4: the norm expansion must not go negative
    (TPU default bf16 matmul precision caused exp(+huge)=inf before the
    HIGHEST-precision fix)."""
    rng = np.random.default_rng(9)
    f = rng.standard_normal((64, 32)).astype(np.float32)
    p = rng.integers(0, 50_000, (64, 2)).astype(np.float32)
    K = np.asarray(combined_similarity(jnp.asarray(f), jnp.asarray(p), 1.0, 1.0))
    assert np.isfinite(K).all()
    assert (K <= 1.0 + 1e-5).all()
    np.testing.assert_allclose(np.diagonal(K), 1.0, atol=1e-5)

    from multimodal_fusion_tpu.ops.pallas_similarity import pallas_combined_similarity

    Kp = np.asarray(
        pallas_combined_similarity(
            jnp.asarray(f), jnp.asarray(p), 1.0, 1.0, tile_m=64, tile_n=64, interpret=True
        )
    )
    assert np.isfinite(Kp).all()
    np.testing.assert_allclose(np.diagonal(Kp), 1.0, atol=1e-5)
