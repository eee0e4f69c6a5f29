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


def test_pallas_knn_matches_bruteforce():
    """Running-top-k Pallas KNN (interpret mode on CPU) vs the exact
    brute-force oracle: same neighbour sets, same ascending distances."""
    from multimodal_fusion_tpu.ops.knn import knn_indices
    from multimodal_fusion_tpu.ops.pallas_knn import pallas_knn

    rng = np.random.default_rng(3)
    x = (rng.standard_normal((300, 24)) * 2.0).astype(np.float32)
    k = 6
    d_ref, i_ref = knn_indices(jnp.asarray(x), k)
    d_pl, i_pl = pallas_knn(jnp.asarray(x), k, tile_m=128, tile_n=128, interpret=True)
    assert d_pl.shape == (300, k) and i_pl.shape == (300, k)
    # norm-expansion cancellation leaves ~1e-2 absolute noise after sqrt
    # (same tolerance as test_knn_matches_sklearn)
    np.testing.assert_allclose(np.asarray(d_pl), np.asarray(d_ref), rtol=1e-3, atol=2e-2)
    match = (np.sort(np.asarray(i_pl), 1) == np.sort(np.asarray(i_ref), 1)).mean()
    assert match >= 0.99  # ties may order differently
    # ascending distances per row
    dv = np.asarray(d_pl)
    assert (np.diff(dv, axis=1) >= -1e-6).all()
    # self always present (distance 0 at slot 0)
    assert (np.asarray(i_pl)[:, 0] == np.arange(300)).mean() >= 0.99


def test_pallas_knn_non_divisible_and_auto():
    from multimodal_fusion_tpu.ops.knn import knn_indices
    from multimodal_fusion_tpu.ops.pallas_knn import knn_indices_auto, pallas_knn

    rng = np.random.default_rng(4)
    x = (rng.standard_normal((197, 17)) * 2.0).astype(np.float32)
    d_ref, i_ref = knn_indices(jnp.asarray(x), 5)
    d_pl, i_pl = pallas_knn(jnp.asarray(x), 5, tile_m=128, tile_n=128, interpret=True)
    np.testing.assert_allclose(np.asarray(d_pl), np.asarray(d_ref), rtol=1e-3, atol=2e-2)
    # padded key columns must never appear as neighbours
    assert (np.asarray(i_pl) < 197).all()
    # auto dispatch below the pallas threshold: exact path
    d_a, i_a = knn_indices_auto(jnp.asarray(x), 5)
    np.testing.assert_allclose(np.asarray(d_a), np.asarray(d_ref), rtol=1e-4, atol=1e-4)


def test_pallas_similarity_mixed_tile_sizes():
    """tile_m != tile_n where neither divides the other: padding must reach a
    COMMON multiple or trailing tiles are never written (review finding —
    rows past the first tile boundary returned uninitialised memory)."""
    import numpy as np

    from multimodal_fusion_tpu.ops.pallas_similarity import (
        pallas_combined_similarity,
    )
    from multimodal_fusion_tpu.ops.similarity import combined_similarity

    rng = np.random.default_rng(0)
    n = 150
    f = jnp.asarray(rng.standard_normal((n, 32)) * 0.3, jnp.float32)
    p = jnp.asarray(rng.uniform(0, 2, (n, 2)), jnp.float32)
    out = np.asarray(
        pallas_combined_similarity(f, p, 1.0, 1.0, tile_m=96, tile_n=128, interpret=True)
    )
    ref = np.asarray(combined_similarity(f, p, 1.0, 1.0))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_pallas_knn_self_distance_pinned_at_large_magnitude():
    """The kernel must pin d(i,i) to exact 0 like the XLA oracles: at large
    feature magnitudes the norm-expansion residue otherwise evicts self from
    slot 0 (review finding — d(i,i) ~ 0.7 at magnitude ~300)."""
    import numpy as np

    from multimodal_fusion_tpu.ops.knn import knn_indices
    from multimodal_fusion_tpu.ops.pallas_knn import pallas_knn

    rng = np.random.default_rng(3)
    x = rng.standard_normal((96, 16)).astype(np.float32) * 300.0
    d_pl, i_pl = pallas_knn(jnp.asarray(x), 4, tile_m=64, tile_n=64, interpret=True)
    d_x, i_x = knn_indices(jnp.asarray(x), 4)
    np.testing.assert_array_equal(np.asarray(i_pl)[:, 0], np.arange(96))
    np.testing.assert_array_equal(np.asarray(d_pl)[:, 0], 0.0)
    assert set(map(tuple, np.sort(i_pl, 1).tolist())) == set(
        map(tuple, np.sort(np.asarray(i_x), 1).tolist())
    )


def test_pallas_similarity_bf16_exact_flag(rng):
    """bf16_exact=True (the --upload_dtype bfloat16 fast path: 1-pass MXU
    feature dot) must agree with the HIGHEST-precision kernel on
    bf16-representable inputs — lossless by construction (the truncation is
    exact and HIGHEST's residual passes multiply zeros).  Interpret mode
    here; the 1-pass vs 6-pass equality itself is asserted live on TPU
    (r3 verification) where precision modes actually differ."""
    import jax.numpy as jnp

    from multimodal_fusion_tpu.ops.pallas_similarity import (
        pallas_combined_similarity,
    )

    f = jnp.asarray(
        rng.standard_normal((64, 32)).astype(np.float32) * 0.1, jnp.bfloat16
    ).astype(jnp.float32)
    p = jnp.asarray(rng.uniform(0, 3, (64, 2)), jnp.float32)
    K_hi = pallas_combined_similarity(f, p, 1.0, 1.0, interpret=True)
    K_lo = pallas_combined_similarity(f, p, 1.0, 1.0, interpret=True, bf16_exact=True)
    np.testing.assert_allclose(np.asarray(K_hi), np.asarray(K_lo), rtol=1e-6, atol=1e-7)


def test_pallas_similarity_bf16_wide_tile_auto(rng):
    """bf16_exact auto-tiling: 512-aligned shapes upgrade to 512-wide tiles
    (the 256-tile bf16 kernel is HBM-bound — see _pick_tile), and the wide
    tile + bf16 feature staging must be EXACTLY the 256-tile result (tile
    size and staging dtype may never change values: norms/assembly are f32
    either way and the staged values are bf16-representable)."""
    from multimodal_fusion_tpu.ops.pallas_similarity import _pick_tile

    assert _pick_tile(512) == 512
    assert _pick_tile(4096) == 512
    assert _pick_tile(300) == 512  # pads to 512 either way: wide tile free
    assert _pick_tile(600) == 256  # 512-padding (1024) exceeds 256's (768)
    assert _pick_tile(130) == 256

    f = jnp.asarray(
        rng.standard_normal((512, 48)).astype(np.float32) * 0.1, jnp.bfloat16
    ).astype(jnp.float32)
    p = jnp.asarray(rng.uniform(0, 3, (512, 2)), jnp.float32)
    K_wide = pallas_combined_similarity(
        f, p, 1.0, 1.0, interpret=True, bf16_exact=True
    )  # auto -> tile 512
    K_base = pallas_combined_similarity(
        f, p, 1.0, 1.0, tile_m=256, tile_n=256, interpret=True, bf16_exact=True
    )
    np.testing.assert_array_equal(np.asarray(K_wide), np.asarray(K_base))
