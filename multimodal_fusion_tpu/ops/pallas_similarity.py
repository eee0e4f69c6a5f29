"""Pallas TPU kernel: fused combined-similarity tiles.

Computes K = exp(-(lambda_h*||h_i-h_j||^2 + lambda_g*||g_i-g_j||^2)) blockwise:
each grid step loads one [TM, D] row-tile and one [TN, D] column-tile of the
feature matrix into VMEM, runs both distance matmuls on the MXU and applies a
single fused exp on the VPU — one transcendental per element instead of the
reference's two (exp(kh)*exp(kg)), and no intermediate [N,N] distance
matrices in HBM.

The spatial term is computed as direct per-coordinate VPU differences
(positions are 2-D); the feature term keeps the norm-expansion MXU dot.

The XLA formulation in ``ops.similarity`` remains the oracle; this kernel is
the TPU fast path for large N (``combined_similarity_auto`` picks per
backend/size).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodal_fusion_tpu.ops.similarity import combined_similarity


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pick_tile(x: int, base: int = 256, big: int = 512) -> int:
    """Largest tile that costs no extra padding over ``base``.

    The bf16_exact kernel at 256-wide tiles is HBM-bound: its dominant
    stream (the column feature tile, re-fetched per grid step) gives an
    arithmetic intensity of ~2*TM*D/(2*D+4*TM) ≈ 183 FLOP/B at TM=256 —
    under the v5e bf16 ridge (~240).  TM=512 lifts it past the ridge
    (~284 FLOP/B → compute-bound; measured r3w5).  Only upgrade when the
    512-padding equals the 256-padding so small/ragged shapes never pay
    extra MXU work for the wider tile."""
    return big if _round_up(x, big) == _round_up(x, base) else base


# In-body column sub-chunk width: the [TM, TN] tile is processed in TN/128
# slices so the MXU dot of slice c+1 can issue against slice c's exp/fma
# VPU epilogue (unrolled Python loop = one dataflow region for Mosaic's
# scheduler — the same interleave that took the attention kernel from 0.68
# to 0.86 of its ceiling, r5).  At 512-tiles the dot and the epilogue cost
# ~2.7 vs ~3 us serial — near-halving the tile time when overlapped.
_COL_CHUNK = 128


def _sim_kernel(
    fi_ref, pi_ref, fj_ref, pjT_ref, o_ref, *, lambda_h, bf16_exact, n_pos
):
    # HIGHEST matmul precision by default: bf16 passes make the norm
    # expansion cancel catastrophically for large-magnitude inputs (see
    # ops/similarity.py).  ``bf16_exact`` marks FEATURE values known to be
    # exactly bf16-representable (the --upload_dtype bfloat16 path ships
    # bf16 and casts to f32 on device): truncating them back to bf16 for a
    # 1-pass MXU dot is LOSSLESS, and HIGHEST's passes 2-6 would multiply
    # exact-zero residuals — so DEFAULT precision is numerically identical
    # there at ~6x the matmul rate (the kernel is compute-bound at ~95% of
    # the 6-pass ceiling; measured r3).
    hi = jax.lax.Precision.HIGHEST
    feat_prec = jax.lax.Precision.DEFAULT if bf16_exact else hi
    fi = fi_ref[:]  # [TM, D] (bf16 under bf16_exact — see rect wrapper)

    # Norms accumulate in f32 regardless of the stored tile dtype; under
    # bf16_exact the stored values ARE the exact feature values, so the f32
    # squares match the f32-tile path bit for bit.  lambda_h folds into the
    # PER-ROW norms and the dot coefficient here (O(TM+TN) work) so the
    # [TM, TN] epilogue needs one broadcast add + one fma + one clamp —
    # scaling all three expansion terms by the same constant leaves the
    # cancellation behavior unchanged.
    fi32 = fi.astype(jnp.float32)
    fa = lambda_h * jnp.sum(fi32 * fi32, axis=1, keepdims=True)  # [TM, 1]

    t_n = fj_ref.shape[0]
    for c0 in range(0, t_n, _COL_CHUNK):
        tc = min(_COL_CHUNK, t_n - c0)
        fj = fj_ref[c0:c0 + tc, :]  # [TC, D]
        fj32 = fj.astype(jnp.float32)
        fb = lambda_h * jnp.sum(fj32 * fj32, axis=1, keepdims=True)  # [TC, 1]
        arg = jnp.maximum(
            (fa + fb.T) + (-2.0 * lambda_h) * jnp.dot(
                fi, fj.T, preferred_element_type=jnp.float32,
                precision=feat_prec,
            ),
            0.0,
        )

        # Spatial distances on the VPU as DIRECT coordinate differences:
        # the positions are 2-D (x, y) — the old formulation padded them to
        # 128 lanes and ran a 6-pass HIGHEST MXU dot, which cost ~75% as
        # much MXU time as the bf16 feature dot itself and held the
        # bf16-exact kernel at 52% of peak (VERDICT r3 #2).  The difference
        # form needs ~5 VPU ops/element, loses no accuracy (no cancellation
        # — it needs no max(d, 0) clamp at all), and frees the MXU for the
        # feature dot.  Coordinates arrive PRE-SCALED by sqrt(lambda_g)
        # (staging), so the squared differences are already the
        # lambda_g-weighted distances; column coordinates arrive TRANSPOSED
        # ([P_pad, TN] tile) so the [1, TC] row broadcasts come straight
        # from sublane slices.
        for p in range(n_pos):
            diff = pi_ref[:, p : p + 1] - pjT_ref[p : p + 1, c0:c0 + tc]
            arg = arg + diff * diff

        o_ref[:, c0:c0 + tc] = jnp.exp(-arg)


@functools.partial(
    jax.jit,
    static_argnames=(
        "lambda_h", "lambda_g", "tile_m", "tile_n", "interpret", "bf16_exact"
    ),
)
def pallas_combined_similarity_rect(
    row_features: jax.Array,
    row_positions: jax.Array,
    col_features: jax.Array,
    col_positions: jax.Array,
    lambda_h: float = 1.0,
    lambda_g: float = 1.0,
    tile_m: int | None = None,
    tile_n: int | None = None,
    interpret: bool = False,
    bf16_exact: bool = False,
) -> jax.Array:
    """Fused [M, N] combined-similarity stripe via the tiled Pallas kernel.

    Rectangular generalisation of the square kernel: rows come from one
    point set, columns from another.  This is the per-device workload of the
    shard_map mesh build (each device owns a row shard and sees gathered
    columns — ``sharded_combined_similarity``).

    ``tile_m``/``tile_n`` default to an auto pick: 256, upgraded to 512
    under ``bf16_exact`` when the wider tile costs no extra padding — the
    bf16 kernel is HBM-bound at 256 (see ``_pick_tile``).  Under
    ``bf16_exact`` the feature tiles are also STAGED in bf16 (the values
    are exactly bf16-representable by precondition, so the cast is
    lossless), halving the dominant HBM stream; norms and the distance
    assembly still run f32, so the output is bit-identical to f32 staging."""
    m, d = row_features.shape
    n = col_features.shape[0]
    n_pos = row_positions.shape[1]
    if col_positions.shape[1] != n_pos:
        raise ValueError("row/col position dims differ")
    # spatial term is a per-coordinate VPU difference (see _sim_kernel);
    # positions are 2-D everywhere in this framework, pad the coordinate
    # axis to the 8-sublane minimum
    p_pad = max(8, _round_up(n_pos, 8))
    if tile_m is None:
        tile_m = _pick_tile(m) if bf16_exact else 256
    if tile_n is None:
        tile_n = _pick_tile(n) if bf16_exact else 256
    m_pad = _round_up(m, tile_m)
    n_pad = _round_up(n, tile_n)
    d_pad = _round_up(d, 128)
    feat_dtype = jnp.bfloat16 if bf16_exact else jnp.float32
    fi = jnp.zeros((m_pad, d_pad), feat_dtype).at[:m, :d].set(
        row_features.astype(feat_dtype)
    )
    # positions pre-scaled by sqrt(lambda_g): the kernel's squared
    # differences then ARE the lambda_g-weighted spatial distances
    g_scale = float(lambda_g) ** 0.5
    pi = jnp.zeros((m_pad, p_pad), jnp.float32).at[:m, :n_pos].set(
        row_positions * g_scale
    )
    fj = jnp.zeros((n_pad, d_pad), feat_dtype).at[:n, :d].set(
        col_features.astype(feat_dtype)
    )
    # column coordinates staged TRANSPOSED: the kernel broadcasts [1, TN]
    # sublane rows against [TM, 1] lane slices — no in-kernel transpose
    pjT = jnp.zeros((p_pad, n_pad), jnp.float32).at[:n_pos, :n].set(
        (col_positions * g_scale).T
    )

    grid = (m_pad // tile_m, n_pad // tile_n)
    kernel = functools.partial(
        _sim_kernel, lambda_h=lambda_h, bf16_exact=bf16_exact, n_pos=n_pos
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile_m, d_pad), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_m, p_pad), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_n, d_pad), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((p_pad, tile_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (tile_m, tile_n), lambda i, j: (i, j), memory_space=pltpu.VMEM
            ),
        ),
        # bytes_accessed is DELIBERATELY the unique-bytes lower bound (each
        # feature matrix counted once + the output once); the column tile is
        # actually re-fetched per grid row (~(m_pad/tile_m)*n_pad*d_pad), but
        # the estimate only feeds Mosaic's scheduling heuristics and the
        # lower bound matches the roofline convention bench.py reports with.
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n_pad * d_pad + (3 * n_pos + 3) * m_pad * n_pad,
            bytes_accessed=(
                fi.dtype.itemsize * (m_pad + n_pad) * d_pad
                + 4 * m_pad * n_pad
            ),
            transcendentals=m_pad * n_pad,
        ),
        interpret=interpret,
    )(fi, pi, fj, pjT)
    return out[:m, :n]


def pallas_combined_similarity(
    features: jax.Array,
    positions: jax.Array,
    lambda_h: float = 1.0,
    lambda_g: float = 1.0,
    tile_m: int | None = None,
    tile_n: int | None = None,
    interpret: bool = False,
    bf16_exact: bool = False,
) -> jax.Array:
    """Fused [N, N] combined similarity via a tiled Pallas kernel."""
    return pallas_combined_similarity_rect(
        features, positions, features, positions,
        lambda_h, lambda_g, tile_m, tile_n, interpret, bf16_exact,
    )


def sharded_combined_similarity(
    mesh,
    features: jax.Array,
    positions: jax.Array,
    lambda_h: float = 1.0,
    lambda_g: float = 1.0,
    interpret: bool = False,
    bf16_exact: bool = False,
) -> jax.Array:
    """Mesh-sharded fused similarity: shard_map + Pallas (VERDICT r2 weak #2).

    GSPMD cannot partition a Mosaic custom call, so the mesh build used to
    force the XLA formulation exactly where the tiled kernel matters most
    (large N).  ``shard_map`` sidesteps GSPMD: each device keeps its ROW
    shard of feats/pos, all-gathers the column copies over the mesh (one ICI
    all-gather of [N, D+P] — tiny next to the O(N^2/n_dev) stripe each
    device computes), and runs the fused Pallas kernel on its [N/n_dev, N]
    stripe.  The result is a row-sharded global [N, N] that downstream GSPMD
    ops consume as before; sharded == unsharded to f32 rounding
    (test_parallel.py::test_sharded_build_uses_pallas_kernel).

    The patch axis must divide the mesh size (callers pad —
    ``_place_for_mesh``)."""
    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map  # jax >= 0.7
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map

    axes = tuple(mesh.axis_names)

    def stripe(f_loc, p_loc):
        f_all = jax.lax.all_gather(f_loc, axes, axis=0, tiled=True)
        p_all = jax.lax.all_gather(p_loc, axes, axis=0, tiled=True)
        return pallas_combined_similarity_rect(
            f_loc, p_loc, f_all, p_all, lambda_h, lambda_g,
            interpret=interpret, bf16_exact=bf16_exact,
        )

    # jax renamed check_rep -> check_vma (0.7.x); the Pallas call inside the
    # body is opaque to the replication checker either way, so disable it
    # under whichever spelling this jax accepts.
    try:
        smapped = shard_map(
            stripe,
            mesh=mesh,
            in_specs=(P(axes, None), P(axes, None)),
            out_specs=P(axes, None),
            check_vma=False,
        )
    except TypeError:  # pragma: no cover - older jax
        smapped = shard_map(
            stripe,
            mesh=mesh,
            in_specs=(P(axes, None), P(axes, None)),
            out_specs=P(axes, None),
            check_rep=False,
        )
    return smapped(features, positions)


# Below this N the XLA formulation wins (kernel launch overhead); tests
# lower it to force the Pallas paths on tiny fixtures.
MIN_PALLAS_N = 1024

# Force the shard_map+Pallas mesh path in interpret mode off-TPU — CPU-mesh
# tests only (interpret-mode Pallas is slow).
FORCE_SHARDED_PALLAS_INTERPRET = False


def combined_similarity_auto(
    features: jax.Array,
    positions: jax.Array,
    lambda_h: float = 1.0,
    lambda_g: float = 1.0,
    min_pallas_n: int = None,
    allow_pallas: bool = True,
    mesh=None,
    bf16_exact: bool = False,
) -> jax.Array:
    """Pallas kernel on TPU for large N, XLA formulation otherwise.

    With ``mesh`` (the GSPMD intra-slide ``--mesh_data`` build) the Pallas
    kernel runs under ``shard_map`` — each device computes its row stripe
    (``sharded_combined_similarity``); GSPMD alone cannot partition a Mosaic
    custom call, which used to force the XLA formulation on meshes (VERDICT
    r2 weak #2).  ``allow_pallas=False`` still forces the XLA expansion
    everywhere (oracle/debug)."""
    n = features.shape[0]
    if min_pallas_n is None:
        min_pallas_n = MIN_PALLAS_N
    on_tpu = jax.default_backend() == "tpu"
    if mesh is not None:
        if (
            allow_pallas
            and (on_tpu or FORCE_SHARDED_PALLAS_INTERPRET)
            and n >= min_pallas_n
            and n % int(mesh.devices.size) == 0
        ):
            return sharded_combined_similarity(
                mesh, features, positions, lambda_h, lambda_g,
                interpret=not on_tpu, bf16_exact=bf16_exact,
            )
        # XLA expansion partitions cleanly into row stripes under GSPMD
        return combined_similarity(features, positions, lambda_h, lambda_g)
    if allow_pallas and on_tpu and n >= min_pallas_n:
        return pallas_combined_similarity(
            features, positions, lambda_h, lambda_g, bf16_exact=bf16_exact
        )
    return combined_similarity(features, positions, lambda_h, lambda_g)
