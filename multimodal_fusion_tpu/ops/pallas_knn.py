"""Pallas TPU kernel: blockwise k-nearest-neighbours with running top-k.

Flash-attention-style accumulation: the grid walks (query tile, key tile);
each step computes one [TM, TN] distance tile on the MXU and merges it into
the query tile's running top-k (values + global indices) held in the
revisited output block — the [N, N] distance matrix never exists in HBM, so
N is bounded by HBM for the *features*, not N^2 (the reference sklearn
NearestNeighbors materialises full distance blocks; ops/knn.py's
``knn_indices_blockwise`` is the XLA-scan formulation and remains the
oracle/fallback).

Top-k merge inside the kernel avoids lane-axis gathers (unsupported):
k rounds of (min, first-occurrence one-hot, masked sum) — elementwise +
cumsum + reductions only, all VPU-friendly.  k is static and small.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodal_fusion_tpu.ops.knn import knn_indices, knn_indices_blockwise

_ACC = 128  # accumulator lane width (top-k slots padded to one TPU lane tile)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _knn_kernel(q_ref, kt_ref, ov_ref, oi_ref, *, k, tile_m, tile_n, n_valid):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        ov_ref[:] = jnp.full(ov_ref.shape, jnp.inf, jnp.float32)
        oi_ref[:] = jnp.zeros(oi_ref.shape, jnp.int32)

    hi = jax.lax.Precision.HIGHEST
    q = q_ref[:]  # [TM, D]
    kt = kt_ref[:]  # [TN, D]
    q_sq = jnp.sum(q * q, axis=1, keepdims=True)
    k_sq = jnp.sum(kt * kt, axis=1, keepdims=True)
    d = jnp.maximum(
        q_sq + k_sq.T - 2.0 * jnp.dot(q, kt.T, preferred_element_type=jnp.float32,
                                      precision=hi),
        0.0,
    )  # [TM, TN]
    col_idx = j * tile_n + jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    d = jnp.where(col_idx < n_valid, d, jnp.inf)
    # pin the self-distance to EXACT zero like the XLA oracles (knn.py:42,
    # :90-94): the norm expansion leaves eps*||x||^2 residue that at large
    # feature magnitudes would evict self from slot 0
    row_idx = i * tile_m + jax.lax.broadcasted_iota(jnp.int32, d.shape, 0)
    d = jnp.where(col_idx == row_idx, 0.0, d)

    vals = jnp.concatenate([ov_ref[:], d], axis=1)  # [TM, ACC+TN]
    idxs = jnp.concatenate([oi_ref[:], col_idx], axis=1)

    # k rounds of lexicographic (value, index) min extraction — cumsum is not
    # lowered on Pallas TPU, so ties break by smallest global index instead
    # of first lane; (value, index) pairs are unique across the merge (tile
    # index ranges are disjoint and accumulator pad slots sit at +inf).
    new_v, new_i = [], []
    big = jnp.int32(2**31 - 1)
    for _ in range(k):
        m = jnp.min(vals, axis=1, keepdims=True)  # [TM, 1]
        is_min = vals == m
        sel = jnp.min(jnp.where(is_min, idxs, big), axis=1)  # [TM]
        first = is_min & (idxs == sel[:, None])
        new_v.append(m[:, 0])
        new_i.append(jnp.where(sel == big, 0, sel))
        vals = jnp.where(first, jnp.inf, vals)
    pad = ov_ref.shape[1] - k
    ov_ref[:] = jnp.concatenate(
        [jnp.stack(new_v, axis=1),
         jnp.full((ov_ref.shape[0], pad), jnp.inf, jnp.float32)], axis=1
    )
    oi_ref[:] = jnp.concatenate(
        [jnp.stack(new_i, axis=1).astype(jnp.int32),
         jnp.zeros((oi_ref.shape[0], pad), jnp.int32)], axis=1
    )


@functools.partial(
    jax.jit, static_argnames=("k", "tile_m", "tile_n", "interpret")
)
def pallas_knn(
    x: jax.Array,
    k: int,
    tile_m: int = 256,
    tile_n: int = 256,
    interpret: bool = False,
):
    """Self-KNN over rows of ``x`` [N, D]: returns (distances [N, k] ascending,
    indices [N, k]) with self included (slot 0), matching ``knn_indices``."""
    if k > _ACC:
        raise ValueError(f"k={k} exceeds the accumulator width {_ACC}")
    n, d = x.shape
    n_pad_q = _round_up(n, tile_m)
    n_pad_k = _round_up(n, tile_n)
    d_pad = _round_up(d, 128)
    xq = jnp.zeros((n_pad_q, d_pad), jnp.float32).at[:n, :d].set(x)
    xk = jnp.zeros((n_pad_k, d_pad), jnp.float32).at[:n, :d].set(x)

    grid = (n_pad_q // tile_m, n_pad_k // tile_n)
    kernel = functools.partial(
        _knn_kernel, k=k, tile_m=tile_m, tile_n=tile_n, n_valid=n
    )
    vals, idxs = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n_pad_q, _ACC), jnp.float32),
            jax.ShapeDtypeStruct((n_pad_q, _ACC), jnp.int32),
        ),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile_m, d_pad), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_n, d_pad), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((tile_m, _ACC), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_m, _ACC), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad_q * n_pad_k * d_pad,
            bytes_accessed=4 * (n_pad_q * d_pad + n_pad_k * d_pad + 2 * n_pad_q * _ACC),
            transcendentals=0,
        ),
        interpret=interpret,
    )(xq, xk)
    # distances come out ascending per the extraction order; sqrt matches
    # knn_indices' euclidean convention (ranking is sqrt-invariant)
    return jnp.sqrt(vals[:n, :k]), idxs[:n, :k]


def knn_indices_auto(
    x: jax.Array, k: int, min_pallas_n: int = 4096, allow_pallas: bool = True
):
    """Pallas running-top-k kernel on TPU for large N (no [N, N] in HBM);
    the XLA blockwise scan for mid sizes; brute force below that.

    This is the PRODUCTION dispatcher for the hypergraph build's node-KNN
    (hypergraph/build.py): at default configs the node count (num_super +
    TMA cores ~ 130) stays in the dense regime, but large-N configs
    (--num_wsi_super_patches in the thousands for 1e5+-patch slides) cross
    into the Pallas kernel.  ``allow_pallas=False`` keeps GSPMD-sharded
    (mesh) callers on the partitionable XLA paths — the same constraint the
    similarity kernel solves with shard_map; KNN's running-top-k merge is
    not shard_map-wrapped because its inputs (super-patch + TMA nodes) are
    mesh-replicated reductions, never sharded."""
    n = x.shape[0]
    if allow_pallas and jax.default_backend() == "tpu" and n >= min_pallas_n:
        return pallas_knn(x, k)
    if n >= min_pallas_n:
        return knn_indices_blockwise(x, k)
    return knn_indices(x, k)
