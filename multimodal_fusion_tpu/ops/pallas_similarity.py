"""Pallas TPU kernel: fused combined-similarity tiles.

Computes K = exp(-(lambda_h*||h_i-h_j||^2 + lambda_g*||g_i-g_j||^2)) blockwise:
each grid step loads one [TM, D] row-tile and one [TN, D] column-tile of the
feature matrix into VMEM, runs both distance matmuls on the MXU and applies a
single fused exp on the VPU — one transcendental per element instead of the
reference's two (exp(kh)*exp(kg)), and no intermediate [N,N] distance
matrices in HBM.

Positions are padded to 128 lanes on entry (TPU lane width); zero-padding
does not change squared distances.

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


def _sim_kernel(fi_ref, pi_ref, fj_ref, pj_ref, o_ref, *, lambda_h, lambda_g):
    # HIGHEST matmul precision: bf16 passes make the norm expansion cancel
    # catastrophically for large-magnitude inputs (see ops/similarity.py).
    hi = jax.lax.Precision.HIGHEST
    fi = fi_ref[:]  # [TM, D]
    fj = fj_ref[:]  # [TN, D]
    pi = pi_ref[:]  # [TM, 128]
    pj = pj_ref[:]  # [TN, 128]

    fi_sq = jnp.sum(fi * fi, axis=1, keepdims=True)  # [TM, 1]
    fj_sq = jnp.sum(fj * fj, axis=1, keepdims=True)  # [TN, 1]
    d_h = fi_sq + fj_sq.T - 2.0 * jnp.dot(
        fi, fj.T, preferred_element_type=jnp.float32, precision=hi
    )

    pi_sq = jnp.sum(pi * pi, axis=1, keepdims=True)
    pj_sq = jnp.sum(pj * pj, axis=1, keepdims=True)
    d_g = pi_sq + pj_sq.T - 2.0 * jnp.dot(
        pi, pj.T, preferred_element_type=jnp.float32, precision=hi
    )

    o_ref[:] = jnp.exp(
        -(lambda_h * jnp.maximum(d_h, 0.0) + lambda_g * jnp.maximum(d_g, 0.0))
    )


@functools.partial(
    jax.jit, static_argnames=("lambda_h", "lambda_g", "tile_m", "tile_n", "interpret")
)
def pallas_combined_similarity(
    features: jax.Array,
    positions: jax.Array,
    lambda_h: float = 1.0,
    lambda_g: float = 1.0,
    tile_m: int = 256,
    tile_n: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Fused [N, N] combined similarity via a tiled Pallas kernel."""
    import math

    n, d = features.shape
    # pad to a COMMON multiple of both tile sizes: rounding to max(tm, tn)
    # alone leaves trailing tiles unvisited when neither divides the other
    # (grid floor-division) and returns uninitialised rows
    n_pad = _round_up(n, math.lcm(tile_m, tile_n))
    d_pad = _round_up(d, 128)
    f = jnp.zeros((n_pad, d_pad), jnp.float32).at[:n, :d].set(features)
    p = jnp.zeros((n_pad, 128), jnp.float32).at[:n, : positions.shape[1]].set(positions)

    grid = (n_pad // tile_m, n_pad // tile_n)
    kernel = functools.partial(_sim_kernel, lambda_h=lambda_h, lambda_g=lambda_g)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad, n_pad), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile_m, d_pad), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_m, 128), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_n, d_pad), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_n, 128), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (tile_m, tile_n), lambda i, j: (i, j), memory_space=pltpu.VMEM
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * n_pad * (d_pad + 128) + 6 * n_pad * n_pad,
            bytes_accessed=4 * (2 * n_pad * d_pad + n_pad * n_pad),
            transcendentals=n_pad * n_pad,
        ),
        interpret=interpret,
    )(f, p, f, p)
    return out[:n, :n]


def combined_similarity_auto(
    features: jax.Array,
    positions: jax.Array,
    lambda_h: float = 1.0,
    lambda_g: float = 1.0,
    min_pallas_n: int = 1024,
    allow_pallas: bool = True,
) -> jax.Array:
    """Pallas kernel on TPU for large N, XLA formulation otherwise.

    ``allow_pallas=False`` forces the XLA formulation — required when the
    caller's inputs are GSPMD-sharded over a mesh (the intra-slide
    ``--mesh_data`` build): a Mosaic custom call cannot be partitioned, so
    XLA would either reject it or all-gather the operands and materialise
    the full [N, N] on every device, defeating the sharding.  The XLA
    expansion partitions cleanly into row stripes."""
    n = features.shape[0]
    if allow_pallas and jax.default_backend() == "tpu" and n >= min_pallas_n:
        return pallas_combined_similarity(features, positions, lambda_h, lambda_g)
    return combined_similarity(features, positions, lambda_h, lambda_g)
