"""K-nearest-neighbour search as batched XLA top-k.

Replaces sklearn ``NearestNeighbors(n_neighbors=k+1, metric='euclidean')``
used for hypergraph edge construction (reference:
``build_hypergraph/preprocess_hypergraph.py:379-388``).  Brute force is the
right call at this scale (a few hundred nodes): one [N,N] distance matmul on
the MXU plus ``lax.top_k``.  For very large N, :func:`knn_indices_blockwise`
streams the key axis in fixed-size blocks with a running top-k — O(N*B)
memory instead of O(N^2) (the SURVEY §5 long-context recipe)."""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from multimodal_fusion_tpu.ops.similarity import pairwise_sq_dists

_BIG = 1e30


@partial(jax.jit, static_argnames=("k", "include_self"))
def knn_indices(
    x: jax.Array,
    k: int,
    mask: Optional[jax.Array] = None,
    include_self: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """For each row of ``x`` [N,D], the indices of its ``k`` nearest rows.

    Returns (dists [N,k], indices [N,k]) sorted ascending by distance.  With
    ``include_self=True`` the self-match (distance 0) occupies slot 0,
    mirroring sklearn's ``kneighbors`` on the training set with n_neighbors=k.
    """
    d = pairwise_sq_dists(x)
    n = x.shape[0]
    if include_self:
        # The matmul expansion leaves ~1e-2 noise on the diagonal; self-distance
        # is exactly zero by definition, so pin it (keeps self in slot 0).
        d = jnp.where(jnp.eye(n, dtype=bool), 0.0, d)
    if mask is not None:
        invalid = ~mask
        d = jnp.where(invalid[None, :], _BIG, d)
        d = jnp.where(invalid[:, None], _BIG, d)
    if not include_self:
        d = d + jnp.eye(n, dtype=d.dtype) * _BIG
    neg_d, idx = jax.lax.top_k(-d, k)
    return jnp.sqrt(jnp.maximum(-neg_d, 0.0)), idx


@partial(jax.jit, static_argnames=("k", "block", "include_self"))
def knn_indices_blockwise(
    x: jax.Array,
    k: int,
    block: int = 2048,
    include_self: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Streaming KNN: scan over key blocks with a running top-k.

    Never materialises the [N, N] distance matrix — peak memory is
    O(N * block).  Results match :func:`knn_indices` (modulo ties).
    """
    n, d = x.shape
    n_pad = ((n + block - 1) // block) * block
    xp = jnp.zeros((n_pad, d), x.dtype).at[:n].set(x)
    x_sq = jnp.sum(x * x, axis=-1, keepdims=True)  # [N, 1]
    xp_sq = jnp.sum(xp * xp, axis=-1)  # [n_pad]
    n_blocks = n_pad // block

    init_d = jnp.full((n, k), _BIG, jnp.float32)
    init_i = jnp.zeros((n, k), jnp.int32)

    def body(carry, j):
        best_d, best_i = carry
        keys = jax.lax.dynamic_slice_in_dim(xp, j * block, block)  # [B, D]
        keys_sq = jax.lax.dynamic_slice_in_dim(xp_sq, j * block, block)  # [B]
        dots = jnp.dot(
            x, keys.T, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        d_blk = jnp.maximum(x_sq + keys_sq[None, :] - 2.0 * dots, 0.0)  # [N, B]
        idx_blk = j * block + jax.lax.broadcasted_iota(jnp.int32, (n, block), 1)
        valid = idx_blk < n
        if not include_self:
            valid = valid & (idx_blk != jax.lax.broadcasted_iota(jnp.int32, (n, block), 0))
        else:
            # exact-zero self distance (matmul-expansion noise on the diagonal)
            d_blk = jnp.where(
                idx_blk == jax.lax.broadcasted_iota(jnp.int32, (n, block), 0),
                0.0,
                d_blk,
            )
        d_blk = jnp.where(valid, d_blk, _BIG)
        cand_d = jnp.concatenate([best_d, d_blk], axis=1)
        cand_i = jnp.concatenate([best_i, idx_blk], axis=1)
        neg_top, sel = jax.lax.top_k(-cand_d, k)
        best_d = -neg_top
        best_i = jnp.take_along_axis(cand_i, sel, axis=1)
        return (best_d, best_i), None

    (best_d, best_i), _ = jax.lax.scan(body, (init_d, init_i), jnp.arange(n_blocks))
    return jnp.sqrt(jnp.maximum(best_d, 0.0)), best_i


def knn_edges(idx: jax.Array) -> jax.Array:
    """Expand kNN indices [N,k] into directed edge pairs [N*k, 2] (src, dst)."""
    n, k = idx.shape
    src = jnp.repeat(jnp.arange(n), k)
    return jnp.stack([src, idx.reshape(-1)], axis=1)
