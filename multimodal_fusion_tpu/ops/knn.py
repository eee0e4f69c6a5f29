"""K-nearest-neighbour search as batched XLA top-k.

Replaces sklearn ``NearestNeighbors(n_neighbors=k+1, metric='euclidean')``
used for hypergraph edge construction (reference:
``build_hypergraph/preprocess_hypergraph.py:379-388``).  Brute force is the
right call at this scale (a few hundred nodes): one [N,N] distance matmul on
the MXU plus ``lax.top_k``.  For very large N the blockwise Pallas variant in
``ops/pallas_similarity.py`` streams tiles through VMEM with a running top-k.
"""

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


def knn_edges(idx: jax.Array) -> jax.Array:
    """Expand kNN indices [N,k] into directed edge pairs [N*k, 2] (src, dst)."""
    n, k = idx.shape
    src = jnp.repeat(jnp.arange(n), k)
    return jnp.stack([src, idx.reshape(-1)], axis=1)
