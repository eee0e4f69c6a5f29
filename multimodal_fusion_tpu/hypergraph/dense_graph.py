"""Dense thresholded similarity graph (the similarity_kernel public API).

Reference: ``build_hypergraph/similarity_kernel.py:126-307`` —
``build_weighted_hypergraph`` keeps every (i, j) pair (self-loops and both
directions included) whose combined similarity >= median(off-diag) *
threshold_median_ratio, via a Python double loop over N^2 entries; the
rebuild replaces that loop with a device threshold mask + one host
``np.nonzero``.

Also covers the legacy variant (``hypergraph/build_hypergraph/
similarity_kernel.py``): ``mean_pool_with_similarity(features, positions,
lambda_h, lambda_g)`` signature and the ``pooled_features`` result key are
accepted for compatibility.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_fusion_tpu.ops.similarity import (
    combined_similarity,
    mean_pool,
    median_offdiag,
    threshold_edge_mask,
)


def build_weighted_hypergraph(
    features: np.ndarray,
    positions: np.ndarray,
    lambda_h: float = 1.0,
    lambda_g: float = 1.0,
    threshold_median_ratio: Optional[float] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """(edge_index [2, E], edge_weights [E]) over the dense similarity graph.

    Edge enumeration order is row-major over the [N, N] grid — identical to
    the reference's double loop (similarity_kernel.py:193-202)."""
    n = features.shape[0]
    if n <= 1:
        raise ValueError(
            f"Number of nodes must be greater than 1, got N={n}."
        )
    K = combined_similarity(
        jnp.asarray(features), jnp.asarray(positions), lambda_h, lambda_g
    )
    K_host = np.asarray(K)
    if threshold_median_ratio is not None:
        # threshold on HOST from the already-pulled K: the [N,N] bool mask is
        # bit-identical and shipping it doubled device->host traffic through
        # the tunnel (review finding)
        med = float(median_offdiag(K))
        mask_host = K_host >= med * threshold_median_ratio
    else:
        mask_host = np.ones_like(K_host, dtype=bool)
    src, dst = np.nonzero(mask_host)  # row-major == reference loop order
    edge_index = np.stack([src, dst]).astype(np.int64)
    edge_weights = K_host[src, dst].astype(np.float32)
    return edge_index, edge_weights


def mean_pool_with_similarity(features: np.ndarray, *legacy_args) -> np.ndarray:
    """Global mean feature [1, D] (reference similarity_kernel.py:214-238).
    Extra positional args (legacy positions/lambdas signature) are ignored,
    matching the current reference semantics."""
    return np.asarray(mean_pool(jnp.asarray(features)))


def build_hypergraph_data(
    features: np.ndarray,
    positions: np.ndarray,
    lambda_h: float = 1.0,
    lambda_g: float = 1.0,
    threshold_median_ratio: Optional[float] = None,
    use_pooling: bool = True,
    legacy_keys: bool = False,
) -> Dict[str, np.ndarray]:
    """Complete graph-data dict {x, edge_index, edge_attr, pos[, pooled_feature]}
    (reference similarity_kernel.py:240-306).  ``legacy_keys=True`` emits the
    older ``pooled_features`` key (SURVEY §2.1 legacy variant)."""
    edge_index, edge_weights = build_weighted_hypergraph(
        features, positions, lambda_h, lambda_g, threshold_median_ratio
    )
    result = {
        "x": np.asarray(features, np.float32),
        "edge_index": edge_index,
        "edge_attr": edge_weights,
        "pos": np.asarray(positions, np.float32),
    }
    if use_pooling:
        key = "pooled_features" if legacy_keys else "pooled_feature"
        result[key] = mean_pool_with_similarity(features)
    return result
