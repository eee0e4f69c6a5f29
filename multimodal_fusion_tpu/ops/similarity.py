"""Pairwise similarity kernels.

Math (reference: ``build_hypergraph/similarity_kernel.py:17-124``)::

    kappa_h(i,j) = exp(-lambda_h * ||h_i - h_j||^2)   (morphological)
    kappa_g(i,j) = exp(-lambda_g * ||g_i - g_j||^2)   (spatial)
    kappa       = kappa_h * kappa_g

Squared distances use the ``||a||^2 + ||b||^2 - 2 a.b`` expansion so the
dominant cost is a single [N,D]x[D,N] matmul on the MXU.  All functions are
jit-friendly (static shapes, optional validity masks for padded inputs).

A fused Pallas kernel for the combined similarity lives in
``ops/pallas_similarity.py``; these XLA versions are the reference/oracle
implementations and the fallback on CPU.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp


# At or below this row width the norm-expansion matmul is replaced by
# direct per-coordinate broadcast differences (positions are 2-D
# everywhere in this framework).  The matmul route materialises its [N,M]
# output to HBM between the dot and the elementwise epilogue — measured r5
# at 65k stripes, those round-trips (not the counting) dominate the
# blockwise passes — while the difference form fuses end-to-end, needs no
# HIGHEST 6-pass dot and no clamp (no cancellation: it is exact-signed
# arithmetic on coordinates).  The Pallas similarity kernel has used the
# same formulation since r4 (VERDICT r3 #2).
_DIRECT_DIFF_MAX_D = 4


def pairwise_sq_dists(
    a: jax.Array, b: Optional[jax.Array] = None, *, bf16_exact: bool = False
) -> jax.Array:
    """Pairwise squared L2 distances between rows of ``a`` [N,D] and ``b`` [M,D].

    The dot product runs at HIGHEST precision: TPU's default bf16 matmul
    makes the norm-expansion cancel catastrophically for large-magnitude
    inputs (e.g. slide coordinates up to 5e4 -> negative "distances" ->
    exp(+huge) = inf in the similarity kernels).  Distances clamp at 0.
    Low-dimensional inputs (D <= 4: positions) skip the expansion entirely
    and use fused per-coordinate differences — see ``_DIRECT_DIFF_MAX_D``.

    ``bf16_exact=True`` marks inputs whose values are EXACTLY
    bf16-representable (the ``--upload_dtype bfloat16`` regime: features
    shipped as bf16, cast to f32 on device): truncating the dot operands
    back to bf16 is lossless there, and a 1-pass DEFAULT-precision MXU dot
    replaces HIGHEST's 6 passes at ~6x the rate.  On TPU this is
    bit-identical to the HIGHEST dot (passes 2-6 would multiply exact-zero
    residuals — the same argument as ``ops.pallas_similarity``'s bf16_exact
    kernel, asserted live on v5e r3); on CPU the bf16 gemm's accumulation
    order differs, so values drift by f32 ulps — callers that promise
    bitwise self-consistency (the blockwise median machinery) must use the
    SAME flag in every pass.  Norms always accumulate from the f32 values.
    """
    if b is None:
        b = a
    if 0 < a.shape[-1] <= _DIRECT_DIFF_MAX_D:
        d = None
        for p in range(a.shape[-1]):
            diff = a[:, p, None] - b[None, :, p]
            d = diff * diff if d is None else d + diff * diff
        return d
    a_sq = jnp.sum(a * a, axis=-1, keepdims=True)  # [N,1]
    b_sq = jnp.sum(b * b, axis=-1, keepdims=True)  # [M,1]
    if bf16_exact:
        ab = jnp.dot(
            a.astype(jnp.bfloat16), b.astype(jnp.bfloat16).T,
            preferred_element_type=jnp.float32,
        )  # single bf16 MXU pass; exact for bf16-representable values
    else:
        ab = jnp.dot(
            a, b.T, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [N,M] on MXU
    return jnp.maximum(a_sq + b_sq.T - 2.0 * ab, 0.0)


@partial(jax.jit, static_argnames=())
def morphological_similarity(features: jax.Array, lambda_h: float = 1.0) -> jax.Array:
    """K_h = exp(-lambda_h * ||h_i - h_j||^2) for features [N,D] -> [N,N]."""
    return jnp.exp(-lambda_h * pairwise_sq_dists(features))


@partial(jax.jit, static_argnames=())
def spatial_similarity(positions: jax.Array, lambda_g: float = 1.0) -> jax.Array:
    """K_g = exp(-lambda_g * ||g_i - g_j||^2) for positions [N,2|3] -> [N,N]."""
    return jnp.exp(-lambda_g * pairwise_sq_dists(positions))


@partial(jax.jit, static_argnames=())
def combined_similarity(
    features: jax.Array,
    positions: jax.Array,
    lambda_h: float = 1.0,
    lambda_g: float = 1.0,
) -> jax.Array:
    """K = K_h * K_g.  Fused as a single exp of the weighted sum of distances
    (mathematically identical to the reference's product of exponentials but
    one transcendental instead of two)."""
    d_h = pairwise_sq_dists(features)
    d_g = pairwise_sq_dists(positions)
    return jnp.exp(-(lambda_h * d_h + lambda_g * d_g))


def cross_similarity(
    a: jax.Array, b: jax.Array, lam: float = 1.0
) -> jax.Array:
    """exp(-lam * ||a_i - b_j||^2) between two row sets [N,D] x [M,D] -> [N,M].

    Used for WSI-super x TMA morphological similarity
    (reference: preprocess_hypergraph.py:202-267, which loops rows in Python —
    here a single batched kernel)."""
    return jnp.exp(-lam * pairwise_sq_dists(a, b))


def median_offdiag(K: jax.Array, n_valid: Optional[jax.Array] = None) -> jax.Array:
    """Median of the off-diagonal entries of a [N,N] similarity matrix with
    TORCH semantics: ``torch.median`` returns the LOWER of the two middle
    values (the off-diagonal count N*(N-1) is always even), while numpy
    interpolates — the interpolated value sits strictly above the lower
    middle, silently dropping the median pair from thresholded edge sets
    (reference similarity_kernel.py:183-186; review finding).

    With padding, ``n_valid`` masks rows/cols >= n_valid out of the
    statistic."""
    n = K.shape[0]
    eye = jnp.eye(n, dtype=bool)
    if n_valid is None:
        vals = jnp.where(eye, jnp.nan, K)
        count = jnp.asarray(n * (n - 1))
    else:
        idx = jnp.arange(n)
        valid = (idx[:, None] < n_valid) & (idx[None, :] < n_valid)
        vals = jnp.where(eye | ~valid, jnp.nan, K)
        count = n_valid * (n_valid - 1)
    flat = jnp.sort(vals.reshape(-1))  # NaNs sort to the end
    return flat[jnp.maximum(count - 1, 0) // 2]


def threshold_edge_mask(
    K: jax.Array,
    threshold: jax.Array,
    n_valid: Optional[jax.Array] = None,
) -> jax.Array:
    """Boolean [N,N] mask of edges with similarity >= threshold.

    The reference keeps self-loops and both (i,j)/(j,i) directions
    (similarity_kernel.py:193-202 iterates the full N^2 grid), so no diagonal
    or symmetry filtering happens here."""
    mask = K >= threshold
    if n_valid is not None:
        idx = jnp.arange(K.shape[0])
        valid = (idx[:, None] < n_valid) & (idx[None, :] < n_valid)
        mask = mask & valid
    return mask


def mean_pool(features: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
    """Global mean feature [1,D] (reference: similarity_kernel.py:214-238)."""
    if mask is None:
        return jnp.mean(features, axis=0, keepdims=True)
    w = mask.astype(features.dtype)[:, None]
    return jnp.sum(features * w, axis=0, keepdims=True) / jnp.maximum(
        jnp.sum(w), 1.0
    )
