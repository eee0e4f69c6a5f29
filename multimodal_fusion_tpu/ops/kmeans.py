"""KMeans as pure XLA compute (matmul + argmin + segment-sum).

Replaces sklearn ``KMeans(n_clusters, random_state=42, n_init=10)`` used by
the hypergraph pipeline (reference: ``build_hypergraph/preprocess_hypergraph.py
:150-151,299,320,391``).  Design notes:

- kmeans++ greedy init (sklearn-style ``n_local_trials = 2 + floor(log k)``),
  driven by a JAX PRNG key.  Parity with sklearn is *structural* (same
  algorithm, deterministic given the key), not bitwise with MT19937 — see
  SURVEY.md §7 "Hard parts".
- Lloyd iterations run as a ``lax.while_loop`` capped at ``n_iters``: under
  the restarts vmap the loop runs until the SLOWEST restart converges
  (already-converged lanes freeze via ``lax.cond``), instead of every
  restart paying the full fixed trip count (see ``_lloyd``).
- ``n_init`` restarts are vmapped and the lowest-inertia run wins — restarts
  run as one batched kernel instead of a host loop.
- Distances use the ||x||^2 - 2 x.c + ||c||^2 expansion: the hot op is a
  [N,D]x[D,K] matmul on the MXU.
- Supports a validity mask for padded point sets; padded rows never attract
  centers and report assignment 0 with zero weight.
- Empty clusters are relocated sklearn-style: each empty cluster takes the
  point with the largest contribution to inertia (distinct points for
  distinct empty clusters), so results never contain empty clusters when
  k <= n_valid — the invariant the reference's aggregation relies on
  (preprocess_hypergraph.py:150-163 raises on empty clusters and never
  fires because sklearn relocates).
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class KMeansResult(NamedTuple):
    centers: jax.Array  # [K, D]
    labels: jax.Array  # [N] int32
    inertia: jax.Array  # [] float32


def _sq_dists_to_centers(x: jax.Array, centers: jax.Array) -> jax.Array:
    # x may be stored bf16 (--upload_dtype bfloat16: values are bf16-exact,
    # so squares computed in f32 are exact and the MXU sees the SAME bf16
    # operands DEFAULT precision would truncate f32 inputs to — identical
    # assignments on TPU at half the x HBM traffic).  centers stay f32.
    x32 = x.astype(jnp.float32)
    x_sq = jnp.sum(x32 * x32, axis=-1, keepdims=True)
    c_sq = jnp.sum(centers * centers, axis=-1)
    xc = jnp.dot(x, centers.astype(x.dtype).T, preferred_element_type=jnp.float32)
    return jnp.maximum(x_sq - 2.0 * xc + c_sq[None, :], 0.0)


def kmeans_plus_plus_init(
    key: jax.Array,
    x: jax.Array,
    k: int,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Greedy kmeans++ seeding. ``x`` [N,D] -> centers [K,D].

    Candidate distances use the ||x||^2 - 2 x.c + ||c||^2 expansion so each
    scan step reads ``x`` once through a [T,D]x[D,N] MXU matmul instead of T
    elementwise [N,D] passes (T = n_local_trials; the init runs k-1 scanned
    steps x n_init vmapped restarts, so this is the init's whole bandwidth
    cost)."""
    n = x.shape[0]
    n_local_trials = 2 + int(math.log(max(k, 2)))
    valid = mask if mask is not None else jnp.ones((n,), bool)
    # norms/centers in f32 regardless of the storage dtype (bf16 x values
    # are exact, so their f32 squares and 0/1-weighted sums are exact too)
    x_sq = jnp.sum(x.astype(jnp.float32) * x.astype(jnp.float32), axis=-1)

    key, sub = jax.random.split(key)
    probs0 = valid.astype(jnp.float32)
    first = jax.random.choice(sub, n, p=probs0 / jnp.sum(probs0))
    centers0 = jnp.zeros((k, x.shape[1]), jnp.float32).at[0].set(
        x[first].astype(jnp.float32)
    )
    d0 = jnp.maximum(
        x_sq - 2.0 * jnp.dot(x, x[first], preferred_element_type=jnp.float32)
        + x_sq[first],
        0.0,
    )
    d0 = jnp.where(valid, d0, 0.0)

    def body(carry, inputs):
        centers, closest_d = carry
        subkey = inputs["key"]
        i = inputs["i"]
        p = jnp.where(valid, closest_d, 0.0)
        p = p / jnp.maximum(jnp.sum(p), 1e-30)
        cand_idx = jax.random.choice(subkey, n, shape=(n_local_trials,), p=p)
        cand = x[cand_idx]  # [T, D]
        xc = jnp.dot(cand, x.T, preferred_element_type=jnp.float32)  # [T,N]
        d_cand = jnp.maximum(x_sq[None, :] - 2.0 * xc + x_sq[cand_idx, None], 0.0)
        d_cand = jnp.minimum(d_cand, closest_d[None, :])
        d_cand = jnp.where(valid[None, :], d_cand, 0.0)
        pots = jnp.sum(d_cand, axis=1)
        best = jnp.argmin(pots)
        new_center = cand[best]
        new_closest = d_cand[best]
        centers = centers.at[i].set(new_center.astype(jnp.float32))
        return (centers, new_closest), None

    keys = jax.random.split(key, k - 1) if k > 1 else jnp.zeros((0, 2), jnp.uint32)
    idxs = jnp.arange(1, k)
    if k > 1:
        (centers, _), _ = jax.lax.scan(
            body, (centers0, d0), {"key": keys, "i": idxs}
        )
    else:
        centers = centers0
    return centers


def _relocate_empty(
    x: jax.Array,
    centers: jax.Array,
    labels: jax.Array,
    d_min: jax.Array,
    counts: jax.Array,
    weights: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """sklearn-style empty-cluster relocation: the i-th empty cluster takes
    the point with the i-th largest contribution to inertia (sklearn
    ``_relocate_empty_clusters``).  Guarantees no empty clusters whenever
    k <= n_valid points.  No-op (statically) when k > n.

    Donor ordering: valid non-singleton points by contribution, then valid
    singleton points (stealing a cluster's only member would just move the
    hole), and NEVER padded rows — an empty cluster whose rank exceeds the
    number of valid points keeps its previous (valid-data) center instead of
    landing on padding garbage."""
    k, n = centers.shape[0], x.shape[0]
    if k > n:
        return centers, labels
    valid = weights > 0
    singleton = counts[labels] <= 1
    contrib = jnp.where(valid & ~singleton, d_min, jnp.where(valid, -1.0, -2.0))
    # EXACT top-k for donors: approx_max_k's bin-wise partial reduce can
    # surface a padding sentinel as a bin maximum even when >= k real donors
    # exist, silently skipping a relocation (TPU-only; CPU falls back to
    # exact, so tests would never catch it).  Relocation runs only in the
    # post-scan refinement + final pass, so the exact sort is off the hot
    # Lloyd loop and its cost is negligible.
    _, far_idx = jax.lax.top_k(contrib, k)  # [K] best donors, descending
    empty = counts == 0
    rank = jnp.cumsum(empty.astype(jnp.int32)) - 1  # rank among empty clusters
    n_valid = jnp.sum(valid.astype(jnp.int32))
    target = far_idx[jnp.clip(rank, 0, k - 1)]  # donor point per empty cluster
    # never relocate onto padding: by rank, and belt-and-braces by checking
    # the chosen donor's own contribution
    can = empty & (rank < n_valid) & (contrib[target] > -1.5)
    centers = jnp.where(can[:, None], x[target].astype(centers.dtype), centers)
    upd = jnp.where(can, target, n)  # out-of-bounds rows dropped by scatter
    labels = labels.at[upd].set(jnp.arange(k), mode="drop")
    return centers, labels


def _lloyd(
    x: jax.Array,
    centers: jax.Array,
    weights: jax.Array,
    n_iters: int,
    tol: float,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Lloyd iterations to convergence (center shift < tol), capped at
    ``n_iters``.  A ``while_loop`` rather than a fixed-trip ``scan``: under
    the restarts vmap a scanned freeze lowers to select (both branches run),
    so every restart paid all ``n_iters`` distance+segment-sum passes even
    after converging — ~38 ms of the 42 ms kmeans stage at bench shapes on
    v5e.  vmapped ``while_loop`` instead iterates until the SLOWEST restart
    converges (clustered data: typically 10-25 of the 50 allowed), with
    identical numerics — frozen lanes keep their values either way."""
    k = centers.shape[0]

    def step_cond(carry):
        _, done, it = carry
        return (~done) & (it < n_iters)

    def step_body(carry):
        centers, done, it = carry

        def run(centers):
            d = _sq_dists_to_centers(x, centers)
            labels = jnp.argmin(d, axis=-1)
            onehot = jax.nn.one_hot(labels, k, dtype=x.dtype) * weights.astype(x.dtype)[:, None]
            counts = jnp.sum(onehot.astype(jnp.float32), axis=0)  # [K] (bf16 cannot count)
            sums = jnp.dot(onehot.T, x, preferred_element_type=jnp.float32)
            new_centers = jnp.where(
                counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1.0), centers
            )
            shift = jnp.sum((new_centers - centers) ** 2)
            return new_centers, shift <= tol

        new_centers, now_done = jax.lax.cond(
            done, lambda c: (c, jnp.asarray(True)), run, centers
        )
        return (new_centers, done | now_done, it + 1)

    centers, _, _ = jax.lax.while_loop(
        step_cond, step_body, (centers, jnp.asarray(False), jnp.int32(0))
    )

    # Relocation refinement OUTSIDE the hot scan: a per-iteration top-k cost
    # ~40% of the fused hypergraph build on TPU (measured round 2), and at
    # convergence these two extra passes are exact no-ops (converged centers
    # are a Lloyd fixed point), so the common all-non-empty case pays only
    # two top-k calls total.
    for _ in range(2):
        d = _sq_dists_to_centers(x, centers)
        labels = jnp.argmin(d, axis=-1)
        counts = jnp.zeros((k,), jnp.float32).at[labels].add(weights)
        centers, labels = _relocate_empty(
            x, centers, labels, jnp.min(d, axis=-1), counts, weights
        )
        onehot = jax.nn.one_hot(labels, k, dtype=x.dtype) * weights.astype(x.dtype)[:, None]
        counts = jnp.sum(onehot.astype(jnp.float32), axis=0)
        sums = jnp.dot(onehot.T, x, preferred_element_type=jnp.float32)
        centers = jnp.where(
            counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1.0), centers
        )

    d = _sq_dists_to_centers(x, centers)
    labels = jnp.argmin(d, axis=-1)
    d_min = jnp.min(d, axis=-1)
    counts = jnp.zeros((k,), jnp.float32).at[labels].add(weights)
    centers, labels = _relocate_empty(x, centers, labels, d_min, counts, weights)

    # Cascade guard: draining a 1-2 point donor cluster in the pass above can
    # itself leave a fresh empty cluster.  Whenever any non-singleton donor
    # exists (guaranteed while k <= n_valid), each extra pass fills at least
    # one empty cluster, so <= k bounded passes restore the no-empty-cluster
    # invariant; in the common case the loop body never executes (one cheap
    # counts scatter decides).
    counts = jnp.zeros((k,), jnp.float32).at[labels].add(weights)

    def fix_cond(state):
        it, _, _, counts = state
        return (it < k) & jnp.any(counts == 0)

    def fix_body(state):
        it, centers, labels, counts = state
        # labels stay STICKY here (no re-argmin): with exact-duplicate
        # points the relocated cluster ties its donor's old cluster and
        # argmin would bounce the point straight back, never converging.
        # Contribution = distance to the ASSIGNED center (sklearn's inertia
        # contribution), not the min distance.
        d = _sq_dists_to_centers(x, centers)
        d_assigned = jnp.take_along_axis(d, labels[:, None], axis=1)[:, 0]
        centers, labels = _relocate_empty(
            x, centers, labels, d_assigned, counts, weights
        )
        counts = jnp.zeros((k,), jnp.float32).at[labels].add(weights)
        return it + 1, centers, labels, counts

    _, centers, labels, _ = jax.lax.while_loop(
        fix_cond, fix_body, (jnp.int32(0), centers, labels, counts)
    )

    d = _sq_dists_to_centers(x, centers)
    inertia = jnp.sum(jnp.take_along_axis(d, labels[:, None], axis=1)[:, 0] * weights)
    return centers, labels, inertia


@partial(jax.jit, static_argnames=("k", "n_iters", "n_init", "tol"))
def kmeans(
    key: jax.Array,
    x: jax.Array,
    k: int,
    n_iters: int = 50,
    n_init: int = 10,
    tol: float = 1e-4,
    mask: Optional[jax.Array] = None,
) -> KMeansResult:
    """KMeans with ``n_init`` batched restarts; best inertia wins.

    ``mask`` marks valid rows of a padded ``x``; masked rows carry zero weight.
    """
    weights = (
        mask.astype(jnp.float32)
        if mask is not None
        else jnp.ones((x.shape[0],), jnp.float32)
    )

    def one_run(subkey):
        init = kmeans_plus_plus_init(subkey, x, k, mask)
        return _lloyd(x, init, weights, n_iters, tol)

    keys = jax.random.split(key, n_init)
    centers_all, labels_all, inertia_all = jax.vmap(one_run)(keys)
    best = jnp.argmin(inertia_all)
    return KMeansResult(centers_all[best], labels_all[best], inertia_all[best])
