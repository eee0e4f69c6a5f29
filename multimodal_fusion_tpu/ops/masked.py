"""Masked helpers for padded/bucketed tensors.

XLA needs static shapes; ragged patch bags become fixed-size arrays plus a
validity mask.  Every reduction in the model zoo goes through these helpers so
padding never leaks into results.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e9


def masked_softmax(logits: jax.Array, mask: Optional[jax.Array], axis: int = -1) -> jax.Array:
    """Softmax over ``axis`` with invalid entries receiving zero probability."""
    if mask is None:
        return jax.nn.softmax(logits, axis=axis)
    logits = jnp.where(mask, logits, NEG_INF)
    out = jax.nn.softmax(logits, axis=axis)
    return jnp.where(mask, out, 0.0)


def masked_mean(x: jax.Array, mask: Optional[jax.Array], axis: int = 0) -> jax.Array:
    if mask is None:
        return jnp.mean(x, axis=axis)
    w = jnp.expand_dims(mask.astype(x.dtype), -1) if x.ndim > mask.ndim else mask.astype(x.dtype)
    s = jnp.sum(x * w, axis=axis)
    n = jnp.maximum(jnp.sum(w, axis=axis), 1.0)
    return s / n


def masked_max(x: jax.Array, mask: Optional[jax.Array], axis: int = 0) -> jax.Array:
    if mask is None:
        return jnp.max(x, axis=axis)
    w = jnp.expand_dims(mask, -1) if x.ndim > mask.ndim else mask
    return jnp.max(jnp.where(w, x, NEG_INF), axis=axis)


def masked_topk(
    scores: jax.Array, k: int, mask: Optional[jax.Array] = None, largest: bool = True
) -> Tuple[jax.Array, jax.Array]:
    """Top-k over the last axis, ignoring masked-out entries.

    Returns (values, indices).  If fewer than ``k`` valid entries exist the
    trailing slots point at masked entries — callers must weight by a
    validity count (mirrors the reference's ``k = min(inst_number, N)``,
    clam_mlp.py:193-197)."""
    s = scores if largest else -scores
    if mask is not None:
        s = jnp.where(mask, s, NEG_INF)
    vals, idx = jax.lax.top_k(s, k)
    if not largest:
        vals = -vals
    return vals, idx


def pad_to(x: jax.Array, n: int, axis: int = 0, value: float = 0.0) -> jax.Array:
    """Pad ``x`` along ``axis`` up to length ``n`` with ``value``."""
    cur = x.shape[axis]
    if cur == n:
        return x
    if cur > n:
        raise ValueError(f"cannot pad axis {axis} of length {cur} down to {n}")
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, n - cur)
    return jnp.pad(x, widths, constant_values=value)


def length_mask(n_valid, n_max: int) -> jax.Array:
    """Boolean mask [n_max] with the first ``n_valid`` entries True."""
    return jnp.arange(n_max) < n_valid


def bucket_size(n: int, buckets=(64, 128, 256, 512, 1024, 2048, 4096, 8192, 16384, 32768)) -> int:
    """Smallest bucket >= n (power-of-two-ish ladder keeps XLA recompiles rare)."""
    for b in buckets:
        if n <= b:
            return b
    return ((n + 8191) // 8192) * 8192
