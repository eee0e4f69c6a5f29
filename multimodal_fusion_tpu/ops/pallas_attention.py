"""Pallas TPU kernel: fused multi-head attention (self- and cross-).

softmax(q @ k^T * scale) @ v computed per (head, q-tile) entirely in VMEM —
the [T_q, T_k] score matrix never touches HBM.  The XLA formulation
(``einsum -> softmax -> einsum``, as in ``models/vit.py:ViTBlock`` and
``models/mfmf.py:CrossAttentionLayer``, mirroring the reference's
``timm``/perceiver attention at ``alignment/tma_feature_extraction/
extract_tma_features_uni.py:38-87`` and ``demo`` perceiver blocks)
materialises the score matrix twice (logits + softmax output) per layer;
for the ViT-L extractor that is ~35% of the forward's HBM traffic, and the
forward is memory-bound on v5e (see BENCH_DETAILS device_resident_mfu).

Design notes (TPU):
- Grid is ``(H, num_q_tiles)`` — the q-tile index varies fastest, and the
  k/v block index maps are constant in it, so Mosaic keeps each head's full
  [T_k, hd] K and V resident in VMEM across that head's q-tiles (one DMA
  per head, not per tile).  Full-K residency is right for the sizes this
  framework meets (T_k <= ~8k: ViT T=257, MFMF bags <= 4096).
- WITHIN each program the key axis is chunked (``_K_CHUNK``) with an
  online-softmax (m, l, acc) carry, flash-attention style — not to save
  VMEM (K/V are resident anyway) but to give Mosaic's scheduler
  independent MXU work (chunk c+1's score matmul) to issue against chunk
  c's exp/max/sum VPU passes, which otherwise serialise after the single
  full-K matmul (VERDICT r4 #1: the r3 full-K kernel idled the MXU for
  ~0.165 ms of every 0.514 ms bag-4096 call).  The forward also saves the
  per-row log-sum-exp so the backward skips the max/sum recompute
  entirely (p = exp(s - lse)) and needs no cross-chunk reduction for the
  softmax-transpose row term (rowsum(do*o) is precomputed outside).
- Arrays stay UNPADDED in HBM: partial edge blocks are handled by Mosaic.
  Only the q axis is tiled — K/V blocks always span the full key axis, so
  the softmax needs no out-of-bounds masking at all (partial q-tile rows
  compute garbage that the masked block write discards).
- Scores accumulate in f32 (``preferred_element_type``) and the softmax
  runs in f32 regardless of input dtype; the probability matrix is cast
  back to the value dtype for the second MXU pass (standard flash-attention
  practice; in f32 mode nothing is cast).
- ``kv_mask`` follows ``ops.masked.NEG_INF`` semantics exactly: user-masked
  keys get the same finite -1e9 the XLA paths use (so an all-masked row
  degrades to the same uniform distribution instead of NaN), while
  structurally out-of-bounds keys get a true -inf.
"""

from __future__ import annotations

import contextlib
import contextvars
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodal_fusion_tpu.ops.masked import NEG_INF


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# Attention dropout: a TILING-INDEPENDENT keep mask.
#
# The forward and backward kernels run with DIFFERENT tile plans (the
# backward holds ~5 live f32 score copies, so _plan_tiles lands on smaller
# q tiles / head groups), yet the flash-style recompute backward must apply
# the EXACT mask the forward drew.  A hardware-PRNG stream seeded per
# program would differ between the two plans, so the mask is instead a
# stateless murmur3-style finalizer over the absolute (head, q, k)
# coordinate — any tile computes any element's mask bit locally, and tests
# reproduce it bit-exactly in pure jnp (``dropout_keep_reference``).
# (Same idea as CUDA flash-attention's Philox-offset-by-position dropout,
# rebuilt as a pure VPU hash so it also runs under interpret mode.)
# ---------------------------------------------------------------------------


def _drop_threshold(rate: float) -> int:
    """uint32 threshold: keep iff hash >= threshold, P(keep) = 1 - rate."""
    if not 0.0 <= rate < 1.0:
        raise ValueError(f"dropout rate must be in [0, 1), got {rate}")
    return min(int(round(rate * 2.0 ** 32)), 2 ** 32 - 1)


def _hash_keep(z: jax.Array, threshold: int) -> jax.Array:
    """murmur3 fmix32 avalanche over uint32 lanes -> keep mask."""
    z = z ^ (z >> 16)
    z = z * jnp.uint32(0x85EBCA6B)
    z = z ^ (z >> 13)
    z = z * jnp.uint32(0xC2B2AE35)
    z = z ^ (z >> 16)
    return z >= jnp.uint32(threshold)


def _keep_mask(seed_u32, h0, q0, k0, shape, t_q: int, t_k: int, rate: float):
    """Keep mask for an [HB, QT, KC] score block at absolute offsets
    (h0, q0, k0).  uint32 arithmetic wraps by design (hash input)."""
    h_idx = h0 + jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    q_idx = q0 + jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    k_idx = k0 + jax.lax.broadcasted_iota(jnp.uint32, shape, 2)
    lin = (h_idx * jnp.uint32(t_q) + q_idx) * jnp.uint32(t_k) + k_idx
    return _hash_keep(lin * jnp.uint32(0x9E3779B9) + seed_u32, _drop_threshold(rate))


def dropout_keep_reference(seed: int, heads: int, t_q: int, t_k: int, rate: float):
    """Pure-jnp oracle of the kernels' dropout mask: the full [H, Tq, Tk]
    keep mask for a given uint32 seed.  Tests pin the fused kernels' dropout
    forward AND backward against XLA attention with this explicit mask."""
    return _keep_mask(
        jnp.uint32(np.uint32(seed)), jnp.uint32(0), jnp.uint32(0),
        jnp.uint32(0), (heads, t_q, t_k), t_q, t_k, rate,
    )


def _apply_dropout(p, seed_ref, dropout_rate, t_q, t_k, q_blk, k0=0):
    """Inverted dropout on the probability block (f32), mask from the
    stateless hash at this program's absolute coordinates.  ``k0`` is the
    in-body key-chunk offset — the hash sees the ABSOLUTE key index, so any
    chunking/tiling plan draws the identical mask."""
    seed = seed_ref[0, 0].astype(jnp.uint32)
    h0 = (pl.program_id(0) * p.shape[0]).astype(jnp.uint32)
    q0 = (pl.program_id(1) * q_blk).astype(jnp.uint32)
    keep = _keep_mask(
        seed, h0, q0, jnp.uint32(k0), p.shape, t_q, t_k, dropout_rate
    )
    return jnp.where(keep, p * (1.0 / (1.0 - dropout_rate)), 0.0), keep


def _attn_kernel(
    q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, *, scale, k_chunk,
    bias_ref=None, seed_ref=None, dropout_rate=0.0, t_q=0,
):
    """Online-softmax forward, key axis chunked IN-BODY (VERDICT r4 #1).

    The r3 kernel computed the full-K softmax in one shot: one [TQ, TK]
    score matmul, then max/exp/sum VPU passes, then the value matmul — the
    MXU sat idle through the whole softmax epilogue (~0.165 ms of a 0.514 ms
    call at MFMF bag-4096 shapes).  Chunking the key axis inside the body
    (an UNROLLED Python loop — every chunk is one dataflow region, so
    Mosaic's scheduler can issue chunk c+1's score matmul while chunk c's
    exp/max/sum still occupy the VPU) keeps both units busy; the running
    (m, l, acc) online-softmax state carries across chunks exactly as in
    flash attention.  K/V still span the FULL key axis in VMEM (one DMA per
    head group) — chunks are register-level slices, not extra traffic.

    Also emits the per-row softmax statistics — the running max ``m_ref``
    and the pre-dropout exp-sum ``l_ref``, both [HB, TQ] — so the backward
    recomputes probabilities directly as exp(s - m) / l, skipping the max
    and sum passes entirely.  m and l are saved SEPARATELY (not the
    combined log-sum-exp): with a fully user-masked bag m is the finite
    NEG_INF = -1e9, whose f32 ulp (64) swallows log(l) entirely — the
    combined form made the backward's p = exp(s - lse) = 1 instead of the
    uniform 1/T_k (caught by test_fused_attention_grads_match_xla's
    all-masked case: dv off by exactly T_k).
    """
    q = q_ref[...]  # [HB, TQ_blk, hd]
    hb, qt, hd = q.shape
    t_k = k_ref.shape[1]
    bias = bias_ref[0] if bias_ref is not None else None  # [TK] f32

    # batched over the head-group dim: ONE dot_general per chunk instead
    # of a grid step per head — program dispatch overhead, not FLOPs, was
    # the cost of a per-head grid (measured 28% SLOWER than XLA on the
    # ViT-L forward at grid (H, 1)).
    #
    # -1e30 (not -inf) init: a fully user-masked chunk maxes at the finite
    # NEG_INF and exp(-1e30 - m_new) underflows to the correct 0 without
    # ever forming inf - inf = NaN.
    m = jnp.full((hb, qt, 1), -1e30, jnp.float32)
    l = jnp.zeros((hb, qt, 1), jnp.float32)
    acc = jnp.zeros((hb, qt, hd), jnp.float32)
    for c0 in range(0, t_k, k_chunk):
        kc = min(k_chunk, t_k - c0)
        k_c = k_ref[:, c0:c0 + kc, :]  # [HB, KC, hd]
        v_c = v_ref[:, c0:c0 + kc, :]
        s = jax.lax.dot_general(
            q, k_c, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale  # [HB, TQ_blk, KC] f32
        if bias is not None:  # kv_mask bias (0 / NEG_INF), static presence
            # REPLACE (not add) to mirror the XLA path's jnp.where(mask, s,
            # NEG_INF) exactly: with an additive bias, an all-masked bag
            # only degrades to the same uniform average while |scaled
            # scores| < 32 (half-ulp of 1e9) — beyond that the add preserves
            # score order and the kernel would silently return unmasked
            # attention
            s = jnp.where(
                bias[None, None, c0:c0 + kc] < 0.0, jnp.float32(NEG_INF), s
            )
        m_new = jnp.maximum(m, jnp.max(s, axis=2, keepdims=True))
        alpha = jnp.exp(m - m_new)  # [HB, TQ_blk, 1]
        pe = jnp.exp(s - m_new)
        # DEFERRED normalisation: the softmax division is a per-row scalar,
        # so it commutes with the value contraction — l accumulates the
        # PRE-dropout row sums and recip(l) scales the [HB, TQ, hd] OUTPUT
        # once at the end (TK/hd = 64x fewer elements at MFMF shapes;
        # measured on the bag4096 fwd, r4).  Dropout composes: the keep
        # mask scales unnormalised pe, the row sum stays the pre-dropout
        # one.
        l = l * alpha + jnp.sum(pe, axis=2, keepdims=True)
        if dropout_rate > 0.0:
            pe, _ = _apply_dropout(
                pe, seed_ref, dropout_rate, t_q, t_k, qt, k0=c0
            )
        acc = acc * alpha + jax.lax.dot_general(
            pe.astype(v_c.dtype), v_c, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [HB, TQ_blk, hd]
        m = m_new

    o_ref[...] = (acc * (1.0 / l)).astype(o_ref.dtype)
    # [HB, TQ_blk, 1] f32 — the row stats keep a trailing singleton dim so
    # their block's last dim EQUALS the array dim (a 2-D (hb, q_tile) block
    # is rejected by the real-TPU lowering whenever hb % 8 != 0; interpret
    # mode accepts it — same trap as the (1,) seed block, module note)
    m_ref[...] = m
    l_ref[...] = l


# Mosaic's default scoped-vmem limit is 16MB — conservative on v5e's
# 128MB VMEM, and measured 32KB short for the backward at hd<=8 configs
# (lane padding makes each [4096, hd] K/V block 2MB regardless of hd).
# Both kernels compile with an explicit 64MB cap; the tile planner budgets
# to half of it so double-buffering and Mosaic scratch always fit.
_VMEM_LIMIT = 64 * 1024 * 1024


def _plan_tiles(
    H: int, q_tile: int, t_k: int, hd: int, itemsize: int,
    score_copies: int = 3, k_chunk: int = 0,
):
    """(q_tile, head_block) whose per-program VMEM footprint fits.

    Footprint model: f32 scores [HB, q_tile, KC] times ``score_copies``
    live copies (~3 through a forward chunk's softmax update, ~4 through a
    backward chunk's p/g/ds chain) plus double-buffered q/k/v/o blocks at
    the LANE-PADDED head dim (VMEM tiles pad the minor dim to 128: a
    [4096, 8] f32 value block still occupies 2MB — measured: an hd=8 MFMF
    config with the unpadded model busted the 16MB scoped-vmem limit that
    hd=64 shapes fit).  ``k_chunk`` is the in-body key chunk: only one
    chunk's score block is live at a time, so the score term scales with
    min(t_k, k_chunk) while the K/V block term keeps the full t_k.
    Prefers the largest head group at the given q_tile, then halves q_tile
    while even a single head-group does not fit."""
    budget = _VMEM_LIMIT // 2
    hd_pad = _round_up(hd, 128)
    kc = min(t_k, k_chunk) if k_chunk else t_k
    # block sets: forward q,o on the q_tile axis and k,v on the key axis;
    # backward q,do,dq and k,v,dk,dv.  Under vmap (a leading batch grid
    # dim) every input re-fetches per batch element, so all blocks are
    # modelled double-buffered (the 2x)
    n_q, n_k = (3, 4) if score_copies > 3 else (2, 2)

    def fits(hb: int, qt: int) -> bool:
        scores = hb * qt * kc * 4 * score_copies
        blocks = 2 * hb * (n_q * qt + n_k * t_k) * hd_pad * itemsize
        return scores + blocks <= budget

    while True:
        for hb in range(H, 0, -1):
            if H % hb == 0 and fits(hb, q_tile):
                return q_tile, hb
        if q_tile <= 16:
            return q_tile, 1  # smallest plan; let Mosaic judge
        q_tile = max(16, _round_up(q_tile // 2, 16))


# In-body key-chunk width: large enough that each chunk's score matmul is
# an efficient MXU pass, small enough that t_k=4096 bags unroll into 8+
# chunks for the MXU/VPU interleave (see _attn_kernel docstring).  Measured
# on v5e bag-4096 (r5), fwd / grad pair vs the r3 full-K kernel's
# 0.514 / 1.738 ms: kc=2048 -> 0.447/1.451, kc=1024 -> 0.414/1.449,
# kc=512 -> 0.405/1.413 ms (0.86 of the hd=64 MXU ceiling both ways);
# kc=256's 16-deep unroll ran past a 560 s compile budget — do not chase.
# Env-overridable for tuning sweeps only — callers jit on shapes, so a
# change only applies to freshly traced shapes.
import os as _os

_K_CHUNK = int(_os.environ.get("MMF_ATTN_K_CHUNK", "512"))


@functools.partial(
    jax.jit, static_argnames=("scale", "q_tile", "dropout_rate", "interpret")
)
def _fused_attention_hxd(
    q: jax.Array,  # [H, Tq, hd]
    k: jax.Array,  # [H, Tk, hd]
    v: jax.Array,  # [H, Tk, hd]
    bias,  # [1, Tk] additive f32 (0 or NEG_INF), or None
    seed,  # [1] int32 dropout seed, or None (iff dropout_rate == 0)
    scale: float,
    q_tile: int,
    dropout_rate: float,
    interpret: bool,
):
    """Returns (out [H, Tq, hd], row max m [H, Tq] f32, exp-sum l [H, Tq]
    f32)."""
    H, t_q, hd = q.shape
    t_k = k.shape[1]
    q_tile, hb = _plan_tiles(
        H, q_tile, t_k, hd, q.dtype.itemsize, k_chunk=_K_CHUNK
    )
    grid = (H // hb, pl.cdiv(t_q, q_tile))
    in_specs = [
        pl.BlockSpec(
            (hb, q_tile, hd), lambda h, j: (h, j, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (hb, t_k, hd), lambda h, j: (h, 0, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (hb, t_k, hd), lambda h, j: (h, 0, 0), memory_space=pltpu.VMEM
        ),
    ]
    args = [q, k, v]
    if bias is not None:
        in_specs.append(
            pl.BlockSpec((1, t_k), lambda h, j: (0, 0), memory_space=pltpu.VMEM)
        )
        args.append(bias)
    if seed is not None:
        # (1, 1) 2D block: under vmap Mosaic requires the last two block
        # dims to equal the array dims (a 1-D (1,) spec batches to
        # (Squeezed, 1) over a (B, 1) array and is rejected on real TPU;
        # interpret mode accepts both)
        in_specs.append(
            pl.BlockSpec((1, 1), lambda h, j: (0, 0), memory_space=pltpu.SMEM)
        )
        args.append(seed)
    has_bias, has_seed = bias is not None, seed is not None

    def kernel(*refs):
        i = 3
        bias_ref = refs[i] if has_bias else None
        i += int(has_bias)
        seed_ref = refs[i] if has_seed else None
        _attn_kernel(
            refs[0], refs[1], refs[2], refs[-3], refs[-2], refs[-1],
            scale=scale, k_chunk=_K_CHUNK, bias_ref=bias_ref,
            seed_ref=seed_ref, dropout_rate=dropout_rate, t_q=t_q,
        )

    row_spec = pl.BlockSpec(
        (hb, q_tile, 1), lambda h, j: (h, j, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((H, t_q, hd), q.dtype),
            jax.ShapeDtypeStruct((H, t_q, 1), jnp.float32),  # row max m
            jax.ShapeDtypeStruct((H, t_q, 1), jnp.float32),  # exp-sum l
        ),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec(
                    (hb, q_tile, hd), lambda h, j: (h, j, 0),
                    memory_space=pltpu.VMEM,
                ),
                row_spec,
                row_spec,
            ),
        ),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
    )(*args)


def _attn_bwd_kernel(
    q_ref, k_ref, v_ref, do_ref, m_ref, l_ref, dsum_ref, dq_ref, dk_ref,
    dv_ref, *, scale, q_tile, t_q, k_chunk, bias_ref=None, seed_ref=None,
    dropout_rate=0.0,
):
    """Recompute backward for one (head-group, q-tile) program, key axis
    chunked in-body like the forward (VERDICT r4 #1).

    Two structural wins over the r3 full-K backward:
    - Probabilities come straight from the forward's saved row statistics
      (p = exp(s - m) / l) — no max pass, no sum pass: two full VPU
      sweeps over the score block gone.
    - The softmax-transpose row term sum_k(dL/dp * p) equals
      rowsum(do * o) (``dsum_ref``, precomputed OUTSIDE the kernel from
      the saved output — the identity holds THROUGH dropout because
      sum_k dL/dp_k p_k = sum_k dL/dpd_k pd_k = do.o), so ds needs no
      cross-chunk reduction and the chunk loop has no carried state
      except the dq accumulator.

    dq accumulates across chunks in registers and writes per q-tile; dk/dv
    ACCUMULATE across the head-group's q-tiles into output blocks whose
    index map is constant in the q-tile index (the same VMEM buffer
    persists until the head index changes), zero-initialised at the first
    tile, each chunk adding into its slice.  Partial-edge q rows are
    explicitly zeroed before the accumulating matmuls: unlike the forward
    (where garbage rows are simply discarded by the masked dq write),
    garbage contributions here would poison dk/dv for every valid key.

    With dropout the forward computed o = drop(p) @ v; the mask is the
    stateless coordinate hash (see module note), so this kernel recomputes
    the IDENTICAL mask despite its different tile plan: dv contracts the
    dropped probabilities, dL/dp = mask-scaled dL/d(drop(p)), and the
    softmax transpose then proceeds on the pre-dropout p.
    """
    j = pl.program_id(1)
    q = q_ref[...]  # [HB, TQ_blk, hd]
    do = do_ref[...]  # [HB, TQ_blk, hd]
    m = m_ref[...]  # [HB, TQ_blk, 1] f32
    # reciprocal once per row: a divide pass over every score chunk costs
    # ~10x the broadcast multiply on VPU
    r = 1.0 / l_ref[...]  # [HB, TQ_blk, 1] f32
    dsum = dsum_ref[...]  # [HB, TQ_blk, 1] f32
    t_k = k_ref.shape[1]
    hb, qt, hd = q.shape
    bias = bias_ref[0] if bias_ref is not None else None  # [TK] f32

    # zero partial-edge q rows on EVERY operand of the accumulating
    # matmuls (ds, p, do, q): a zeroed ds against an undefined (possibly
    # NaN) q row still yields 0 * NaN = NaN in the contraction.  Each mask
    # is built at its operand's full shape via broadcasted_iota — Mosaic
    # rejects inserting a minor dim on sub-32-bit (bool) values
    def rows_valid(shape):
        return (
            j * q_tile + jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        ) < t_q

    do_z = jnp.where(rows_valid(do.shape), do, 0)
    q_z = jnp.where(rows_valid(q.shape), q, 0)

    @pl.when(j == 0)
    def _():
        dk_ref[...] = jnp.zeros_like(dk_ref)
        dv_ref[...] = jnp.zeros_like(dv_ref)

    dq_acc = jnp.zeros((hb, qt, hd), jnp.float32)
    for c0 in range(0, t_k, k_chunk):
        kc = min(k_chunk, t_k - c0)
        sl = slice(c0, c0 + kc)
        k_c = k_ref[:, sl, :]  # [HB, KC, hd]
        v_c = v_ref[:, sl, :]
        s = jax.lax.dot_general(
            q, k_c, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale  # [HB, TQ_blk, KC]
        if bias is not None:
            masked_col = bias[None, None, sl] < 0.0  # [1, 1, KC]
            s = jnp.where(masked_col, jnp.float32(NEG_INF), s)
        p = jnp.exp(s - m) * r  # normalised from the saved row stats

        dp = jax.lax.dot_general(
            do, v_c, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [HB, TQ_blk, KC] = dL/d(drop(p))
        if dropout_rate > 0.0:
            pd, keep = _apply_dropout(
                p, seed_ref, dropout_rate, t_q, t_k, qt, k0=c0
            )
            inv = 1.0 / (1.0 - dropout_rate)
            dp = jnp.where(keep, dp * inv, 0.0)  # dL/dp through the mask
        else:
            pd = p
        ds = p * (dp - dsum) * scale
        if bias is not None:
            # VJP of the forward's where: masked scores are CONSTANTS,
            # their cotangent is zero.  p alone does not encode this — an
            # all-masked row has uniform nonzero p but must produce zero
            # dq/dk.
            ds = jnp.where(masked_col, 0.0, ds)
        ds = jnp.where(rows_valid(ds.shape), ds, 0.0)
        p_z = jnp.where(rows_valid(pd.shape), pd, 0.0)

        dq_acc = dq_acc + jax.lax.dot_general(
            ds.astype(k_c.dtype), k_c, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [HB, TQ_blk, hd]
        dk_ref[:, sl, :] += jax.lax.dot_general(
            ds.astype(q.dtype), q_z, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(dk_ref.dtype)  # [HB, KC, hd]
        dv_ref[:, sl, :] += jax.lax.dot_general(
            p_z.astype(do.dtype), do_z, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(dv_ref.dtype)  # [HB, KC, hd]

    dq_ref[...] = dq_acc.astype(dq_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "q_tile", "dropout_rate", "interpret")
)
def _fused_attention_bwd_hxd(
    q: jax.Array,  # [H, Tq, hd]
    k: jax.Array,  # [H, Tk, hd]
    v: jax.Array,  # [H, Tk, hd]
    bias,  # [1, Tk] f32 or None
    seed,  # [1] int32 or None
    do: jax.Array,  # [H, Tq, hd]
    row_m: jax.Array,  # [H, Tq, 1] f32 (forward's running row max)
    row_l: jax.Array,  # [H, Tq, 1] f32 (forward's pre-dropout exp-sum)
    dsum: jax.Array,  # [H, Tq, 1] f32 (rowsum(do * o))
    scale: float,
    q_tile: int,
    dropout_rate: float,
    interpret: bool,
):
    H, t_q, hd = q.shape
    t_k = k.shape[1]
    # ~4 live f32 score-CHUNK copies through the p/dp/ds chain (the lse
    # formulation dropped the full-K max/sum stage), so the planner keeps
    # far larger q tiles than the r3 full-K backward could
    q_tile, hb = _plan_tiles(
        H, q_tile, t_k, hd, q.dtype.itemsize, score_copies=4,
        k_chunk=_K_CHUNK,
    )
    grid = (H // hb, pl.cdiv(t_q, q_tile))
    q_spec = pl.BlockSpec(
        (hb, q_tile, hd), lambda h, j: (h, j, 0), memory_space=pltpu.VMEM
    )
    kv_spec = pl.BlockSpec(
        (hb, t_k, hd), lambda h, j: (h, 0, 0), memory_space=pltpu.VMEM
    )
    row_spec = pl.BlockSpec(
        (hb, q_tile, 1), lambda h, j: (h, j, 0), memory_space=pltpu.VMEM
    )
    in_specs = [q_spec, kv_spec, kv_spec, q_spec, row_spec, row_spec, row_spec]
    args = [q, k, v, do, row_m, row_l, dsum]
    if bias is not None:
        in_specs.append(
            pl.BlockSpec((1, t_k), lambda h, j: (0, 0), memory_space=pltpu.VMEM)
        )
        args.append(bias)
    if seed is not None:
        in_specs.append(
            pl.BlockSpec((1, 1), lambda h, j: (0, 0), memory_space=pltpu.SMEM)
        )
        args.append(seed)
    has_bias, has_seed = bias is not None, seed is not None

    def kernel(*refs):
        i = 7
        bias_ref = refs[i] if has_bias else None
        i += int(has_bias)
        seed_ref = refs[i] if has_seed else None
        _attn_bwd_kernel(
            refs[0], refs[1], refs[2], refs[3], refs[4], refs[5], refs[6],
            refs[-3], refs[-2], refs[-1],
            scale=scale, q_tile=q_tile, t_q=t_q, k_chunk=_K_CHUNK,
            bias_ref=bias_ref, seed_ref=seed_ref, dropout_rate=dropout_rate,
        )

    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((H, t_q, hd), q.dtype),
            jax.ShapeDtypeStruct((H, t_k, hd), k.dtype),
            jax.ShapeDtypeStruct((H, t_k, hd), v.dtype),
        ),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=in_specs,
            out_specs=(
                q_spec,
                kv_spec,
                kv_spec,
            ),
        ),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _attention_hxd(q, k, v, bias, seed, scale, q_tile, dropout_rate, interpret):
    out, _, _ = _fused_attention_hxd(
        q, k, v, bias, seed, scale, q_tile, dropout_rate, interpret
    )
    return out


def _attention_hxd_fwd(q, k, v, bias, seed, scale, q_tile, dropout_rate, interpret):
    out, row_m, row_l = _fused_attention_hxd(
        q, k, v, bias, seed, scale, q_tile, dropout_rate, interpret
    )
    return out, (q, k, v, bias, seed, out, row_m, row_l)


def _attention_hxd_bwd(scale, q_tile, dropout_rate, interpret, res, g):
    q, k, v, bias, seed, out, row_m, row_l = res
    # softmax-transpose row term: sum_k(dL/dp * p) == rowsum(do * o), valid
    # THROUGH dropout (see _attn_bwd_kernel docstring) — one tiny [H,Tq,hd]
    # elementwise reduce in XLA instead of a cross-chunk carry in-kernel
    dsum = jnp.sum(
        g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1, keepdims=True
    )  # [H, Tq, 1]
    dq, dk, dv = _fused_attention_bwd_hxd(
        q, k, v, bias, seed, g.astype(q.dtype), row_m, row_l, dsum, scale,
        q_tile, dropout_rate, interpret,
    )
    dbias = None if bias is None else jnp.zeros_like(bias)
    # integer seed: float0 cotangent (no gradient flows into the RNG)
    dseed = None if seed is None else np.zeros(seed.shape, jax.dtypes.float0)
    return dq, dk, dv, dbias, dseed


_attention_hxd.defvjp(_attention_hxd_fwd, _attention_hxd_bwd)


def fused_attention(
    q: jax.Array,  # [Tq, H, hd]
    k: jax.Array,  # [Tk, H, hd]
    v: jax.Array,  # [Tk, H, hd]
    kv_mask: Optional[jax.Array] = None,  # [Tk] bool, True = keep
    *,
    scale: Optional[float] = None,
    q_tile: Optional[int] = None,
    dropout_rate: float = 0.0,
    dropout_key: Optional[jax.Array] = None,
    interpret: bool = False,
) -> jax.Array:
    """Fused softmax(q k^T / sqrt(hd)) v in the models' [T, H, hd] layout.

    Returns [Tq, H, hd] in the input dtype.  Matches
    ``einsum('qhd,khd->hqk') -> (+NEG_INF mask) -> softmax -> einsum`` to
    float tolerance.  Batch via ``jax.vmap`` (Pallas prepends a grid dim).
    DIFFERENTIABLE in q/k/v via a custom VJP whose backward is a second
    fused kernel (flash-style recompute — no saved probability matrix);
    kv_mask carries no gradient.

    ``dropout_rate`` > 0 (requires ``dropout_key``) applies inverted
    dropout to the attention probabilities INSIDE the kernel via the
    stateless coordinate-hash mask (see module note) — the backward kernel
    recomputes the identical mask.  The draw comes from the hash, not from
    ``jax.random.bernoulli``, so it differs from the XLA formulation's
    stream (both are valid dropout; ``dropout_keep_reference`` reproduces
    the kernel's mask exactly for tests).
    """
    t_q, H, hd = q.shape
    t_k = k.shape[0]
    if scale is None:
        scale = 1.0 / (hd ** 0.5)
    if q_tile is None:
        # cap the per-program f32 score block (q_tile x t_k) at ~8MB so
        # large key counts shrink the q tile instead of blowing VMEM
        q_tile = _round_up(max(16, min(t_q, 512, (2 << 20) // max(t_k, 1))), 16)
    if kv_mask is None:
        bias = None
    else:
        bias = jnp.where(kv_mask[None, :], 0.0, NEG_INF).astype(jnp.float32)
    dropout_rate = float(dropout_rate)
    _drop_threshold(dropout_rate)  # validate range
    if dropout_rate > 0.0:
        if dropout_key is None:
            raise ValueError("dropout_rate > 0 requires dropout_key")
        seed = jax.lax.bitcast_convert_type(
            jax.random.bits(dropout_key, (1, 1), jnp.uint32), jnp.int32
        )
    else:
        seed = None
    qh = jnp.transpose(q, (1, 0, 2))
    kh = jnp.transpose(k, (1, 0, 2))
    vh = jnp.transpose(v, (1, 0, 2))
    out = _attention_hxd(
        qh, kh, vh, bias, seed, float(scale), int(q_tile), dropout_rate,
        interpret,
    )
    return jnp.transpose(out, (1, 0, 2))


def xla_attention(
    q: jax.Array,  # [Tq, H, hd]
    k: jax.Array,
    v: jax.Array,
    kv_mask: Optional[jax.Array] = None,
    dropout_rate: float = 0.0,
    dropout_key: Optional[jax.Array] = None,
) -> jax.Array:
    """The einsum->softmax->einsum oracle formulation (exactly what
    models/vit.py and models/mfmf.py historically inlined), with the same
    inverted bernoulli dropout on the probabilities that
    ``models.common.dropout`` applies (bit-identical given the same key)."""
    hd = q.shape[-1]
    scores = jnp.einsum("qhd,khd->hqk", q, k) / (hd ** 0.5)
    if kv_mask is not None:
        scores = jnp.where(kv_mask[None, None, :], scores, NEG_INF)
    attn = jax.nn.softmax(scores, axis=-1)
    if dropout_rate > 0.0 and dropout_key is not None:
        keep = 1.0 - dropout_rate
        mask = jax.random.bernoulli(dropout_key, keep, attn.shape)
        attn = jnp.where(mask, attn / keep, 0.0)
    return jnp.einsum("hqk,khd->qhd", attn, v)


# Trace-time escape hatch: GSPMD cannot partition a Mosaic custom call, so
# computations traced for a mesh WITHOUT shard_map manual partitioning
# (e.g. leftover windows whose size doesn't divide the mesh, replicated
# placements) must keep the XLA formulation even when a model's attn_impl
# says 'auto'/'pallas'.  The survival trainer wraps those traces in
# ``force_xla()``; inside shard_map each device is single-device and the
# kernel dispatches normally.
_FORCE_XLA: contextvars.ContextVar[bool] = contextvars.ContextVar(
    "mmf_attention_force_xla", default=False
)


@contextlib.contextmanager
def force_xla():
    tok = _FORCE_XLA.set(True)
    try:
        yield
    finally:
        _FORCE_XLA.reset(tok)


# Per-case score-tensor size (Tq*Tk*H elements) above which the fused
# kernel beats XLA on TPU.  Measured on v5e (B=1, hd=64): at 4096x4096x8
# (134M) the kernel is 2.4x FASTER (0.47ms vs 1.15ms — XLA spills the
# 268MB score tensor to HBM); at ViT-L's 257x257x16 (1.1M) XLA is 1.5x
# faster (XLA:TPU fuses the softmax into the attention matmuls at small T
# and runs ~66 TF/s — its cost-analysis "bytes accessed" wildly overstates
# the real traffic there).  The crossover is somewhere in between; 32M is
# conservative: below it XLA is known-good, above it XLA's materialised
# scores dominate.
AUTO_MIN_SCORE_ELEMS = 32 * 1024 * 1024


# Above this key count 'auto' stays on XLA: the full-K-resident design
# needs each head's [t_k, hd] K and V in VMEM (the module comment's <= ~8k
# regime); explicit impl='pallas' is still honoured for larger shapes.
AUTO_MAX_TK = 8192


def _auto_uses_pallas(t_q: int, t_k: int, heads: int, backend: str) -> bool:
    return (
        backend == "tpu"
        and t_q * t_k * heads >= AUTO_MIN_SCORE_ELEMS
        and t_k <= AUTO_MAX_TK
    )


def attention(
    q: jax.Array,  # [Tq, H, hd]
    k: jax.Array,  # [Tk, H, hd]
    v: jax.Array,  # [Tk, H, hd]
    kv_mask: Optional[jax.Array] = None,
    impl: str = "auto",
    dropout_rate: float = 0.0,
    dropout_key: Optional[jax.Array] = None,
    train: bool = False,
) -> jax.Array:
    """Multi-head attention with implementation dispatch.

    impl: 'xla' (oracle), 'pallas' (fused kernel), 'pallas_interpret'
    (kernel in interpret mode, CPU tests), or 'auto' — the fused kernel on
    TPU when the score tensor is big enough to win (see
    AUTO_MIN_SCORE_ELEMS), the XLA formulation otherwise.

    Attention dropout (``dropout_rate`` > 0, ``train=True``, key given) is
    supported by EVERY impl: the XLA path draws a bernoulli mask from the
    key (bit-identical to the historical inline formulation), the fused
    kernel draws the stateless coordinate-hash mask seeded from the key
    (different stream, equally valid dropout — its backward recomputes the
    identical mask).  Under ``force_xla()`` (GSPMD mesh traces without
    shard_map) every impl resolves to 'xla'.
    """
    if _FORCE_XLA.get():
        impl = "xla"
    if impl == "auto":
        try:
            backend = jax.default_backend()
        except Exception:  # pragma: no cover - backend init failure
            backend = "cpu"
        impl = (
            "pallas"
            if _auto_uses_pallas(q.shape[0], k.shape[0], q.shape[1], backend)
            else "xla"
        )
    rate = float(dropout_rate) if (train and dropout_key is not None) else 0.0
    if impl == "xla":
        return xla_attention(q, k, v, kv_mask, rate, dropout_key)
    if impl in ("pallas", "pallas_interpret"):
        return fused_attention(
            q, k, v, kv_mask, dropout_rate=rate, dropout_key=dropout_key,
            interpret=impl == "pallas_interpret",
        )
    raise ValueError(f"unknown attention impl {impl!r}")


VALID_IMPLS = ("auto", "xla", "pallas", "pallas_interpret")
