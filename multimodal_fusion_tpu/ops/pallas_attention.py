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
  per head, not per tile).  This "full-K flash" shape is right for the
  sizes this framework meets (T_k <= ~8k: ViT T=257, MFMF bags <= 4096);
  it needs no online-softmax state machine.
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

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodal_fusion_tpu.ops.masked import NEG_INF


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, bias_ref=None):
    q = q_ref[...]  # [HB, TQ_blk, hd]
    k = k_ref[...]  # [HB, TK, hd]
    v = v_ref[...]  # [HB, TK, hd]

    # batched over the head-group dim: ONE dot_general per program instead
    # of a grid step per head — program dispatch overhead, not FLOPs, was
    # the cost of a per-head grid (measured 28% SLOWER than XLA on the
    # ViT-L forward at grid (H, 1)).
    #
    # The K/V blocks span the FULL key axis by construction (only the q
    # axis is tiled), so there are no out-of-bounds key columns or value
    # rows to mask — the softmax denominator is exact as-is.  Partial
    # q-tile rows compute garbage that the masked block write discards.
    scores = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) * scale  # [HB, TQ_blk, TK] f32
    if bias_ref is not None:  # kv_mask bias (0 / NEG_INF), static presence
        # REPLACE (not add) to mirror the XLA path's jnp.where(mask, s,
        # NEG_INF) exactly: with an additive bias, an all-masked bag only
        # degrades to the same uniform average while |scaled scores| < 32
        # (half-ulp of 1e9) — beyond that the add preserves score order
        # and the kernel would silently return unmasked attention
        scores = jnp.where(
            bias_ref[0][None, None, :] < 0.0, jnp.float32(NEG_INF), scores
        )

    m = jnp.max(scores, axis=2, keepdims=True)
    p = jnp.exp(scores - m)
    p = p / jnp.sum(p, axis=2, keepdims=True)

    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [HB, TQ_blk, hd]
    o_ref[...] = o.astype(o_ref.dtype)


# Mosaic's default scoped-vmem limit is 16MB — conservative on v5e's
# 128MB VMEM, and measured 32KB short for the backward at hd<=8 configs
# (lane padding makes each [4096, hd] K/V block 2MB regardless of hd).
# Both kernels compile with an explicit 64MB cap; the tile planner budgets
# to half of it so double-buffering and Mosaic scratch always fit.
_VMEM_LIMIT = 64 * 1024 * 1024


def _plan_tiles(
    H: int, q_tile: int, t_k: int, hd: int, itemsize: int,
    score_copies: int = 3,
):
    """(q_tile, head_block) whose per-program VMEM footprint fits.

    Footprint model: f32 scores [HB, q_tile, t_k] times ``score_copies``
    live copies (~3 through the forward softmax, ~5 through the backward's
    p/dp/ds chain) plus double-buffered q/k/v/o blocks at the LANE-PADDED
    head dim (VMEM tiles pad the minor dim to 128: a [4096, 8] f32 value
    block still occupies 2MB — measured: an hd=8 MFMF config with the
    unpadded model busted the 16MB scoped-vmem limit that hd=64 shapes
    fit).  Prefers the largest head group at the given q_tile, then
    halves q_tile while even a single head-group does not fit."""
    budget = _VMEM_LIMIT // 2
    hd_pad = _round_up(hd, 128)
    # block sets: forward q,o on the q_tile axis and k,v on the key axis;
    # backward q,do,dq and k,v,dk,dv.  Under vmap (a leading batch grid
    # dim) every input re-fetches per batch element, so all blocks are
    # modelled double-buffered (the 2x)
    n_q, n_k = (3, 4) if score_copies > 3 else (2, 2)

    def fits(hb: int, qt: int) -> bool:
        scores = hb * qt * t_k * 4 * score_copies
        blocks = 2 * hb * (n_q * qt + n_k * t_k) * hd_pad * itemsize
        return scores + blocks <= budget

    while True:
        for hb in range(H, 0, -1):
            if H % hb == 0 and fits(hb, q_tile):
                return q_tile, hb
        if q_tile <= 16:
            return q_tile, 1  # smallest plan; let Mosaic judge
        q_tile = max(16, _round_up(q_tile // 2, 16))


@functools.partial(
    jax.jit, static_argnames=("scale", "q_tile", "interpret")
)
def _fused_attention_hxd(
    q: jax.Array,  # [H, Tq, hd]
    k: jax.Array,  # [H, Tk, hd]
    v: jax.Array,  # [H, Tk, hd]
    bias,  # [1, Tk] additive f32 (0 or NEG_INF), or None
    scale: float,
    q_tile: int,
    interpret: bool,
) -> jax.Array:
    H, t_q, hd = q.shape
    t_k = k.shape[1]
    q_tile, hb = _plan_tiles(H, q_tile, t_k, hd, q.dtype.itemsize)
    grid = (H // hb, pl.cdiv(t_q, q_tile))
    qkv_specs = [
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
    if bias is None:
        kernel = functools.partial(_attn_kernel, scale=scale)
        in_specs, args = qkv_specs, (q, k, v)
    else:
        def kernel(q_ref, k_ref, v_ref, bias_ref, o_ref):
            _attn_kernel(q_ref, k_ref, v_ref, o_ref, scale=scale, bias_ref=bias_ref)

        in_specs = qkv_specs + [
            pl.BlockSpec((1, t_k), lambda h, j: (0, 0), memory_space=pltpu.VMEM)
        ]
        args = (q, k, v, bias)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((H, t_q, hd), q.dtype),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (hb, q_tile, hd), lambda h, j: (h, j, 0), memory_space=pltpu.VMEM
            ),
        ),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
    )(*args)


def _attn_bwd_kernel(
    q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *,
    scale, q_tile, t_q, bias_ref=None,
):
    """Flash-style recompute backward for one (head-group, q-tile) program.

    dq writes per q-tile; dk/dv ACCUMULATE across that head-group's q-tiles
    into output blocks whose index map is constant in the q-tile index (the
    same VMEM buffer persists until the head index changes), zero-initialised
    at the first tile.  Partial-edge q rows are explicitly zeroed before the
    accumulating matmuls: unlike the forward (where garbage rows are simply
    discarded by the masked dq write), garbage contributions here would
    poison dk/dv for every valid key.
    """
    j = pl.program_id(1)
    q = q_ref[...]  # [HB, TQ_blk, hd]
    k = k_ref[...]  # [HB, TK, hd]
    v = v_ref[...]  # [HB, TK, hd]
    do = do_ref[...]  # [HB, TQ_blk, hd]

    scores = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) * scale
    if bias_ref is not None:
        masked_col = bias_ref[0][None, None, :] < 0.0  # [1, 1, TK]
        scores = jnp.where(masked_col, jnp.float32(NEG_INF), scores)
    m = jnp.max(scores, axis=2, keepdims=True)
    p = jnp.exp(scores - m)
    p = p / jnp.sum(p, axis=2, keepdims=True)  # [HB, TQ_blk, TK] f32

    dp = jax.lax.dot_general(
        do, v, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # [HB, TQ_blk, TK]
    dsum = jnp.sum(dp * p, axis=2, keepdims=True)
    ds = p * (dp - dsum) * scale
    if bias_ref is not None:
        # VJP of the forward's where: masked scores are CONSTANTS, their
        # cotangent is zero.  p alone does not encode this — an all-masked
        # row has uniform nonzero p but must produce zero dq/dk.
        ds = jnp.where(masked_col, 0.0, ds)

    # zero partial-edge q rows on EVERY operand of the accumulating
    # matmuls (ds, p, do, q): a zeroed ds against an undefined (possibly
    # NaN) q row still yields 0 * NaN = NaN in the contraction.  Each mask
    # is built at its operand's full shape via broadcasted_iota — Mosaic
    # rejects inserting a minor dim on sub-32-bit (bool) values
    def rows_valid(shape):
        return (
            j * q_tile + jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        ) < t_q

    ds = jnp.where(rows_valid(ds.shape), ds, 0.0)
    p_z = jnp.where(rows_valid(p.shape), p, 0.0)
    do_z = jnp.where(rows_valid(do.shape), do, 0)
    q_z = jnp.where(rows_valid(q.shape), q, 0)

    dq_ref[...] = jax.lax.dot_general(
        ds.astype(k.dtype), k, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(dq_ref.dtype)

    @pl.when(j == 0)
    def _():
        dk_ref[...] = jnp.zeros_like(dk_ref)
        dv_ref[...] = jnp.zeros_like(dv_ref)

    dk_ref[...] += jax.lax.dot_general(
        ds.astype(q.dtype), q_z, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(dk_ref.dtype)  # [HB, TK, hd]
    dv_ref[...] += jax.lax.dot_general(
        p_z.astype(do.dtype), do_z, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(dv_ref.dtype)  # [HB, TK, hd]


@functools.partial(
    jax.jit, static_argnames=("scale", "q_tile", "interpret")
)
def _fused_attention_bwd_hxd(
    q: jax.Array,  # [H, Tq, hd]
    k: jax.Array,  # [H, Tk, hd]
    v: jax.Array,  # [H, Tk, hd]
    bias,  # [1, Tk] f32 or None
    do: jax.Array,  # [H, Tq, hd]
    scale: float,
    q_tile: int,
    interpret: bool,
):
    H, t_q, hd = q.shape
    t_k = k.shape[1]
    # ~5 live f32 score-tile copies through the p/dp/ds chain, so the
    # planner lands on a smaller q tile than the forward's
    q_tile, hb = _plan_tiles(H, q_tile, t_k, hd, q.dtype.itemsize, score_copies=5)
    grid = (H // hb, pl.cdiv(t_q, q_tile))
    q_spec = pl.BlockSpec(
        (hb, q_tile, hd), lambda h, j: (h, j, 0), memory_space=pltpu.VMEM
    )
    kv_spec = pl.BlockSpec(
        (hb, t_k, hd), lambda h, j: (h, 0, 0), memory_space=pltpu.VMEM
    )
    in_specs = [q_spec, kv_spec, kv_spec, q_spec]
    if bias is None:
        kernel = functools.partial(
            _attn_bwd_kernel, scale=scale, q_tile=q_tile, t_q=t_q
        )
        args = (q, k, v, do)
    else:
        def kernel(q_ref, k_ref, v_ref, do_ref, bias_ref, dq_ref, dk_ref, dv_ref):
            _attn_bwd_kernel(
                q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                scale=scale, q_tile=q_tile, t_q=t_q, bias_ref=bias_ref,
            )

        in_specs = in_specs + [
            pl.BlockSpec((1, t_k), lambda h, j: (0, 0), memory_space=pltpu.VMEM)
        ]
        args = (q, k, v, do, bias)
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _attention_hxd(q, k, v, bias, scale, q_tile, interpret):
    return _fused_attention_hxd(q, k, v, bias, scale, q_tile, interpret)


def _attention_hxd_fwd(q, k, v, bias, scale, q_tile, interpret):
    out = _fused_attention_hxd(q, k, v, bias, scale, q_tile, interpret)
    return out, (q, k, v, bias)


def _attention_hxd_bwd(scale, q_tile, interpret, res, g):
    q, k, v, bias = res
    dq, dk, dv = _fused_attention_bwd_hxd(
        q, k, v, bias, g.astype(q.dtype), scale, q_tile, interpret
    )
    dbias = None if bias is None else jnp.zeros_like(bias)
    return dq, dk, dv, dbias


_attention_hxd.defvjp(_attention_hxd_fwd, _attention_hxd_bwd)


def fused_attention(
    q: jax.Array,  # [Tq, H, hd]
    k: jax.Array,  # [Tk, H, hd]
    v: jax.Array,  # [Tk, H, hd]
    kv_mask: Optional[jax.Array] = None,  # [Tk] bool, True = keep
    *,
    scale: Optional[float] = None,
    q_tile: Optional[int] = None,
    interpret: bool = False,
) -> jax.Array:
    """Fused softmax(q k^T / sqrt(hd)) v in the models' [T, H, hd] layout.

    Returns [Tq, H, hd] in the input dtype.  Matches
    ``einsum('qhd,khd->hqk') -> (+NEG_INF mask) -> softmax -> einsum`` to
    float tolerance.  Batch via ``jax.vmap`` (Pallas prepends a grid dim).
    DIFFERENTIABLE in q/k/v via a custom VJP whose backward is a second
    fused kernel (flash-style recompute — no saved probability matrix);
    kv_mask carries no gradient.
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
    qh = jnp.transpose(q, (1, 0, 2))
    kh = jnp.transpose(k, (1, 0, 2))
    vh = jnp.transpose(v, (1, 0, 2))
    out = _attention_hxd(qh, kh, vh, bias, float(scale), int(q_tile), interpret)
    return jnp.transpose(out, (1, 0, 2))


def xla_attention(
    q: jax.Array,  # [Tq, H, hd]
    k: jax.Array,
    v: jax.Array,
    kv_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """The einsum->softmax->einsum oracle formulation (exactly what
    models/vit.py and models/mfmf.py historically inlined)."""
    hd = q.shape[-1]
    scores = jnp.einsum("qhd,khd->hqk", q, k) / (hd ** 0.5)
    if kv_mask is not None:
        scores = jnp.where(kv_mask[None, None, :], scores, NEG_INF)
    attn = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("hqk,khd->qhd", attn, v)


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
) -> jax.Array:
    """Multi-head attention with implementation dispatch.

    impl: 'xla' (oracle), 'pallas' (fused kernel), 'pallas_interpret'
    (kernel in interpret mode, CPU tests), or 'auto' — the fused kernel on
    TPU when the score tensor is big enough to win (see
    AUTO_MIN_SCORE_ELEMS), the XLA formulation otherwise.  The fused
    kernel is differentiable (custom VJP, fused recompute backward) but
    implements no attention dropout — training paths with a nonzero
    attention-dropout rate must use the XLA formulation (model code guards
    this with its ``train`` flag and dropout rate).
    """
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
    if impl == "xla":
        return xla_attention(q, k, v, kv_mask)
    if impl in ("pallas", "pallas_interpret"):
        return fused_attention(
            q, k, v, kv_mask, interpret=impl == "pallas_interpret"
        )
    raise ValueError(f"unknown attention impl {impl!r}")


VALID_IMPLS = ("auto", "xla", "pallas", "pallas_interpret")
