"""Fused Pallas attention kernel vs the XLA einsum oracle.

The kernel (ops/pallas_attention.py) keeps each head's [Tq, Tk] score
matrix in VMEM; these tests pin it (interpret mode on CPU) against the
exact formulation used by models/vit.py and models/mfmf.py, including
partial-edge-block handling (T not a multiple of any tile), kv masking
with ops.masked.NEG_INF semantics, bf16, vmap batching, and the two
production call sites (ViT forward, MFMF cross-attention eval path).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from multimodal_fusion_tpu.ops.masked import NEG_INF
from multimodal_fusion_tpu.ops.pallas_attention import fused_attention


def xla_attention(q, k, v, kv_mask=None):
    hd = q.shape[-1]
    scores = jnp.einsum("qhd,khd->hqk", q, k) / math.sqrt(hd)
    if kv_mask is not None:
        scores = jnp.where(kv_mask[None, None, :], scores, NEG_INF)
    attn = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("hqk,khd->qhd", attn, v)


@pytest.mark.parametrize(
    "tq,tk,heads,hd",
    [
        (257, 257, 4, 64),  # ViT-L token count: partial edge blocks both axes
        (8, 100, 4, 32),  # cross-attention, tiny q
        (16, 16, 2, 16),  # aligned small
    ],
)
def test_fused_attention_matches_xla(tq, tk, heads, hd):
    rng = np.random.default_rng(tq + tk)
    q = jnp.asarray(rng.standard_normal((tq, heads, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((tk, heads, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((tk, heads, hd)), jnp.float32)
    want = xla_attention(q, k, v)
    got = fused_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_fused_attention_kv_mask_matches_xla():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((12, 2, 32)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((40, 2, 32)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((40, 2, 32)), jnp.float32)
    mask = jnp.asarray(rng.random(40) > 0.4)
    want = xla_attention(q, k, v, mask)
    got = fused_attention(q, k, v, mask, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)

    # masked keys must be equivalent to physically removing them
    idx = np.flatnonzero(np.asarray(mask))
    want_removed = xla_attention(q, k[idx], v[idx])
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want_removed), rtol=2e-5, atol=2e-5
    )


def test_fused_attention_all_masked_row_matches_xla():
    # NEG_INF is finite, so an all-masked bag degrades to a uniform
    # average in the XLA path — the kernel must reproduce that, not NaN
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((4, 2, 16)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((24, 2, 16)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((24, 2, 16)), jnp.float32)
    mask = jnp.zeros(24, bool)
    want = xla_attention(q, k, v, mask)
    got = fused_attention(q, k, v, mask, interpret=True)
    assert np.isfinite(np.asarray(got)).all()
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)

    # large-magnitude scores (|scaled| >= 32 = half-ulp of 1e9): an
    # ADDITIVE NEG_INF bias would preserve score order here and silently
    # return unmasked attention — the kernel must REPLACE like jnp.where
    # does (review finding r3)
    q40, k40 = q * 40.0, k * 40.0
    want = xla_attention(q40, k40, v, mask)
    got = fused_attention(q40, k40, v, mask, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)
    # and with a partial mask at the same magnitudes
    pmask = jnp.asarray(rng.random(24) > 0.4)
    want = xla_attention(q40, k40, v, pmask)
    got = fused_attention(q40, k40, v, pmask, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_fused_attention_bf16():
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal((257, 4, 64)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((257, 4, 64)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((257, 4, 64)), jnp.bfloat16)
    want = np.asarray(xla_attention(q, k, v), np.float32)
    got = fused_attention(q, k, v, interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32), want, rtol=0.05, atol=0.05)


def test_fused_attention_vmap():
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((3, 65, 4, 32)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 70, 4, 32)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((3, 70, 4, 32)), jnp.float32)
    want = jax.vmap(lambda a, b, c: xla_attention(a, b, c))(q, k, v)
    got = jax.vmap(lambda a, b, c: fused_attention(a, b, c, interpret=True))(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_vit_forward_pallas_attention_matches_xla():
    from multimodal_fusion_tpu.models.vit import ViT, set_attention_impl

    model = ViT(img_size=32, patch_size=8, embed_dim=64, depth=2, num_heads=4,
                rngs=nnx.Rngs(0))
    img = jnp.asarray(
        np.random.default_rng(4).standard_normal((32, 32, 3)), jnp.float32
    )
    want = np.asarray(model(img))
    set_attention_impl(model, "pallas_interpret")
    got = np.asarray(model(img))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    set_attention_impl(model, "xla")
    np.testing.assert_allclose(np.asarray(model(img)), want)
    with pytest.raises(ValueError):
        set_attention_impl(model, "mosaic")


def test_extractor_attn_impl_plumbs_through():
    from multimodal_fusion_tpu.data.tma_extraction import make_feature_extractor
    from multimodal_fusion_tpu.models.vit import ViT

    model = ViT(img_size=32, patch_size=8, embed_dim=64, depth=2, num_heads=4,
                rngs=nnx.Rngs(0))
    patches = [
        np.random.default_rng(i).integers(0, 255, (32, 32, 3), np.uint8)
        for i in range(5)
    ]
    feats_xla = make_feature_extractor(model, batch_size=4, attn_impl="xla")(patches)
    feats_pl = make_feature_extractor(
        model, batch_size=4, attn_impl="pallas_interpret"
    )(patches)
    np.testing.assert_allclose(feats_pl, feats_xla, rtol=2e-5, atol=2e-5)
    assert model.blocks[0].attn_impl == "pallas_interpret"
    # 'auto' stays stored (shape-dispatched per call)...
    make_feature_extractor(model, batch_size=4, attn_impl="auto")
    assert model.blocks[0].attn_impl == "auto"
    # ...except under a mesh, where GSPMD requires the XLA formulation
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
    make_feature_extractor(model, batch_size=4, attn_impl="auto", mesh=mesh)
    assert model.blocks[0].attn_impl == "xla"


def test_auto_dispatch_rule():
    from multimodal_fusion_tpu.ops.pallas_attention import (
        AUTO_MIN_SCORE_ELEMS, _auto_uses_pallas,
    )

    # ViT-L self-attention: XLA wins (measured on v5e)
    assert not _auto_uses_pallas(257, 257, 16, "tpu")
    # MFMF 4096-patch bag: the fused kernel wins 2.4x (measured on v5e)
    assert _auto_uses_pallas(4096, 4096, 8, "tpu")
    # never on CPU
    assert not _auto_uses_pallas(4096, 4096, 8, "cpu")
    assert 257 * 257 * 16 < AUTO_MIN_SCORE_ELEMS <= 4096 * 4096 * 8
    # past the full-K-resident VMEM budget 'auto' stays on XLA (the
    # per-head K/V must fit in VMEM; explicit 'pallas' is still honoured)
    assert not _auto_uses_pallas(4096, 32768, 8, "tpu")
    # huge key counts shrink the default q tile instead of blowing VMEM
    from multimodal_fusion_tpu.ops.pallas_attention import _round_up
    assert _round_up(max(16, min(4096, 512, (2 << 20) // 32768)), 16) == 64


def test_attention_entrypoint_impls_agree():
    from multimodal_fusion_tpu.ops.pallas_attention import attention

    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.standard_normal((33, 4, 32)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((50, 4, 32)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((50, 4, 32)), jnp.float32)
    mask = jnp.asarray(rng.random(50) > 0.2)
    want = np.asarray(xla_attention(q, k, v, mask))
    np.testing.assert_allclose(
        np.asarray(attention(q, k, v, mask, impl="auto")), want
    )  # auto == xla on CPU, bit-identical
    np.testing.assert_allclose(
        np.asarray(attention(q, k, v, mask, impl="pallas_interpret")),
        want, rtol=2e-5, atol=2e-5,
    )
    with pytest.raises(ValueError):
        attention(q, k, v, impl="mosaic")


def test_mfmf_cross_attention_pallas_eval_matches_xla():
    from multimodal_fusion_tpu.models.mfmf import CrossAttentionLayer

    layer = CrossAttentionLayer(32, 4, 2, 0.0, nnx.Rngs(0))
    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.standard_normal((5, 32)), jnp.float32)
    kv = jnp.asarray(rng.standard_normal((19, 32)), jnp.float32)
    mask = jnp.asarray(rng.random(19) > 0.3)
    want = np.asarray(layer(q, kv, mask, train=False))
    layer.attn_impl = "pallas_interpret"
    got = np.asarray(layer(q, kv, mask, train=False))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    # training forward keeps the differentiable XLA path (kernel has no VJP)
    out_train = layer(q, kv, mask, key=jax.random.key(0), train=True)
    assert np.isfinite(np.asarray(out_train)).all()


def test_mfmf_attention_impl_config():
    """MFMF reads 'attention_impl' from its model config: 'auto' default,
    explicit override plumbs to every block, invalid value raises, and the
    survival trainer's mesh guard can force 'xla' post-construction."""
    from multimodal_fusion_tpu.config import ModelConfig
    from multimodal_fusion_tpu.models.factory import ModelFactory

    def cfg(**extra):
        c = ModelConfig(
            model_type="mfmf", n_classes=2, input_dim=16, model_size="8*4",
            dropout=0.0, output_dim=16,
            channels_used_in_model=["wsi=features", "tma=cd3=features"],
            channel_input_dims={},
            fusion_blocks_sequence=[
                {"q": "tma", "kv": "wsi"},
                {"q": "result", "kv": "wsi"},
            ],
        )
        for k, v in extra.items():
            setattr(c, k, v)
        return c

    m = ModelFactory.create_model(cfg(), seed=0)
    assert all(b.attn_impl == "auto" for b in m.attention_blocks.values())
    m = ModelFactory.create_model(cfg(attention_impl="xla"), seed=0)
    assert all(b.attn_impl == "xla" for b in m.attention_blocks.values())
    with pytest.raises(ValueError, match="attention_impl"):
        ModelFactory.create_model(cfg(attention_impl="mosaic"), seed=0)

    # the guard the survival trainer applies under a mesh (_build_model)
    m = ModelFactory.create_model(cfg(), seed=0)
    for blk in m.attention_blocks.values():
        blk.attn_impl = "xla"
    assert all(b.attn_impl == "xla" for b in m.attention_blocks.values())


def test_fused_attention_grads_match_xla():
    """The custom-VJP backward (fused recompute kernel) against jax.grad of
    the XLA formulation: self-attention with partial edge tiles, cross
    attention with a kv mask (masked keys: dv nonzero, dq/dk mask-aware),
    an all-masked bag (zero dq/dk, uniform-p dv), and vmap batching."""
    rng = np.random.default_rng(11)

    def loss_pl(q, k, v, m=None):
        return jnp.sum(fused_attention(q, k, v, m, interpret=True) ** 2)

    def loss_xla(q, k, v, m=None):
        return jnp.sum(xla_attention(q, k, v, m) ** 2)

    def check(tq, tk, heads, hd, mask=None, atol=2e-4):
        q = jnp.asarray(rng.standard_normal((tq, heads, hd)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((tk, heads, hd)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((tk, heads, hd)), jnp.float32)
        args = (q, k, v) if mask is None else (q, k, v, mask)
        g_pl = jax.grad(loss_pl, argnums=(0, 1, 2))(*args)
        g_x = jax.grad(loss_xla, argnums=(0, 1, 2))(*args)
        for a, b, name in zip(g_pl, g_x, "qkv"):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=atol,
                err_msg=f"d{name} tq={tq} tk={tk}",
            )
        return g_pl

    check(257, 257, 4, 64)  # partial edge q tiles: garbage rows must not poison dk/dv
    check(33, 50, 2, 32, mask=jnp.asarray(rng.random(50) > 0.3))
    # all-masked bag: dq and dk must be exactly zero (the forward's where
    # makes every score a constant), dv still flows through the uniform p
    g = check(8, 24, 2, 16, mask=jnp.zeros(24, bool))
    assert float(jnp.abs(g[0]).max()) == 0.0
    assert float(jnp.abs(g[1]).max()) == 0.0
    assert float(jnp.abs(g[2]).max()) > 0.0

    # vmap: batched grads agree too
    qB = jnp.asarray(rng.standard_normal((3, 40, 2, 32)), jnp.float32)
    kB = jnp.asarray(rng.standard_normal((3, 48, 2, 32)), jnp.float32)
    vB = jnp.asarray(rng.standard_normal((3, 48, 2, 32)), jnp.float32)

    def bl_pl(q, k, v):
        return jnp.sum(jax.vmap(lambda a, b, c: fused_attention(a, b, c, interpret=True))(q, k, v) ** 2)

    def bl_x(q, k, v):
        return jnp.sum(jax.vmap(lambda a, b, c: xla_attention(a, b, c))(q, k, v) ** 2)

    g_pl = jax.grad(bl_pl, argnums=(0, 1, 2))(qB, kB, vB)
    g_x = jax.grad(bl_x, argnums=(0, 1, 2))(qB, kB, vB)
    for a, b in zip(g_pl, g_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)


def test_mfmf_cross_attention_pallas_train_grads():
    """With attention dropout 0 the MFMF train forward may use the fused
    kernel: forward AND parameter gradients must match the XLA layer."""
    from multimodal_fusion_tpu.models.mfmf import CrossAttentionLayer

    layer = CrossAttentionLayer(32, 4, 2, 0.0, nnx.Rngs(0))
    rng = np.random.default_rng(12)
    q = jnp.asarray(rng.standard_normal((6, 32)), jnp.float32)
    kv = jnp.asarray(rng.standard_normal((40, 32)), jnp.float32)
    mask = jnp.asarray(rng.random(40) > 0.25)
    key = jax.random.key(0)

    def loss(model):
        return jnp.sum(model(q, kv, mask, key=key, train=True) ** 2)

    layer.attn_impl = "xla"
    want_l, want_g = nnx.value_and_grad(loss)(layer)
    layer.attn_impl = "pallas_interpret"
    got_l, got_g = nnx.value_and_grad(loss)(layer)
    np.testing.assert_allclose(float(got_l), float(want_l), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4
        ),
        got_g, want_g,
    )

    # nonzero attention dropout: the kernel path applies its own hash-mask
    # dropout (valid but a DIFFERENT draw than the XLA bernoulli stream);
    # eval forwards of the two impls still agree, train forwards are both
    # finite and both actually drop
    drop = CrossAttentionLayer(32, 4, 2, 0.3, nnx.Rngs(0))
    drop.attn_impl = "pallas_interpret"
    out_pe = np.asarray(drop(q, kv, mask, train=False))
    out_p = np.asarray(drop(q, kv, mask, key=key, train=True))
    drop.attn_impl = "xla"
    out_xe = np.asarray(drop(q, kv, mask, train=False))
    out_x = np.asarray(drop(q, kv, mask, key=key, train=True))
    np.testing.assert_allclose(out_pe, out_xe, rtol=2e-5, atol=2e-5)
    assert np.isfinite(out_p).all() and np.isfinite(out_x).all()
    assert not np.allclose(out_p, out_pe)  # dropout really happened
    assert not np.allclose(out_x, out_xe)


# ---------------------------------------------------------------------------
# In-kernel attention dropout (VERDICT r3 #1): the stateless hash mask
# ---------------------------------------------------------------------------


def xla_attention_with_mask(q, k, v, keep, rate, kv_mask=None):
    """Oracle: the exact function the kernel computes — softmax probs,
    explicit keep mask (the kernel's own hash draw), inverted scaling."""
    hd = q.shape[-1]
    scores = jnp.einsum("qhd,khd->hqk", q, k) / math.sqrt(hd)
    if kv_mask is not None:
        scores = jnp.where(kv_mask[None, None, :], scores, NEG_INF)
    attn = jax.nn.softmax(scores, axis=-1)
    attn = jnp.where(keep, attn / (1.0 - rate), 0.0)
    return jnp.einsum("hqk,khd->qhd", attn, v)


def _seed_of(key):
    from multimodal_fusion_tpu.ops.pallas_attention import dropout_keep_reference

    bits = jax.random.bits(key, (1, 1), jnp.uint32)
    return int(np.asarray(bits)[0, 0]), dropout_keep_reference


@pytest.mark.parametrize("tq,tk,heads,hd", [(65, 80, 4, 32), (257, 100, 2, 16)])
def test_fused_attention_dropout_matches_hash_oracle(tq, tk, heads, hd):
    """Forward with dropout == XLA attention with the kernel's EXACT mask
    (dropout_keep_reference reproduces the in-kernel hash bit-for-bit),
    including partial edge q tiles and a kv mask."""
    rng = np.random.default_rng(tq)
    rate = 0.3
    q = jnp.asarray(rng.standard_normal((tq, heads, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((tk, heads, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((tk, heads, hd)), jnp.float32)
    key = jax.random.key(42)
    seed, ref = _seed_of(key)
    keep = ref(seed, heads, tq, tk, rate)
    # sanity: the hash draw is close to the keep probability
    frac = float(jnp.mean(keep.astype(jnp.float32)))
    assert abs(frac - (1 - rate)) < 0.02

    got = fused_attention(q, k, v, dropout_rate=rate, dropout_key=key, interpret=True)
    want = xla_attention_with_mask(q, k, v, keep, rate)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)

    mask = jnp.asarray(rng.random(tk) > 0.3)
    got = fused_attention(
        q, k, v, mask, dropout_rate=rate, dropout_key=key, interpret=True
    )
    want = xla_attention_with_mask(q, k, v, keep, rate, kv_mask=mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)

    # rate 0 (no key): bit-identical to the no-dropout kernel
    np.testing.assert_array_equal(
        np.asarray(fused_attention(q, k, v, interpret=True)),
        np.asarray(fused_attention(q, k, v, dropout_rate=0.0, interpret=True)),
    )


def test_fused_attention_dropout_grads_match_oracle():
    """Custom-VJP backward recomputes the IDENTICAL mask despite its
    different tile plan — grads must match jax.grad of the explicit-mask
    oracle (partial edge tiles + kv mask)."""
    rng = np.random.default_rng(21)
    rate, heads, hd, tq, tk = 0.25, 2, 32, 70, 90
    q = jnp.asarray(rng.standard_normal((tq, heads, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((tk, heads, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((tk, heads, hd)), jnp.float32)
    mask = jnp.asarray(rng.random(tk) > 0.25)
    key = jax.random.key(7)
    seed, ref = _seed_of(key)
    keep = ref(seed, heads, tq, tk, rate)

    def loss_pl(q, k, v):
        return jnp.sum(
            fused_attention(
                q, k, v, mask, dropout_rate=rate, dropout_key=key, interpret=True
            ) ** 2
        )

    def loss_or(q, k, v):
        return jnp.sum(xla_attention_with_mask(q, k, v, keep, rate, kv_mask=mask) ** 2)

    g_pl = jax.grad(loss_pl, argnums=(0, 1, 2))(q, k, v)
    g_or = jax.grad(loss_or, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_pl, g_or, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
            err_msg=f"d{name}",
        )


def test_fused_attention_dropout_vmap_distinct_masks():
    """vmapped calls with per-case keys draw DIFFERENT masks per case and
    each case matches its own oracle."""
    rng = np.random.default_rng(31)
    rate, heads, hd, tq, tk = 0.4, 2, 16, 33, 40
    qB = jnp.asarray(rng.standard_normal((3, tq, heads, hd)), jnp.float32)
    kB = jnp.asarray(rng.standard_normal((3, tk, heads, hd)), jnp.float32)
    vB = jnp.asarray(rng.standard_normal((3, tk, heads, hd)), jnp.float32)
    keys = jax.random.split(jax.random.key(5), 3)

    got = jax.vmap(
        lambda a, b, c, kk: fused_attention(
            a, b, c, dropout_rate=rate, dropout_key=kk, interpret=True
        )
    )(qB, kB, vB, keys)
    from multimodal_fusion_tpu.ops.pallas_attention import dropout_keep_reference

    outs = []
    keeps = []
    for i in range(3):
        seed = int(np.asarray(jax.random.bits(keys[i], (1, 1), jnp.uint32))[0, 0])
        keep = dropout_keep_reference(seed, heads, tq, tk, rate)
        keeps.append(np.asarray(keep))
        outs.append(xla_attention_with_mask(qB[i], kB[i], vB[i], keep, rate))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(jnp.stack(outs)), rtol=2e-5, atol=2e-5
    )
    assert not (keeps[0] == keeps[1]).all()  # different seeds, different draws


def test_attention_entrypoint_dropout_dispatch():
    """attention(): xla impl reproduces the bernoulli stream (bit-identical
    to the historical inline path / models.common.dropout), pallas impl the
    hash mask; train=False or missing key disables dropout on both."""
    from multimodal_fusion_tpu.models.common import dropout as common_dropout
    from multimodal_fusion_tpu.ops.pallas_attention import attention

    rng = np.random.default_rng(41)
    rate, heads, hd, tq, tk = 0.3, 2, 16, 12, 20
    q = jnp.asarray(rng.standard_normal((tq, heads, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((tk, heads, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((tk, heads, hd)), jnp.float32)
    key = jax.random.key(9)

    scores = jnp.einsum("qhd,khd->hqk", q, k) / math.sqrt(hd)
    attn = jax.nn.softmax(scores, axis=-1)
    attn = common_dropout(attn, rate, key, True)
    want_inline = jnp.einsum("hqk,khd->qhd", attn, v)
    got = attention(q, k, v, impl="xla", dropout_rate=rate, dropout_key=key, train=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want_inline))

    # train=False: no dropout on either impl
    np.testing.assert_array_equal(
        np.asarray(attention(q, k, v, impl="xla", dropout_rate=rate,
                             dropout_key=key, train=False)),
        np.asarray(attention(q, k, v, impl="xla")),
    )
    got_pl = attention(
        q, k, v, impl="pallas_interpret", dropout_rate=rate, dropout_key=key,
        train=True,
    )
    seed, ref = _seed_of(key)
    keep = ref(seed, heads, tq, tk, rate)
    want_pl = xla_attention_with_mask(q, k, v, keep, rate)
    np.testing.assert_allclose(
        np.asarray(got_pl), np.asarray(want_pl), rtol=2e-5, atol=2e-5
    )

    with pytest.raises(ValueError, match="dropout"):
        fused_attention(q, k, v, dropout_rate=0.3, interpret=True)
    with pytest.raises(ValueError, match="rate"):
        fused_attention(q, k, v, dropout_rate=1.5, dropout_key=key, interpret=True)


def test_force_xla_context():
    """force_xla(): trace-time override for GSPMD mesh traces — every impl
    resolves to the XLA formulation inside the context, normal dispatch
    outside."""
    from multimodal_fusion_tpu.ops import pallas_attention as pa

    rng = np.random.default_rng(51)
    q = jnp.asarray(rng.standard_normal((8, 2, 16)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((10, 2, 16)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((10, 2, 16)), jnp.float32)

    calls = []
    orig = pa.fused_attention

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    pa.fused_attention = spy
    try:
        with pa.force_xla():
            out = pa.attention(q, k, v, impl="pallas_interpret")
        assert not calls  # kernel never dispatched inside the context
        pa.attention(q, k, v, impl="pallas_interpret")
        assert calls  # normal dispatch restored outside
    finally:
        pa.fused_attention = orig
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(xla_attention(q, k, v)), rtol=1e-6, atol=1e-6
    )
