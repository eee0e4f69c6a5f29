"""MFMF: configurable Perceiver-IO-style cross-attention fusion.

Reference: ``downstream_survival/models/mfmf.py:10-148`` — every channel is
transferred to ``output_dim`` tokens, grouped into modalities
{wsi, reconstruct, tma, other}, then fused through a configurable sequence of
cross-attention blocks (default other->tma, result->wsi, reconstruct->result),
mean-pooled and classified.  Uses ``wsi=reconstructed_features`` as a
first-class modality.

The cross-attention block reimplements perceiver-io's ``CrossAttentionLayer``
(pre-norm MHA with residual + pre-norm MLP with residual) natively in JAX,
with key-side validity masks for padded bags (the reference has no padding).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
from flax import nnx

from multimodal_fusion_tpu.config import ModelConfig
from multimodal_fusion_tpu.models.base import Case, Result
from multimodal_fusion_tpu.models.clam_mlp import ClamMLP
from multimodal_fusion_tpu.models.common import dropout, split_keys, torch_linear

DEFAULT_FUSION_SEQUENCE = [
    {"q": "other", "kv": "tma"},
    {"q": "result", "kv": "wsi"},
    {"q": "reconstruct", "kv": "result"},
]


class CrossAttentionLayer(nnx.Module):
    """Pre-norm multi-head cross attention + MLP, both residual."""

    def __init__(
        self,
        dim: int,
        num_heads: int,
        widening_factor: int,
        dropout_rate: float,
        rngs: nnx.Rngs,
    ):
        if dim % num_heads != 0:
            raise ValueError(f"dim {dim} not divisible by num_heads {num_heads}")
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.q_norm = nnx.LayerNorm(dim, rngs=rngs)
        self.kv_norm = nnx.LayerNorm(dim, rngs=rngs)
        self.q_proj = torch_linear(dim, dim, rngs)
        self.k_proj = torch_linear(dim, dim, rngs)
        self.v_proj = torch_linear(dim, dim, rngs)
        self.out_proj = torch_linear(dim, dim, rngs)
        self.mlp_norm = nnx.LayerNorm(dim, rngs=rngs)
        self.mlp_fc1 = torch_linear(dim, widening_factor * dim, rngs)
        self.mlp_fc2 = torch_linear(widening_factor * dim, dim, rngs)
        self.dropout_rate = dropout_rate
        # 'auto' (shape-dispatched fused Pallas kernel where measured
        # faster — ops/pallas_attention.attention), 'xla', 'pallas', or
        # 'pallas_interpret'.  The fused kernel is differentiable (custom
        # VJP, fused recompute backward) INCLUDING attention dropout (the
        # stateless hash mask — ops/pallas_attention module note), so every
        # impl covers both eval and training; the Pallas draw differs from
        # the XLA bernoulli stream (both valid dropout).
        self.attn_impl = "auto"

    def __call__(
        self,
        q: jax.Array,  # [Nq, D]
        kv: jax.Array,  # [Nk, D]
        kv_mask: Optional[jax.Array] = None,  # [Nk] bool
        *,
        key=None,
        train: bool = False,
    ) -> jax.Array:
        k1, k2 = split_keys(key, 2)
        qn = self.q_norm(q)
        kvn = self.kv_norm(kv)
        H, hd = self.num_heads, self.head_dim
        Q = self.q_proj(qn).reshape(-1, H, hd)
        K = self.k_proj(kvn).reshape(-1, H, hd)
        V = self.v_proj(kvn).reshape(-1, H, hd)
        # every impl (incl. 'xla', which reproduces the historical inline
        # einsum->softmax->bernoulli-dropout->einsum bit-exactly) supports
        # train-time attention dropout — ops/pallas_attention.attention
        from multimodal_fusion_tpu.ops.pallas_attention import attention

        out = attention(
            Q, K, V, kv_mask, impl=self.attn_impl,
            dropout_rate=self.dropout_rate, dropout_key=k1, train=train,
        ).reshape(q.shape[0], -1)
        x = q + self.out_proj(out)  # attention residual
        h = self.mlp_fc2(jax.nn.gelu(self.mlp_fc1(self.mlp_norm(x)), approximate=False))
        h = dropout(h, self.dropout_rate, k2, train)
        return x + h


class MFMF(ClamMLP):
    def __init__(self, config: ModelConfig, rngs: nnx.Rngs):
        super().__init__(config, rngs)
        self.fusion_blocks_sequence: List[Dict[str, str]] = (
            config.get("fusion_blocks_sequence") or DEFAULT_FUSION_SEQUENCE
        )
        num_heads = config.get("attention_num_heads", 8)
        widening = config.get("attention_widening_factor", 1)
        attn_dropout = config.get("attention_dropout", 0.0)
        self.attention_blocks = nnx.Dict(
            {
                f"{b['q']}:{b['kv']}": CrossAttentionLayer(
                    self.output_dim, num_heads, widening, attn_dropout, rngs
                )
                for b in self.fusion_blocks_sequence
            }
        )
        # config 'attention_impl': 'auto' (default — shape-dispatched fused
        # Pallas kernel on TPU for large bags, XLA otherwise), 'xla',
        # 'pallas', 'pallas_interpret'.  Mesh runs dispatch the kernel too:
        # the survival trainer runs the per-case vmap inside shard_map
        # (Trainer._vmap_cases), so each device calls it on its local case
        # shard; only leftover windows that don't divide the mesh fall back
        # to the XLA formulation (ops.pallas_attention.force_xla).
        from multimodal_fusion_tpu.ops.pallas_attention import VALID_IMPLS

        impl = config.get("attention_impl", "auto")
        if impl not in VALID_IMPLS:
            raise ValueError(f"unknown attention_impl {impl!r}")
        for blk in self.attention_blocks.values():
            blk.attn_impl = impl
        # Per-channel transfer layers for EVERY channel (wsi/tma channels get
        # input_dim -> output_dim, tabular per channel_input_dims).
        mfmf_transfer = {}
        for ch in self.channels_used_in_model:
            if ch.endswith("=mask"):
                continue
            if ch.startswith("wsi=") or ch.startswith("tma="):
                in_dim = self.input_dim
            else:
                in_dim = config.channel_input_dims.get(ch)
                if in_dim is None:
                    raise ValueError(
                        f"channel_input_dims missing entry for tabular channel "
                        f"{ch!r}; static shapes are required (no lazy layer "
                        "creation)"
                    )
            mfmf_transfer[ch] = torch_linear(in_dim, self.output_dim, rngs)
        self.mfmf_transfer = nnx.Dict(mfmf_transfer)
        self.head = torch_linear(self.output_dim, self.n_classes, rngs)

    def _collect_modalities(self, case: Case):
        chans = case["channels"]
        raw_masks = case.get("masks", {})
        tma_feats, tma_masks = [], []
        other_feats = []
        modality, modality_mask = {}, {}
        for ch in self.channels_used_in_model:
            if ch.endswith("=mask") or ch not in chans:
                continue
            feat = chans[ch]
            if not ch.startswith("wsi=") and not ch.startswith("tma="):
                group = ch.split("=")[0]
                mch = f"{group}=mask"
                if mch in chans:
                    feat = feat * chans[mch]
            feat = self.mfmf_transfer[ch](feat)
            if ch.startswith("tma="):
                tma_feats.append(feat)
                m = raw_masks.get(ch)
                tma_masks.append(m if m is not None else jnp.ones((feat.shape[0],), bool))
            elif ch == "wsi=features":
                modality["wsi"] = feat
                modality_mask["wsi"] = raw_masks.get(ch)
            elif ch == "wsi=reconstructed_features":
                modality["reconstruct"] = feat
                modality_mask["reconstruct"] = raw_masks.get(ch)
            else:
                other_feats.append(feat)
        if tma_feats:
            modality["tma"] = jnp.concatenate(tma_feats, axis=0)
            modality_mask["tma"] = jnp.concatenate(tma_masks)
        if other_feats:
            modality["other"] = jnp.concatenate(other_feats, axis=0)
            modality_mask["other"] = None
        return modality, modality_mask

    def __call__(self, case: Case, label, *, key=None, train: bool = False) -> Result:
        modality, modality_mask = self._collect_modalities(case)
        keys = split_keys(key, len(self.fusion_blocks_sequence))
        result_mask = None
        for blk, k in zip(self.fusion_blocks_sequence, keys):
            q = modality[blk["q"]]
            kv = modality[blk["kv"]]
            kv_mask = modality_mask.get(blk["kv"])
            out = self.attention_blocks[f"{blk['q']}:{blk['kv']}"](
                q, kv, kv_mask, key=k, train=train
            )
            modality["result"] = out
            result_mask = modality_mask.get(blk["q"])
            modality_mask["result"] = result_mask
        res_tokens = modality["result"]
        if result_mask is not None:
            w = result_mask.astype(res_tokens.dtype)[:, None]
            fused = jnp.sum(res_tokens * w, axis=0, keepdims=True) / jnp.maximum(jnp.sum(w), 1.0)
        else:
            fused = jnp.mean(res_tokens, axis=0, keepdims=True)
        logits = self.head(fused)
        probs, preds = self.classify(logits)
        return self.make_result(logits, probs, preds, Y_prob=probs, Y_hat=preds)

    def loss_fn(self, logits, labels, result):
        return self.base_loss(logits, labels)
