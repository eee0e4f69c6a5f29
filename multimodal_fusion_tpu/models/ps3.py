"""PS3: modality tokens -> LayerNorm -> shared QKV -> single-head cross-modal
self-attention -> per-modality MLP -> concat -> fusion MLP.

Reference: ``downstream_survival/models/ps3.py:8-145``.  CLAM features are
detached before fusion (reference :82,87).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import nnx

from multimodal_fusion_tpu.config import ModelConfig
from multimodal_fusion_tpu.models.base import Case, Result, process_case
from multimodal_fusion_tpu.models.clam_mlp import CLAM_CHANNELS, ClamMLP
from multimodal_fusion_tpu.models.common import dropout, split_keys, torch_linear


class PS3(ClamMLP):
    def __init__(self, config: ModelConfig, rngs: nnx.Rngs):
        super().__init__(config, rngs)
        self.modality_order = sorted(self.used_modality)
        self.token_norm = nnx.LayerNorm(self.output_dim, rngs=rngs)
        self.qkv_proj = torch_linear(self.output_dim, 3 * self.output_dim, rngs)
        self.modality_mlps = nnx.Dict(
            {ch: torch_linear(self.output_dim, self.output_dim, rngs) for ch in self.modality_order}
        )
        self.fusion_fc_a = torch_linear(len(self.modality_order) * self.output_dim, self.size[1], rngs)
        self.fusion_fc_b = torch_linear(self.size[1], self.n_classes, rngs)

    def __call__(self, case: Case, label, *, key=None, train: bool = False) -> Result:
        inputs, in_masks = process_case(case, self.channels_used_in_model)
        keys = split_keys(key, len(self.modality_order) + 1)
        aux: Result = {}
        tokens = {}
        for ch, k in zip(self.modality_order, keys):
            if ch in CLAM_CHANNELS:
                res = self.clam_forward(ch, inputs[ch], in_masks.get(ch), label, key=k, train=train)
                for rk, rv in res.items():
                    aux[f"{ch}_{rk}"] = rv
                tokens[ch] = jax.lax.stop_gradient(res["features"])
            else:
                tokens[ch] = self.transfer_layers[ch](inputs[ch])

        h = jnp.concatenate([tokens[ch] for ch in self.modality_order], axis=0)  # [M, D]
        h = self.token_norm(h)
        qkv = self.qkv_proj(h)
        q, k_, v = jnp.split(qkv, 3, axis=-1)
        attn = jax.nn.softmax(
            jnp.dot(q, k_.T, preferred_element_type=jnp.float32) / math.sqrt(self.output_dim),
            axis=-1,
        )
        h = jnp.dot(attn, v, preferred_element_type=jnp.float32)  # [M, D]
        h = jnp.concatenate(
            [self.modality_mlps[ch](h[i : i + 1]) for i, ch in enumerate(self.modality_order)],
            axis=0,
        )
        h = self.token_norm(h)
        h = h.reshape(1, -1)
        hid = dropout(jax.nn.relu(self.fusion_fc_a(h)), self.dropout_rate, keys[-1], train)
        logits = self.fusion_fc_b(hid)
        probs, preds = self.classify(logits)
        aux["Y_prob"] = probs
        aux["Y_hat"] = preds
        return self.make_result(logits, probs, preds, **aux)
