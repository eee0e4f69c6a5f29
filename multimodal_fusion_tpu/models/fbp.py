"""FBP: pairwise bilinear modality interactions + two-level linear MoE.

Reference: ``downstream_survival/models/fbp.py:8-124``.  The bilinear form is
torch's ``nn.Bilinear(D, D, D)`` — out_o = x1 W_o x2^T + b_o with weight
[D, D, D]; realised here as a single einsum on the MXU.  CLAM features are
detached before fusion (reference :82,87).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from multimodal_fusion_tpu.config import ModelConfig
from multimodal_fusion_tpu.models.base import Case, Result, process_case
from multimodal_fusion_tpu.models.clam_mlp import CLAM_CHANNELS, ClamMLP
from multimodal_fusion_tpu.models.common import split_keys, torch_linear


class Bilinear(nnx.Module):
    """torch.nn.Bilinear equivalent: weight [out, in1, in2], bias [out]."""

    def __init__(self, in1: int, in2: int, out: int, rngs: nnx.Rngs):
        bound = 1.0 / (in1**0.5)
        self.weight = nnx.Param(
            jax.random.uniform(rngs.params(), (out, in1, in2), jnp.float32, -bound, bound)
        )
        self.bias = nnx.Param(
            jax.random.uniform(rngs.params(), (out,), jnp.float32, -bound, bound)
        )

    def __call__(self, x1: jax.Array, x2: jax.Array) -> jax.Array:
        # x1, x2: [..., in]; out: [..., out]
        return jnp.einsum("...i,oij,...j->...o", x1, self.weight[...], x2) + self.bias[...]


class FBP(ClamMLP):
    def __init__(self, config: ModelConfig, rngs: nnx.Rngs):
        super().__init__(config, rngs)
        self.modality_order = sorted(self.used_modality)
        M = len(self.modality_order)
        self.bilinear = Bilinear(self.output_dim, self.output_dim, self.output_dim, rngs)
        self.modality_moe = nnx.Linear(M, 1, use_bias=False, rngs=rngs)
        self.moe = nnx.Linear(M, 1, use_bias=False, rngs=rngs)
        self.head = torch_linear(self.output_dim, self.n_classes, rngs)

    def __call__(self, case: Case, label, *, key=None, train: bool = False) -> Result:
        inputs, in_masks = process_case(case, self.channels_used_in_model)
        keys = split_keys(key, len(self.modality_order))
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
        M = h.shape[0]
        h_i = jnp.broadcast_to(h[:, None, :], (M, M, self.output_dim))
        h_j = jnp.broadcast_to(h[None, :, :], (M, M, self.output_dim))
        pw = self.bilinear(h_i, h_j)  # [M, M, D]
        pw = jnp.transpose(pw, (0, 2, 1))  # [M, D, M]
        pw = self.modality_moe(pw)[..., 0]  # [M, D]
        pw = pw.T  # [D, M]
        fused = self.moe(pw).T  # [1, D]
        logits = self.head(fused)
        probs, preds = self.classify(logits)
        aux["Y_prob"] = probs
        aux["Y_hat"] = preds
        return self.make_result(logits, probs, preds, **aux)
