"""SVDPool and MDLM fusion variants.

Reference: ``downstream_survival/models/svd_pool.py:8-213`` (SVD alignment +
mean/max/sum pooling over the modality axis, single Linear head, base-only
per-case loss, SVD group loss) and ``mdlm.py:9-64`` (per-CLAM-modality linear
heads then late-fusion Linear; tabular channels feed the late fusion raw).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from flax import nnx

from multimodal_fusion_tpu.config import ModelConfig
from multimodal_fusion_tpu.models.base import Case, Result
from multimodal_fusion_tpu.models.clam_mlp import CLAM_CHANNELS, ClamMLP
from multimodal_fusion_tpu.models.common import torch_linear
from multimodal_fusion_tpu.models.svd_gate import AlignmentStack
from multimodal_fusion_tpu.ops.losses import rank1_svd_loss


class SVDPool(ClamMLP):
    def __init__(self, config: ModelConfig, rngs: nnx.Rngs):
        super().__init__(config, rngs)
        align_chs = config.get("alignment_channels") or self.used_modality
        self.alignment_channels = sorted(align_chs)
        missing = [m for m in self.used_modality if m not in self.alignment_channels]
        if missing:
            # the reference crashes the same way (svd_pool.py:59-61 looks up
            # alignment_layers for EVERY modality), but deep inside the step;
            # surface it as a clear construction-time error instead
            raise ValueError(
                "svd_pool aligns every used modality; alignment_channels "
                f"{self.alignment_channels} is missing {missing} — list all "
                "modalities or omit the option"
            )
        self.tau1 = config.get("tau1", 0.1)
        self.tau2 = config.get("tau2", 0.1)
        self.lambda1 = config.get("lambda1", 1.0)
        self.loss2_chunk_size = config.get("loss2_chunk_size")
        self.return_svd_features = config.get("return_svd_features", False)
        num_layers = config.get("alignment_layer_num", 2)
        self.alignment_layers = nnx.Dict(
            {ch: AlignmentStack(self.output_dim, num_layers, rngs) for ch in self.alignment_channels}
        )
        self.pooling_strategy = config.get("pooling_strategy", "mean")
        if self.pooling_strategy not in ("mean", "max", "sum"):
            raise ValueError(f"Unsupported pooling strategy: {self.pooling_strategy}")
        self.pool_head = torch_linear(self.output_dim, self.n_classes, rngs)

    def align_forward(self, features: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        return {ch: self.alignment_layers[ch](features[ch]) for ch in sorted(features)}

    def __call__(self, case: Case, label, *, key=None, train: bool = False) -> Result:
        features, aux = self.compute_branch_features(case, label, key=key, train=train)
        if self.return_svd_features:
            original = dict(features)
            aligned = self.align_forward(features)
            return {"features": original, "aligned_features": aligned}
        features = self.align_forward(features)
        aux["aligned_features_stack"] = jnp.stack(
            [features[ch][0] for ch in sorted(features)], axis=0
        )
        stacked = jnp.stack([features[ch] for ch in sorted(features)], axis=1)  # [1, M, D]
        if self.pooling_strategy == "mean":
            h = jnp.mean(stacked, axis=1)
        elif self.pooling_strategy == "max":
            h = jnp.max(stacked, axis=1)
        else:
            h = jnp.sum(stacked, axis=1)
        logits = self.pool_head(h)
        probs, preds = self.classify(logits)
        aux["Y_prob"] = probs
        aux["Y_hat"] = preds
        return self.make_result(logits, probs, preds, **aux)

    def loss_fn(self, logits, labels, result):
        # base-only per case (reference svd_pool.py:178-182)
        return self.base_loss(logits, labels)

    def has_group_loss(self) -> bool:
        return True

    def group_loss_fn(self, window_results: Result) -> jax.Array:
        stack = window_results["aligned_features_stack"]  # [G, M, D]
        feats = jnp.transpose(stack, (0, 2, 1))
        loss, _ = rank1_svd_loss(feats, self.tau1, self.tau2, self.lambda1, self.loss2_chunk_size)
        return loss


class MDLM(ClamMLP):
    def __init__(self, config: ModelConfig, rngs: nnx.Rngs):
        super().__init__(config, rngs)
        self.modality_order = sorted(self.used_modality)
        self.prediction_heads = nnx.Dict(
            {ch: torch_linear(self.output_dim, self.n_classes, rngs) for ch in self.modality_order}
        )
        # Late fusion Linear, statically sized: CLAM modalities contribute
        # n_classes dims, tabular channels their raw dims (the reference sizes
        # this lazily at first forward, mdlm.py:52-56).
        fused_dim = 0
        for ch in self.modality_order:
            if ch in CLAM_CHANNELS:
                fused_dim += self.n_classes
            else:
                fused_dim += config.channel_input_dims[ch]
        self.late_fusion = torch_linear(fused_dim, self.n_classes, rngs)

    def __call__(self, case: Case, label, *, key=None, train: bool = False) -> Result:
        from multimodal_fusion_tpu.models.base import process_case

        inputs, in_masks = process_case(case, self.channels_used_in_model)
        from multimodal_fusion_tpu.models.common import split_keys

        keys = split_keys(key, len(self.modality_order))
        aux: Result = {}
        tokens: Dict[str, jax.Array] = {}
        for ch, k in zip(self.modality_order, keys):
            if ch in CLAM_CHANNELS:
                res = self.clam_forward(ch, inputs[ch], in_masks.get(ch), label, key=k, train=train)
                for rk, rv in res.items():
                    aux[f"{ch}_{rk}"] = rv
                tokens[ch] = self.prediction_heads[ch](res["features"])
            else:
                tokens[ch] = inputs[ch]  # raw tabular (reference mdlm.py:49)
        h = jnp.concatenate([tokens[ch] for ch in self.modality_order], axis=1)
        logits = self.late_fusion(h)
        probs, preds = self.classify(logits)
        aux["Y_prob"] = probs
        aux["Y_hat"] = preds
        return self.make_result(logits, probs, preds, **aux)
