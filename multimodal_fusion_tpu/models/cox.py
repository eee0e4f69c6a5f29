"""Cox survival head on the flagship fusion trunk.

The BASELINE north star names "hypergraph-fusion Cox survival" / per-slide
risk scores; the reference only trains binary living/deceased CE.  This model
keeps the full SVDGateRandomClam trunk (CLAM branches, alignment, TCP gate)
and adds a linear log-risk head; the Cox partial likelihood is a
window-level loss (it needs the risk set), so it rides the group-loss slot
exactly like the SVD loss does.

Requires ``time`` (follow-up) and ``event`` (1=event) per case; the survival
trainer forwards them through the window results when the dataset CSV
provides ``time``/``event`` columns.  C-index evaluation:
``train/metrics.py:concordance_index``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from multimodal_fusion_tpu.config import ModelConfig
from multimodal_fusion_tpu.models.base import Case, Result
from multimodal_fusion_tpu.models.common import torch_linear
from multimodal_fusion_tpu.models.svd_gate import SVDGateRandomClam
from multimodal_fusion_tpu.ops.losses import cox_ph_loss


class CoxSVDGateClam(SVDGateRandomClam):
    def __init__(self, config: ModelConfig, rngs: nnx.Rngs):
        super().__init__(config, rngs)
        self.risk_head = torch_linear(self.output_dim * len(self.used_modality), 1, rngs)
        # svd-off fallback: aligned_features_stack only exists with
        # enable_svd (svd_gate.py:186), and the n_classes-wide logits cannot
        # feed the wide risk head — a dedicated head keeps the model usable
        # either way (review finding: the old fallback was a trace-time
        # shape crash)
        self.risk_head_logits = torch_linear(self.n_classes, 1, rngs)
        self.cox_weight = config.get("cox_weight", 1.0)

    def __call__(self, case: Case, label, *, key=None, train: bool = False, drop_prob=None) -> Result:
        out = super().__call__(case, label, key=key, train=train, drop_prob=drop_prob)
        if "aligned_features_stack" in out:
            h = out["aligned_features_stack"].reshape(1, -1)
            out["risk"] = self.risk_head(h)[:, 0]  # [1] log-risk
        else:
            out["risk"] = self.risk_head_logits(out["logits"])[:, 0]
        return out

    def group_loss_fn(self, window_results: Result) -> jax.Array:
        loss = super().group_loss_fn(window_results)
        if "time" in window_results and "event" in window_results:
            risk = window_results["risk"][:, 0]
            loss = loss + self.cox_weight * cox_ph_loss(
                risk, window_results["time"], window_results["event"]
            )
        return loss

    def has_group_loss(self) -> bool:
        return True
