"""AUC-CLAM: CLAM with AUCM margin group loss over the accumulation window.

Reference: ``downstream_survival/models/auc_clam.py:52-333`` — identical CLAM
structure; ``loss_fn`` stashes the per-case logit margin
(logits[:,1]-logits[:,0]) and ``group_loss_fn`` applies libauc's AUCMLoss
over the window.  Our window-stacked result dict replaces the reference's
stateful ``self.group_logits`` list.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from multimodal_fusion_tpu.config import ModelConfig
from multimodal_fusion_tpu.models.base import Result
from multimodal_fusion_tpu.models.clam import CLAM
from multimodal_fusion_tpu.ops.losses import aucm_loss


class AUCCLAM(CLAM):
    # validation adds ONE AUCM group loss over the whole evaluated set,
    # mirroring the reference's group_logits stash guard
    # (trainer.py:906-912); see SurvivalTrainer._eval_summary
    stashes_group_logits = True

    def __init__(self, config: ModelConfig, rngs: nnx.Rngs):
        super().__init__(config, rngs)
        # stored but NEVER applied — reference parity: auc_clam.py:316 and
        # gate_auc_mil.py both leave the flag dead (see gate_mil.py note)
        self.auc_loss_weight = config.get("auc_loss_weight", 1.0)
        self.auc_margin = config.get("auc_margin", 1.0)
        self.auc_a = nnx.Param(jnp.zeros(()))
        self.auc_b = nnx.Param(jnp.zeros(()))
        self.auc_alpha = nnx.Param(jnp.zeros(()))

    def has_group_loss(self) -> bool:
        return True

    def group_loss_fn(self, window_results: Result) -> jax.Array:
        margins = window_results["logits"][:, 0, 1] - window_results["logits"][:, 0, 0]
        labels = window_results["label"]
        return aucm_loss(
            margins, labels, self.auc_a[...], self.auc_b[...],
            self.auc_alpha[...], self.auc_margin,
        )
