"""ClamMLP — the multimodal fusion trunk.

Per-branch CLAM over ``wsi=features`` and concatenated ``tma=features`` bags,
static per-channel transfer layers for tabular channels, concat fusion MLP.
Reference semantics: ``downstream_survival/models/clam_mlp.py:51-403``.

Differences by design (documented in SURVEY.md §7):
- transfer layers are statically sized from ``config.channel_input_dims``
  (the reference creates them lazily from runtime shapes, which forces
  checkpoint-shape reconstruction hacks at eval time, trainer.py:1072-1105);
- mask channels are applied in the data layer (elementwise multiply is
  position-independent);
- ``inst_preds``/``inst_labels`` logging arrays are omitted from the jitted
  result dict (host-side logging concern, not model output).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import nnx

from multimodal_fusion_tpu.config import ModelConfig, model_size_dims
from multimodal_fusion_tpu.models.base import (
    BaseModel,
    Case,
    Result,
    derive_used_modalities,
    process_case,
)
from multimodal_fusion_tpu.models.clam import ClamAttentionCore, clam_instance_loss
from multimodal_fusion_tpu.models.common import split_keys, torch_linear
from multimodal_fusion_tpu.ops.masked import masked_softmax

CLAM_CHANNELS = ("tma=features", "wsi=features")


class ClamBranch(nnx.Module):
    """One CLAM branch: attention core + transfer layer + bag classifier +
    instance classifier (reference clam_mlp.py:144-167)."""

    def __init__(self, config: ModelConfig, rngs: nnx.Rngs):
        self.core = ClamAttentionCore(config, rngs)
        size = self.core.size
        out_dim = config.get("output_dim", 1024)
        self.transfer = torch_linear(size[1], out_dim, rngs)
        self.classifier = torch_linear(out_dim, config.n_classes, rngs)
        self.instance_classifiers = nnx.List([torch_linear(size[1], 2, rngs)])


class ClamMLP(BaseModel):
    def __init__(self, config: ModelConfig, rngs: nnx.Rngs):
        super().__init__(config, rngs)
        self.size = model_size_dims(config.input_dim, config.model_size)
        self.model_size = config.model_size
        self.output_dim = config.get("output_dim", 1024)
        self.subtyping = config.get("subtyping", False)
        self.inst_number = config.get("inst_number", 8)
        self.gate = config.get("gate", True)
        self.base_weight = config.get("base_weight", 0.7)
        self.attention_only = config.get("attention_only", False)
        self.channels_used_in_model = list(config.channels_used_in_model)
        if config.inst_loss_fn not in (None, "ce"):
            raise ValueError(f"Unsupported instance loss: {config.inst_loss_fn}")

        self.used_modality = derive_used_modalities(self.channels_used_in_model)

        # CLAM branches (always built for both bag channels, as the reference
        # does; unused ones simply never run).
        self.clam_branches = nnx.Dict({ch: ClamBranch(config, rngs) for ch in CLAM_CHANNELS})

        # Tabular transfer layers, statically shaped.  hypergraph= channels
        # are consumed by the hypergraph network (CustOmics), not by this
        # trunk — reject them at construction (they'd otherwise surface as a
        # bare KeyError deep inside jit, and fusion_fc1 would be sized for a
        # modality that never materialises).
        hg = [ch for ch in self.used_modality if ch.startswith("hypergraph=")]
        if hg and not getattr(self, "consumes_hypergraph", False):
            raise ValueError(
                f"{type(self).__name__} does not consume hypergraph channels "
                f"{hg}; use model_type=cust_omics for hypergraph inputs"
            )
        self.transfer_layers = nnx.Dict()
        for ch in self.used_modality:
            if ch in CLAM_CHANNELS or ch.startswith("hypergraph="):
                continue  # hypergraph channels feed CustOmics' own network
            in_dim = config.channel_input_dims.get(ch)
            if in_dim is None:
                raise ValueError(
                    f"channel_input_dims missing entry for tabular channel {ch!r}; "
                    "static shapes are required (no lazy layer creation)"
                )
            self.transfer_layers[ch] = torch_linear(in_dim, self.output_dim, rngs)

        self.fusion_fc1 = torch_linear(self.output_dim * len(self.used_modality), self.size[1], rngs)
        self.fusion_fc2 = torch_linear(self.size[1], config.n_classes, rngs)

    # ------------------------------------------------------------------

    def fusion_prediction(self, h: jax.Array) -> jax.Array:
        """Two stacked Linears, no activation (reference clam_mlp.py:175-179)."""
        return self.fusion_fc2(self.fusion_fc1(h))

    def clam_forward(
        self,
        channel: str,
        x: jax.Array,
        mask: Optional[jax.Array],
        label,
        *,
        key=None,
        train: bool = False,
    ) -> Result:
        """One CLAM branch pass -> dict with features/clam_loss/etc
        (reference clam_mlp.py:257-323)."""
        branch = self.clam_branches[channel]
        scores, h = branch.core(x, key=key, train=train)
        A_raw = scores[:, 0]
        A = masked_softmax(A_raw, mask)
        M = jnp.dot(A[None, :], h, preferred_element_type=jnp.float32)
        M = branch.transfer(M)  # [1, output_dim]
        logits = branch.classifier(M)
        probs, preds = self.classify(logits)
        out: Result = {
            "attention_weights": A_raw[None, :],
            "Y_prob": probs,
            "Y_hat": preds,
            "features": M,
        }
        if self.base_weight < 1:
            out["total_inst_loss"] = clam_instance_loss(
                A_raw, h, mask, label, branch.instance_classifiers,
                self.inst_number, self.n_classes, self.subtyping,
                subtyping_divisor=len(self.clam_branches),
            )
        out["clam_loss"] = self.clam_loss(logits, label, out)
        return out

    def clam_loss(self, logits, label, branch_result) -> jax.Array:
        labels = jnp.asarray(label)[None]
        base = self.base_loss(logits, labels)
        if self.base_weight < 1:
            return base * self.base_weight + branch_result["total_inst_loss"] * (1 - self.base_weight)
        return base

    def compute_branch_features(
        self, case: Case, label, *, key=None, train: bool = False
    ) -> Tuple[Dict[str, jax.Array], Result]:
        """Run every used modality to its [1, output_dim] feature."""
        inputs, in_masks = process_case(case, self.channels_used_in_model)
        keys = split_keys(key, len(self.used_modality))
        features: Dict[str, jax.Array] = {}
        aux: Result = {}
        for ch, k in zip(self.used_modality, keys):
            if ch in CLAM_CHANNELS:
                res = self.clam_forward(
                    ch, inputs[ch], in_masks.get(ch), label, key=k, train=train
                )
                for rk, rv in res.items():
                    aux[f"{ch}_{rk}"] = rv
                features[ch] = res["features"]
            else:
                features[ch] = self.transfer_layers[ch](inputs[ch])
        return features, aux

    # ------------------------------------------------------------------

    def __call__(self, case: Case, label, *, key=None, train: bool = False) -> Result:
        features, aux = self.compute_branch_features(case, label, key=key, train=train)
        h = jnp.concatenate([features[ch] for ch in self.used_modality], axis=1)
        logits = self.fusion_prediction(h)
        probs, preds = self.classify(logits)
        aux["Y_prob"] = probs
        aux["Y_hat"] = preds
        return self.make_result(logits, probs, preds, **aux)

    def loss_fn(self, logits, labels, result):
        total = self.base_loss(logits, labels)
        for ch in CLAM_CHANNELS:
            k = f"{ch}_clam_loss"
            if k in result:
                total = total + result[k]
        return total


class ClamMLPDetach(ClamMLP):
    """CLAM branch features detached before fusion
    (reference clam_mlp_detach.py:8-72; duplicate copy in sim_mlm.py)."""

    def compute_branch_features(self, case, label, *, key=None, train=False):
        features, aux = super().compute_branch_features(case, label, key=key, train=train)
        for ch in CLAM_CHANNELS:
            if ch in features:
                features[ch] = jax.lax.stop_gradient(features[ch])
        return features, aux
