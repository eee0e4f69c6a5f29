"""Gate MIL family: confidence-gated per-channel MIL fusion.

Reference semantics: ``downstream_survival/models/gate_shared_mil.py:15-204``
(shared modules), ``gate_mil.py:6-105`` (per-channel modules),
``gate_mil_detach.py`` (confidence head + fusion on detached features),
``gate_auc_mil.py:8-208`` (+ AUCM group loss).

Quirk preserved: the reference's "sample attention" is
``Softmax(dim=1)`` over a [N, 1] score column — i.e. constant 1 per
instance — so the MIL pool degenerates to a **sum** over instances.  We
reproduce it as a masked sum.  GateMIL (non-shared) also multiplies the
confidence in twice when building the fused vector (``h*conf*conf``,
reference gate_mil.py:79-81); GateSharedMIL uses ``h*conf`` once.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from flax import nnx

from multimodal_fusion_tpu.config import ModelConfig, model_size_dims
from multimodal_fusion_tpu.models.base import BaseModel, Case, Result
from multimodal_fusion_tpu.models.common import dropout, split_keys, torch_linear
from multimodal_fusion_tpu.ops.losses import aucm_loss, cross_entropy
from multimodal_fusion_tpu.ops.masked import masked_mean


def positive_swish(x: jax.Array, c: float = 0.3) -> jax.Array:
    return x * jax.nn.sigmoid(x) + c


class FeatureWeightor(nnx.Module):
    """Linear(D, D) -> sigmoid (reference gate_shared_mil.py:50)."""

    def __init__(self, dim: int, rngs: nnx.Rngs):
        self.fc = torch_linear(dim, dim, rngs)

    def __call__(self, x):
        return jax.nn.sigmoid(self.fc(x))


class GateTCPClassifier(nnx.Module):
    """D -> s1 -> ReLU -> Drop -> s2 -> ReLU -> Drop -> C (reference :52-60)."""

    def __init__(self, dim: int, s1: int, s2: int, n_classes: int, rate: float, rngs: nnx.Rngs):
        self.fc1 = torch_linear(dim, s1, rngs)
        self.fc2 = torch_linear(s1, s2, rngs)
        self.fc3 = torch_linear(s2, n_classes, rngs)
        self.rate = rate

    def __call__(self, x, *, key=None, train=False):
        k1, k2 = split_keys(key, 2)
        h = dropout(jax.nn.relu(self.fc1(x)), self.rate, k1, train)
        h = dropout(jax.nn.relu(self.fc2(h)), self.rate, k2, train)
        return self.fc3(h)


class GateTCPConfidence(nnx.Module):
    """D -> s1 -> s2 -> 1 -> Dropout -> PositiveSwish (reference :61)."""

    def __init__(self, dim: int, s1: int, s2: int, rate: float, rngs: nnx.Rngs):
        self.fc1 = torch_linear(dim, s1, rngs)
        self.fc2 = torch_linear(s1, s2, rngs)
        self.fc3 = torch_linear(s2, 1, rngs)
        self.rate = rate

    def __call__(self, x, *, key=None, train=False):
        out = self.fc3(self.fc2(self.fc1(x)))
        return positive_swish(dropout(out, self.rate, key, train))


class FusionClassifier(nnx.Module):
    """nC*D -> D -> s1 -> s2 -> C with ReLU+Dropout between (reference :67-79)."""

    def __init__(self, in_dim: int, dim: int, s1: int, s2: int, n_classes: int, rate: float, rngs: nnx.Rngs):
        self.fc1 = torch_linear(in_dim, dim, rngs)
        self.fc2 = torch_linear(dim, s1, rngs)
        self.fc3 = torch_linear(s1, s2, rngs)
        self.fc4 = torch_linear(s2, n_classes, rngs)
        self.rate = rate

    def __call__(self, x, *, key=None, train=False):
        keys = split_keys(key, 3)
        h = dropout(jax.nn.relu(self.fc1(x)), self.rate, keys[0], train)
        h = dropout(jax.nn.relu(self.fc2(h)), self.rate, keys[1], train)
        h = dropout(jax.nn.relu(self.fc3(h)), self.rate, keys[2], train)
        return self.fc4(h)


class GateSharedMIL(BaseModel):
    """Shared-across-channels gated MIL (reference gate_shared_mil.py)."""

    shared = True
    detach = False
    double_confidence = False

    def __init__(self, config: ModelConfig, rngs: nnx.Rngs):
        super().__init__(config, rngs)
        # the reference gate models keep EVERY channel — including '=mask'
        # tabular masks — as a full gated slot with its own weightor/TCP
        # modules and a share of the nC divisor (gate_shared_mil.py:107
        # excludes only wsi=reconstructed); stripping masks changed the
        # architecture and loss for mask-carrying configs (review finding)
        self.channels_used_in_model = [
            c for c in config.channels_used_in_model if c != "wsi=reconstructed"
        ]
        self.confidence_weight = config.get("confidence_weight", 1)
        self.feature_weight_weight = config.get("feature_weight_weight", 1)
        size = model_size_dims(config.input_dim, config.get("model_size", "small"))
        self.size = size
        D = config.input_dim

        def make_modules():
            return (
                FeatureWeightor(D, rngs),
                GateTCPClassifier(D, size[1], size[2], self.n_classes, self.dropout_rate, rngs),
                GateTCPConfidence(D, size[1], size[2], self.dropout_rate, rngs),
            )

        if self.shared:
            fw, cls, conf = make_modules()
            self.feature_weightors = nnx.Dict({c: fw for c in ["__shared__"]})
            self.tcp_classifiers = nnx.Dict({c: cls for c in ["__shared__"]})
            self.tcp_confidences = nnx.Dict({c: conf for c in ["__shared__"]})
        else:
            fws, clss, confs = {}, {}, {}
            for c in self.channels_used_in_model:
                fw, cls, conf = make_modules()
                fws[c], clss[c], confs[c] = fw, cls, conf
            self.feature_weightors = nnx.Dict(fws)
            self.tcp_classifiers = nnx.Dict(clss)
            self.tcp_confidences = nnx.Dict(confs)

        nC = len(self.channels_used_in_model)
        self.fusion_classifier = FusionClassifier(
            nC * D, D, size[1], size[2], self.n_classes, self.dropout_rate, rngs
        )

    def _module_key(self, channel: str) -> str:
        return "__shared__" if self.shared else channel

    def __call__(self, case: Case, label, *, key=None, train: bool = False) -> Result:
        labels = jnp.asarray(label)[None]
        chans = case["channels"]
        raw_masks = case.get("masks", {})
        keys = split_keys(key, len(self.channels_used_in_model) + 1)

        fw_loss = jnp.asarray(0.0)
        logits_loss = jnp.asarray(0.0)
        conf_loss = jnp.asarray(0.0)
        slots = []
        for i, ch in enumerate(self.channels_used_in_model):
            if ch == "wsi=reconstructed" or ch not in chans:
                continue
            mk = self._module_key(ch)
            x = chans[ch]  # [N, D]
            mask = raw_masks.get(ch)
            fw = self.feature_weightors[mk](x)
            x = fw * x
            # "sample attention" == masked sum over instances (see docstring)
            if mask is not None:
                h = jnp.sum(x * mask[:, None].astype(x.dtype), axis=0, keepdims=True)
            else:
                h = jnp.sum(x, axis=0, keepdims=True)
            kc, kf = split_keys(keys[i], 2)
            tcp_logits = self.tcp_classifiers[mk](h, key=kc, train=train)
            conf_in = jax.lax.stop_gradient(h) if self.detach else h
            confidence = self.tcp_confidences[mk](conf_in, key=kf, train=train)
            pred = jax.nn.softmax(tcp_logits, axis=1)
            p_target = pred[jnp.arange(1), labels]
            logits_loss = logits_loss + cross_entropy(tcp_logits, labels)
            conf_loss = conf_loss + jnp.mean((confidence.reshape(-1) - p_target) ** 2)
            fw_loss = fw_loss + masked_mean(fw, mask, axis=0).mean()
            if self.detach:
                slot = jax.lax.stop_gradient(h) * jax.lax.stop_gradient(confidence)
            elif self.double_confidence:
                slot = (h * confidence) * confidence
            else:
                slot = h * confidence
            slots.append(slot)

        nC = len(self.channels_used_in_model)
        aux: Result = {
            "feature_weight_loss": fw_loss / nC,
            "confidence_logits_loss": logits_loss / nC,
            "confidence_loss": conf_loss / nC,
        }
        conf_h = jnp.concatenate(slots, axis=1)
        logits = self.fusion_classifier(conf_h, key=keys[-1], train=train)
        probs, preds = self.classify(logits)
        return self.make_result(logits, probs, preds, **aux)

    def loss_fn(self, logits, labels, result):
        base = self.base_loss(logits, labels)
        conf_total = (result["confidence_loss"] + result["confidence_logits_loss"]) * self.confidence_weight
        return base + conf_total + result["feature_weight_loss"]


class GateMIL(GateSharedMIL):
    """Per-channel modules; fused slot is h*conf*conf (reference gate_mil.py)."""

    shared = False
    double_confidence = True


class GateMILDetach(GateSharedMIL):
    """Per-channel modules; confidence head and fusion on detached features
    (reference gate_mil_detach.py:80-95)."""

    shared = False
    detach = True


class GateAUCMIL(GateMIL):
    stashes_group_logits = True  # reference adds its AUCM loss in validation
    """GateMIL + AUCM margin group loss over the accumulation window
    (reference gate_auc_mil.py:28-35,169-180)."""

    def __init__(self, config: ModelConfig, rngs: nnx.Rngs):
        super().__init__(config, rngs)
        self.auc_margin = config.get("auc_margin", 1.0)
        self.auc_loss_weight = config.get("auc_loss_weight", 1.0)
        self.auc_a = nnx.Param(jnp.zeros(()))
        self.auc_b = nnx.Param(jnp.zeros(()))
        self.auc_alpha = nnx.Param(jnp.zeros(()))

    def has_group_loss(self) -> bool:
        return True

    def group_loss_fn(self, window_results: Result) -> jax.Array:
        margins = window_results["logits"][:, 0, 1] - window_results["logits"][:, 0, 0]
        labels = window_results["label"]
        # auc_loss_weight is stored but NEVER applied — reference parity
        # (gate_auc_mil.py:29,175 and auc_clam.py both leave it dead)
        return aucm_loss(
            margins, labels, self.auc_a[...], self.auc_b[...],
            self.auc_alpha[...], self.auc_margin,
        )
