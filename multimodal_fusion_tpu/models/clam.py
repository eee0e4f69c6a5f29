"""MIL and CLAM models + the shared CLAM branch machinery.

Reference semantics: ``downstream_survival/models/mil.py:12-124`` (MIL_fc),
``downstream_survival/models/clam.py:51-302`` (CLAM-SB with gated attention
and top-k/bottom-k instance clustering loss).

TPU-native notes: bags arrive padded [N_pad, D] with a validity mask; the bag
softmax and the top-k instance selection are masked so padding never leaks.
``k = min(inst_number, N)`` (reference clam_mlp.py:193-197) is realised with a
static k and per-slot validity weights.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import nnx

from multimodal_fusion_tpu.config import ModelConfig, model_size_dims
from multimodal_fusion_tpu.models.attention import AttnNet, AttnNetGated
from multimodal_fusion_tpu.models.base import BaseModel, Case, Result
from multimodal_fusion_tpu.models.common import dropout, split_keys, torch_linear
from multimodal_fusion_tpu.ops.losses import cross_entropy
from multimodal_fusion_tpu.ops.masked import masked_softmax, masked_topk


def instance_ce(
    instances: jax.Array,
    targets: jax.Array,
    slot_valid: jax.Array,
    classifier: nnx.Linear,
) -> jax.Array:
    """Per-instance CE averaged over valid slots (== torch CE over the
    min(k, N) selected instances)."""
    logits = classifier(instances)
    nll = cross_entropy(logits, targets, reduction="none")
    w = slot_valid.astype(nll.dtype)
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)


class ClamAttentionCore(nnx.Module):
    """fc (Linear->ReLU->Dropout) + attention scorer, shared by every CLAM user."""

    def __init__(self, config: ModelConfig, rngs: nnx.Rngs):
        size = model_size_dims(config.input_dim, config.model_size)
        self.size = size
        n_attn = 1 if config.n_classes == 2 else config.n_classes
        self.fc = torch_linear(size[0], size[1], rngs)
        self.dropout_rate = config.dropout
        attn_cls = AttnNetGated if config.get("gate", True) else AttnNet
        # the reference HARDCODES Dropout(0.25) inside Attn_Net(_Gated)
        # whenever dropout is truthy (clam_mlp.py:16,36-38) — the configured
        # rate applies only to the fc stack above
        attn_rate = 0.25 if config.dropout else 0.0
        self.attn = attn_cls(size[1], size[2], n_attn, attn_rate, rngs)

    def __call__(
        self, x: jax.Array, *, key: Optional[jax.Array] = None, train: bool = False
    ) -> Tuple[jax.Array, jax.Array]:
        """x [N, input_dim] -> (scores [N, n_attn], h [N, size1])."""
        k1, k2 = split_keys(key, 2)
        h = jax.nn.relu(self.fc(x))
        h = dropout(h, self.dropout_rate, k1, train)
        scores, _ = self.attn(h, key=k2, train=train)
        return scores, h


def clam_instance_loss(
    A: jax.Array,
    h: jax.Array,
    mask: Optional[jax.Array],
    label: jax.Array,
    classifiers,  # list[nnx.Linear], one per class slot
    inst_number: int,
    n_classes: int,
    subtyping: bool,
    subtyping_divisor: Optional[int] = None,
) -> jax.Array:
    """Top-k/bottom-k instance clustering loss.

    ``A`` [N] raw attention scores, ``h`` [N, size1], ``label`` scalar int.
    For each instance classifier i: if one_hot(label)[i] == 1, in-class eval
    (top-k -> positives, bottom-k -> negatives); else out-of-class eval (only
    under subtyping: top-k -> negatives).  Matches reference clam.py:169-228 /
    clam_mlp.py:188-228, with min(k, N) via slot weights.
    """
    k = min(inst_number, A.shape[0])  # static clamp to the padded bag size
    n_valid = (
        jnp.sum(mask) if mask is not None else jnp.asarray(A.shape[0])
    ).astype(jnp.int32)
    k_eff = jnp.minimum(k, n_valid)
    slot_valid = jnp.arange(k) < k_eff

    _, idx_p = masked_topk(A, k, mask)
    top_p = h[idx_p]
    _, idx_n = masked_topk(-A, k, mask)
    top_n = h[idx_n]

    onehot = jax.nn.one_hot(label, n_classes)
    total = jnp.asarray(0.0)
    for i, clf in enumerate(classifiers):
        in_targets = jnp.concatenate([jnp.ones((k,), jnp.int32), jnp.zeros((k,), jnp.int32)])
        in_instances = jnp.concatenate([top_p, top_n], axis=0)
        in_valid = jnp.concatenate([slot_valid, slot_valid])
        in_loss = instance_ce(in_instances, in_targets, in_valid, clf)
        if subtyping:
            out_loss = instance_ce(top_p, jnp.zeros((k,), jnp.int32), slot_valid, clf)
        else:
            out_loss = jnp.asarray(0.0)
        total = total + jnp.where(onehot[i] == 1, in_loss, out_loss)
    if subtyping:
        # CLAM divides by its n_classes instance classifiers (clam.py:274);
        # the ClamMLP family divides by len(instance_classifiers) = the
        # NUMBER OF BAG CHANNELS (clam_mlp.py:315-316, a ModuleDict of
        # one-element lists) — callers pass that via subtyping_divisor
        total = total / (subtyping_divisor or len(classifiers))
    return total


def concat_bag_channels(case: Case, channels) -> Tuple[jax.Array, jax.Array]:
    """Concat the listed raw channels along the instance axis with a joint
    validity mask (skipping ``wsi=reconstructed``)."""
    chans = case["channels"]
    raw_masks = case.get("masks", {})
    parts, masks = [], []
    for c in channels:
        if c == "wsi=reconstructed" or c not in chans:
            continue
        arr = chans[c]
        parts.append(arr)
        m = raw_masks.get(c)
        masks.append(m if m is not None else jnp.ones((arr.shape[0],), bool))
    return jnp.concatenate(parts, axis=0), jnp.concatenate(masks)


class MILFC(BaseModel):
    """Pure MIL: per-instance classifier + top-instance selection
    (reference mil.py:12-124)."""

    def __init__(self, config: ModelConfig, rngs: nnx.Rngs):
        super().__init__(config, rngs)
        self.channels_used_in_model = list(config.channels_used_in_model)
        h1 = model_size_dims(config.input_dim, config.model_size)[1]
        self.fc = torch_linear(config.input_dim, h1, rngs)
        self.classifier = torch_linear(h1, config.n_classes, rngs)

    def _concat_input(self, case: Case) -> Tuple[jax.Array, jax.Array]:
        """Concat raw channels along the instance axis
        (reference mil.py:92, clam.py:160: cat over dim=1 then squeeze)."""
        return concat_bag_channels(case, self.channels_used_in_model)

    def __call__(self, case: Case, label, *, key=None, train: bool = False) -> Result:
        h, mask = self._concat_input(case)
        k1, _ = split_keys(key, 2)
        h = jax.nn.relu(self.fc(h))
        h = dropout(h, self.dropout_rate, k1, train)
        logits = self.classifier(h)  # [N, C]
        y_probs = masked_softmax(logits, None, axis=1)
        if self.n_classes == 2:
            # binary: instance with the highest positive-class probability
            # (reference mil.py:100-103)
            pos = jnp.where(mask, y_probs[:, 1], -jnp.inf)
            top_idx = jnp.argmax(pos)
            selected_logits = logits[top_idx][None, :]
            probs, preds = self.classify(selected_logits)
        else:
            # multiclass: the (instance, class) pair with the highest
            # probability anywhere; Y_hat is that CLASS (reference
            # mil.py:105-110 — m // C selects the instance, m % C the class)
            flat = jnp.where(mask[:, None], y_probs, -jnp.inf).reshape(-1)
            m = jnp.argmax(flat)
            top_idx = m // self.n_classes
            selected_logits = logits[top_idx][None, :]
            probs = y_probs[top_idx][None, :]
            preds = (m % self.n_classes)[None]
        return self.make_result(selected_logits, probs, preds)


class CLAM(BaseModel):
    """CLAM-SB: gated attention pooling + instance clustering loss
    (reference clam.py:51-302)."""

    def __init__(self, config: ModelConfig, rngs: nnx.Rngs):
        super().__init__(config, rngs)
        self.channels_used_in_model = list(config.channels_used_in_model)
        self.core = ClamAttentionCore(config, rngs)
        size = self.core.size
        self.base_weight = config.get("base_weight", 0.7)
        self.inst_number = config.get("inst_number", 8)
        self.subtyping = config.get("subtyping", False)
        self.attention_only = config.get("attention_only", False)
        self.return_features = config.get("return_features", False)
        self.classifier = torch_linear(size[1], config.n_classes, rngs)
        self.instance_classifiers = nnx.List(
            [torch_linear(size[1], 2, rngs) for _ in range(config.n_classes)]
        )

    def _concat_input(self, case: Case) -> Tuple[jax.Array, jax.Array]:
        return concat_bag_channels(case, self.channels_used_in_model)

    def __call__(self, case: Case, label, *, key=None, train: bool = False) -> Result:
        h_in, mask = self._concat_input(case)
        scores, h = self.core(h_in, key=key, train=train)
        A_raw = scores[:, 0]  # [N] (binary: single attention branch)
        if self.attention_only:
            return {"attention_weights": A_raw[None, :]}
        A = masked_softmax(A_raw, mask)  # [N]
        M = jnp.dot(A[None, :], h, preferred_element_type=jnp.float32)  # [1, size1]
        logits = self.classifier(M)
        probs, preds = self.classify(logits)
        kwargs = {"attention_weights": A_raw[None, :]}
        if self.return_features:
            kwargs["features"] = M
        if self.base_weight < 1:
            kwargs["total_inst_loss"] = clam_instance_loss(
                A_raw, h, mask, label, self.instance_classifiers,
                self.inst_number, self.n_classes, self.subtyping,
            )
        return self.make_result(logits, probs, preds, **kwargs)

    def loss_fn(self, logits, labels, result):
        base = self.base_loss(logits, labels)
        if self.base_weight < 1:
            return base * self.base_weight + result["total_inst_loss"] * (1 - self.base_weight)
        return base
