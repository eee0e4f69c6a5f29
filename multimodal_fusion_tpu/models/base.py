"""BaseModel contract.

Every model in the zoo:

- is an ``nnx.Module`` constructed from a :class:`ModelConfig` and ``nnx.Rngs``;
- implements ``__call__(case, label, *, key=None, train=False) -> result dict``
  for a SINGLE case (padded arrays); batching is ``jax.vmap`` in the trainer;
- returns the unified result dict with at least ``logits`` [1, C],
  ``probabilities`` [1, C], ``predictions`` [1] (reference contract:
  ``downstream_survival/models/base_model.py:40-131``); auxiliary entries are
  inserted in sorted key order for deterministic pytree structure;
- implements ``loss_fn(logits, labels, result)``;
- may implement ``group_loss_fn(window_results)`` — a loss over the gradient
  accumulation window (stacked result dicts), e.g. the SVD group loss.

Case format (produced by ``data.multimodal``):

``case['channels']``: dict RAW channel string -> array; bag channels
(``wsi=features``, ``tma=<marker>=features``) are [N_pad, D]; tabular value
and mask channels are [1, D_c].  ``case['masks']``: dict bag-channel -> bool
[N_pad] validity masks.  Models merge/mask channels themselves via
:func:`process_case`, mirroring the reference's per-model
``_process_input_data``.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import nnx

from multimodal_fusion_tpu.config import ModelConfig
from multimodal_fusion_tpu.ops.losses import cross_entropy

Case = Dict[str, Any]
Result = Dict[str, jax.Array]


def derive_used_modalities(channels_used_in_model) -> list:
    """Collapse channel list into the modality set the trunk consumes.

    wsi=* -> 'wsi=features'; tma=* -> 'tma=features'; '*=mask' skipped; other
    channels pass through (reference: clam_mlp.py:105-114).  Sorted for
    deterministic iteration.
    """
    used = set()
    for ch in channels_used_in_model:
        if ch.startswith("wsi=reconstructed"):
            # dropped by process_case (models read it directly, e.g. MFMF);
            # mapping it to 'wsi=features' made a reconstructed-only list
            # crash on a missing input where the reference silently runs
            # without the wsi branch
            continue
        if ch.startswith("wsi="):
            used.add("wsi=features")
        elif ch.startswith("tma="):
            used.add("tma=features")
        elif ch.endswith("=mask"):
            continue
        else:
            used.add(ch)
    return sorted(used)


def process_case(case: Case, channels_used_in_model) -> tuple:
    """Merge raw channels into modality inputs (reference clam_mlp.py:230-255).

    - ``wsi=features`` passes through;
    - every ``tma=*`` channel concatenates (with masks) into ``tma=features``;
    - ``*=mask`` channels are folded into their value channel by elementwise
      multiply;
    - other channels pass through.

    Deviation note: non-feature ``wsi=*`` channels (e.g. ``wsi=positions``)
    are dropped here; the reference's bare-else would pass them through into
    its lazily-built trunk (clam_mlp.py:246-250) — a path no shipped config
    exercises.

    Returns (inputs dict, masks dict) with keys matching
    :func:`derive_used_modalities` output.
    """
    chans = case["channels"]
    raw_masks = case.get("masks", {})
    inputs: Dict[str, jax.Array] = {}
    masks: Dict[str, Optional[jax.Array]] = {}
    tma_parts, tma_masks = [], []
    for ch in channels_used_in_model:
        if ch.startswith("wsi=reconstructed"):
            continue
        elif ch.startswith("wsi=features"):
            inputs["wsi=features"] = chans[ch]
            masks["wsi=features"] = raw_masks.get(ch)
        if ch.startswith("tma="):
            arr = chans[ch]
            tma_parts.append(arr)
            m = raw_masks.get(ch)
            tma_masks.append(
                m if m is not None else jnp.ones((arr.shape[0],), bool)
            )
        elif ch.endswith("=mask"):
            continue
        elif not ch.startswith("wsi="):
            group = ch.split("=")[0]
            v = chans[ch]
            mask_ch = f"{group}=mask"
            if mask_ch in chans:
                v = v * chans[mask_ch]
            inputs[ch] = v
    if tma_parts:
        inputs["tma=features"] = jnp.concatenate(tma_parts, axis=0)
        masks["tma=features"] = jnp.concatenate(tma_masks)
    return inputs, masks


class BaseModel(nnx.Module):
    # True only for models that IMPLEMENT inference-time modality dropout
    # (the detach family); consulted by the trainer's eval gate so a
    # requested drop_prob is never silently ignored
    supports_drop_prob = False

    def __init__(self, config: ModelConfig, rngs: nnx.Rngs):
        self.config = config
        self.input_dim = config.input_dim
        self.dropout_rate = config.dropout
        self.n_classes = config.n_classes
        if config.base_loss_fn not in (None, "ce"):
            raise ValueError(f"Unsupported base loss: {config.base_loss_fn}")

    # -- shared pieces ------------------------------------------------------

    def base_loss(self, logits: jax.Array, labels: jax.Array) -> jax.Array:
        return cross_entropy(logits, labels)

    @staticmethod
    def make_result(
        logits: jax.Array,
        probabilities: jax.Array,
        predictions: jax.Array,
        **kwargs,
    ) -> Result:
        result = {
            "logits": logits,
            "probabilities": probabilities,
            "predictions": predictions,
        }
        for k in sorted(kwargs):
            if kwargs[k] is not None:
                result[k] = kwargs[k]
        return result

    @staticmethod
    def classify(logits: jax.Array):
        """probabilities + argmax predictions from [1, C] logits."""
        probs = jax.nn.softmax(logits, axis=-1)
        preds = jnp.argmax(logits, axis=-1)
        return probs, preds

    # -- default losses -----------------------------------------------------

    def loss_fn(self, logits: jax.Array, labels: jax.Array, result: Result) -> jax.Array:
        return self.base_loss(logits, labels)

    def verbose_items(self, result: Result):
        """(name, value) pairs for training-log printing (reference models'
        verbose_items; generic version lists every *_loss entry)."""
        return [(k, v) for k, v in result.items() if k.endswith("_loss")]

    def has_group_loss(self) -> bool:
        return False

    def group_loss_fn(self, window_results: Result) -> jax.Array:
        """Loss over the accumulation window; ``window_results`` holds the
        stacked (leading window axis) result dicts."""
        return jnp.asarray(0.0)
