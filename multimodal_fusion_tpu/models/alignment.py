"""Cross-modal alignment model.

Reference: ``alignment/alignment_model.py:16-126`` — per-modality stacks of
``num_layers`` Linear(feature_dim, feature_dim) with no nonlinearity, plus an
MLP match predictor (Linear -> ReLU -> Dropout -> Linear -> Sigmoid) over the
concatenation of all modalities for match/mismatch BCE (loss_IM).

The reference's inline ``main()`` demo references an undefined symbol
(alignment_model.py:160) — dead code, not reproduced.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
from flax import nnx

from multimodal_fusion_tpu.models.common import dropout, torch_linear


class MLPMatchPredictor(nnx.Module):
    def __init__(self, input_dim: int, hidden_dim: int, rngs: nnx.Rngs, dropout_rate: float = 0.1):
        # dropout default 0.1 = the reference's (alignment_model.py:110);
        # 0.3 tripled match-predictor dropout in loss_IM training
        self.fc1 = torch_linear(input_dim, hidden_dim, rngs)
        self.fc2 = torch_linear(hidden_dim, 1, rngs)
        self.rate = dropout_rate

    def __call__(self, x, *, key=None, train=False):
        h = jax.nn.relu(self.fc1(x))
        h = dropout(h, self.rate, key, train)
        return jax.nn.sigmoid(self.fc2(h))


class MultiModalAlignmentModel(nnx.Module):
    def __init__(
        self,
        modality_names: Sequence[str],
        feature_dim: int = 1024,
        num_layers: int = 1,  # reference default (alignment_model.py:24)
        *,
        rngs: nnx.Rngs,
        predictor_hidden: int = 512,
    ):
        self.modality_names = list(modality_names)
        self.feature_dim = feature_dim
        self.num_layers = num_layers
        self.alignment_layers = nnx.Dict(
            {
                name: nnx.List(
                    [torch_linear(feature_dim, feature_dim, rngs) for _ in range(num_layers)]
                )
                for name in self.modality_names
            }
        )
        self.mlp_predictor = MLPMatchPredictor(
            feature_dim * len(self.modality_names), predictor_hidden, rngs
        )

    def align_one(self, name: str, x: jax.Array) -> jax.Array:
        for layer in self.alignment_layers[name]:
            x = layer(x)
        return x

    def __call__(self, features: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        """Align each provided modality; passthrough for unknown names."""
        out = {}
        for name, x in features.items():
            out[name] = self.align_one(name, x) if name in self.alignment_layers else x
        return out

    def predict_match(self, fused: jax.Array, *, key=None, train=False) -> jax.Array:
        return self.mlp_predictor(fused, key=key, train=train)


def infer_alignment_arch(checkpoint_path, data=None) -> tuple:
    """(num_layers, feature_dim) read from a saved MultiModalAlignmentModel
    checkpoint's keys (``alignment_layers/<marker>/<i>/kernel``) — loaders
    should not have to guess the depth the model was trained with.  Pass an
    already-open ``data`` NpzFile to avoid re-reading the file."""
    import re

    import numpy as np

    if data is None:
        data = np.load(checkpoint_path, allow_pickle=False)
    idxs, dim = [], None
    for k in data.files:
        m = re.match(r"alignment_layers/[^/]+/(\d+)/kernel$", k)
        if m:
            idxs.append(int(m.group(1)))
            dim = int(data[k].shape[0])
    if not idxs:
        raise ValueError(
            f"{checkpoint_path} does not look like an alignment model "
            "checkpoint (no alignment_layers/*/N/kernel keys)"
        )
    return max(idxs) + 1, dim


def infer_alignment_markers(checkpoint_path, data=None) -> list:
    """Sorted marker names read from a saved MultiModalAlignmentModel
    checkpoint's ``alignment_layers/<marker>/...`` keys.  Pass an
    already-open ``data`` NpzFile to avoid re-reading the file (the export
    path calls this right after :func:`infer_alignment_arch`)."""
    import re

    import numpy as np

    if data is None:
        data = np.load(checkpoint_path, allow_pickle=False)
    markers = sorted({
        m.group(1)
        for k in data.files
        if (m := re.match(r"alignment_layers/([^/]+)/\d+/kernel$", k))
    })
    if not markers:
        raise ValueError(
            f"{checkpoint_path} has no alignment_layers/<marker> keys"
        )
    return markers
