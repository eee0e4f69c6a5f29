"""Extra models: the reference's unregistered/dead-code model files, fixed
and made first-class here.

- SVDCLAM (reference ``svd_clam.py:92-469``): CLAM over the concatenated bag
  plus a MultiModalAlignmentModel over per-marker TMA features with the
  rank-1 SVD loss (+ optional loss_IM vs in-case shuffled negatives).  The
  reference file is dead code behind a broken import (``svd_clam.py:7``);
  this is the repaired equivalent (SURVEY.md §7: "document and fix
  dead/broken paths").
- UniversalConnections (reference ``auto_connections.py:7-155``): iterative
  view-generation attention that grows the token set; the reference returns
  the raw token matrix, and so do we (experimental, not a classifier).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from multimodal_fusion_tpu.config import ModelConfig
from multimodal_fusion_tpu.models.base import Case, Result, process_case
from multimodal_fusion_tpu.models.clam import CLAM
from multimodal_fusion_tpu.models.clam_mlp import CLAM_CHANNELS, ClamMLP
from multimodal_fusion_tpu.models.common import split_keys, torch_linear
from multimodal_fusion_tpu.ops.losses import (
    binary_cross_entropy,
    rank1_svd_loss_from_dict,
)


class SVDCLAM(CLAM):
    """CLAM + per-TMA-marker alignment layers + rank-1 SVD loss."""

    def __init__(self, config: ModelConfig, rngs: nnx.Rngs):
        super().__init__(config, rngs)
        self.alignment_channels = sorted(
            config.get("alignment_channels")
            or [c for c in config.channels_used_in_model if c.startswith("tma=")]
        )
        num_layers = config.get("alignment_layer_num", 2)
        self.tau1 = config.get("tau1", 0.1)
        self.tau2 = config.get("tau2", 0.1)
        self.lambda1 = config.get("lambda1", 1.0)
        self.lambda2 = config.get("lambda2", 0.0)
        self.loss2_chunk_size = config.get("loss2_chunk_size")
        from multimodal_fusion_tpu.models.alignment import MultiModalAlignmentModel

        self.alignment_model = MultiModalAlignmentModel(
            self.alignment_channels,
            feature_dim=config.input_dim,
            num_layers=num_layers,
            rngs=rngs,
        )

    def __call__(self, case: Case, label, *, key=None, train: bool = False) -> Result:
        chans = case["channels"]
        align_in = {c: chans[c] for c in self.alignment_channels if c in chans}
        aligned = self.alignment_model(align_in) if align_in else {}
        if aligned:
            # Reference svd_clam.py:227-237: the CLAM bag consumes the
            # ALIGNED features of every alignment channel, DETACHED — the
            # alignment layers train only through the SVD/IM losses, not
            # through the attention branch.
            sub = dict(chans)
            for c, v in aligned.items():
                sub[c] = jax.lax.stop_gradient(v)
            case = dict(case, channels=sub)
        out = super().__call__(case, label, key=key, train=train)
        if aligned:
            svd_loss, svd_values = rank1_svd_loss_from_dict(
                {k: v for k, v in aligned.items()},
                self.tau1, self.tau2, self.lambda1, self.loss2_chunk_size,
            )
            keys_sorted = sorted(aligned)
            B = aligned[keys_sorted[0]].shape[0]
            if self.lambda2 != 0 and B > 1:
                # derangement shifts: shift_i = (i mod (B-1)) + 1 is never a
                # multiple of B, so no 'negative' row equals its positive
                # (plain shift=i+1 was the identity whenever (i+1) % B == 0,
                # labelling the SAME fused row both 1 and 0 — review finding);
                # B == 1 admits no mismatched combination at all: skip.
                pos = jnp.concatenate([aligned[k] for k in keys_sorted], axis=1)
                neg = jnp.concatenate(
                    [
                        jnp.roll(aligned[k], shift=(i % (B - 1)) + 1, axis=0)
                        for i, k in enumerate(keys_sorted)
                    ],
                    axis=1,
                )
                allf = jnp.concatenate([pos, neg], axis=0)
                labels = jnp.concatenate([jnp.ones(pos.shape[0]), jnp.zeros(neg.shape[0])])
                pred = self.alignment_model.predict_match(allf, key=key, train=train)
                svd_loss = svd_loss + self.lambda2 * binary_cross_entropy(pred[:, 0], labels)
            out["svd_loss"] = svd_loss
            out["svd_values"] = svd_values
        return out

    def loss_fn(self, logits, labels, result):
        base = super().loss_fn(logits, labels, result)
        if self.base_weight < 1 and "svd_loss" in result:
            return base + result["svd_loss"]
        return base


class UniversalConnections(ClamMLP):
    """Iterative view-generation attention; returns the grown token matrix."""

    def __init__(self, config: ModelConfig, rngs: nnx.Rngs):
        super().__init__(config, rngs)
        self.views_num = config.get("views_num", 4)
        self.token_dim = config.get("token_dim", self.output_dim)
        self.inference_depth = config.get("inference_depth", 2)
        D, M, L = self.token_dim, self.views_num, self.inference_depth
        self.q_gen = nnx.List([torch_linear(D, M * D, rngs) for _ in range(L)])

        def xavier(key, shape):
            bound = (6.0 / (shape[0] + shape[1])) ** 0.5
            return jax.random.uniform(key, shape, jnp.float32, -bound, bound)

        self.Wq = nnx.List([nnx.Param(xavier(rngs.params(), (D, D))) for _ in range(L)])
        self.Wk = nnx.List([nnx.Param(xavier(rngs.params(), (D, D))) for _ in range(L)])
        self.Wv = nnx.List([nnx.Param(xavier(rngs.params(), (D, D))) for _ in range(L)])
        self.post_fc1 = nnx.List([torch_linear(D, D, rngs) for _ in range(L)])
        self.post_fc2 = nnx.List([torch_linear(D, D, rngs) for _ in range(L)])

    def __call__(self, case: Case, label, *, key=None, train: bool = False) -> jax.Array:
        inputs, in_masks = process_case(case, self.channels_used_in_model)
        keys = split_keys(key, len(self.used_modality))
        tokens = []
        for ch, k in zip(self.used_modality, keys):
            if ch in CLAM_CHANNELS:
                res = self.clam_forward(ch, inputs[ch], in_masks.get(ch), label, key=k, train=train)
                tokens.append(jax.lax.stop_gradient(res["features"]))
            else:
                tokens.append(self.transfer_layers[ch](inputs[ch]))
        X = jnp.concatenate(tokens, axis=0)  # [N, D]

        g = jnp.mean(X, axis=0, keepdims=True)  # global awareness [1, D]
        for d in range(self.inference_depth):
            Q = self.q_gen[d](g).reshape(self.views_num, self.token_dim)
            W_score = jnp.dot(self.Wq[d][...], self.Wk[d][...].T)
            S = jnp.dot(jnp.dot(Q, W_score), X.T)  # [M, N]
            A = jax.nn.softmax(S, axis=1)
            V = jnp.dot(X, self.Wv[d][...])
            Z = jnp.dot(A, V)
            Z = self.post_fc2[d](jax.nn.gelu(self.post_fc1[d](Z), approximate=False)) + Z
            X = jnp.concatenate([X, Z], axis=0)
        return X
