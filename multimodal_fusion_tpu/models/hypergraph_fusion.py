"""CustOmics: hypergraph-based multimodal fusion.

Reference: ``downstream_survival/models/cust_omics.py:11-431`` —
HypergraphConv stack + GlobalAttention pooling over WSI(+TMA) nodes, MoE
gating fusion with tabular tokens.  The reference leaves this model out of
its factory; here it is a registered first-class model (SURVEY.md §2.4).

TPU-native formulation: the hypergraph is a dense (padded) incidence matrix
H [N, E] with node/edge validity masks, so the convolution

    X' = D^-1 H W B^-1 H^T X Theta       (torch_geometric HypergraphConv)

is two MXU matmuls; no scatter/gather.  N is at most a few hundred nodes
(super-patches + TMA cores), so dense is strictly faster than sparse here.

Documented deviation: when the h5 carries ``hypergraph=edge_weights`` we
feed them into the convolution's W (PyG supports ``hyperedge_weight``); the
reference computes and stores these cosine weights but then calls
``conv(x, edge_index)`` WITHOUT them (cust_omics.py:101) — i.e. it throws
its own weights away.  Parity of the op itself (weighted and unweighted) is
pinned in tests/test_hypergraph_fusion_parity.py against a dense torch
transcription of PyG's HypergraphConv.

Case channels consumed (produced by ``data.multimodal`` from the
``hypergraph/`` h5 group written by the build pipeline):
- ``hypergraph=wsi_super_features`` [Ns_pad, D] (+ mask)
- ``hypergraph=tma_features``       [Nt_pad, D] (+ mask, optional)
- ``hypergraph=incidence``          [Ns_pad+Nt_pad, E_pad]
- ``hypergraph=edge_weights``       [E_pad]
Fallback (reference cust_omics.py:190-227): raw wsi/tma embeddings with a
fully-connected incidence (every node is a hyperedge over all nodes).
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
from flax import nnx

from multimodal_fusion_tpu.config import ModelConfig
from multimodal_fusion_tpu.models.base import Case, Result, process_case
from multimodal_fusion_tpu.models.clam_mlp import CLAM_CHANNELS, ClamMLP
from multimodal_fusion_tpu.models.common import dropout, split_keys, torch_linear


class MaskedBatchNorm(nnx.Module):
    """Node-axis normalisation with learnable scale/bias.

    The reference uses torch BatchNorm1d whose "batch" here is the node set
    of a single hypergraph; we normalise over the case's valid nodes in both
    train and eval (deterministic, padding-invariant, vmap-safe — no mutable
    running statistics inside the compiled step).  Documented deviation:
    torch eval would use running stats accumulated across cases."""

    def __init__(self, dim: int, rngs: nnx.Rngs, momentum: float = 0.1, eps: float = 1e-5):
        self.scale = nnx.Param(jnp.ones((dim,)))
        self.bias = nnx.Param(jnp.zeros((dim,)))
        self.eps = eps

    def __call__(self, x: jax.Array, mask: Optional[jax.Array], train: bool) -> jax.Array:
        if mask is None:
            mean = jnp.mean(x, axis=0)
            var = jnp.mean((x - mean) ** 2, axis=0)
        else:
            w = mask.astype(x.dtype)[:, None]
            n = jnp.maximum(jnp.sum(w), 1.0)
            mean = jnp.sum(x * w, axis=0) / n
            var = jnp.sum(((x - mean) ** 2) * w, axis=0) / n
        out = (x - mean) * jax.lax.rsqrt(var + self.eps)
        return out * self.scale[...] + self.bias[...]


class HypergraphConv(nnx.Module):
    """Dense masked HypergraphConv (torch_geometric semantics,
    use_attention=False)."""

    def __init__(self, in_dim: int, out_dim: int, rngs: nnx.Rngs):
        self.lin = nnx.Linear(in_dim, out_dim, use_bias=False, rngs=rngs)
        self.bias = nnx.Param(jnp.zeros((out_dim,)))

    def __call__(
        self,
        x: jax.Array,  # [N, in]
        incidence: jax.Array,  # [N, E] 0/1
        edge_weight: Optional[jax.Array] = None,  # [E]
    ) -> jax.Array:
        E = incidence.shape[1]
        w = edge_weight if edge_weight is not None else jnp.ones((E,), x.dtype)
        xl = self.lin(x)  # [N, out]
        B = jnp.sum(incidence, axis=0)  # edge degree [E]
        D = jnp.dot(incidence, w, preferred_element_type=jnp.float32)  # node degree [N]
        edge_feat = jnp.dot(incidence.T, xl, preferred_element_type=jnp.float32)
        edge_feat = edge_feat / jnp.maximum(B, 1e-12)[:, None]
        out = jnp.dot(incidence * w[None, :], edge_feat, preferred_element_type=jnp.float32)
        out = out / jnp.maximum(D, 1e-12)[:, None]
        return out + self.bias[...]


class GlobalAttentionPool(nnx.Module):
    """gate = softmax(gate_nn(x)) over valid nodes; out = sum gate*x
    (torch_geometric GlobalAttention with Tanh gate MLP,
    reference cust_omics.py:68-75)."""

    def __init__(self, dim: int, rngs: nnx.Rngs):
        self.gate_fc1 = torch_linear(dim, dim // 2, rngs)
        self.gate_fc2 = torch_linear(dim // 2, 1, rngs)

    def __call__(self, x: jax.Array, mask: Optional[jax.Array]) -> jax.Array:
        gate = self.gate_fc2(jnp.tanh(self.gate_fc1(x)))[:, 0]  # [N]
        if mask is not None:
            gate = jnp.where(mask, gate, -1e9)
        gate = jax.nn.softmax(gate)
        if mask is not None:
            gate = jnp.where(mask, gate, 0.0)
        return jnp.dot(gate[None, :], x, preferred_element_type=jnp.float32)  # [1, D]


class HypergraphNetwork(nnx.Module):
    """Linear+BN+ReLU -> HypergraphConv stack -> Linear -> attention pool
    (reference cust_omics.py:11-110).  Note: the pooled token comes from the
    pre-output-layer features as in the reference (GlobalAttention consumes
    the post-output x there — see :100-108: output_layer then pool)."""

    def __init__(
        self,
        input_dim: int,
        hidden_dims: List[int],
        output_dim: int,
        dropout_rate: float,
        rngs: nnx.Rngs,
    ):
        self.first = torch_linear(input_dim, hidden_dims[0], rngs)
        self.bn = MaskedBatchNorm(hidden_dims[0], rngs)
        self.convs = nnx.List(
            [HypergraphConv(hidden_dims[i - 1], hidden_dims[i], rngs) for i in range(1, len(hidden_dims))]
        )
        self.out_layer = torch_linear(hidden_dims[-1], output_dim, rngs)
        self.pool = GlobalAttentionPool(output_dim, rngs)
        self.dropout_rate = dropout_rate

    def __call__(
        self,
        x: jax.Array,
        incidence: jax.Array,
        node_mask: Optional[jax.Array],
        edge_weight: Optional[jax.Array] = None,
        *,
        key=None,
        train: bool = False,
    ) -> jax.Array:
        keys = split_keys(key, 1 + len(self.convs))
        h = jax.nn.relu(self.bn(self.first(x), node_mask, train))
        h = dropout(h, self.dropout_rate, keys[0], train)
        for conv, k in zip(self.convs, keys[1:]):
            h = conv(h, incidence, edge_weight)
            h = dropout(h, self.dropout_rate, k, train)
        h = self.out_layer(h)
        return self.pool(h, node_mask)


class CustOmics(ClamMLP):
    consumes_hypergraph = True  # the one trunk that does (see ClamMLP init)
    def __init__(self, config: ModelConfig, rngs: nnx.Rngs):
        super().__init__(config, rngs)
        self.modality_order = sorted(self.used_modality)
        hidden_dims = config.get("hypergraph_hidden_dims", [256, 256])
        hg_dropout = config.get("hypergraph_dropout", 0.2)
        self.hypergraph_net = HypergraphNetwork(
            self.output_dim, hidden_dims, self.output_dim, hg_dropout, rngs
        )
        self.other_modalities = [
            m for m in self.modality_order
            if m not in CLAM_CHANNELS and not m.startswith("hypergraph=")
        ]
        self.max_num_tokens = 1 + len(self.other_modalities)
        self.moe_gate = torch_linear(self.output_dim, self.max_num_tokens, rngs)
        self.head = torch_linear(self.output_dim, self.n_classes, rngs)
        # Static transfers onto hypergraph node features when stored dims
        # differ from output_dim (the reference creates SEPARATE lazy
        # transfers per part, cust_omics.py:283-303 — wsi_super and tma node
        # features may be stored at different dims, so each part transfers
        # BEFORE concatenation).  hypergraph_tma_node_dim defaults to the
        # wsi dim when unset.
        hg_dim = config.get("hypergraph_node_dim", config.input_dim)
        tma_dim = config.get("hypergraph_tma_node_dim", hg_dim)
        if hg_dim != self.output_dim:
            self.hypergraph_transfer = torch_linear(hg_dim, self.output_dim, rngs)
        else:
            self.hypergraph_transfer = None
        if tma_dim != self.output_dim:
            self.hypergraph_tma_transfer = torch_linear(tma_dim, self.output_dim, rngs)
        else:
            self.hypergraph_tma_transfer = None

    def _image_nodes(self, case: Case, inputs, in_masks):
        """Preprocessed hypergraph channels if present, else raw wsi/tma
        with fully-connected incidence."""
        chans = case["channels"]
        raw_masks = case.get("masks", {})
        if "hypergraph=wsi_super_features" in chans and "hypergraph=incidence" in chans:
            # per-part transfer BEFORE concatenation (reference
            # cust_omics.py:283-303): the two parts may be stored at
            # different dims
            w = chans["hypergraph=wsi_super_features"]
            if self.hypergraph_transfer is not None:
                w = self.hypergraph_transfer(w)
            parts = [w]
            masks = [
                raw_masks.get(
                    "hypergraph=wsi_super_features",
                    jnp.ones((w.shape[0],), bool),
                )
            ]
            if "hypergraph=tma_features" in chans:
                t = chans["hypergraph=tma_features"]
                if self.hypergraph_tma_transfer is not None:
                    t = self.hypergraph_tma_transfer(t)
                parts.append(t)
                masks.append(raw_masks.get("hypergraph=tma_features", jnp.ones((t.shape[0],), bool)))
            nodes = jnp.concatenate(parts, axis=0)
            node_mask = jnp.concatenate(masks)
            incidence = chans["hypergraph=incidence"]
            edge_w = chans.get("hypergraph=edge_weights")
            return nodes, node_mask, incidence, edge_w
        # Fallback: raw image embeddings, fully connected hyperedges.
        parts, masks = [], []
        for ch in CLAM_CHANNELS[::-1]:  # wsi first, then tma (reference order)
            if ch in inputs:
                arr = inputs[ch]
                parts.append(arr)
                m = in_masks.get(ch)
                masks.append(m if m is not None else jnp.ones((arr.shape[0],), bool))
        if not parts:
            return None, None, None, None
        nodes = jnp.concatenate(parts, axis=0)
        node_mask = jnp.concatenate(masks)
        if self.hypergraph_transfer is not None:
            nodes = self.hypergraph_transfer(nodes)
        valid = node_mask.astype(nodes.dtype)
        incidence = valid[:, None] * valid[None, :]  # every node: one hyperedge
        return nodes, node_mask, incidence, None

    def __call__(self, case: Case, label, *, key=None, train: bool = False) -> Result:
        inputs, in_masks = process_case(case, self.channels_used_in_model)
        k_hg, k_tok = split_keys(key, 2)
        aux: Result = {}
        nodes, node_mask, incidence, edge_w = self._image_nodes(case, inputs, in_masks)
        tokens = []
        if nodes is not None:
            hg_token = self.hypergraph_net(
                nodes, incidence, node_mask, edge_w, key=k_hg, train=train
            )
            tokens.append(hg_token)
        for ch in self.other_modalities:
            tokens.append(self.transfer_layers[ch](inputs[ch]))
        if not tokens:
            # reference falls back to a zero fused token (cust_omics.py:392-395)
            tokens.append(jnp.zeros((1, self.output_dim), jnp.float32))
        tokens_tensor = jnp.concatenate(tokens, axis=0)  # [T, D]
        T = tokens_tensor.shape[0]
        token_mean = jnp.mean(tokens_tensor, axis=0, keepdims=True)
        weights = jax.nn.softmax(self.moe_gate(token_mean), axis=-1)[:, :T]
        weights = weights / (jnp.sum(weights, axis=-1, keepdims=True) + 1e-8)
        fused = jnp.dot(weights, tokens_tensor, preferred_element_type=jnp.float32)
        logits = self.head(fused)
        probs, preds = self.classify(logits)
        aux["Y_prob"] = probs
        aux["Y_hat"] = preds
        aux["moe_weights"] = weights
        return self.make_result(logits, probs, preds, **aux)

    def loss_fn(self, logits, labels, result):
        return self.base_loss(logits, labels)
