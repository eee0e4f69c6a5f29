"""cust_omics hypergraph ops vs torch replicas of the PyG layers.

torch_geometric is not installed, so the reference's HypergraphConv /
GlobalAttention cannot run here; these replicas implement the published
PyG semantics (hypergraph_conv.py: X' = D^-1 H W B^-1 H^T X Theta with
weighted node degree, unweighted edge degree, inf->0 on empty degrees;
glob/attention.py: softmax(gate_nn(x)) within the batch, weighted sum) in
plain torch, and the transplant test pins our dense masked formulation to
them.  The network-level test mirrors reference cust_omics.py:42-110
(first_h Linear+BN1d+ReLU -> convs -> output_layer -> attention pool).
"""

import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402
from flax import nnx  # noqa: E402

from multimodal_fusion_tpu.models.hypergraph_fusion import (  # noqa: E402
    GlobalAttentionPool,
    HypergraphConv,
    HypergraphNetwork,
)

sys.path.insert(0, str(Path(__file__).resolve().parent))
from test_torch_parity import _set_linear, _t2j  # noqa: E402


class TorchHypergraphConv(torch.nn.Module):
    """Dense transcription of PyG HypergraphConv (use_attention=False)."""

    def __init__(self, in_dim, out_dim):
        super().__init__()
        self.lin = torch.nn.Linear(in_dim, out_dim, bias=False)
        self.bias = torch.nn.Parameter(torch.zeros(out_dim))

    def forward(self, x, H, w=None):
        # H: [N, E] incidence; w: [E] hyperedge weights (ones when None)
        E = H.shape[1]
        w = torch.ones(E) if w is None else w
        xl = self.lin(x)
        B = H.sum(0)  # edge degree, unweighted
        D = H @ w  # node degree, weighted
        Binv = torch.where(B > 0, 1.0 / B, torch.zeros_like(B))
        Dinv = torch.where(D > 0, 1.0 / D, torch.zeros_like(D))
        edge_feat = Binv[:, None] * (H.t() @ xl)
        out = Dinv[:, None] * ((H * w[None, :]) @ edge_feat)
        return out + self.bias


class TorchGlobalAttention(torch.nn.Module):
    """PyG GlobalAttention with the reference's gate Sequential
    (Linear -> Tanh -> Linear), single graph in the batch."""

    def __init__(self, dim):
        super().__init__()
        self.fc1 = torch.nn.Linear(dim, dim // 2)
        self.fc2 = torch.nn.Linear(dim // 2, 1)

    def forward(self, x):
        gate = self.fc2(torch.tanh(self.fc1(x)))  # [N, 1]
        gate = torch.softmax(gate, dim=0)
        return (gate * x).sum(0, keepdim=True)  # [1, D]


def test_hypergraph_conv_parity():
    rng = np.random.default_rng(0)
    N, E, DI, DO = 14, 6, 10, 8
    x = rng.standard_normal((N, DI)).astype(np.float32)
    H = (rng.random((N, E)) < 0.4).astype(np.float32)
    H[:, 0] = 0.0  # an empty hyperedge (degree 0 path)
    H[3, :] = 0.0  # an isolated node (degree 0 path)
    w = rng.uniform(0.5, 1.5, E).astype(np.float32)

    torch.manual_seed(1)
    ref = TorchHypergraphConv(DI, DO)
    mine = HypergraphConv(DI, DO, nnx.Rngs(0))
    mine.lin.kernel[...] = _t2j(ref.lin.weight).T
    mine.bias[...] = _t2j(ref.bias)

    for weights in (None, w):
        with torch.no_grad():
            want = ref(
                torch.tensor(x), torch.tensor(H),
                None if weights is None else torch.tensor(weights),
            ).numpy()
        got = np.asarray(
            mine(jnp.asarray(x), jnp.asarray(H),
                 None if weights is None else jnp.asarray(weights))
        )
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_global_attention_parity():
    rng = np.random.default_rng(2)
    N, D = 11, 12
    x = rng.standard_normal((N, D)).astype(np.float32)
    torch.manual_seed(3)
    ref = TorchGlobalAttention(D)
    mine = GlobalAttentionPool(D, nnx.Rngs(0))
    _set_linear(mine.gate_fc1, ref.fc1)
    _set_linear(mine.gate_fc2, ref.fc2)
    with torch.no_grad():
        want = ref(torch.tensor(x)).numpy()
    got = np.asarray(mine(jnp.asarray(x), None))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    # masked == physically removing padded nodes
    x_pad = np.concatenate([x, 9.0 * np.ones((4, D), np.float32)])
    mask = np.arange(N + 4) < N
    got_masked = np.asarray(mine(jnp.asarray(x_pad), jnp.asarray(mask)))
    np.testing.assert_allclose(got_masked, want, rtol=1e-4, atol=1e-5)


class TorchHGNet(torch.nn.Module):
    """Reference HypergraphNetwork (cust_omics.py:42-110) with the dense
    PyG replicas; convs called WITHOUT hyperedge weights like the reference
    (:101 — conv(x, edge_index))."""

    def __init__(self, input_dim, hidden_dims, output_dim):
        super().__init__()
        self.first = torch.nn.Linear(input_dim, hidden_dims[0])
        self.bn = torch.nn.BatchNorm1d(hidden_dims[0])
        self.convs = torch.nn.ModuleList(
            [TorchHypergraphConv(hidden_dims[i - 1], hidden_dims[i])
             for i in range(1, len(hidden_dims))]
        )
        self.out_layer = torch.nn.Linear(hidden_dims[-1], output_dim)
        self.pool = TorchGlobalAttention(output_dim)

    def forward(self, x, H):
        h = torch.relu(self.bn(self.first(x)))
        for conv in self.convs:
            h = conv(h, H)
        h = self.out_layer(h)
        return self.pool(h)


def test_hypergraph_network_parity():
    """Full-network transplant.  torch BN1d runs in TRAIN mode (batch stats)
    to match our deterministic masked normalisation — the documented
    deviation is eval-time running stats, which a single-graph 'batch' makes
    degenerate anyway (models/hypergraph_fusion.py MaskedBatchNorm)."""
    rng = np.random.default_rng(4)
    N, E, DI = 20, 8, 16
    hidden = [12, 12]
    DO = 12  # == hidden[-1]: the reference's gate dims only line up then
    x = rng.standard_normal((N, DI)).astype(np.float32)
    H = (rng.random((N, E)) < 0.5).astype(np.float32)

    torch.manual_seed(5)
    ref = TorchHGNet(DI, hidden, DO)
    ref.eval()
    ref.bn.train()  # batch statistics, like our masked normalisation

    mine = HypergraphNetwork(DI, hidden, DO, 0.0, nnx.Rngs(0))
    _set_linear(mine.first, ref.first)
    mine.bn.scale[...] = _t2j(ref.bn.weight)
    mine.bn.bias[...] = _t2j(ref.bn.bias)
    for i, conv in enumerate(ref.convs):
        mine.convs[i].lin.kernel[...] = _t2j(conv.lin.weight).T
        mine.convs[i].bias[...] = _t2j(conv.bias)
    _set_linear(mine.out_layer, ref.out_layer)
    _set_linear(mine.pool.gate_fc1, ref.pool.fc1)
    _set_linear(mine.pool.gate_fc2, ref.pool.fc2)

    with torch.no_grad():
        want = ref(torch.tensor(x), torch.tensor(H)).numpy()
    got = np.asarray(
        mine(jnp.asarray(x), jnp.asarray(H), None, None, train=False)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
