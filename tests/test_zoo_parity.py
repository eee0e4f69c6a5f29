"""Weight-transplant parity for the rest of the model zoo (VERDICT r1 item 3).

Covers the families that round 1 left untested against torch: PS3, FBP, MDLM,
SVDPool, GateMIL/GateMILDetach (non-shared), DeepSupervise heads, and the
CLIP group loss (incl. the replicated anchor-self-pair reference quirk).
MFMF's cross-attention block is verified against a hand-rolled torch replica
of perceiver-io's CrossAttentionLayer (the perceiver package is not
installed, so the reference class itself cannot run here).

Same pattern as test_torch_parity.py: import the torch reference read-only,
copy its initialised weights into the nnx model, compare outputs on shared
inputs in eval mode.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference")
torch = pytest.importorskip("torch")
if not REF.exists():  # pragma: no cover
    pytest.skip("reference tree unavailable", allow_module_level=True)

# reuse the stubs + helpers from the established parity module
from test_torch_parity import (  # noqa: E402  (installs sys.path + stubs)
    _set_linear,
    _t2j,
    transplant_svd_gate,
)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from flax import nnx  # noqa: E402

from multimodal_fusion_tpu.config import ModelConfig  # noqa: E402
from multimodal_fusion_tpu.models.factory import ModelFactory  # noqa: E402

D_IN = 48
D_OUT = 40
TAB = 12

CHANNELS = ["wsi=features", "tma=cd3=features", "clinical=val", "clinical=mask"]


def _set_ln(nnx_ln, torch_ln):
    nnx_ln.scale[...] = _t2j(torch_ln.weight)
    nnx_ln.bias[...] = _t2j(torch_ln.bias)


def _base_config(model_type, **extra):
    return {
        "model_type": model_type,
        "n_classes": 2,
        "input_dim": D_IN,
        "model_size": "32*16",
        "dropout": 0.0,
        "output_dim": D_OUT,
        "channels_used_in_model": CHANNELS,
        "device": "cpu",
        "base_weight": 0.7,
        "inst_number": 3,
        **extra,
    }


def _torch_inputs(seed=0, n_wsi=10, n_tma=4):
    rng = np.random.default_rng(seed)
    data = {
        "wsi=features": torch.tensor(
            rng.standard_normal((1, n_wsi, D_IN)), dtype=torch.float32
        ),
        "tma=cd3=features": torch.tensor(
            rng.standard_normal((1, n_tma, D_IN)), dtype=torch.float32
        ),
        "clinical=val": torch.tensor(rng.standard_normal((1, 1, TAB)), dtype=torch.float32),
        "clinical=mask": torch.tensor(np.ones((1, 1, TAB)), dtype=torch.float32),
    }
    return data, torch.tensor([1])


def _jax_case(data):
    channels = {k: jnp.asarray(v.numpy()[0]) for k, v in data.items()}
    masks = {
        "wsi=features": jnp.ones(channels["wsi=features"].shape[0], bool),
        "tma=cd3=features": jnp.ones(channels["tma=cd3=features"].shape[0], bool),
    }
    return {"channels": channels, "masks": masks}


def transplant_clam_mlp_base(ref, mine):
    """ClamMLP shared surface: per-channel CLAM branches + tabular transfers.
    The reference creates transfer layers lazily — run a forward first."""
    for ch in ("wsi=features", "tma=features"):
        branch = mine.clam_branches[ch]
        seq = ref.attention_net[ch]
        _set_linear(branch.core.fc, seq[0])
        attn = seq[3]
        _set_linear(branch.core.attn.fc_a, attn.attention_a[0])
        _set_linear(branch.core.attn.fc_b, attn.attention_b[0])
        _set_linear(branch.core.attn.fc_c, attn.attention_c)
        if ch in ref.transfer_layer:
            _set_linear(branch.transfer, ref.transfer_layer[ch])
        _set_linear(branch.classifier, ref.classifiers[ch])
        _set_linear(branch.instance_classifiers[0], ref.instance_classifiers[ch][0])
    for ch, layer in ref.transfer_layer.items():
        if ch in ("wsi=features", "tma=features"):
            continue
        if ch in mine.transfer_layers:
            _set_linear(mine.transfer_layers[ch], layer)


def _assert_result_parity(out, ref_out, extra_keys=()):
    np.testing.assert_allclose(
        np.asarray(out["logits"]), ref_out["logits"].numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["probabilities"]),
        ref_out["probabilities"].numpy(),
        rtol=1e-4,
        atol=1e-5,
    )
    for k in extra_keys:
        np.testing.assert_allclose(
            np.asarray(out[k]).reshape(-1),
            ref_out[k].numpy().reshape(-1),
            rtol=1e-4,
            atol=1e-5,
            err_msg=k,
        )


# ---------------------------------------------------------------------------
# PS3
# ---------------------------------------------------------------------------


def test_ps3_parity():
    from models.ps3 import PS3 as RefPS3

    config = _base_config("ps3")
    torch.manual_seed(10)
    ref = RefPS3(config)
    ref.eval()
    data, label = _torch_inputs(seed=11)
    with torch.no_grad():
        ref(data, label)  # materialise lazy transfer layers

    cfg = ModelConfig.from_dict({**config, "channel_input_dims": {"clinical=val": TAB}})
    mine = ModelFactory.create_model(cfg, seed=0)
    transplant_clam_mlp_base(ref, mine)
    _set_ln(mine.token_norm, ref.token_norm)
    _set_linear(mine.qkv_proj, ref.qkv_proj)
    for ch in mine.modality_order:
        _set_linear(mine.modality_mlps[ch], ref.modality_mlp_layers[ch])
    _set_linear(mine.fusion_fc_a, ref.modality_fusion_layer[0])
    _set_linear(mine.fusion_fc_b, ref.modality_fusion_layer[3])

    data, label = _torch_inputs(seed=12)
    with torch.no_grad():
        ref_out = ref(data, label)
        ref_loss = ref.loss_fn(ref_out["logits"], label, ref_out)
    out = mine(_jax_case(data), jnp.asarray(1), train=False)
    _assert_result_parity(out, ref_out, extra_keys=["wsi=features_clam_loss"])
    my_loss = mine.loss_fn(out["logits"], jnp.asarray([1]), out)
    np.testing.assert_allclose(float(my_loss), float(ref_loss), rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# FBP
# ---------------------------------------------------------------------------


def test_fbp_parity():
    from models.fbp import FBP as RefFBP

    config = _base_config("fbp")
    torch.manual_seed(20)
    ref = RefFBP(config)
    ref.eval()
    data, label = _torch_inputs(seed=21)
    with torch.no_grad():
        ref(data, label)

    cfg = ModelConfig.from_dict({**config, "channel_input_dims": {"clinical=val": TAB}})
    mine = ModelFactory.create_model(cfg, seed=0)
    transplant_clam_mlp_base(ref, mine)
    mine.bilinear.weight[...] = _t2j(ref.modality_bilinear_fusion_layer.weight)
    mine.bilinear.bias[...] = _t2j(ref.modality_bilinear_fusion_layer.bias)
    mine.modality_moe.kernel[...] = _t2j(ref.modality_moe_fusion_layer.weight).T
    mine.moe.kernel[...] = _t2j(ref.moe_fusion_layer.weight).T
    _set_linear(mine.head, ref.fusion_prediction_layer)

    data, label = _torch_inputs(seed=22)
    with torch.no_grad():
        ref_out = ref(data, label)
    out = mine(_jax_case(data), jnp.asarray(1), train=False)
    _assert_result_parity(out, ref_out, extra_keys=["tma=features_clam_loss"])


# ---------------------------------------------------------------------------
# MDLM
# ---------------------------------------------------------------------------


def test_mdlm_parity():
    from models.mdlm import MDLM as RefMDLM

    config = _base_config("mdlm")
    torch.manual_seed(30)
    ref = RefMDLM(config)
    ref.eval()
    data, label = _torch_inputs(seed=31)
    with torch.no_grad():
        ref(data, label)  # materialises transfer + late_fusion_layer

    cfg = ModelConfig.from_dict({**config, "channel_input_dims": {"clinical=val": TAB}})
    mine = ModelFactory.create_model(cfg, seed=0)
    transplant_clam_mlp_base(ref, mine)
    for ch in ("wsi=features", "tma=features"):
        _set_linear(mine.prediction_heads[ch], ref.prediction_head_dict[ch])
    _set_linear(mine.late_fusion, ref.late_fusion_layer)

    data, label = _torch_inputs(seed=32)
    with torch.no_grad():
        ref_out = ref(data, label)
    out = mine(_jax_case(data), jnp.asarray(1), train=False)
    _assert_result_parity(out, ref_out)


# ---------------------------------------------------------------------------
# SVDPool
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("pooling", ["mean", "max", "sum"])
def test_svd_pool_parity(pooling):
    from models.svd_pool import SVDPool as RefPool

    config = _base_config(
        "svd_pool", pooling_strategy=pooling, tau1=0.1, tau2=0.1, lambda1=1.0
    )
    torch.manual_seed(40)
    ref = RefPool(config)
    ref.eval()
    data, label = _torch_inputs(seed=41)
    with torch.no_grad():
        ref.alignment_features = []
        ref(data, label)

    cfg = ModelConfig.from_dict({**config, "channel_input_dims": {"clinical=val": TAB}})
    mine = ModelFactory.create_model(cfg, seed=0)
    transplant_clam_mlp_base(ref, mine)
    for ch in mine.alignment_channels:
        for i, l in enumerate(ref.alignment_layers[ch]):
            _set_linear(mine.alignment_layers[ch].layers[i], l)
    _set_linear(mine.pool_head, ref.fusion_prediction)

    # forward + per-case loss parity
    ref.alignment_features = []
    stacks = []
    for seed in range(4):
        data, label = _torch_inputs(seed=50 + seed)
        with torch.no_grad():
            ref_out = ref(data, label)
            ref_loss = ref.loss_fn(ref_out["logits"], label, ref_out)
        out = mine(_jax_case(data), jnp.asarray(1), train=False)
        stacks.append(out["aligned_features_stack"])
        _assert_result_parity(out, ref_out)
        my_loss = mine.loss_fn(out["logits"], jnp.asarray([1]), out)
        np.testing.assert_allclose(float(my_loss), float(ref_loss), rtol=1e-4, atol=1e-5)

    # window-level SVD group loss parity
    with torch.no_grad():
        ref_group = ref.group_loss_fn({})
    my_group = mine.group_loss_fn({"aligned_features_stack": jnp.stack(stacks)})
    np.testing.assert_allclose(float(my_group), float(ref_group), rtol=1e-3, atol=1e-4)


# ---------------------------------------------------------------------------
# GateMIL / GateMILDetach (non-shared variants)
# ---------------------------------------------------------------------------


def _transplant_gate(ref, mine, channels):
    for ch in channels:
        _set_linear(mine.feature_weightors[ch].fc, ref.ChannelFeatureWeightor[ch][0])
        _set_linear(mine.tcp_classifiers[ch].fc1, ref.TCPClassifier[ch][0])
        _set_linear(mine.tcp_classifiers[ch].fc2, ref.TCPClassifier[ch][3])
        _set_linear(mine.tcp_classifiers[ch].fc3, ref.TCPClassifier[ch][6])
        _set_linear(mine.tcp_confidences[ch].fc1, ref.TCPConfidenceLayer[ch][0])
        _set_linear(mine.tcp_confidences[ch].fc2, ref.TCPConfidenceLayer[ch][1])
        _set_linear(mine.tcp_confidences[ch].fc3, ref.TCPConfidenceLayer[ch][2])
    _set_linear(mine.fusion_classifier.fc1, ref.classifiers[0])
    _set_linear(mine.fusion_classifier.fc2, ref.classifiers[3])
    _set_linear(mine.fusion_classifier.fc3, ref.classifiers[6])
    _set_linear(mine.fusion_classifier.fc4, ref.classifiers[9])


@pytest.mark.parametrize("variant", ["gate_mil", "gate_mil_detach"])
def test_gate_mil_parity(variant):
    mod = __import__(f"models.{variant}", fromlist=[""])
    RefGate = getattr(mod, "GateMIL" if variant == "gate_mil" else "GateMILDetach")

    channels = ["wsi=features", "tma=cd3=features"]
    config = {
        "n_classes": 2, "input_dim": D_IN, "model_size": "64*32",
        "dropout": 0.0, "device": "cpu",
        "channels_used_in_model": channels,
        "confidence_weight": 1.0, "feature_weight_weight": 1.0,
    }
    torch.manual_seed(60)
    ref = RefGate(config)
    ref.eval()

    cfg = ModelConfig.from_dict({**config, "model_type": variant})
    mine = ModelFactory.create_model(cfg, seed=0)
    _transplant_gate(ref, mine, channels)

    rng = np.random.default_rng(61)
    wsi = rng.standard_normal((1, 7, D_IN)).astype(np.float32)
    tma = rng.standard_normal((1, 4, D_IN)).astype(np.float32)
    label = torch.tensor([1])
    with torch.no_grad():
        ref_out = ref(
            {"wsi=features": torch.tensor(wsi), "tma=cd3=features": torch.tensor(tma)},
            label,
        )
        ref_loss = ref.loss_fn(ref_out["logits"], label, dict(ref_out))
    case = {
        "channels": {
            "wsi=features": jnp.asarray(wsi[0]),
            "tma=cd3=features": jnp.asarray(tma[0]),
        },
        "masks": {
            "wsi=features": jnp.ones(7, bool),
            "tma=cd3=features": jnp.ones(4, bool),
        },
    }
    out = mine(case, jnp.asarray(1), train=False)
    _assert_result_parity(
        out, ref_out,
        extra_keys=["feature_weight_loss", "confidence_logits_loss", "confidence_loss"],
    )
    my_loss = mine.loss_fn(out["logits"], jnp.asarray([1]), out)
    np.testing.assert_allclose(float(my_loss), float(ref_loss), rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# CLIP group loss (incl. the replicated anchor-self-pair quirk)
# ---------------------------------------------------------------------------


def test_clip_gate_parity():
    from models.clip_gate_random_clam import ClipGateRandomClam as RefClip

    config = _base_config(
        "clip_gate_random_clam",
        enable_svd=True, enable_dynamic_gate=True, enable_random_loss=False,
        enable_clip=True, clip_init_tau=0.07,
        tau1=0.1, tau2=0.1, lambda1=1.0, lambda2=0.0,
    )
    torch.manual_seed(70)
    ref = RefClip(config)
    ref.eval()
    data, label = _torch_inputs(seed=71)
    with torch.no_grad():
        ref.alignment_features = []
        ref(data, label)

    cfg = ModelConfig.from_dict({**config, "channel_input_dims": {"clinical=val": TAB}})
    mine = ModelFactory.create_model(cfg, seed=0)
    transplant_svd_gate(ref, mine)
    mine.clip_logit_scale[...] = _t2j(ref.clip_logit_scale)

    ref.alignment_features = []
    stacks = []
    for seed in range(5):
        data, label = _torch_inputs(seed=80 + seed)
        with torch.no_grad():
            ref_out = ref(data, label)
        out = mine(_jax_case(data), jnp.asarray(1), train=False)
        stacks.append(out["aligned_features_stack"])
        _assert_result_parity(out, ref_out)
    with torch.no_grad():
        ref_group = ref.group_loss_fn({})
    my_group = mine.group_loss_fn({"aligned_features_stack": jnp.stack(stacks)})
    # this only matches because we replicate the anchor-self-pair inclusion
    # and the divide-by-M (models/svd_gate.py group_loss_fn docstring)
    np.testing.assert_allclose(float(my_group), float(ref_group), rtol=1e-3, atol=1e-4)


# ---------------------------------------------------------------------------
# DeepSupervise heads
# ---------------------------------------------------------------------------


def test_deep_supervise_parity():
    from models.deep_supervise_svd_gate_random import (
        DeepSuperviseSVDGateRandomClam as RefDS,
    )

    config = _base_config(
        "deep_supervise_svd_gate_random",
        enable_svd=True, enable_dynamic_gate=True, enable_random_loss=False,
        tau1=0.1, tau2=0.1, lambda1=1.0, lambda2=0.0,
    )
    torch.manual_seed(90)
    ref = RefDS(config)
    ref.eval()
    data, label = _torch_inputs(seed=91)
    with torch.no_grad():
        ref.alignment_features = []
        ref(data, label)

    cfg = ModelConfig.from_dict({**config, "channel_input_dims": {"clinical=val": TAB}})
    mine = ModelFactory.create_model(cfg, seed=0)
    transplant_svd_gate(ref, mine)
    for ch in mine.ds_classifiers:
        if ch in ("wsi=features", "tma=features"):
            continue
        _set_linear(mine.ds_classifiers[ch].fc1, ref.Classifier[ch][0])
        _set_linear(mine.ds_classifiers[ch].fc2, ref.Classifier[ch][3])

    data, label = _torch_inputs(seed=92)
    with torch.no_grad():
        ref.alignment_features = []
        ref_out = ref(data, label)
    out = mine(_jax_case(data), jnp.asarray(1), train=False)
    _assert_result_parity(
        out, ref_out,
        extra_keys=["clinical=val_logits_loss", "clinical=val_logits"],
    )


# ---------------------------------------------------------------------------
# MFMF cross-attention block vs a torch replica of perceiver-io's layer
# ---------------------------------------------------------------------------


class TorchCrossAttentionLayer(torch.nn.Module):
    """Faithful torch replica of perceiver-io's CrossAttentionLayer
    (krasserm/perceiver-io modules.py): pre-norm MHA with residual, then
    pre-norm GELU MLP with residual.  The reference imports the installed
    package (mfmf.py:5); it is absent here, so parity is pinned against this
    replica of the same published architecture."""

    def __init__(self, dim, num_heads, widening):
        super().__init__()
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.q_norm = torch.nn.LayerNorm(dim)
        self.kv_norm = torch.nn.LayerNorm(dim)
        self.q_proj = torch.nn.Linear(dim, dim)
        self.k_proj = torch.nn.Linear(dim, dim)
        self.v_proj = torch.nn.Linear(dim, dim)
        self.o_proj = torch.nn.Linear(dim, dim)
        self.mlp_norm = torch.nn.LayerNorm(dim)
        self.mlp_fc1 = torch.nn.Linear(dim, widening * dim)
        self.mlp_fc2 = torch.nn.Linear(widening * dim, dim)

    def forward(self, q, kv):
        qn, kvn = self.q_norm(q), self.kv_norm(kv)
        H, hd = self.num_heads, self.head_dim
        Q = self.q_proj(qn).view(-1, H, hd)
        K = self.k_proj(kvn).view(-1, H, hd)
        V = self.v_proj(kvn).view(-1, H, hd)
        scores = torch.einsum("qhd,khd->hqk", Q, K) / (hd**0.5)
        attn = torch.softmax(scores, dim=-1)
        out = torch.einsum("hqk,khd->qhd", attn, V).reshape(q.shape[0], -1)
        x = q + self.o_proj(out)
        h = self.mlp_fc2(torch.nn.functional.gelu(self.mlp_fc1(self.mlp_norm(x))))
        return x + h


def test_mfmf_cross_attention_parity():
    from multimodal_fusion_tpu.models.mfmf import CrossAttentionLayer

    dim, heads, widening = 32, 4, 2
    torch.manual_seed(100)
    ref = TorchCrossAttentionLayer(dim, heads, widening)
    ref.eval()
    mine = CrossAttentionLayer(dim, heads, widening, 0.0, nnx.Rngs(0))
    _set_ln(mine.q_norm, ref.q_norm)
    _set_ln(mine.kv_norm, ref.kv_norm)
    _set_ln(mine.mlp_norm, ref.mlp_norm)
    for name in ("q_proj", "k_proj", "v_proj"):
        _set_linear(getattr(mine, name), getattr(ref, name))
    _set_linear(mine.out_proj, ref.o_proj)
    _set_linear(mine.mlp_fc1, ref.mlp_fc1)
    _set_linear(mine.mlp_fc2, ref.mlp_fc2)

    rng = np.random.default_rng(101)
    q = rng.standard_normal((5, dim)).astype(np.float32)
    kv = rng.standard_normal((9, dim)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(q), torch.tensor(kv)).numpy()
    got = np.asarray(mine(jnp.asarray(q), jnp.asarray(kv), train=False))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    # masked kv rows must be equivalent to physically removing them
    kv_pad = np.concatenate([kv, 55.0 * np.ones((3, dim), np.float32)])
    mask = np.arange(12) < 9
    got_masked = np.asarray(
        mine(jnp.asarray(q), jnp.asarray(kv_pad), jnp.asarray(mask), train=False)
    )
    np.testing.assert_allclose(got_masked, want, rtol=1e-4, atol=1e-5)


def test_subtyping_inst_loss_divisor_parity(tmp_path):
    """ClamMLP-family subtyping divides total_inst_loss by the NUMBER OF BAG
    CHANNELS (reference clam_mlp.py:315-316), not by the per-branch
    classifier count (review finding: ours was 2x the reference)."""
    from models.clam_mlp import ClamMLP as RefModel

    from multimodal_fusion_tpu.config import ModelConfig
    from multimodal_fusion_tpu.models.factory import ModelFactory

    cfg = _base_config("clam_mlp", subtyping=True)
    torch.manual_seed(0)
    ref = RefModel(cfg)
    ref.eval()
    data, label = _torch_inputs()
    with torch.no_grad():
        ref(data, label)  # lazy layers
    mcfg = ModelConfig.from_dict({**cfg, "channel_input_dims": {"clinical=val": TAB}})
    mine = ModelFactory.create_model(mcfg, seed=0)
    transplant_clam_mlp_base(ref, mine)
    _set_linear(mine.fusion_fc1, ref.fusion_prediction[0])
    _set_linear(mine.fusion_fc2, ref.fusion_prediction[1])
    with torch.no_grad():
        ref_out = ref(data, label)
    out = mine(_jax_case(data), jnp.asarray(1), train=False)
    for ch in ("wsi=features", "tma=features"):
        np.testing.assert_allclose(
            np.asarray(out[f"{ch}_total_inst_loss"]),
            ref_out[f"{ch}_total_inst_loss"].numpy(),
            rtol=1e-4, atol=1e-5, err_msg=ch,
        )


def test_milfc_multiclass_selection_parity():
    """MILFC n_classes=3: the reference's WORKING multiclass branch selects
    the global-max (instance, class) pair and predicts the CLASS
    (mil.py:105-110); the binary top-instance rule is wrong there."""
    from models.mil import MIL_fc as RefModel

    from multimodal_fusion_tpu.config import ModelConfig
    from multimodal_fusion_tpu.models.factory import ModelFactory

    cfg = _base_config("mil")
    cfg["n_classes"] = 3
    cfg["channels_used_in_model"] = ["wsi=features"]
    torch.manual_seed(1)
    ref = RefModel(cfg)
    ref.eval()
    rng = np.random.default_rng(4)
    x = rng.standard_normal((1, 12, D_IN)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref({"wsi=features": torch.tensor(x)}, torch.tensor([1]))

    mine = ModelFactory.create_model(ModelConfig.from_dict(cfg), seed=0)
    _set_linear(mine.fc, ref.fc[0])
    _set_linear(mine.classifier, ref.classifier)
    case = {"channels": {"wsi=features": jnp.asarray(x[0])},
            "masks": {"wsi=features": jnp.ones(12, bool)}}
    out = mine(case, jnp.asarray(1), train=False)
    np.testing.assert_allclose(
        np.asarray(out["logits"]), ref_out["logits"].numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["probabilities"]), ref_out["probabilities"].numpy(),
        rtol=1e-4, atol=1e-5,
    )
    assert int(np.asarray(out["predictions"]).reshape(())) == int(
        ref_out["predictions"].view(-1)[0]
    )


def test_deep_supervise_detach_gradient_flow():
    """Reference DS-detach (deep_supervise_svd_gate_random_detach.py:58-61):
    the deep-supervise head trains the LIVE tabular transfer layer; only
    downstream consumers see detached tabular features.  Review finding: we
    had it exactly backwards (head detached, downstream live)."""
    import jax

    from multimodal_fusion_tpu.config import ModelConfig
    from multimodal_fusion_tpu.models.factory import ModelFactory
    from flax import nnx

    cfg = ModelConfig.from_dict({
        **_base_config("deep_supervise_svd_gate_random_detach"),
        "channel_input_dims": {"clinical=val": TAB},
        "enable_svd": False, "enable_dynamic_gate": False,
        "enable_random_loss": False,
    })
    model = ModelFactory.create_model(cfg, seed=0)
    graphdef, params, rest = nnx.split(model, nnx.Param, ...)
    data, _ = _torch_inputs()
    case = _jax_case(data)

    def loss_of(key_name):
        def f(params):
            m = nnx.merge(graphdef, params, rest)
            res = m(case, jnp.asarray(1), train=False)
            return jnp.sum(res[key_name])
        return jax.grad(f)

    def transfer_grad_norm(grads):
        leaf = grads["transfer_layers"]["clinical=val"]["kernel"][...]
        return float(jnp.abs(leaf).sum())

    # DS head loss MUST reach the tabular transfer layer...
    g_ds = loss_of("clinical=val_logits_loss")(params)
    assert transfer_grad_norm(g_ds) > 0
    # ...while the downstream fusion logits must NOT (detached after head)
    g_fusion = loss_of("logits")(params)
    assert transfer_grad_norm(g_fusion) == 0.0


def test_drop_prob_unsupported_raises(tmp_path):
    """Requesting drop_prob on a NON-detach model must fail loudly (the
    reference's forward has no such parameter -> TypeError); a silent no-op
    faked perfect robustness sweeps (review finding)."""
    import pytest as _pytest

    from multimodal_fusion_tpu.config import Configs, ExperimentConfig, ModelConfig
    from multimodal_fusion_tpu.data.splits import FoldSplit
    from multimodal_fusion_tpu.train.survival import SurvivalTrainer

    mc = ModelConfig.from_dict({
        **_base_config("svd_gate_random_clam"),
        "channel_input_dims": {"clinical=val": TAB},
        "enable_svd": False, "enable_dynamic_gate": False,
        "enable_random_loss": False,
    })
    ec = ExperimentConfig(exp_name="dp", seed=0, k_folds=2, max_epochs=1,
                          batch_size=2, lr=1e-3)
    tr = SurvivalTrainer(Configs(experiment_config=ec, model_config=mc), tmp_path)
    model, graphdef, _, _ = tr._build_model(0)
    assert tr._supports_drop_prob is False
    with _pytest.raises(ValueError, match="does not support inference-time"):
        tr._make_eval_step(model, graphdef, drop_prob=0.3)
    # detach variant supports it
    mc2 = ModelConfig.from_dict({**mc.to_dict(),
                                 "model_type": "svd_gate_random_clam_detach"})
    tr2 = SurvivalTrainer(Configs(experiment_config=ec, model_config=mc2), tmp_path)
    model2, graphdef2, _, _ = tr2._build_model(0)
    assert tr2._supports_drop_prob is True
    tr2._make_eval_step(model2, graphdef2, drop_prob=0.3)
