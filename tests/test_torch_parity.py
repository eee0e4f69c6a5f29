"""Numerical parity against the actual torch reference implementation.

Weight-transplant tests: initialise the reference torch model, copy its
weights into our JAX model, run both on identical inputs in eval mode and
compare outputs.  This pins the math (attention, transfer, TCP gate,
alignment stack, fusion, losses) to the reference bit-for-bit up to f32
rounding.

The reference tree is imported read-only from /root/reference (no code is
copied); tests skip cleanly if torch or the reference is unavailable.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference")
torch = pytest.importorskip("torch")
if not REF.exists():  # pragma: no cover
    pytest.skip("reference tree unavailable", allow_module_level=True)

sys.path.insert(0, str(REF / "downstream_survival"))

# The reference's models/__init__ imports optional deps we don't ship
# (libauc, torch_geometric, perceiver); stub just enough to import the
# modules under test.
import types


def _stub(name, attrs):
    parts = name.split(".")
    for i in range(1, len(parts) + 1):
        mod_name = ".".join(parts[:i])
        if mod_name not in sys.modules:
            sys.modules[mod_name] = types.ModuleType(mod_name)
    mod = sys.modules[name]
    for a, v in attrs.items():
        setattr(mod, a, v)


class _Dummy:
    def __init__(self, *a, **k):
        pass

    def __call__(self, *a, **k):
        raise RuntimeError("stub")


_stub("libauc", {})
_stub("libauc.losses", {"AUCMLoss": _Dummy})
_stub("torch_geometric", {})
_stub("torch_geometric.nn", {"HypergraphConv": _Dummy, "GlobalAttention": _Dummy})
_stub("perceiver", {})
_stub("perceiver.model", {})
_stub("perceiver.model.core", {})
_stub("perceiver.model.core.modules", {"CrossAttentionLayer": _Dummy})

import jax
import jax.numpy as jnp
from flax import nnx

from multimodal_fusion_tpu.config import ModelConfig
from multimodal_fusion_tpu.models.factory import ModelFactory

D_IN = 48
D_OUT = 40
TAB = 12


def _t2j(x):
    return jnp.asarray(x.detach().cpu().numpy())


def _set_linear(nnx_linear, torch_linear):
    nnx_linear.kernel[...] = _t2j(torch_linear.weight).T
    nnx_linear.bias[...] = _t2j(torch_linear.bias)


@pytest.fixture(scope="module")
def ref_svd_model():
    from models.svd_gate_random_clam import SVDGateRandomClam as RefModel

    config = {
        "model_type": "svd_gate_random_clam",
        "n_classes": 2,
        "input_dim": D_IN,
        "model_size": "32*16",
        "dropout": 0.0,
        "output_dim": D_OUT,
        "channels_used_in_model": [
            "wsi=features",
            "tma=cd3=features",
            "clinical=val",
            "clinical=mask",
        ],
        "device": "cpu",
        "enable_svd": True,
        "enable_dynamic_gate": True,
        "enable_random_loss": False,
        "tau1": 0.1,
        "tau2": 0.1,
        "lambda1": 1.0,
        "lambda2": 0.0,
        "base_weight": 0.7,
        "inst_number": 3,
    }
    torch.manual_seed(0)
    model = RefModel(config)
    model.eval()
    return model, config


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
    label = torch.tensor([1])
    return data, label


def _jax_case_from_torch(data):
    channels = {k: jnp.asarray(v.numpy()[0]) for k, v in data.items()}
    masks = {
        "wsi=features": jnp.ones(channels["wsi=features"].shape[0], bool),
        "tma=cd3=features": jnp.ones(channels["tma=cd3=features"].shape[0], bool),
    }
    return {"channels": channels, "masks": masks}


def transplant_svd_gate(ref, mine):
    """Copy every reference weight into the nnx model."""
    for ch in ("wsi=features", "tma=features"):
        branch = mine.clam_branches[ch]
        seq = ref.attention_net[ch]
        _set_linear(branch.core.fc, seq[0])
        attn = seq[3]
        _set_linear(branch.core.attn.fc_a, attn.attention_a[0])
        _set_linear(branch.core.attn.fc_b, attn.attention_b[0])
        _set_linear(branch.core.attn.fc_c, attn.attention_c)
        _set_linear(branch.transfer, ref.transfer_layer[ch])
        _set_linear(branch.classifier, ref.classifiers[ch])
        _set_linear(branch.instance_classifiers[0], ref.instance_classifiers[ch][0])
    for ch, layer in ref.transfer_layer.items():
        if ch in ("wsi=features", "tma=features"):
            continue
        _set_linear(mine.transfer_layers[ch], layer)
    _set_linear(mine.fusion_fc1, ref.fusion_prediction[0])
    _set_linear(mine.fusion_fc2, ref.fusion_prediction[1])
    for ch in mine.used_modality:
        _set_linear(mine.tcp_classifiers[ch].fc1, ref.TCPClassifier[ch][0])
        _set_linear(mine.tcp_classifiers[ch].fc2, ref.TCPClassifier[ch][3])
        _set_linear(mine.tcp_confidence[ch].fc1, ref.TCPConfidenceLayer[ch][0])
        _set_linear(mine.tcp_confidence[ch].fc2, ref.TCPConfidenceLayer[ch][1])
        _set_linear(mine.tcp_confidence[ch].fc3, ref.TCPConfidenceLayer[ch][2])
        for i, l in enumerate(ref.alignment_layers[ch]):
            _set_linear(mine.alignment_layers[ch].layers[i], l)


@pytest.fixture(scope="module")
def paired_models(ref_svd_model):
    ref, config = ref_svd_model
    data, label = _torch_inputs()
    with torch.no_grad():
        ref_out = ref(data, label)  # materialises lazy transfer layers
    cfg = ModelConfig.from_dict({**config, "channel_input_dims": {"clinical=val": TAB}})
    mine = ModelFactory.create_model(cfg, seed=0)
    transplant_svd_gate(ref, mine)
    return ref, mine


def test_forward_parity(paired_models):
    ref, mine = paired_models
    data, label = _torch_inputs(seed=3)
    with torch.no_grad():
        ref_out = ref(data, label)
    case = _jax_case_from_torch(data)
    out = mine(case, jnp.asarray(1), train=False)

    np.testing.assert_allclose(
        np.asarray(out["logits"]), ref_out["logits"].numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["probabilities"]), ref_out["probabilities"].numpy(), rtol=1e-4, atol=1e-5
    )
    for ch in ("wsi=features", "tma=features"):
        np.testing.assert_allclose(
            np.asarray(out[f"{ch}_clam_loss"]),
            ref_out[f"{ch}_clam_loss"].numpy(),
            rtol=1e-4, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(out[f"{ch}_attention_weights"]),
            ref_out[f"{ch}_attention_weights"].numpy(),
            rtol=1e-4, atol=1e-4,
        )
    np.testing.assert_allclose(
        np.asarray(out["gated_gated_logits_loss"]),
        ref_out["gated_gated_logits_loss"].numpy(),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out["gated_gated_confidence_loss"]),
        ref_out["gated_gated_confidence_loss"].numpy(),
        rtol=1e-4, atol=1e-5,
    )


def test_loss_fn_parity(paired_models):
    ref, mine = paired_models
    data, label = _torch_inputs(seed=4)
    with torch.no_grad():
        ref_out = ref(data, label)
        ref_loss = ref.loss_fn(ref_out["logits"], label, ref_out)
    case = _jax_case_from_torch(data)
    out = mine(case, jnp.asarray(1), train=False)
    my_loss = mine.loss_fn(out["logits"], jnp.asarray([1]), out)
    np.testing.assert_allclose(float(my_loss), float(ref_loss), rtol=1e-4, atol=1e-5)


def test_group_loss_parity(ref_svd_model, paired_models):
    ref, mine = paired_models
    # accumulate a window of 5 cases through both models
    ref.alignment_features = []
    stacks = []
    for seed in range(5):
        data, label = _torch_inputs(seed=seed)
        with torch.no_grad():
            ref(data, label)
        case = _jax_case_from_torch(data)
        out = mine(case, jnp.asarray(1), train=False)
        stacks.append(out["aligned_features_stack"])
    ref_result = {}
    with torch.no_grad():
        ref_group = ref.group_loss_fn(ref_result)
    window = {"aligned_features_stack": jnp.stack(stacks)}
    my_group = mine.group_loss_fn(window)
    np.testing.assert_allclose(float(my_group), float(ref_group), rtol=1e-3, atol=1e-4)


def test_rank1_loss_matches_torch_impl():
    """rank1 SVD loss vs the torch linalg formulation on shared inputs."""
    from multimodal_fusion_tpu.ops.losses import rank1_svd_loss

    rng = np.random.default_rng(7)
    feats = np.abs(rng.standard_normal((6, 32, 3))).astype(np.float32) + 0.1

    # torch transcription (svd_gate_random_clam.py:107-157)
    tf = torch.tensor(feats)
    eps = 1e-8
    norm = torch.norm(tf, p=2, dim=1, keepdim=True)
    tfn = tf / (norm + eps)
    U, S, _ = torch.linalg.svd(tfn)
    loss1 = torch.nn.functional.cross_entropy(S / 0.1, torch.zeros(S.shape[0]).long())
    U1 = U[:, :, 0]
    loss2 = torch.nn.functional.cross_entropy((U1 @ U1.T) / 0.1, torch.arange(6))
    want = float(loss1 + 1.0 * loss2)

    got, _ = rank1_svd_loss(jnp.asarray(feats), 0.1, 0.1, 1.0)
    np.testing.assert_allclose(float(got), want, rtol=1e-3, atol=1e-4)


def test_vae_parity():
    """VAE encoder/decoder weight-transplant parity (deterministic path)."""
    sys.path.insert(0, str(REF))
    from vae.models import Encoder as RefEnc, Decoder as RefDec

    torch.manual_seed(1)
    renc = RefEnc(24, [16, 8], 4)
    rdec = RefDec(4, [8, 16], 24)

    from multimodal_fusion_tpu.models.vae import VAE

    mine = VAE(input_dim=24, encoder_hidden=[16, 8], decoder_hidden=[8, 16],
               latent_dim=4, rngs=nnx.Rngs(0))
    # encoder: Sequential [Linear, GELU, Dropout, Linear, GELU]
    tls = [m for m in renc.encoder if isinstance(m, torch.nn.Linear)]
    for i, tl in enumerate(tls):
        _set_linear(mine.encoder.layers[i], tl)
    _set_linear(mine.encoder.fc_mean, renc.fc_mean)
    _set_linear(mine.encoder.fc_log_var, renc.fc_log_var)
    dls = [m for m in rdec.decoder if isinstance(m, torch.nn.Linear)]
    for i, tl in enumerate(dls[:-1]):
        _set_linear(mine.decoder.layers[i], tl)
    _set_linear(mine.decoder.out, dls[-1])

    renc.eval(), rdec.eval()
    x = np.random.default_rng(2).standard_normal((5, 24)).astype(np.float32)
    with torch.no_grad():
        t_mean, t_logvar = renc(torch.tensor(x))
        t_recon = rdec(t_mean)
    j_mean, j_logvar = mine.encoder(jnp.asarray(x), train=False)
    j_recon = mine.decoder(j_mean, train=False)
    np.testing.assert_allclose(np.asarray(j_mean), t_mean.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(j_logvar), t_logvar.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(j_recon), t_recon.numpy(), rtol=1e-4, atol=1e-5)


def test_clam_standalone_parity():
    """Standalone CLAM weight-transplant parity incl. instance loss."""
    from models.clam import CLAM as RefCLAM

    # NOTE: the reference validator lists "32*32" instead of "32*16"
    # (clam.py:140 typo), so use 64*32 here.
    config = {
        "n_classes": 2,
        "input_dim": D_IN,
        "model_size": "64*32",
        "dropout": 0.0,
        "device": "cpu",
        "base_weight": 0.7,
        "inst_number": 3,
        "channels_used_in_model": ["wsi=features"],
    }
    torch.manual_seed(2)
    ref = RefCLAM(config)
    ref.eval()

    cfg = ModelConfig.from_dict({**config, "model_type": "clam"})
    mine = ModelFactory.create_model(cfg, seed=0)
    seq = ref.attention_net
    _set_linear(mine.core.fc, seq[0])
    _set_linear(mine.core.attn.fc_a, seq[3].attention_a[0])
    _set_linear(mine.core.attn.fc_b, seq[3].attention_b[0])
    _set_linear(mine.core.attn.fc_c, seq[3].attention_c)
    _set_linear(mine.classifier, ref.classifiers)
    for i in range(2):
        _set_linear(mine.instance_classifiers[i], ref.instance_classifiers[i])

    rng = np.random.default_rng(5)
    x = rng.standard_normal((1, 9, D_IN)).astype(np.float32)
    label = torch.tensor([0])
    with torch.no_grad():
        ref_out = ref({"wsi=features": torch.tensor(x)}, label)
        ref_loss = ref.loss_fn(ref_out["logits"], label, ref_out)
    case = {
        "channels": {"wsi=features": jnp.asarray(x[0])},
        "masks": {"wsi=features": jnp.ones(9, bool)},
    }
    out = mine(case, jnp.asarray(0), train=False)
    np.testing.assert_allclose(
        np.asarray(out["logits"]), ref_out["logits"].numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        float(out["total_inst_loss"]), float(ref_out["total_inst_loss"]), rtol=1e-4, atol=1e-5
    )
    my_loss = mine.loss_fn(out["logits"], jnp.asarray([0]), out)
    np.testing.assert_allclose(float(my_loss), float(ref_loss), rtol=1e-4, atol=1e-5)


def test_gate_shared_mil_parity():
    """GateSharedMIL weight-transplant parity: degenerate sample-softmax
    (sum pooling), shared modules, loss semantics."""
    from models.gate_shared_mil import GateSharedMIL as RefGate

    config = {
        "n_classes": 2, "input_dim": D_IN, "model_size": "64*32",
        "dropout": 0.0, "device": "cpu",
        "channels_used_in_model": ["wsi=features", "tma=cd3=features"],
        "confidence_weight": 1.0, "feature_weight_weight": 1.0,
    }
    torch.manual_seed(3)
    ref = RefGate(config)
    ref.eval()

    cfg = ModelConfig.from_dict({**config, "model_type": "gate_shared_mil"})
    mine = ModelFactory.create_model(cfg, seed=0)
    mk = "__shared__"
    _set_linear(mine.feature_weightors[mk].fc, ref.ChannelFeatureWeightor[0])
    _set_linear(mine.tcp_classifiers[mk].fc1, ref.TCPClassifier[0])
    _set_linear(mine.tcp_classifiers[mk].fc2, ref.TCPClassifier[3])
    _set_linear(mine.tcp_classifiers[mk].fc3, ref.TCPClassifier[6])
    _set_linear(mine.tcp_confidences[mk].fc1, ref.TCPConfidenceLayer[0])
    _set_linear(mine.tcp_confidences[mk].fc2, ref.TCPConfidenceLayer[1])
    _set_linear(mine.tcp_confidences[mk].fc3, ref.TCPConfidenceLayer[2])
    _set_linear(mine.fusion_classifier.fc1, ref.classifiers[0])
    _set_linear(mine.fusion_classifier.fc2, ref.classifiers[3])
    _set_linear(mine.fusion_classifier.fc3, ref.classifiers[6])
    _set_linear(mine.fusion_classifier.fc4, ref.classifiers[9])

    rng = np.random.default_rng(8)
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
    np.testing.assert_allclose(
        np.asarray(out["logits"]), ref_out["logits"].numpy(), rtol=1e-4, atol=1e-4
    )
    for k in ("feature_weight_loss", "confidence_logits_loss", "confidence_loss"):
        np.testing.assert_allclose(
            float(out[k]), float(ref_out[k]), rtol=1e-4, atol=1e-5
        )
    my_loss = mine.loss_fn(out["logits"], jnp.asarray([1]), out)
    np.testing.assert_allclose(float(my_loss), float(ref_loss), rtol=1e-4, atol=1e-5)
