"""Import trained reference (torch) checkpoints into this framework's models.

Migration path for users of the reference: their trained artifacts —
survival fold checkpoints (raw ``state_dict`` saved by
``downstream_survival/trainer.py:566-578``), VAE checkpoints
(``vae/train.py:255-300``, dict with ``model_state_dict`` and possible
torch.compile ``_orig_mod.`` prefixes) and alignment checkpoints
(``alignment/trainer.py:366-375``) — load directly into the nnx model zoo,
with NO torch model code required: only the flat state_dict key layout is
consumed.  The mappings are the same correspondences pinned by the
weight-transplant parity suites (tests/test_torch_parity.py,
test_zoo_parity.py), so an imported model's forward matches the reference
within f32 rounding.

Mechanics: torch ``nn.Sequential``/``ModuleDict`` naming is positional
(e.g. ``TCPClassifier.<ch>.0.weight`` … ``.3.weight`` with activations at
the unlisted indices), so each container maps by pairing its index-sorted
Linear entries with our module's Linears in order — robust to the
reference's varying activation/dropout placement.  Torch ``Linear.weight``
is ``[out, in]``; nnx kernels are ``[in, out]`` (transposed on copy).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Sequence

import numpy as np

__all__ = [
    "load_torch_state_dict",
    "import_survival_checkpoint",
    "import_vae_checkpoint",
    "import_alignment_checkpoint",
]


def load_torch_state_dict(path_or_sd) -> Dict[str, np.ndarray]:
    """Load a reference checkpoint into {key: np.ndarray}.

    Accepts a path (``torch.load`` on CPU; requires torch) or an
    already-loaded mapping (tensors or arrays).  Unwraps the VAE/alignment
    trainers' ``model_state_dict`` nesting and strips torch.compile
    ``_orig_mod.`` prefixes (reference generate_reconstructed_wsi.py:134-144).
    """
    if isinstance(path_or_sd, (str, Path)):
        import torch

        obj = torch.load(path_or_sd, map_location="cpu", weights_only=True)
    else:
        obj = path_or_sd
    if isinstance(obj, dict) and "model_state_dict" in obj:
        obj = obj["model_state_dict"]
    out = {}
    for k, v in obj.items():
        if k.startswith("_orig_mod."):
            k = k[len("_orig_mod."):]
        out[k] = np.asarray(getattr(v, "numpy", lambda: v)())
    return out


class _Importer:
    """Tracks which state_dict keys were consumed; hard-fails on absent keys
    so silent partial imports cannot happen."""

    def __init__(self, sd: Dict[str, np.ndarray]):
        self.sd = sd
        self.used: set = set()

    def take(self, key: str) -> np.ndarray:
        if key not in self.sd:
            raise KeyError(
                f"checkpoint is missing '{key}' — wrong model_type/config "
                "for this checkpoint?"
            )
        self.used.add(key)
        return self.sd[key]

    def linear(self, dst, prefix: str):
        """Copy ``<prefix>.weight/.bias`` into an nnx Linear."""
        w = self.take(f"{prefix}.weight")
        dst.kernel[...] = w.T
        if f"{prefix}.bias" in self.sd:
            dst.bias[...] = self.take(f"{prefix}.bias")

    def seq(self, dsts: Sequence, prefix: str):
        """Pair a torch Sequential's index-sorted Linear entries with our
        Linears positionally (activations/dropout occupy the gap indices)."""
        idxs = sorted(
            int(k[len(prefix) + 1:].split(".")[0])
            for k in self.sd
            if k.startswith(prefix + ".") and k.endswith(".weight")
            and k[len(prefix) + 1:].split(".")[0].isdigit()
            and k.count(".", len(prefix) + 1) == 1
        )
        if len(idxs) != len(dsts):
            raise KeyError(
                f"'{prefix}' has {len(idxs)} Linear entries, model expects "
                f"{len(dsts)}"
            )
        for dst, i in zip(dsts, idxs):
            self.linear(dst, f"{prefix}.{i}")

    def leftover(self) -> List[str]:
        return sorted(k for k in self.sd if k not in self.used)


# --------------------------------------------------------------------------
# survival zoo


def _import_clam_core(imp: _Importer, core, prefix: str):
    """Reference Sequential(Linear, ReLU, Dropout, Attn_Net_Gated) at
    ``prefix`` -> our ClamAttentionCore (clam.py)."""
    imp.linear(core.fc, f"{prefix}.0")
    if any(k.startswith(f"{prefix}.3.attention_a") for k in imp.sd):
        imp.seq([core.attn.fc_a], f"{prefix}.3.attention_a")
        imp.seq([core.attn.fc_b], f"{prefix}.3.attention_b")
        imp.linear(core.attn.fc_c, f"{prefix}.3.attention_c")
    else:  # non-gated Attn_Net: Sequential(Linear, Tanh, [Dropout,] Linear)
        imp.seq([core.attn.fc1, core.attn.fc2], f"{prefix}.3.module")


def _import_clam(imp: _Importer, model):
    _import_clam_core(imp, model.core, "attention_net")
    imp.linear(model.classifier, "classifiers")
    for i, ic in enumerate(model.instance_classifiers):
        imp.linear(ic, f"instance_classifiers.{i}")


def _import_mil(imp: _Importer, model):
    imp.linear(model.fc, "fc.0")
    imp.linear(model.classifier, "classifier")


def _import_clam_mlp(imp: _Importer, model, fusion: bool = True,
                     tabular_transfer: bool = True):
    """``fusion=False`` for subclasses whose torch counterpart REPLACES the
    inherited 2-layer ``fusion_prediction`` (svd_pool.py:45);
    ``tabular_transfer=False`` for MDLM, whose reference forward consumes
    tabular channels RAW (mdlm.py:44) so those lazy layers never exist in
    its checkpoints (ours stay at init — dead on both sides)."""
    for ch, branch in model.clam_branches.items():
        _import_clam_core(imp, branch.core, f"attention_net.{ch}")
        imp.linear(branch.transfer, f"transfer_layer.{ch}")
        imp.linear(branch.classifier, f"classifiers.{ch}")
        for i, ic in enumerate(branch.instance_classifiers):
            imp.linear(ic, f"instance_classifiers.{ch}.{i}")
    if tabular_transfer:
        for ch, layer in model.transfer_layers.items():
            imp.linear(layer, f"transfer_layer.{ch}")
    if fusion:
        imp.linear(model.fusion_fc1, "fusion_prediction.0")
        imp.linear(model.fusion_fc2, "fusion_prediction.1")


def _import_svd_gate(imp: _Importer, model):
    _import_clam_mlp(imp, model)
    if getattr(model, "enable_dynamic_gate", False):
        for ch, cls in model.tcp_classifiers.items():
            imp.seq([cls.fc1, cls.fc2], f"TCPClassifier.{ch}")
        for ch, conf in model.tcp_confidence.items():
            imp.seq([conf.fc1, conf.fc2, conf.fc3], f"TCPConfidenceLayer.{ch}")
    if getattr(model, "enable_svd", False):
        for ch, stack in model.alignment_layers.items():
            imp.seq(list(stack.layers), f"alignment_layers.{ch}")
    if hasattr(model, "clip_logit_scale") and "clip_logit_scale" in imp.sd:
        model.clip_logit_scale[...] = imp.take("clip_logit_scale")
    if hasattr(model, "ds_classifiers"):
        for ch, cls in model.ds_classifiers.items():
            imp.seq([cls.fc1, cls.fc2], f"Classifier.{ch}")


def _import_gate_mil(imp: _Importer, model):
    # Note: the reference's SampleAtt weights are DEAD parameters (its
    # Softmax(dim=1) over a [N, 1] tensor is constantly 1 — the degenerate
    # quirk documented in models/gate_mil.py), so its keys legitimately
    # remain in leftover().
    shared = model.shared
    for ch, fw in model.feature_weightors.items():
        sfx = "" if shared else f".{ch}"
        imp.seq([fw.fc], f"ChannelFeatureWeightor{sfx}")
    for ch, cls in model.tcp_classifiers.items():
        sfx = "" if shared else f".{ch}"
        imp.seq([cls.fc1, cls.fc2, cls.fc3], f"TCPClassifier{sfx}")
    for ch, conf in model.tcp_confidences.items():
        sfx = "" if shared else f".{ch}"
        imp.seq([conf.fc1, conf.fc2, conf.fc3], f"TCPConfidenceLayer{sfx}")
    fc = model.fusion_classifier
    imp.seq([fc.fc1, fc.fc2, fc.fc3, fc.fc4], "classifiers")


def _import_ps3(imp: _Importer, model):
    _import_clam_mlp(imp, model)
    model.token_norm.scale[...] = imp.take("token_norm.weight")
    model.token_norm.bias[...] = imp.take("token_norm.bias")
    imp.linear(model.qkv_proj, "qkv_proj")
    for ch, layer in model.modality_mlps.items():
        imp.linear(layer, f"modality_mlp_layers.{ch}")
    imp.seq([model.fusion_fc_a, model.fusion_fc_b], "modality_fusion_layer")


def _import_fbp(imp: _Importer, model):
    _import_clam_mlp(imp, model)
    # nn.Bilinear weight [out, in1, in2] — same layout as our Bilinear
    model.bilinear.weight[...] = imp.take("modality_bilinear_fusion_layer.weight")
    model.bilinear.bias[...] = imp.take("modality_bilinear_fusion_layer.bias")
    imp.linear(model.modality_moe, "modality_moe_fusion_layer")  # bias-free
    imp.linear(model.moe, "moe_fusion_layer")
    imp.linear(model.head, "fusion_prediction_layer")


def _import_mdlm(imp: _Importer, model):
    _import_clam_mlp(imp, model, tabular_transfer=False)
    for ch, head in model.prediction_heads.items():
        imp.linear(head, f"prediction_head_dict.{ch}")
    # lazily-created in the reference; present once the model has run
    imp.linear(model.late_fusion, "late_fusion_layer")


def _import_svd_pool(imp: _Importer, model):
    _import_clam_mlp(imp, model, fusion=False)
    for ch, stack in model.alignment_layers.items():
        imp.seq(list(stack.layers), f"alignment_layers.{ch}")
    imp.linear(model.pool_head, "fusion_prediction")


def import_survival_checkpoint(model, checkpoint) -> List[str]:
    """Copy a reference ``s_<fold>_checkpoint.pt`` into an nnx survival
    model built with the matching config.  Dispatches on the model class;
    returns the list of unconsumed checkpoint keys (always empty for exact
    config matches, except documented loss-function internals).

    ``auc_clam``/``gate_auc_mil``: libauc keeps its AUCM a/b/alpha inside
    the LOSS object, not the model state_dict (the reference never
    checkpoints them), so our ``auc_a/auc_b/auc_alpha`` stay at init."""
    from multimodal_fusion_tpu.models.clam import CLAM, MILFC
    from multimodal_fusion_tpu.models.clam_mlp import ClamMLP
    from multimodal_fusion_tpu.models.gate_mil import GateSharedMIL
    from multimodal_fusion_tpu.models.svd_gate import SVDGateRandomClam

    from multimodal_fusion_tpu.models.fbp import FBP
    from multimodal_fusion_tpu.models.pool_fusion import MDLM, SVDPool
    from multimodal_fusion_tpu.models.ps3 import PS3

    imp = _Importer(load_torch_state_dict(checkpoint))
    if isinstance(model, SVDGateRandomClam):
        _import_svd_gate(imp, model)
    elif isinstance(model, PS3):
        _import_ps3(imp, model)
    elif isinstance(model, FBP):
        _import_fbp(imp, model)
    elif isinstance(model, MDLM):
        _import_mdlm(imp, model)
    elif isinstance(model, SVDPool):
        _import_svd_pool(imp, model)
    elif isinstance(model, ClamMLP):
        _import_clam_mlp(imp, model)
    elif isinstance(model, CLAM):  # covers AUCCLAM
        _import_clam(imp, model)
    elif isinstance(model, MILFC):
        _import_mil(imp, model)
    elif isinstance(model, GateSharedMIL):  # covers gate_mil/_detach/auc
        _import_gate_mil(imp, model)
    else:
        raise NotImplementedError(
            f"torch-checkpoint import not implemented for {type(model).__name__}"
        )
    return imp.leftover()


# --------------------------------------------------------------------------
# VAE + alignment


def import_vae_checkpoint(vae, checkpoint) -> List[str]:
    """Reference ``vae/train.py`` checkpoint -> our models/vae.py VAE."""
    imp = _Importer(load_torch_state_dict(checkpoint))
    imp.seq(list(vae.encoder.layers), "encoder.encoder")
    imp.linear(vae.encoder.fc_mean, "encoder.fc_mean")
    imp.linear(vae.encoder.fc_log_var, "encoder.fc_log_var")
    imp.seq(list(vae.decoder.layers) + [vae.decoder.out], "decoder.decoder")
    return imp.leftover()


def import_alignment_checkpoint(model, checkpoint) -> List[str]:
    """Reference ``alignment/trainer.py`` checkpoint -> our
    MultiModalAlignmentModel (+ MLP match predictor when present)."""
    imp = _Importer(load_torch_state_dict(checkpoint))
    for name, stack in model.alignment_layers.items():
        imp.seq(list(stack), f"alignment_layers.{name}")
    if hasattr(model, "mlp_predictor") and any(
        k.startswith("mlp_predictor.") for k in imp.sd
    ):
        imp.seq(
            [model.mlp_predictor.fc1, model.mlp_predictor.fc2], "mlp_predictor.mlp"
        )
    return imp.leftover()


def convert_alignment_checkpoint(src_path, dst_path):
    """Convert a reference torch alignment checkpoint to our npz format,
    deriving modalities/depth/dim from the state_dict keys; returns the
    written path."""
    import re

    from flax import nnx

    from multimodal_fusion_tpu.models.alignment import MultiModalAlignmentModel
    from multimodal_fusion_tpu.train.checkpoint import save_model

    sd = load_torch_state_dict(src_path)
    pat = re.compile(r"alignment_layers\.([^.]+)\.(\d+)\.weight$")
    mods, depth, dim = set(), 0, None
    for k, v in sd.items():
        m = pat.match(k)
        if m:
            mods.add(m.group(1))
            depth = max(depth, int(m.group(2)) + 1)
            dim = int(v.shape[0])
    if not mods:
        raise ValueError(f"{src_path} has no alignment_layers keys")
    model = MultiModalAlignmentModel(
        sorted(mods), feature_dim=dim, num_layers=depth, rngs=nnx.Rngs(0)
    )
    import_alignment_checkpoint(model, sd)
    return save_model(dst_path, model)
