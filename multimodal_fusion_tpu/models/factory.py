"""Model factory.

Registry parity with the reference's 20 keys
(``downstream_survival/models/model_factory.py:39-92``), plus
``cust_omics`` which the reference implements but forgets to register
(SURVEY.md §2.4) — registered here as a first-class model.
"""

from __future__ import annotations

from typing import Dict, Type

from flax import nnx

from multimodal_fusion_tpu.config import ModelConfig
from multimodal_fusion_tpu.models.auc_clam import AUCCLAM
from multimodal_fusion_tpu.models.base import BaseModel
from multimodal_fusion_tpu.models.clam import CLAM, MILFC
from multimodal_fusion_tpu.models.clam_mlp import ClamMLP, ClamMLPDetach
from multimodal_fusion_tpu.models.cox import CoxSVDGateClam
from multimodal_fusion_tpu.models.extras import SVDCLAM, UniversalConnections
from multimodal_fusion_tpu.models.fbp import FBP
from multimodal_fusion_tpu.models.gate_mil import (
    GateAUCMIL,
    GateMIL,
    GateMILDetach,
    GateSharedMIL,
)
from multimodal_fusion_tpu.models.hypergraph_fusion import CustOmics
from multimodal_fusion_tpu.models.mfmf import MFMF
from multimodal_fusion_tpu.models.pool_fusion import MDLM, SVDPool
from multimodal_fusion_tpu.models.ps3 import PS3
from multimodal_fusion_tpu.models.svd_gate import (
    ClipGateRandomClam,
    ClipGateRandomClamDetach,
    DeepSuperviseSVDGateRandomClam,
    DeepSuperviseSVDGateRandomClamDetach,
    SVDGateRandomClam,
    SVDGateRandomClamDetach,
)

MODEL_REGISTRY: Dict[str, Type[BaseModel]] = {
    "mil": MILFC,
    "clam": CLAM,
    "auc_clam": AUCCLAM,
    "clam_mlp": ClamMLP,
    "clam_mlp_detach": ClamMLPDetach,
    "svd_gate_random_clam": SVDGateRandomClam,
    "svd_gate_random_clam_detach": SVDGateRandomClamDetach,
    "clip_gate_random_clam": ClipGateRandomClam,
    "clip_gate_random_clam_detach": ClipGateRandomClamDetach,
    "deep_supervise_svd_gate_random": DeepSuperviseSVDGateRandomClam,
    "deep_supervise_svd_gate_random_detach": DeepSuperviseSVDGateRandomClamDetach,
    "gate_shared_mil": GateSharedMIL,
    "gate_mil": GateMIL,
    "gate_auc_mil": GateAUCMIL,
    "gate_mil_detach": GateMILDetach,
    "svd_pool": SVDPool,
    "mdlm": MDLM,
    "ps3": PS3,
    "fbp": FBP,
    "mfmf": MFMF,
    "cust_omics": CustOmics,
    # dead-code paths in the reference, repaired and registered here
    "svd_clam": SVDCLAM,
    "auto_connections": UniversalConnections,
    # survival-native extension (BASELINE north star: Cox risk scores)
    "cox_svd_gate_random_clam": CoxSVDGateClam,
}


class ModelFactory:
    @staticmethod
    def create_model(config, seed: int = 0) -> BaseModel:
        """Build a model from a ModelConfig (or raw dict)."""
        if isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        model_type = config.model_type
        if model_type not in MODEL_REGISTRY:
            raise ValueError(
                f"Unknown model type {model_type!r}; available: {sorted(MODEL_REGISTRY)}"
            )
        return MODEL_REGISTRY[model_type](config, nnx.Rngs(seed))

    @staticmethod
    def available_models():
        return sorted(MODEL_REGISTRY)



def create_model(config, seed: int = 0) -> BaseModel:
    """Package-level convenience export (multimodal_fusion_tpu.models
    re-exports it); delegates to :meth:`ModelFactory.create_model`."""
    return ModelFactory.create_model(config, seed)
