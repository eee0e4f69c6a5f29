from multimodal_fusion_tpu.models.base import BaseModel, process_case, derive_used_modalities  # noqa: F401
from multimodal_fusion_tpu.models.factory import ModelFactory, MODEL_REGISTRY, create_model  # noqa: F401
