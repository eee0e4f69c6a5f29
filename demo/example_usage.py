"""Demo: fusion forward pass on toy embeddings.

Parity target #1 in BASELINE.json (reference: ``demo/example_usage.py:17-186``):
build ``svd_gate_random_clam`` and ``deep_supervise_svd_gate_random`` from the
factory, run a forward pass on random [4, 1024]-style mock modalities, print
result shapes.  Runs on any backend (CPU included).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

# BASELINE.json pins this parity config to CPU ("fusion forward pass on toy
# embeddings (CPU)"); also keeps the demo independent of TPU availability.
try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass
import jax.numpy as jnp
import numpy as np

from multimodal_fusion_tpu.config import ModelConfig
from multimodal_fusion_tpu.models.factory import ModelFactory

FEATURE_DIM = 1024
N_INSTANCES = 4


def create_mock_case(seed: int = 0):
    """Mock multimodal case: wsi/tma bags of [4, 1024] + tabular vectors."""
    rng = np.random.default_rng(seed)
    channels = {
        "wsi=features": jnp.asarray(rng.standard_normal((N_INSTANCES, FEATURE_DIM)), jnp.float32),
        "tma=cd3=features": jnp.asarray(rng.standard_normal((N_INSTANCES, FEATURE_DIM)), jnp.float32),
        "tma=cd8=features": jnp.asarray(rng.standard_normal((N_INSTANCES, FEATURE_DIM)), jnp.float32),
        "clinical=val": jnp.asarray(rng.standard_normal((1, 16)), jnp.float32),
        "clinical=mask": jnp.ones((1, 16), jnp.float32),
    }
    masks = {
        "wsi=features": jnp.ones(N_INSTANCES, bool),
        "tma=cd3=features": jnp.ones(N_INSTANCES, bool),
        "tma=cd8=features": jnp.ones(N_INSTANCES, bool),
    }
    return {"channels": channels, "masks": masks}


def make_config(model_type: str) -> ModelConfig:
    return ModelConfig(
        model_type=model_type,
        n_classes=2,
        input_dim=FEATURE_DIM,
        model_size="64*32",
        dropout=0.25,
        output_dim=128,
        channels_used_in_model=[
            "wsi=features",
            "tma=cd3=features",
            "tma=cd8=features",
            "clinical=val",
            "clinical=mask",
        ],
        channel_input_dims={"clinical=val": 16},
        enable_svd=True,
        enable_dynamic_gate=True,
        enable_random_loss=True,
    )


def demonstrate(model_type: str) -> None:
    print(f"\n=== {model_type} ===")
    cfg = make_config(model_type)
    model = ModelFactory.create_model(cfg, seed=0)
    case = create_mock_case()
    label = jnp.asarray(1)

    result = model(case, label, train=False)
    print(f"logits:        {result['logits'].shape}")
    print(f"probabilities: {result['probabilities'].shape} -> {np.asarray(result['probabilities'])[0]}")
    print(f"predictions:   {result['predictions'].shape} -> {int(result['predictions'][0])}")
    loss = model.loss_fn(result["logits"], label[None], result)
    print(f"loss:          {float(loss):.4f}")
    aux = [k for k in result if k.endswith("_loss")]
    if aux:
        print(f"aux losses:    {aux}")

    # training-mode pass exercises dropout / random modality dropping
    result_train = model(case, label, key=jax.random.key(0), train=True)
    loss_train = model.loss_fn(result_train["logits"], label[None], result_train)
    print(f"train loss:    {float(loss_train):.4f}")


if __name__ == "__main__":
    print(f"JAX backend: {jax.default_backend()} ({len(jax.devices())} device(s))")
    for model_type in ("svd_gate_random_clam", "deep_supervise_svd_gate_random"):
        try:
            demonstrate(model_type)
        except Exception as e:  # tolerant smoke script, like the reference
            print(f"{model_type} failed: {e}")
    print("\nDemo complete.")
