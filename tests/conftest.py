"""Test harness configuration.

Forces an 8-device virtual CPU mesh so sharding/collective paths are tested
without TPU hardware (the JAX-native 'fake backend'; see SURVEY.md §4).
Must run before jax initializes.
"""

import os

# Force CPU: the machine environment pins JAX_PLATFORMS=axon (TPU tunnel),
# so a plain setdefault is not enough, and the axon plugin also overrides the
# env var at import — the jax.config update below is the authoritative switch.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

# Persistent compilation cache: kmeans/model jits dominate suite wall-clock.
import jax

jax.config.update("jax_platforms", "cpu")
_cache_dir = Path(__file__).resolve().parents[1] / ".jax_cache"
_cache_dir.mkdir(exist_ok=True)
jax.config.update("jax_compilation_cache_dir", str(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def synthetic_dataset(tmp_path_factory):
    """Small synthetic survival dataset shared across tests."""
    from multimodal_fusion_tpu.io.fixtures import make_synthetic_dataset

    root = tmp_path_factory.mktemp("data")
    csv_path = make_synthetic_dataset(
        root, n_patients=8, seed=0, min_wsi_patches=24, max_wsi_patches=48,
        feature_dim=64,
    )
    return root, csv_path
