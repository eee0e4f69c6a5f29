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
# own subdir: the suite (CPU) must not share cache files with concurrent
# TPU-process runs; atomic writes (utils/jaxcache) make the dir safe for the
# suite's OWN subprocess-spawning tests (multihost gang, dryrun) — a cache
# entry read mid-write segfaulted the suite once
from multimodal_fusion_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache(Path(__file__).resolve().parents[1] / ".jax_cache" / "cpu")

import numpy as np
import pytest

# Files that compile trainer/mesh-sized XLA programs, largest first.  They
# run FIRST: XLA:CPU has segfaulted repeatedly when compiling (or
# (de)serializing) these big scanned executables deep into an aged
# full-suite process — never in a young one (test_alignment_trained_parity
# has always run first alphabetically and never crashed; the same programs
# compile fine standalone).  Ordering the heavy compiles into the young
# process sidesteps the upstream bug deterministically; the compile-cache
# guard (utils/jaxcache.guard_cpu_compile_cache) independently covers the
# (de)serialization crashes.  Within each file, test order is unchanged.
_HEAVY_COMPILE_FILES = [
    "test_trained_parity.py",      # scanned survival train step (crash site x2)
    "test_trainers.py",            # scanned alignment/VAE steps (crash site x3)
    "test_vae_trained_parity.py",
    "test_alignment_trained_parity.py",
    "test_parallel.py",            # mesh-sharded trainer programs
    "test_full_pipeline.py",
    "test_experiment_matrix.py",   # smoke-trains every model family
    "test_torch_import.py",
    "test_cli_and_utils.py",       # in-process CLI smoke trainings
]


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: trainer-scale compiles (auto-applied to the heavy-compile "
        "files); deselect with -m 'not slow' for the fast tier",
    )


def pytest_collection_modifyitems(config, items):
    rank = {name: i for i, name in enumerate(_HEAVY_COMPILE_FILES)}
    items.sort(key=lambda it: rank.get(Path(it.fspath).name, len(rank)))
    # fast tier: `python -m pytest tests/ -m "not slow" -q` runs every
    # kernel/op/model/io/schema test in well under 10 minutes; the slow
    # marker lands exactly on the trainer-scale compile files above
    slow = pytest.mark.slow
    heavy = set(_HEAVY_COMPILE_FILES)
    for it in items:
        if Path(it.fspath).name in heavy:
            it.add_marker(slow)


# Periodic executable cleanup between heavy files: the XLA:CPU segfaults
# (CLAUDE.md round-3 notes) all hit compiles/deserializations deep inside an
# AGED process holding many live trainer-sized executables; dropping them at
# file boundaries keeps the process young.  Only fires between the heavy
# files — clearing between every file would recompile shared small kernels
# hundreds of times.
_last_file = [None]


def pytest_runtest_setup(item):
    f = Path(item.fspath).name
    prev = _last_file[0]
    if prev is not None and f != prev and prev in set(_HEAVY_COMPILE_FILES):
        jax.clear_caches()
    _last_file[0] = f


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
