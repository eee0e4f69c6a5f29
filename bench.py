"""Benchmark: hypergraph build throughput (patches/sec) vs CPU torch reference.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The headline metric is the BASELINE.json north-star: hypergraph construction
throughput over cached patch-embedding matrices.  The baseline is the
reference implementation (torch/sklearn, CPU) run on identical synthetic
fixtures in-process; the candidate is this repo's JAX pipeline on the default
JAX backend (TPU when present).
"""

import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np


def _enable_compile_cache():
    import jax

    cache = Path(__file__).resolve().parent / ".jax_cache"
    cache.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

N_FILES = 4
N_PATCHES = 4096
N_TMA = 32
DIM = 1024
NUM_SUPER = 100
NUM_GROUPS = 10
K = 5
NUM_HYPEREDGES = 10


def make_fixtures(root: Path, n_files: int):
    import h5py

    rng = np.random.default_rng(0)
    paths = []
    for i in range(n_files):
        p = root / f"case_{i}.h5"
        with h5py.File(p, "w") as f:
            f["wsi/features"] = rng.standard_normal((N_PATCHES, DIM)).astype(np.float32)
            f["wsi/positions"] = rng.integers(0, 50000, (N_PATCHES, 2)).astype(np.float32)
            f["tma/features"] = rng.standard_normal((N_TMA, DIM)).astype(np.float32)
        paths.append(p)
    return paths


def run_ours(paths):
    from multimodal_fusion_tpu.hypergraph.build import process_single_file

    # warmup/compile on the first file
    process_single_file(paths[0], NUM_SUPER, NUM_GROUPS, K, NUM_HYPEREDGES)
    t0 = time.time()
    for p in paths[1:]:
        process_single_file(p, NUM_SUPER, NUM_GROUPS, K, NUM_HYPEREDGES)
    dt = time.time() - t0
    return (len(paths) - 1) * N_PATCHES / dt


def run_reference(paths):
    """Reference torch/sklearn pipeline on CPU over the same fixtures."""
    ref = Path("/root/reference")
    if not ref.exists():
        return None
    sys.path.insert(0, str(ref))
    try:
        from build_hypergraph.preprocess_hypergraph import process_single_file as ref_process
    except Exception:
        return None
    import contextlib
    import io

    t0 = time.time()
    n = 0
    for p in paths:
        with contextlib.redirect_stdout(io.StringIO()):
            try:
                ref_process(str(p), NUM_SUPER, NUM_GROUPS, K, NUM_HYPEREDGES)
            except TypeError:
                # the reference's own stats-JSON step rejects np.int64 under
                # modern numpy; all compute stages have already run by then
                pass
        n += N_PATCHES
    return n / (time.time() - t0)


def main():
    _enable_compile_cache()
    with tempfile.TemporaryDirectory() as td:
        root = Path(td)
        (root / "ours").mkdir(exist_ok=True)
        (root / "ref").mkdir(exist_ok=True)
        ours_paths = make_fixtures(root / "ours", N_FILES)
        ours_pps = run_ours(ours_paths)

        n_ref = int(os.environ.get("BENCH_REF_FILES", "1"))
        ref_paths = make_fixtures(root / "ref", n_ref)
        ref_pps = run_reference(ref_paths)

    vs = (ours_pps / ref_pps) if ref_pps else None
    print(
        json.dumps(
            {
                "metric": "hypergraph_build_patches_per_sec",
                "value": round(ours_pps, 1),
                "unit": "patches/s",
                "vs_baseline": round(vs, 2) if vs else None,
            }
        )
    )


if __name__ == "__main__":
    main()
