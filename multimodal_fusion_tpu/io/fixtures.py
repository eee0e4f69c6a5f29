"""Synthetic fixture generator.

The reference ships no data, so both the test suite and the benchmark build
their own datasets with the exact on-disk layout (CSV + per-patient HDF5 +
per-marker NPZ; see ``h5io`` docstring and reference
``downstream_survival/dataset_csv/survival_dataset.csv:1-3``,
``alignment/alignment_dataset.py:57``).
"""

from __future__ import annotations

import csv
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np

from multimodal_fusion_tpu.channels import TMA_MARKERS
from multimodal_fusion_tpu.io.h5io import write_channel

TABULAR_DIMS = {
    "clinical": 16,
    "pathological": 12,
    "blood": 24,
    "icd": 10,
    "tma_cell_density": 8,
}


def make_patient_h5(
    path: Path,
    rng: np.random.Generator,
    n_wsi_patches: int,
    n_tma_patches: int = 4,
    feature_dim: int = 1024,
    markers: Sequence[str] = TMA_MARKERS,
    tabular_dims: Optional[Dict[str, int]] = None,
    with_reconstructed: bool = False,
) -> None:
    tabular_dims = tabular_dims or TABULAR_DIMS
    feats = rng.standard_normal((n_wsi_patches, feature_dim)).astype(np.float32)
    pos = (rng.integers(0, 50_000, size=(n_wsi_patches, 2))).astype(np.float32)
    write_channel(path, "wsi=features", feats)
    write_channel(path, "wsi=positions", pos)
    if with_reconstructed:
        write_channel(path, "wsi=reconstructed_features", feats + 0.01)
    for mk in markers:
        mfeats = rng.standard_normal((n_tma_patches, feature_dim)).astype(np.float32)
        write_channel(path, f"tma={mk}=features", mfeats)
    for grp, dim in tabular_dims.items():
        val = rng.standard_normal((1, dim)).astype(np.float32)
        mask = (rng.random((1, dim)) > 0.1).astype(np.float32)
        write_channel(path, f"{grp}=val", val)
        write_channel(path, f"{grp}=ori_val", val * 2.0)
        write_channel(path, f"{grp}=mask", mask)


def make_synthetic_dataset(
    root: str | Path,
    n_patients: int = 8,
    seed: int = 0,
    min_wsi_patches: int = 32,
    max_wsi_patches: int = 96,
    n_tma_patches: int = 4,
    feature_dim: int = 1024,
    markers: Sequence[str] = TMA_MARKERS,
    labels: Sequence[str] = ("living", "deceased"),
    with_reconstructed: bool = False,
) -> Path:
    """Create a synthetic survival dataset under ``root``.

    Returns the path to the dataset CSV (columns: patient_id, case_id, label,
    h5_file_path — matching the reference CSV contract).
    """
    root = Path(root)
    (root / "h5").mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    rows: List[Dict[str, str]] = []
    for i in range(n_patients):
        case_id = f"patient_{i:03d}"
        h5_rel = f"h5/{case_id}.h5"
        n_patches = int(rng.integers(min_wsi_patches, max_wsi_patches + 1))
        make_patient_h5(
            root / h5_rel,
            rng,
            n_wsi_patches=n_patches,
            n_tma_patches=n_tma_patches,
            feature_dim=feature_dim,
            markers=markers,
            with_reconstructed=with_reconstructed,
        )
        rows.append(
            {
                "patient_id": str(i + 1),
                "case_id": case_id,
                "label": labels[i % len(labels)],
                "h5_file_path": h5_rel,
            }
        )
    csv_path = root / "dataset.csv"
    with open(csv_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["patient_id", "case_id", "label", "h5_file_path"])
        w.writeheader()
        w.writerows(rows)
    return csv_path


def make_alignment_npz_fixtures(
    root: str | Path,
    n_cores: int = 6,
    patches_per_core: int = 3,
    feature_dim: int = 1024,
    markers: Sequence[str] = TMA_MARKERS,
    seed: int = 0,
) -> Dict[str, Path]:
    """Create per-marker NPZ files with aligned keys.

    Key format matches the reference regex
    ``_block(\\d+)_x(\\d+)_y(\\d+)_patient(\\w+)$``
    (reference: alignment/alignment_dataset.py:57).  Each NPZ entry is a
    ``[patches_per_core, feature_dim]`` array keyed by
    ``<marker>_block<b>_x<x>_y<y>_patient<pid>``.
    """
    root = Path(root)
    root.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    cores = [
        (int(rng.integers(1, 4)), int(rng.integers(0, 20)), int(rng.integers(0, 20)), f"{i:03d}")
        for i in range(n_cores)
    ]
    paths: Dict[str, Path] = {}
    for mk in markers:
        data = {}
        for (b, x, y, pid) in cores:
            key = f"{mk}_block{b}_x{x}_y{y}_patient{pid}"
            data[key] = rng.standard_normal((patches_per_core, feature_dim)).astype(np.float32)
        p = root / f"{mk}.npz"
        np.savez_compressed(p, **data)
        paths[mk] = p
    return paths
