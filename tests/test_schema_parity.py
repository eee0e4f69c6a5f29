"""On-disk schema parity: the reference pipeline and ours must write
interchangeable HDF5 layouts (same dataset paths, shapes, dtypes)."""

import sys
from pathlib import Path

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")
REF = Path("/root/reference")
if not REF.exists():
    pytest.skip("reference unavailable", allow_module_level=True)


def _make_fixture(path, n=60, t=8, d=16, seed=0):
    rng = np.random.default_rng(seed)
    with h5py.File(path, "w") as f:
        f["wsi/features"] = rng.standard_normal((n, d)).astype(np.float32)
        f["wsi/positions"] = rng.integers(0, 1000, (n, 2)).astype(np.float32)
        f["tma/features"] = rng.standard_normal((t, d)).astype(np.float32)


def _h5_tree(path):
    out = {}
    with h5py.File(path, "r") as f:
        def visit(name, obj):
            if isinstance(obj, h5py.Dataset):
                out[name] = (obj.shape, obj.dtype.kind)
        f.visititems(visit)
    return out


def test_hypergraph_h5_schema_matches_reference(tmp_path):
    pytest.importorskip("torch")
    sys.path.insert(0, str(REF))
    from build_hypergraph.preprocess_hypergraph import (
        process_single_file as ref_process,
    )

    from multimodal_fusion_tpu.hypergraph.build import process_single_file

    ref_file = tmp_path / "ref.h5"
    our_file = tmp_path / "ours.h5"
    _make_fixture(ref_file)
    _make_fixture(our_file)

    try:
        ref_process(str(ref_file), 6, 3, 2, 3)
    except TypeError:
        pass  # reference's stats-JSON np.int64 bug fires after datasets write
    process_single_file(our_file, 6, 3, 2, 3)

    ref_tree = _h5_tree(ref_file)
    our_tree = _h5_tree(our_file)

    # identical dataset paths
    assert set(ref_tree) == set(our_tree), (
        set(ref_tree) ^ set(our_tree)
    )
    # identical shapes and dtype kinds except edge count E (clustering is
    # structurally- not bitwise-matched; see ops/kmeans.py docstring)
    for name in ref_tree:
        r_shape, r_kind = ref_tree[name]
        o_shape, o_kind = our_tree[name]
        assert r_kind == o_kind, f"{name}: dtype kind {r_kind} vs {o_kind}"
        if name in ("hypergraph/edge_index", "hypergraph/edge_weights"):
            assert len(r_shape) == len(o_shape)
            if name == "hypergraph/edge_index":
                assert r_shape[0] == o_shape[0] == 2
        else:
            assert r_shape == o_shape, f"{name}: {r_shape} vs {o_shape}"

    # our file is readable by our own dataset layer via hypergraph channels
    from multimodal_fusion_tpu.data.multimodal import MultimodalDataset
    import csv

    with open(tmp_path / "ds.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["patient_id", "case_id", "label", "h5_file_path"])
        w.writeheader()
        w.writerow({"patient_id": 1, "case_id": "c", "label": "living", "h5_file_path": "ours.h5"})
    ds = MultimodalDataset(
        tmp_path / "ds.csv", tmp_path,
        channels=["hypergraph=wsi_super_features", "hypergraph=tma_features",
                  "hypergraph=edge_index", "hypergraph=edge_weights"],
    )
    raw, _ = ds.get_case("c")
    assert raw["hypergraph=wsi_super_features"].shape == (6, 16)
    assert raw["hypergraph=edge_index"].shape[0] == 2

    # and the REFERENCE-written file is also readable by our dataset layer
    with open(tmp_path / "ds2.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["patient_id", "case_id", "label", "h5_file_path"])
        w.writeheader()
        w.writerow({"patient_id": 1, "case_id": "r", "label": "living", "h5_file_path": "ref.h5"})
    ds2 = MultimodalDataset(
        tmp_path / "ds2.csv", tmp_path,
        channels=["hypergraph=wsi_super_features", "hypergraph=edge_index"],
    )
    raw2, _ = ds2.get_case("r")
    assert raw2["hypergraph=wsi_super_features"].shape == (6, 16)
