"""Experiment-matrix smoke tests (VERDICT r1 item 7).

Every entry of experiments/matrix.py must parse against the real CLI parser;
one representative per family trains end-to-end for 1 epoch on fixtures.
"""

import importlib.util
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]

spec = importlib.util.spec_from_file_location("exp_matrix", REPO / "experiments" / "matrix.py")
matrix = importlib.util.module_from_spec(spec)
spec.loader.exec_module(matrix)

from multimodal_fusion_tpu.channels import parse_channels  # noqa: E402
from multimodal_fusion_tpu.cli.main_survival import build_parser  # noqa: E402
from multimodal_fusion_tpu.models.factory import MODEL_REGISTRY  # noqa: E402


def test_matrix_covers_reference_families():
    fams = {n.split("/")[0] for n in matrix.ENTRIES}
    assert fams == {"0.clam", "1.deep_supervise", "2.related_works", "3.additional_exp"}
    assert len(matrix.ENTRIES) >= 60


def test_every_entry_parses_and_resolves():
    parser = build_parser()
    for name, e in matrix.ENTRIES.items():
        argv = matrix.build_argv(
            name, "d.csv", "root", "results",
            dataset_split_path="split.json" if e.get("needs_split_path") else None,
        )
        args = parser.parse_args(argv)
        assert args.model_type in MODEL_REGISTRY, name
        assert parse_channels([c.lower() for c in args.target_channels]), name


# one representative per family/mechanism
SMOKE = [
    "0.clam/clam/tma_wsi_clam",
    "0.clam/clam_mlp/all_clam_mlp",
    "0.clam/svd_gate_random_clam/combined_svd_gate_random_clam",
    "0.clam/clip_gate_random_clam_detach/clip_random_clam_detach",
    "1.deep_supervise/random/ds_svd_random",
    "2.related_works/mfmf_config1",
    "3.additional_exp/svd_pool_max",
]


@pytest.fixture(scope="module")
def smoke_dataset(tmp_path_factory):
    from multimodal_fusion_tpu.io.fixtures import make_synthetic_dataset

    root = tmp_path_factory.mktemp("exp_matrix")
    csv_path = make_synthetic_dataset(
        root, n_patients=8, seed=11, min_wsi_patches=8, max_wsi_patches=12,
        feature_dim=16, n_tma_patches=2, with_reconstructed=True,
    )
    return root, csv_path


@pytest.mark.parametrize("name", SMOKE)
def test_family_representative_smoke_runs(name, smoke_dataset, tmp_path):
    from multimodal_fusion_tpu.cli.main_survival import main

    root, csv_path = smoke_dataset
    overrides = {
        "max_epochs": "1", "k": "2", "batch_size": "4", "input_dim": "16",
        "model_size": "16*8", "output_dim": "16", "inst_number": "2",
        "dropout": "0.0",
    }
    argv = matrix.build_argv(name, csv_path, root, tmp_path / "res", overrides=overrides)
    argv = [str(a) for a in argv]
    log_dir = main(argv)
    assert (log_dir / "summary.csv").exists(), name
    lines = (log_dir / "summary.csv").read_text().strip().split("\n")
    assert len(lines) == 3  # header + 2 folds


def test_generated_scripts_in_sync(tmp_path):
    """The checked-in .sh files must match what the matrix generates."""
    matrix.generate_scripts(tmp_path)
    for name in matrix.ENTRIES:
        ours = (REPO / "experiments" / f"{name}.sh").read_text()
        fresh = (tmp_path / f"{name}.sh").read_text()
        assert ours == fresh, f"{name}.sh is stale — re-run python experiments/matrix.py"


def test_driver_scripts_in_sync(tmp_path):
    """cmd.sh / mfmf_for_loop.sh / run_sequential.sh drivers match the
    matrix, reference every generated script that exists, and parse."""
    import subprocess

    written = matrix.generate_driver_scripts(tmp_path)
    assert len(written) == 4
    for p in written:
        rel = p.relative_to(tmp_path)
        ours = (REPO / "experiments" / rel).read_text()
        assert ours == p.read_text(), f"{rel} is stale — re-run experiments/matrix.py"
        subprocess.run(["bash", "-n", str(p)], check=True)
        # every script a driver invokes must exist next to it
        for line in ours.splitlines():
            if "bash " in line and ".sh" in line and "$CFG" not in line:
                target = line.split("bash ")[1].split(".sh")[0].strip('"') + ".sh"
                assert (REPO / "experiments" / rel.parent / target).exists(), target


def test_alignment_sweep_smoke(tmp_path):
    """One alignment ablation entry trains for a few steps on NPZ fixtures."""
    from multimodal_fusion_tpu.cli.run_alignment import main as align_main
    from multimodal_fusion_tpu.io.fixtures import make_alignment_npz_fixtures

    markers = ["cd3", "cd8"]
    make_alignment_npz_fixtures(
        tmp_path, n_cores=10, patches_per_core=2, feature_dim=16, markers=markers
    )
    argv = matrix.build_alignment_argv(
        "ablation_tau1", value="0.2",
        overrides={"max_steps": "3", "batch_size": "4", "val_interval": "2"},
    )
    argv += [
        "--base_dir", str(tmp_path), "--filename_template", "{marker}.npz",
        "--markers", *markers, "--feature_dim", "16",
        "--save_path", str(tmp_path / "m.npz"),
    ]
    out = align_main([str(a) for a in argv])
    assert (tmp_path / "m.npz").exists() or out is not None


def test_alignment_scripts_in_sync(tmp_path):
    matrix.generate_alignment_scripts(tmp_path)
    for name in list(matrix.ALIGNMENT_SWEEPS) + ["run_all_ablations"]:
        ours = (REPO / "experiments" / "alignment" / f"{name}.sh").read_text()
        fresh = (tmp_path / "alignment" / f"{name}.sh").read_text()
        assert ours == fresh, f"alignment/{name}.sh is stale"


def test_alignment_entries_parse():
    """Every alignment sweep entry must satisfy the real run_alignment
    parser (caught the generated exp_svd script passing loss_type=svd,
    which the CLI rejects)."""
    from multimodal_fusion_tpu.cli.run_alignment import build_parser

    parser = build_parser()
    for name, sweep in matrix.ALIGNMENT_SWEEPS.items():
        values = sweep.get("values") or [None]
        for v in values:
            argv = matrix.build_alignment_argv(name, value=v)
            argv += ["--base_dir", "x", "--save_path", "m.npz"]
            parser.parse_args([str(a) for a in argv])
