"""Golden trained-model parity (VERDICT r1 item 2; BASELINE north star).

Trains the torch reference's flagship end-to-end through its own Trainer
(``downstream_survival/trainer.py:train_fold``) on tiny CPU fixtures, trains
our SurvivalTrainer on the SAME fold membership, and compares final test AUC.

RNG streams differ across frameworks (init, sampler order), so the fixture is
constructed strongly separable: both trained models must reach near-perfect
test AUC, pinning *trained* behavior — not just same-weights forwards — to
the 0.02 band BASELINE.md targets.
"""

import csv
import sys
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference")
torch = pytest.importorskip("torch")
if not REF.exists():  # pragma: no cover
    pytest.skip("reference tree unavailable", allow_module_level=True)

# installs sys.path + optional-dep stubs for the reference tree
import test_torch_parity  # noqa: F401, E402

# torchmetrics is absent; the reference trainer uses AUROC for its metrics,
# so the stub must COMPUTE real AUCs (sklearn) for this test to mean anything.
import types  # noqa: E402


class _AUROC:
    def __init__(self, task="binary", num_classes=None, average=None):
        self.task = task

    def to(self, device):
        return self

    def __call__(self, preds, target):
        from sklearn.metrics import roc_auc_score

        p = preds.detach().cpu().numpy()
        t = target.detach().cpu().numpy()
        if self.task == "binary":
            return torch.tensor(roc_auc_score(t, p))
        return torch.tensor(
            roc_auc_score(t, p, multi_class="ovr", average="macro")
        )


for _m in ("torchmetrics", "torchmetrics.classification"):
    if _m not in sys.modules:
        sys.modules[_m] = types.ModuleType(_m)
sys.modules["torchmetrics.classification"].AUROC = _AUROC

import jax.numpy as jnp  # noqa: E402  (ensures jax initialised on CPU via conftest)

from multimodal_fusion_tpu.config import Configs, ExperimentConfig, ModelConfig  # noqa: E402
from multimodal_fusion_tpu.data.multimodal import MultimodalDataset  # noqa: E402
from multimodal_fusion_tpu.data.splits import FoldSplit  # noqa: E402

D = 24
N_CASES = 32
CHANNELS = ["wsi=features", "tma=cd3=features"]


def _make_separable_dataset(root: Path) -> Path:
    """Class-1 bags shifted +1.2 per dim: linearly separable at bag level."""
    import h5py

    rng = np.random.default_rng(0)
    rows = []
    for i in range(N_CASES):
        label = i % 2
        shift = 1.2 if label == 1 else 0.0
        n_wsi = int(rng.integers(12, 20))
        p = root / f"case_{i}.h5"
        with h5py.File(p, "w") as f:
            f["wsi/features"] = (
                rng.standard_normal((n_wsi, D)) + shift
            ).astype(np.float32)
            f["wsi/positions"] = rng.uniform(0, 10, (n_wsi, 2)).astype(np.float32)
            f["tma/cd3/features"] = (
                rng.standard_normal((4, D)) + shift
            ).astype(np.float32)
        rows.append(
            {
                "patient_id": i + 1,
                "case_id": f"case_{i}",
                "label": "deceased" if label else "living",
                "h5_file_path": p.name,
            }
        )
    csv_path = root / "dataset.csv"
    with open(csv_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["patient_id", "case_id", "label", "h5_file_path"])
        w.writeheader()
        w.writerows(rows)
    return csv_path


MODEL_CONFIG = {
    "model_type": "svd_gate_random_clam",
    "n_classes": 2,
    "input_dim": D,
    "model_size": "16*8",
    "dropout": 0.25,
    "output_dim": 16,
    "channels_used_in_model": CHANNELS,
    "enable_svd": True,
    "enable_dynamic_gate": True,
    "enable_random_loss": False,
    "tau1": 0.1,
    "tau2": 0.1,
    "lambda1": 1.0,
    "lambda2": 0.0,
    "base_weight": 0.7,
    "inst_number": 3,
}
MAX_EPOCHS = 6
LR = 2e-3
BATCH = 4


def _train_reference(csv_path, root, results_dir, fold_split):
    from torch.utils.data import Subset

    from datasets.multimodal_dataset import MultimodalDataset as RefDataset
    from trainer import Trainer as RefTrainer

    ref_ds = RefDataset(
        csv_path=str(csv_path),
        data_root_dir=str(root),
        channels=CHANNELS,
        align_channels=None,
        alignment_model_path=None,
        device=torch.device("cpu"),
        print_info=False,
        preload_all=False,
    )
    configs = {
        "model_config": {**MODEL_CONFIG, "device": "cpu"},
        "experiment_config": {
            "results_dir": str(results_dir),
            "max_epochs": MAX_EPOCHS,
            "lr": LR,
            "reg": 0.0,
            "opt": "adam",
            "early_stopping": False,
            "batch_size": BATCH,
            "seed": 0,
            "verbose": False,
        },
    }
    torch.manual_seed(0)
    trainer = RefTrainer(configs=configs, log_dir=str(results_dir / "logs"))
    datasets = (
        Subset(ref_ds, list(fold_split["train"])),
        Subset(ref_ds, list(fold_split["val"])),
        Subset(ref_ds, list(fold_split["test"])),
    )
    _, test_auc, val_auc, test_acc, val_acc = trainer.train_fold(datasets, 0)
    return float(test_auc), ref_ds


def _train_ours(csv_path, root, results_dir, fold_split):
    from multimodal_fusion_tpu.train.survival import SurvivalTrainer

    ds = MultimodalDataset(csv_path, root, channels=CHANNELS)
    mc = ModelConfig.from_dict(MODEL_CONFIG)
    ec = ExperimentConfig(
        exp_name="golden", seed=0, k_folds=2, max_epochs=MAX_EPOCHS,
        batch_size=BATCH, lr=LR, patience=50, min_epochs=0,
        monitor_metric="auc", monitor_mode="max", weighted_sampling=True,
    )
    ec.extra["verbose"] = False
    trainer = SurvivalTrainer(Configs(experiment_config=ec, model_config=mc), results_dir)
    split = FoldSplit(
        np.asarray(fold_split["train"]),
        np.asarray(fold_split["val"]),
        np.asarray(fold_split["test"]),
    )
    summary = trainer.train_fold(ds, split, 0)
    return float(summary["test_auc"])


def test_trained_flagship_auc_parity(tmp_path):
    csv_path = _make_separable_dataset(tmp_path)

    # the REFERENCE's own splitter defines the fold membership for both sides
    from datasets.multimodal_dataset import MultimodalDataset as RefDataset
    from main import create_k_fold_splits as ref_splits

    ref_ds = RefDataset(
        csv_path=str(csv_path), data_root_dir=str(tmp_path), channels=CHANNELS,
        align_channels=None, alignment_model_path=None,
        device=torch.device("cpu"), print_info=False, preload_all=False,
    )
    fold = ref_splits(ref_ds, k=2, seed=0)[0]
    # our dataset must enumerate cases in the same CSV order for the indices
    # to mean the same cases
    ours_ds = MultimodalDataset(csv_path, tmp_path, channels=CHANNELS)
    assert list(ours_ds.case_ids) == list(ref_ds.case_ids)

    import contextlib
    import io

    with contextlib.redirect_stdout(io.StringIO()):
        ref_auc, _ = _train_reference(csv_path, tmp_path, tmp_path / "ref_out", fold)
    our_auc = _train_ours(csv_path, tmp_path, tmp_path / "our_out", fold)

    # both must LEARN (near-perfect on the separable task) and land in the
    # same band — trained parity, not just same-weights forward parity
    assert ref_auc >= 0.95, f"reference failed to learn: {ref_auc}"
    assert our_auc >= 0.95, f"ours failed to learn: {our_auc}"
    assert abs(ref_auc - our_auc) <= 0.02, (ref_auc, our_auc)


def test_cindex_parity_same_weights(tmp_path):
    """BASELINE north star: 'per-slide risk scores ... C-index parity within
    0.005'.  With transplanted weights the per-slide risk ordering must be
    IDENTICAL, so the C-index gap is exactly 0."""
    from test_torch_parity import (
        ref_svd_model as _fixture_unused,  # noqa: F401  (fixture import)
    )
    from test_torch_parity import _jax_case_from_torch, _torch_inputs, transplant_svd_gate

    from multimodal_fusion_tpu.models.factory import ModelFactory
    from multimodal_fusion_tpu.train.metrics import concordance_index

    from models.svd_gate_random_clam import SVDGateRandomClam as RefModel

    config = {
        "model_type": "svd_gate_random_clam", "n_classes": 2, "input_dim": 48,
        "model_size": "32*16", "dropout": 0.0, "output_dim": 40,
        "channels_used_in_model": [
            "wsi=features", "tma=cd3=features", "clinical=val", "clinical=mask",
        ],
        "device": "cpu", "enable_svd": True, "enable_dynamic_gate": True,
        "enable_random_loss": False, "tau1": 0.1, "tau2": 0.1,
        "lambda1": 1.0, "lambda2": 0.0, "base_weight": 0.7, "inst_number": 3,
    }
    torch.manual_seed(0)
    ref = RefModel(config)
    ref.eval()
    data, label = _torch_inputs()
    with torch.no_grad():
        ref(data, label)  # materialise lazy layers
    mine = ModelFactory.create_model(
        ModelConfig.from_dict({**config, "channel_input_dims": {"clinical=val": 12}}),
        seed=0,
    )
    transplant_svd_gate(ref, mine)

    rng = np.random.default_rng(0)
    n = 16
    risks_ref, risks_ours = [], []
    for i in range(n):
        data, label = _torch_inputs(seed=200 + i)
        with torch.no_grad():
            r = ref(data, label)
        out = mine(_jax_case_from_torch(data), jnp.asarray(1), train=False)
        risks_ref.append(float(r["logits"][0, 1]))
        risks_ours.append(float(out["logits"][0, 1]))
    risks_ref = np.asarray(risks_ref)
    risks_ours = np.asarray(risks_ours)
    np.testing.assert_allclose(risks_ours, risks_ref, rtol=1e-4, atol=1e-5)

    # identical ordering => identical C-index on any survival cohort
    times = rng.exponential(1.0, n)
    events = rng.integers(0, 2, n).astype(bool)
    ci_ref = concordance_index(times, events, risks_ref)
    ci_ours = concordance_index(times, events, risks_ours)
    assert abs(ci_ref - ci_ours) < 0.005  # exactly 0 in practice
    assert (np.argsort(risks_ref) == np.argsort(risks_ours)).all()
