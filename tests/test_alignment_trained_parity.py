"""Golden trained-parity for the alignment pretrainer: the torch reference's
MultiModalAlignmentTrainer vs ours on the same NPZ fixtures and the same
8:1:1 tuple split (derived with the reference's own shuffle).

Completes the golden-parity trio (survival flagship, VAE, alignment): both
trainers must drive the rank-1 SVD alignment loss into the same band.  RNG
streams differ (init, sampler, negative draws), so the comparison is banded,
not bitwise — the loss formulation itself is already transplant-tested
(test_torch_parity.test_rank1_loss_matches_torch_impl).
"""

import sys
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference")
torch = pytest.importorskip("torch")
if not REF.exists():  # pragma: no cover
    pytest.skip("reference tree unavailable", allow_module_level=True)
import contextlib  # noqa: E402

from flax import nnx  # noqa: E402


@contextlib.contextmanager
def _isolated_ref_imports(path, names):
    """The reference alignment package's top-level module names (trainer,
    alignment_model, alignment_dataset) collide with downstream_survival's
    trainer.py that other parity tests import; import under a temporary
    sys.path and evict/restore afterwards so the suite order is irrelevant."""
    saved = {n: sys.modules.pop(n, None) for n in names}
    sys.path.insert(0, str(path))
    try:
        yield
    finally:
        sys.path.remove(str(path))
        for n in names:
            sys.modules.pop(n, None)
            if saved[n] is not None:
                sys.modules[n] = saved[n]


_ALIGN_NAMES = ("trainer", "alignment_model", "alignment_dataset")

from multimodal_fusion_tpu.io.fixtures import make_alignment_npz_fixtures  # noqa: E402

MARKERS = ["cd3", "cd8", "he"]
DIM = 1024  # the reference dataset hardcodes 1024-d vectors (alignment_dataset.py:130-138)
MAX_STEPS = 40
BATCH = 8
LOSS_KW = dict(tau1=0.1, tau2=0.1, lambda1=1.0, lambda2=0.1)


def _split_tuples(keys, seed=42):
    rng = np.random.RandomState(seed)
    idx = np.arange(len(keys))
    rng.shuffle(idx)
    n_train = int(len(idx) * 0.8)
    n_val = int(len(idx) * 0.1)
    return (
        [keys[i] for i in idx[:n_train]],
        [keys[i] for i in idx[n_train:n_train + n_val]],
    )


def _train_reference(npz_dir):
    from torch.utils.data import DataLoader

    from alignment_dataset import build_collate_fn, create_tma_aligned_with_neg_dataset
    from alignment_model import MultiModalAlignmentModel as RefModel
    from trainer import MultiModalAlignmentTrainer as RefTrainer

    base = create_tma_aligned_with_neg_dataset(
        base_dir=str(npz_dir), modality_names=MARKERS, align_mode="intersection",
        filename_template="{marker}.npz", mismatch_ratio=1.0, seed=42,
    )
    train_ids, val_ids = _split_tuples(base.normalized_keys)
    splits = base.split_by_ids_with_neg(
        {"train": train_ids, "val": val_ids}, id_type="tuple",
        mismatch_ratio=1.0, seed=42,
    )
    train_loader = DataLoader(
        splits["train"], batch_size=BATCH, shuffle=True, num_workers=0,
        collate_fn=build_collate_fn(splits["train"], ratio=1.0),
        generator=torch.Generator().manual_seed(0),
    )
    val_loader = DataLoader(
        splits["val"], batch_size=BATCH, shuffle=False, num_workers=0,
        collate_fn=build_collate_fn(splits["val"], ratio=1.0),
    )
    torch.manual_seed(0)
    model = RefModel(MARKERS, feature_dim=DIM, num_layers=2)
    trainer = RefTrainer(
        model, device="cpu", learning_rate=1e-3, loss_type="rank1",
        mismatch_ratio=1.0, early_stopping_patience=100, **LOSS_KW,
    )
    history = trainer.train(
        train_loader, val_loader, max_steps=MAX_STEPS,
        save_path="/tmp/_ref_align.pth", log_interval=1000, val_interval=10,
    )
    return float(np.min(history["val_losses"])), [
        tuple(k) for k in base.normalized_keys
    ]


def _train_ours(npz_dir, tmp_path):
    from multimodal_fusion_tpu.data.alignment import TMANpzAlignedWithNegDataset
    from multimodal_fusion_tpu.models.alignment import MultiModalAlignmentModel
    from multimodal_fusion_tpu.train.alignment import MultiModalAlignmentTrainer

    ds = TMANpzAlignedWithNegDataset(
        npz_dir, MARKERS, filename_template="{marker}.npz", mismatch_ratio=1.0,
        seed=42,
    )
    train_ids, val_ids = _split_tuples(ds.normalized_keys)
    views = ds.split_by_ids_with_neg(
        {"train": train_ids, "val": val_ids}, id_type="tuple"
    )
    model = MultiModalAlignmentModel(MARKERS, feature_dim=DIM, num_layers=2,
                                     rngs=nnx.Rngs(0))
    trainer = MultiModalAlignmentTrainer(model, learning_rate=1e-3, **LOSS_KW)
    out = trainer.train(
        views["train"], views["val"], max_steps=MAX_STEPS, batch_size=BATCH,
        val_interval=10, save_path=tmp_path / "align.npz",
    )
    return float(out["best_val_loss"]), [tuple(k) for k in ds.normalized_keys]


def test_alignment_trained_loss_parity(tmp_path):
    make_alignment_npz_fixtures(
        tmp_path, n_cores=20, patches_per_core=3, feature_dim=DIM, markers=MARKERS
    )
    import io

    with _isolated_ref_imports(REF / "alignment", _ALIGN_NAMES):
        with contextlib.redirect_stdout(io.StringIO()):
            ref_loss, ref_keys = _train_reference(tmp_path)
    our_loss, our_keys = _train_ours(tmp_path, tmp_path)

    # both stacks enumerate the identical aligned tuples from the NPZs
    assert sorted(ref_keys) == sorted(our_keys)
    print(f"\nalignment trained best val loss: reference={ref_loss:.4f} "
          f"ours={our_loss:.4f}")
    assert np.isfinite(ref_loss) and np.isfinite(our_loss)
    assert our_loss < 2.0 * ref_loss + 1e-3
    assert ref_loss < 2.0 * our_loss + 1e-3
