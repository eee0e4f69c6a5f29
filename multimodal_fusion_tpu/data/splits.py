"""K-fold splitting and class-balanced sampling.

Reference semantics: ``downstream_survival/main.py:257-441`` —
- ``random`` mode: StratifiedKFold(k, shuffle, seed) over cases; each fold's
  held-out half is split into val/test (even indices -> val, odd -> test,
  matching the reference's interleaved split at :417-439);
- ``fixed`` mode: external JSON with train/test patient lists (robust numeric
  id matching); k-fold runs only within the train portion, the fixed test set
  is shared by all folds.
Weighted sampling: ``trainer.py:241-276`` — inverse-class-frequency weights
with replacement.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np
from sklearn.model_selection import StratifiedKFold


def extract_numeric_id(value) -> Optional[int]:
    """Last integer run in an id string (reference main.py:443-456)."""
    try:
        if isinstance(value, (int, np.integer)):
            return int(value)
        if value is None:
            return None
        m = re.findall(r"\d+", str(value))
        return int(m[-1]) if m else None
    except Exception:
        return None


@dataclass
class FoldSplit:
    train_idx: np.ndarray
    val_idx: np.ndarray
    test_idx: np.ndarray


def create_k_fold_splits(
    labels: Sequence[int],
    k: int,
    seed: int,
    patient_ids: Optional[Sequence] = None,
    fixed_split_path: Optional[str | Path] = None,
) -> List[FoldSplit]:
    labels = np.asarray(labels)
    n = len(labels)
    if fixed_split_path is None:
        skf = StratifiedKFold(n_splits=k, shuffle=True, random_state=seed)
        out = []
        for train_idx, heldout in skf.split(np.zeros(n), labels):
            val_idx = heldout[0::2]
            test_idx = heldout[1::2]
            out.append(FoldSplit(train_idx, val_idx, test_idx))
        return out

    spec = json.loads(Path(fixed_split_path).read_text())
    test_ids = {extract_numeric_id(x) for x in spec.get("test", [])}
    train_ids = {extract_numeric_id(x) for x in spec.get("train", [])}
    if patient_ids is None:
        raise ValueError("fixed split mode requires patient_ids")
    numeric = [extract_numeric_id(p) for p in patient_ids]
    test_mask = np.asarray([pid in test_ids for pid in numeric])
    train_pool = np.asarray(
        [i for i, pid in enumerate(numeric) if pid in train_ids or (pid not in test_ids and not train_ids)]
    )
    test_idx = np.where(test_mask)[0]
    skf = StratifiedKFold(n_splits=k, shuffle=True, random_state=seed)
    out = []
    pool_labels = labels[train_pool]
    for tr, va in skf.split(np.zeros(len(train_pool)), pool_labels):
        out.append(FoldSplit(train_pool[tr], train_pool[va], test_idx))
    return out


def save_fold_split(split: FoldSplit, case_ids: Sequence[str], path: str | Path) -> None:
    """Persist a fold split as case-id CSV (reference trainer.py:63-139)."""
    import csv

    rows = []
    maxlen = max(len(split.train_idx), len(split.val_idx), len(split.test_idx))
    for i in range(maxlen):
        rows.append(
            {
                "train": case_ids[split.train_idx[i]] if i < len(split.train_idx) else "",
                "val": case_ids[split.val_idx[i]] if i < len(split.val_idx) else "",
                "test": case_ids[split.test_idx[i]] if i < len(split.test_idx) else "",
            }
        )
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["train", "val", "test"])
        w.writeheader()
        w.writerows(rows)


def load_fold_split(path: str | Path, case_ids: Sequence[str]) -> FoldSplit:
    """Inverse of ``save_fold_split``: case-id CSV -> index-based FoldSplit.

    Case ids absent from ``case_ids`` are dropped (the dataset may have
    filtered cases since training).  Reference reloads its persisted splits
    rather than re-deriving them (utils/robust_on_missing_modality.py:28-44).
    """
    import csv

    # the csv module stringified the ids on save; match on str so numeric
    # case_id columns (np.int64 in the dataset) still resolve
    idx = {str(cid): i for i, cid in enumerate(case_ids)}
    cols: Dict[str, List[int]] = {"train": [], "val": [], "test": []}
    with open(path, newline="") as f:
        for row in csv.DictReader(f):
            for k in cols:
                if row.get(k) and row[k] in idx:
                    cols[k].append(idx[row[k]])
    return FoldSplit(
        np.asarray(cols["train"], np.int64),
        np.asarray(cols["val"], np.int64),
        np.asarray(cols["test"], np.int64),
    )


class WeightedRandomSampler:
    """Inverse-class-frequency sampling with replacement, seeded."""

    def __init__(self, labels: Sequence[int], seed: int):
        labels = np.asarray(labels)
        counts = np.bincount(labels)
        weights = 1.0 / np.maximum(counts[labels], 1)
        self.probs = weights / weights.sum()
        self.rng = np.random.default_rng(seed)
        self.n = len(labels)

    def sample_epoch(self) -> np.ndarray:
        return self.rng.choice(self.n, size=self.n, replace=True, p=self.probs)
