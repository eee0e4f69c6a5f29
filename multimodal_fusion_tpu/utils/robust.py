"""Missing-modality robustness sweep.

Reference: ``downstream_survival/utils/robust_on_missing_modality.py:1-237``
— load ``configs_*.json`` + per-fold checkpoints from a results dir,
re-create the splits, evaluate the test split under a sweep of modality
``drop_prob`` values, write CSV + JSON.
"""

from __future__ import annotations

import csv
import json
from pathlib import Path
from typing import Dict, List, Optional, Sequence


from multimodal_fusion_tpu.data.splits import create_k_fold_splits, load_fold_split


def robustness_sweep(
    results_dir: str | Path,
    csv_path: str | Path,
    data_root_dir: str | Path,
    drop_probs: Sequence[float] = (0.0, 0.1, 0.2, 0.3, 0.4, 0.5),
    folds: Optional[Sequence[int]] = None,
    output_path: Optional[str | Path] = None,
    seed: int = 0,
) -> List[Dict]:
    from multimodal_fusion_tpu.utils.results_io import load_results_context

    results_dir = Path(results_dir)
    configs, dataset, trainer, folds = load_results_context(
        results_dir, csv_path, data_root_dir, folds=folds
    )
    exp = configs.experiment_config

    def fold_split(fold: int):
        # the splits the trainer actually used, reloaded from its persisted
        # splits_<fold>.csv (reference robust_on_missing_modality.py:28-44);
        # re-derivation from the seed is only a fallback for results dirs
        # that predate split persistence.
        persisted = results_dir / f"splits_{fold}.csv"
        if persisted.exists():
            return load_fold_split(persisted, dataset.case_ids)
        return create_k_fold_splits(
            dataset.labels,
            exp.k_folds,
            exp.seed,
            patient_ids=[dataset.case_to_patient[c] for c in dataset.case_ids],
            fixed_split_path=exp.fixed_split_path if exp.split_mode == "fixed" else None,
        )[fold]

    rows: List[Dict] = []
    for fold in folds:
        split = fold_split(fold)
        for dp in drop_probs:
            res = trainer.evaluate_fold(
                dataset, split, fold, drop_prob=dp if dp > 0 else None, seed=seed
            )
            rows.append(
                {"fold": fold, "drop_prob": dp, "auc": res["auc"], "acc": res["acc"], "loss": res["loss"]}
            )

    out = Path(output_path) if output_path else results_dir / "robustness"
    with open(f"{out}.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["fold", "drop_prob", "auc", "acc", "loss"])
        w.writeheader()
        w.writerows(rows)
    Path(f"{out}.json").write_text(json.dumps(rows, indent=2))
    return rows
