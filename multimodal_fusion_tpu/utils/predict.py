"""Batch scoring (serving) of new cases from a trained survival results dir.

TPU-native extension beyond the reference surface: the reference can only
re-evaluate its own k-fold test splits (``utils/robust_on_missing_modality.py``)
— there is no way to score *new* patients with a trained model.  This module
loads ``configs_*.json`` + per-fold ``s_<fold>_checkpoint.npz`` from a results
dir (same artifact layout the reference persists, trainer.py:741-745) and
scores every case in an arbitrary CSV through the jitted eval path, optionally
ensembling the fold checkpoints (mean probability — the standard k-fold
deployment recipe).

The input CSV needs the usual ``patient_id, case_id, h5_file_path`` columns;
``label`` is OPTIONAL (unknown at serving time) — when absent, a placeholder
is injected so the dataset layer's validation/filtering still applies (the
returned dict carries probabilities/risk only — per-fold AUC/ACC against
placeholder labels would be meaningless and are not surfaced).  Class-probability columns follow the TRAINING
label order (sorted unique labels, reference multimodal_dataset.py:123-133 —
e.g. ``deceased``=0, ``living``=1 for the survival CSV).
"""

from __future__ import annotations

import csv
import json
import tempfile
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np
import pandas as pd

from multimodal_fusion_tpu.data.splits import FoldSplit


def ensemble_rows(per_fold: Dict[int, Dict], folds: Sequence[int],
                  case_to_patient: Dict) -> List[Dict]:
    """Mean-probability fold ensemble → one output row per case (shared by
    the one-shot ``predict`` path and the long-lived ``utils/serve`` server)."""
    case_ids = per_fold[folds[0]]["patient_ids"]
    probs = np.mean([np.asarray(per_fold[f]["probs"]) for f in folds], axis=0)
    risk = np.mean([np.asarray(per_fold[f]["risk"]) for f in folds], axis=0)
    preds = probs.argmax(axis=1)
    rows: List[Dict] = []
    for i, cid in enumerate(case_ids):
        row = {
            "case_id": cid,
            "patient_id": case_to_patient[cid],
            "prediction": int(preds[i]),
            "risk": float(risk[i]),
        }
        for c in range(probs.shape[1]):
            row[f"prob_{c}"] = float(probs[i, c])
        for f in folds:
            row[f"fold_{f}_prob_1"] = float(per_fold[f]["probs"][i][1])
        rows.append(row)
    return rows


def predict(
    results_dir: str | Path,
    csv_path: str | Path,
    data_root_dir: str | Path,
    folds: Optional[Sequence[int]] = None,
    output_path: Optional[str | Path] = None,
    drop_prob: Optional[float] = None,
    seed: int = 0,
) -> Dict:
    """Score every case in ``csv_path`` with each fold checkpoint under
    ``results_dir``; returns {case_id: {...}} plus the ensemble, and writes
    ``predictions.csv`` / ``predictions.json`` next to ``output_path`` (or
    into the results dir)."""
    from multimodal_fusion_tpu.utils.results_io import load_results_context

    results_dir = Path(results_dir)
    df = pd.read_csv(csv_path)
    tmp = None
    if "label" not in df.columns:
        # serving-time CSV without outcomes: placeholder label keeps the
        # dataset layer's channel validation/filtering intact (written to the
        # system temp dir — the results dir may be a read-only artifact)
        df = df.assign(label="unknown")
        tmp = tempfile.NamedTemporaryFile("w", suffix=".csv", delete=False)
        tmp.close()
        df.to_csv(tmp.name, index=False)
        csv_path = tmp.name
    try:
        configs, dataset, trainer, folds = load_results_context(
            results_dir, csv_path, data_root_dir, folds=folds
        )
        if len(dataset) == 0:
            raise ValueError(
                "no cases to score: every CSV row was filtered by the "
                "dataset layer (missing h5 files or channels?); input rows="
                f"{len(df)}"
            )
        all_idx = np.arange(len(dataset))
        split = FoldSplit(
            train_idx=np.array([], int), val_idx=np.array([], int), test_idx=all_idx
        )
        per_fold: Dict[int, Dict] = {}
        for fold in folds:
            per_fold[fold] = trainer.evaluate_fold(
                dataset, split, fold, drop_prob=drop_prob, seed=seed
            )
    finally:
        if tmp is not None:
            Path(tmp.name).unlink(missing_ok=True)

    rows = ensemble_rows(per_fold, folds, dataset.case_to_patient)

    import os as _os

    if output_path:
        out = Path(output_path)
    elif _os.access(results_dir, _os.W_OK):
        out = results_dir / "predictions"
    else:
        # read-only results artifact (the same assumption the placeholder
        # CSV makes above): don't lose minutes of scoring to a
        # PermissionError at write time
        out = Path.cwd() / "predictions"
        print(f"results dir not writable; writing {out}.csv/.json")
    out.parent.mkdir(parents=True, exist_ok=True)
    with open(f"{out}.csv", "w", newline="") as fh:
        w = csv.DictWriter(fh, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    result = {
        "cases": rows,
        "folds": list(folds),
        "drop_prob": drop_prob,
        "n_cases_scored": len(rows),
        "n_cases_input": len(df),
    }
    Path(f"{out}.json").write_text(json.dumps(result, indent=2))
    return result
