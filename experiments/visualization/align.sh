#!/usr/bin/env bash
# Alignment-feature visualization over a finished results dir
# (mirrors reference downstream_survival/utils/align.sh: heatmap + t-SNE
# plots of the dumped svd_features for one fold).
set -euo pipefail
RESULTS_DIR=${1:?usage: align.sh <results_dir> [fold]}
FOLD=${2:-0}
python - <<PY
from pathlib import Path
from multimodal_fusion_tpu.utils.visualization import (
    plot_alignment_heatmap, plot_modality_tsne,
)
d = Path("${RESULTS_DIR}")
dump = d / "svd_features" / "fold_${FOLD}_features.npz"
out = d / "svd_features_fold${FOLD}"
out.mkdir(parents=True, exist_ok=True)
print(plot_alignment_heatmap(dump, out / "heatmap.png"))
print(plot_modality_tsne(dump, out / "tsne.png"))
PY
