#!/usr/bin/env bash
# Alignment-feature visualization over a finished results dir
# (mirrors reference downstream_survival/utils/align.sh: dump the fold's
# aligned SVD features, then heatmap + t-SNE plots).
set -euo pipefail
RESULTS_DIR=${1:?usage: align.sh <results_dir> [fold]}
FOLD=${2:-0}
CSV_PATH=${CSV_PATH:?set CSV_PATH}
DATA_ROOT_DIR=${DATA_ROOT_DIR:?set DATA_ROOT_DIR}
python -m multimodal_fusion_tpu.cli.alignment_visualization \
    --results_dir "$RESULTS_DIR" \
    --csv_path "$CSV_PATH" \
    --data_root_dir "$DATA_ROOT_DIR" \
    --fold_idx "$FOLD" \
    --plots
