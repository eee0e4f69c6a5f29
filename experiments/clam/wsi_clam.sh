#!/usr/bin/env bash
# CLAM baseline over WSI features (mirrors reference
# downstream_survival/experiments/0.clam/clam/tma_wsi_clam.sh)
set -euo pipefail
SEED=${1:-1}
python multimodal_fusion_tpu/cli/main_survival.py \
  --csv_path "${CSV_PATH:?set CSV_PATH}" \
  --data_root_dir "${DATA_ROOT:?set DATA_ROOT}" \
  --exp_code clam_wsi_s${SEED} \
  --model_type clam \
  --target_channels wsi=features \
  --channels_used_in_model wsi=features \
  --model_size small --k 10 --max_epochs 200 --batch_size 64 \
  --early_stopping --seed ${SEED}
