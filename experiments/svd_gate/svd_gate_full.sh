#!/usr/bin/env bash
# Flagship: SVD + dynamic gate + random-drop loss over all modalities
set -euo pipefail
SEED=${1:-1}
python multimodal_fusion_tpu/cli/main_survival.py \
  --csv_path "${CSV_PATH:?set CSV_PATH}" \
  --data_root_dir "${DATA_ROOT:?set DATA_ROOT}" \
  --exp_code svd_gate_s${SEED} \
  --model_type svd_gate_random_clam \
  --target_channels wsi=features tma clinical_mask pathological_mask blood_mask icd_mask tma_cell_density_mask \
  --channels_used_in_model wsi=features tma clinical_mask pathological_mask blood_mask icd_mask tma_cell_density_mask \
  --model_size 64*32 --output_dim 128 \
  --enable_svd --enable_dynamic_gate --enable_random_loss \
  --tau1 0.1 --tau2 0.05 --lambda1 1.0 \
  --k 10 --max_epochs 200 --batch_size 64 --early_stopping --seed ${SEED}
