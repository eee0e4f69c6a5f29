#!/bin/bash
# 0.clam/clam_mlp/icd_clam_mlp — generated from experiments/matrix.py (reference:
# downstream_survival/experiments/0.clam/clam_mlp/icd_clam_mlp.sh). Edit the matrix, not this file.
set -euo pipefail
SEED=${1:-5678}
DATA_ROOT_DIR=${DATA_ROOT_DIR:?set DATA_ROOT_DIR}
CSV_PATH=${CSV_PATH:?set CSV_PATH}
RESULTS_DIR=${RESULTS_DIR:-./results}
# TPU execution knobs (JSON merged into the experiment config), e.g.
# TPU_OPTS='{"device_data": true, "scan_windows": 8, "mesh_shape": {"data": 8}}'
TPU_OPTS=${TPU_OPTS:-'{}'}

python -m multimodal_fusion_tpu.cli.main_survival \
    --csv_path "$CSV_PATH" \
    --data_root_dir "$DATA_ROOT_DIR" \
    --results_dir "$RESULTS_DIR" \
    --exp_code icd_clam_mlp \
    --model_type clam_mlp \
    --target_channels icd \
    --channels_used_in_model icd \
    --k 10 \
    --split_mode random \
    --max_epochs 200 \
    --lr 1e-4 \
    --lr_scheduler plateau \
    --lr_scheduler_params '{"mode": "min", "patience": 15, "factor": 0.5}' \
    --reg 1e-5 \
    --opt adam \
    --batch_size 64 \
    --input_dim 1024 \
    --dropout 0.25 \
    --n_classes 2 \
    --base_loss_fn ce \
    --base_weight 0.9 \
    --inst_loss_fn ce \
    --model_size '64*32' \
    --inst_number 8 \
    --output_dim 128 \
    --early_stopping \
    --gate \
    --subtyping \
    --tpu_opts "$TPU_OPTS" \
    --seed "$SEED"
