#!/usr/bin/env bash
# Alignment pretraining headline run (mirrors reference alignment/run.sh)
set -euo pipefail
NPZ_DIR=${NPZ_DIR:?set NPZ_DIR}
python -m multimodal_fusion_tpu.cli.run_alignment \
    --base_dir "$NPZ_DIR" \
    --align_mode intersection \
    --filename_template "tma_uni_tile_1024_{marker}.npz" \
    --mismatch_ratio 1.0 \
    --seed 42 \
    --lambda1 1.0 --lambda2 0.1 --tau1 0.01 --tau2 0.05 \
    --num_layers 2 \
    --lr 1e-4 --weight_decay 1e-5 \
    --max_steps "${MAX_STEPS:-10000}" \
    --batch_size "${BATCH_SIZE:-512}" \
    --loss2_chunk_size 8 \
    --save_path "${SAVE_PATH:-./alignment_model.npz}"
