#!/bin/bash
# alignment/exp_svd_256_tma — generated from experiments/matrix.py (reference:
# alignment/experiments/exp_svd_256_tma.sh). Edit the matrix, not this file.
set -euo pipefail
NPZ_DIR=${NPZ_DIR:?set NPZ_DIR (per-marker aligned NPZ directory)}
OUT_DIR=${OUT_DIR:-./results/exp_svd_256_tma}
mkdir -p "$OUT_DIR"

python -m multimodal_fusion_tpu.cli.run_alignment --base_dir "$NPZ_DIR" --mismatch_ratio 1.0 --seed 42 --lambda1 1.0 --lambda2 0.1 --tau1 0.1 --tau2 0.05 --num_layers 2 --max_steps 400 --batch_size 512 --lr 1e-4 --weight_decay 1e-5 --loss2_chunk_size 8 --align_mode intersection --loss_type rank1 --save_path "$OUT_DIR/model.npz"
