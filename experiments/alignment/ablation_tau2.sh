#!/bin/bash
# alignment/ablation_tau2 — generated from experiments/matrix.py (reference:
# alignment/experiments/ablation_tau2.sh). Edit the matrix, not this file.
set -euo pipefail
NPZ_DIR=${NPZ_DIR:?set NPZ_DIR (per-marker aligned NPZ directory)}
OUT_DIR=${OUT_DIR:-./results/ablation_tau2}
mkdir -p "$OUT_DIR"

for V in 0.01 0.05 0.1 0.2 5; do
  python -m multimodal_fusion_tpu.cli.run_alignment --base_dir "$NPZ_DIR" --mismatch_ratio 1.0 --seed 42 --lambda1 1.0 --lambda2 0.1 --tau1 0.1 --num_layers 2 --max_steps 400 --batch_size 512 --lr 1e-4 --weight_decay 1e-5 --loss2_chunk_size 8 --align_mode intersection --tau2 "$V" --save_path "$OUT_DIR/model_tau2_$V.npz"
done
