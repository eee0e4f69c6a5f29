#!/bin/bash
# alignment/ablation_seed — generated from experiments/matrix.py (reference:
# alignment/experiments/ablation_seed.sh). Edit the matrix, not this file.
set -euo pipefail
NPZ_DIR=${NPZ_DIR:?set NPZ_DIR (per-marker aligned NPZ directory)}
OUT_DIR=${OUT_DIR:-./results/ablation_seed}
mkdir -p "$OUT_DIR"

for V in 42 123 456 1024 9999; do
  python -m multimodal_fusion_tpu.cli.run_alignment --base_dir "$NPZ_DIR" --mismatch_ratio 1.0 --lambda1 1.0 --lambda2 0.1 --tau1 0.1 --tau2 0.05 --num_layers 2 --max_steps 400 --batch_size 512 --lr 1e-4 --weight_decay 1e-5 --loss2_chunk_size 8 --align_mode intersection --seed "$V" --save_path "$OUT_DIR/model_seed_$V.npz"
done
