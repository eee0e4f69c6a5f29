#!/bin/bash
# alignment/run_sequential.sh — generated from experiments/matrix.py (reference:
# alignment/experiments/run_sequential.sh). Edit the matrix, not this file.
# Sequential driver: runs each experiment in this group in order,
# continuing past failures (the reference dispatches these through a
# fire-and-forget task runner).
set -uo pipefail
SEED=${1:-5678}
cd "$(dirname "$0")"

echo "=== [1/8] ablation_tau1 ($(date)) ==="; bash ablation_tau1.sh || echo "FAILED: ablation_tau1"
echo "=== [2/8] ablation_tau2 ($(date)) ==="; bash ablation_tau2.sh || echo "FAILED: ablation_tau2"
echo "=== [3/8] ablation_lambda1 ($(date)) ==="; bash ablation_lambda1.sh || echo "FAILED: ablation_lambda1"
echo "=== [4/8] ablation_lambda2 ($(date)) ==="; bash ablation_lambda2.sh || echo "FAILED: ablation_lambda2"
echo "=== [5/8] ablation_num_layers ($(date)) ==="; bash ablation_num_layers.sh || echo "FAILED: ablation_num_layers"
echo "=== [6/8] ablation_seed ($(date)) ==="; bash ablation_seed.sh || echo "FAILED: ablation_seed"
echo "=== [7/8] ablation_mismatch_ratio ($(date)) ==="; bash ablation_mismatch_ratio.sh || echo "FAILED: ablation_mismatch_ratio"
echo "=== [8/8] ablation_loss2_chunk_size ($(date)) ==="; bash ablation_loss2_chunk_size.sh || echo "FAILED: ablation_loss2_chunk_size"
