#!/bin/bash
# 0.clam/cmd.sh — generated from experiments/matrix.py (reference:
# downstream_survival/experiments/0.clam/cmd.sh). Edit the matrix, not this file.
# Sequential driver: runs each experiment in this group in order,
# continuing past failures (the reference dispatches these through a
# fire-and-forget task runner).
set -uo pipefail
SEED=${1:-5678}
cd "$(dirname "$0")"

echo "=== 0.clam/ablation_output_dim/ablate_output_dim_18 ==="; bash ablation_output_dim/ablate_output_dim_18.sh "$SEED" || echo "FAILED: 0.clam/ablation_output_dim/ablate_output_dim_18"
echo "=== 0.clam/ablation_output_dim/ablate_output_dim_256 ==="; bash ablation_output_dim/ablate_output_dim_256.sh "$SEED" || echo "FAILED: 0.clam/ablation_output_dim/ablate_output_dim_256"
echo "=== 0.clam/ablation_output_dim/ablate_output_dim_36 ==="; bash ablation_output_dim/ablate_output_dim_36.sh "$SEED" || echo "FAILED: 0.clam/ablation_output_dim/ablate_output_dim_36"
echo "=== 0.clam/ablation_output_dim/ablate_output_dim_512 ==="; bash ablation_output_dim/ablate_output_dim_512.sh "$SEED" || echo "FAILED: 0.clam/ablation_output_dim/ablate_output_dim_512"
echo "=== 0.clam/ablation_output_dim/ablate_output_dim_64 ==="; bash ablation_output_dim/ablate_output_dim_64.sh "$SEED" || echo "FAILED: 0.clam/ablation_output_dim/ablate_output_dim_64"
echo "=== 0.clam/clam/tma_clam ==="; bash clam/tma_clam.sh "$SEED" || echo "FAILED: 0.clam/clam/tma_clam"
echo "=== 0.clam/clam/tma_wsi_clam ==="; bash clam/tma_wsi_clam.sh "$SEED" || echo "FAILED: 0.clam/clam/tma_wsi_clam"
echo "=== 0.clam/clam/wsi_clam ==="; bash clam/wsi_clam.sh "$SEED" || echo "FAILED: 0.clam/clam/wsi_clam"
echo "=== 0.clam/clam_mlp/all_clam_mlp ==="; bash clam_mlp/all_clam_mlp.sh "$SEED" || echo "FAILED: 0.clam/clam_mlp/all_clam_mlp"
echo "=== 0.clam/clam_mlp/blood_clam_mlp ==="; bash clam_mlp/blood_clam_mlp.sh "$SEED" || echo "FAILED: 0.clam/clam_mlp/blood_clam_mlp"
echo "=== 0.clam/clam_mlp/clinical_clam_mlp ==="; bash clam_mlp/clinical_clam_mlp.sh "$SEED" || echo "FAILED: 0.clam/clam_mlp/clinical_clam_mlp"
echo "=== 0.clam/clam_mlp/icd_clam_mlp ==="; bash clam_mlp/icd_clam_mlp.sh "$SEED" || echo "FAILED: 0.clam/clam_mlp/icd_clam_mlp"
echo "=== 0.clam/clam_mlp/pathological_clam_mlp ==="; bash clam_mlp/pathological_clam_mlp.sh "$SEED" || echo "FAILED: 0.clam/clam_mlp/pathological_clam_mlp"
echo "=== 0.clam/clam_mlp/tma_cell_density_clam_mlp ==="; bash clam_mlp/tma_cell_density_clam_mlp.sh "$SEED" || echo "FAILED: 0.clam/clam_mlp/tma_cell_density_clam_mlp"
echo "=== 0.clam/clam_mlp/tma_clam_mlp ==="; bash clam_mlp/tma_clam_mlp.sh "$SEED" || echo "FAILED: 0.clam/clam_mlp/tma_clam_mlp"
echo "=== 0.clam/clam_mlp/tma_wsi_clam_mlp ==="; bash clam_mlp/tma_wsi_clam_mlp.sh "$SEED" || echo "FAILED: 0.clam/clam_mlp/tma_wsi_clam_mlp"
echo "=== 0.clam/clam_mlp/wsi_clam_mlp ==="; bash clam_mlp/wsi_clam_mlp.sh "$SEED" || echo "FAILED: 0.clam/clam_mlp/wsi_clam_mlp"
echo "=== 0.clam/clam_mlp_detach/all_clam_mlp_detach ==="; bash clam_mlp_detach/all_clam_mlp_detach.sh "$SEED" || echo "FAILED: 0.clam/clam_mlp_detach/all_clam_mlp_detach"
echo "=== 0.clam/clam_mlp_detach/tma_clam_mlp_detach ==="; bash clam_mlp_detach/tma_clam_mlp_detach.sh "$SEED" || echo "FAILED: 0.clam/clam_mlp_detach/tma_clam_mlp_detach"
echo "=== 0.clam/clam_mlp_detach/tma_wsi_clam_mlp_detach ==="; bash clam_mlp_detach/tma_wsi_clam_mlp_detach.sh "$SEED" || echo "FAILED: 0.clam/clam_mlp_detach/tma_wsi_clam_mlp_detach"
echo "=== 0.clam/clam_mlp_detach/wsi_clam_mlp_detach ==="; bash clam_mlp_detach/wsi_clam_mlp_detach.sh "$SEED" || echo "FAILED: 0.clam/clam_mlp_detach/wsi_clam_mlp_detach"
echo "=== 0.clam/clip_gate_random_clam/clip_only_clam ==="; bash clip_gate_random_clam/clip_only_clam.sh "$SEED" || echo "FAILED: 0.clam/clip_gate_random_clam/clip_only_clam"
echo "=== 0.clam/clip_gate_random_clam/clip_random_clam ==="; bash clip_gate_random_clam/clip_random_clam.sh "$SEED" || echo "FAILED: 0.clam/clip_gate_random_clam/clip_random_clam"
echo "=== 0.clam/clip_gate_random_clam_detach/clip_only_clam_detach ==="; bash clip_gate_random_clam_detach/clip_only_clam_detach.sh "$SEED" || echo "FAILED: 0.clam/clip_gate_random_clam_detach/clip_only_clam_detach"
echo "=== 0.clam/clip_gate_random_clam_detach/clip_random_clam_detach ==="; bash clip_gate_random_clam_detach/clip_random_clam_detach.sh "$SEED" || echo "FAILED: 0.clam/clip_gate_random_clam_detach/clip_random_clam_detach"
echo "=== 0.clam/svd_gate_random_clam/combined_svd_gate_random_clam ==="; bash svd_gate_random_clam/combined_svd_gate_random_clam.sh "$SEED" || echo "FAILED: 0.clam/svd_gate_random_clam/combined_svd_gate_random_clam"
echo "=== 0.clam/svd_gate_random_clam/dynamic_gate_only_clam ==="; bash svd_gate_random_clam/dynamic_gate_only_clam.sh "$SEED" || echo "FAILED: 0.clam/svd_gate_random_clam/dynamic_gate_only_clam"
echo "=== 0.clam/svd_gate_random_clam/dynamic_random_clam ==="; bash svd_gate_random_clam/dynamic_random_clam.sh "$SEED" || echo "FAILED: 0.clam/svd_gate_random_clam/dynamic_random_clam"
echo "=== 0.clam/svd_gate_random_clam/random_loss_only_clam ==="; bash svd_gate_random_clam/random_loss_only_clam.sh "$SEED" || echo "FAILED: 0.clam/svd_gate_random_clam/random_loss_only_clam"
echo "=== 0.clam/svd_gate_random_clam/svd_dynamic_clam ==="; bash svd_gate_random_clam/svd_dynamic_clam.sh "$SEED" || echo "FAILED: 0.clam/svd_gate_random_clam/svd_dynamic_clam"
echo "=== 0.clam/svd_gate_random_clam/svd_only_clam ==="; bash svd_gate_random_clam/svd_only_clam.sh "$SEED" || echo "FAILED: 0.clam/svd_gate_random_clam/svd_only_clam"
echo "=== 0.clam/svd_gate_random_clam/svd_random_clam ==="; bash svd_gate_random_clam/svd_random_clam.sh "$SEED" || echo "FAILED: 0.clam/svd_gate_random_clam/svd_random_clam"
echo "=== 0.clam/svd_gate_random_clam_detach/combined_svd_gate_random_clam_detach ==="; bash svd_gate_random_clam_detach/combined_svd_gate_random_clam_detach.sh "$SEED" || echo "FAILED: 0.clam/svd_gate_random_clam_detach/combined_svd_gate_random_clam_detach"
echo "=== 0.clam/svd_gate_random_clam_detach/dynamic_gate_only_clam_detach ==="; bash svd_gate_random_clam_detach/dynamic_gate_only_clam_detach.sh "$SEED" || echo "FAILED: 0.clam/svd_gate_random_clam_detach/dynamic_gate_only_clam_detach"
echo "=== 0.clam/svd_gate_random_clam_detach/dynamic_random_clam_detach ==="; bash svd_gate_random_clam_detach/dynamic_random_clam_detach.sh "$SEED" || echo "FAILED: 0.clam/svd_gate_random_clam_detach/dynamic_random_clam_detach"
echo "=== 0.clam/svd_gate_random_clam_detach/random_loss_only_clam_detach ==="; bash svd_gate_random_clam_detach/random_loss_only_clam_detach.sh "$SEED" || echo "FAILED: 0.clam/svd_gate_random_clam_detach/random_loss_only_clam_detach"
echo "=== 0.clam/svd_gate_random_clam_detach/svd_dynamic_clam_detach ==="; bash svd_gate_random_clam_detach/svd_dynamic_clam_detach.sh "$SEED" || echo "FAILED: 0.clam/svd_gate_random_clam_detach/svd_dynamic_clam_detach"
echo "=== 0.clam/svd_gate_random_clam_detach/svd_only_clam_detach ==="; bash svd_gate_random_clam_detach/svd_only_clam_detach.sh "$SEED" || echo "FAILED: 0.clam/svd_gate_random_clam_detach/svd_only_clam_detach"
echo "=== 0.clam/svd_gate_random_clam_detach/svd_random_clam_detach ==="; bash svd_gate_random_clam_detach/svd_random_clam_detach.sh "$SEED" || echo "FAILED: 0.clam/svd_gate_random_clam_detach/svd_random_clam_detach"
