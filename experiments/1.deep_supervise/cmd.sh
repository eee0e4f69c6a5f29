#!/bin/bash
# 1.deep_supervise/cmd.sh — generated from experiments/matrix.py (reference:
# downstream_survival/experiments/1.deep_supervise/cmd.sh). Edit the matrix, not this file.
# Sequential driver: runs each experiment in this group in order,
# continuing past failures (the reference dispatches these through a
# fire-and-forget task runner).
set -uo pipefail
SEED=${1:-5678}
cd "$(dirname "$0")"

echo "=== 1.deep_supervise/fix/ds_random_detach_fix ==="; bash fix/ds_random_detach_fix.sh "$SEED" || echo "FAILED: 1.deep_supervise/fix/ds_random_detach_fix"
echo "=== 1.deep_supervise/fix/ds_random_fix ==="; bash fix/ds_random_fix.sh "$SEED" || echo "FAILED: 1.deep_supervise/fix/ds_random_fix"
echo "=== 1.deep_supervise/fix/ds_svd_detach_fix ==="; bash fix/ds_svd_detach_fix.sh "$SEED" || echo "FAILED: 1.deep_supervise/fix/ds_svd_detach_fix"
echo "=== 1.deep_supervise/fix/ds_svd_fix ==="; bash fix/ds_svd_fix.sh "$SEED" || echo "FAILED: 1.deep_supervise/fix/ds_svd_fix"
echo "=== 1.deep_supervise/fix/ds_svd_random_detach_fix ==="; bash fix/ds_svd_random_detach_fix.sh "$SEED" || echo "FAILED: 1.deep_supervise/fix/ds_svd_random_detach_fix"
echo "=== 1.deep_supervise/fix/ds_svd_random_fix ==="; bash fix/ds_svd_random_fix.sh "$SEED" || echo "FAILED: 1.deep_supervise/fix/ds_svd_random_fix"
echo "=== 1.deep_supervise/random/ds_random ==="; bash random/ds_random.sh "$SEED" || echo "FAILED: 1.deep_supervise/random/ds_random"
echo "=== 1.deep_supervise/random/ds_random_detach ==="; bash random/ds_random_detach.sh "$SEED" || echo "FAILED: 1.deep_supervise/random/ds_random_detach"
echo "=== 1.deep_supervise/random/ds_svd ==="; bash random/ds_svd.sh "$SEED" || echo "FAILED: 1.deep_supervise/random/ds_svd"
echo "=== 1.deep_supervise/random/ds_svd_detach ==="; bash random/ds_svd_detach.sh "$SEED" || echo "FAILED: 1.deep_supervise/random/ds_svd_detach"
echo "=== 1.deep_supervise/random/ds_svd_random ==="; bash random/ds_svd_random.sh "$SEED" || echo "FAILED: 1.deep_supervise/random/ds_svd_random"
echo "=== 1.deep_supervise/random/ds_svd_random_detach ==="; bash random/ds_svd_random_detach.sh "$SEED" || echo "FAILED: 1.deep_supervise/random/ds_svd_random_detach"
echo "=== 1.deep_supervise/single_channel/all_ds ==="; bash single_channel/all_ds.sh "$SEED" || echo "FAILED: 1.deep_supervise/single_channel/all_ds"
echo "=== 1.deep_supervise/single_channel/blood_ds ==="; bash single_channel/blood_ds.sh "$SEED" || echo "FAILED: 1.deep_supervise/single_channel/blood_ds"
echo "=== 1.deep_supervise/single_channel/clinical_ds ==="; bash single_channel/clinical_ds.sh "$SEED" || echo "FAILED: 1.deep_supervise/single_channel/clinical_ds"
echo "=== 1.deep_supervise/single_channel/icd_ds ==="; bash single_channel/icd_ds.sh "$SEED" || echo "FAILED: 1.deep_supervise/single_channel/icd_ds"
echo "=== 1.deep_supervise/single_channel/pathological_ds ==="; bash single_channel/pathological_ds.sh "$SEED" || echo "FAILED: 1.deep_supervise/single_channel/pathological_ds"
echo "=== 1.deep_supervise/single_channel/tma_cell_density_ds ==="; bash single_channel/tma_cell_density_ds.sh "$SEED" || echo "FAILED: 1.deep_supervise/single_channel/tma_cell_density_ds"
