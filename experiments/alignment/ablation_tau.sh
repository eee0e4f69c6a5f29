#!/usr/bin/env bash
# Alignment tau1/tau2 ablation sweep (mirrors reference
# alignment/experiments/ablation_*.sh); analyze with
# multimodal_fusion_tpu.utils.visualization.analyze_ablation
set -euo pipefail
for TAU1 in 0.05 0.1 0.2; do
  for TAU2 in 0.05 0.1; do
    python multimodal_fusion_tpu/cli/run_alignment.py \
      --base_dir "${NPZ_DIR:?set NPZ_DIR}" \
      --tau1 ${TAU1} --tau2 ${TAU2} \
      --max_steps 5000 --batch_size 64 \
      --save_path "align_t1${TAU1}_t2${TAU2}.npz"
  done
done
