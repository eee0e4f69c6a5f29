#!/bin/bash
# 2.related_works/mfmf_for_loop.sh — generated from experiments/matrix.py (reference:
# downstream_survival/experiments/2.related_works/mfmf_for_loop{1,2,3}.sh). Edit the matrix, not this file.
# Sequential driver: runs each experiment in this group in order,
# continuing past failures (the reference dispatches these through a
# fire-and-forget task runner).
set -uo pipefail
SEED=${1:-5678}
cd "$(dirname "$0")"

# usage: mfmf_for_loop.sh <seed> [cfg...] — $1 is ALWAYS the seed;
# config indices follow (default: all 3)
if [ $# -ge 2 ]; then CONFIG_LIST=("${@:2}"); else CONFIG_LIST=($(seq 0 2)); fi
echo "Starting training loop for CONFIG indices: ${CONFIG_LIST[*]}"
for CFG in "${CONFIG_LIST[@]}"; do
  echo "=== mfmf_config$CFG ==="
  bash "mfmf_config$CFG.sh" "$SEED" || echo "FAILED: mfmf_config$CFG"
done
