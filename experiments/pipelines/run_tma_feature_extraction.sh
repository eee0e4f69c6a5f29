#!/usr/bin/env bash
# TMA core -> UNI-ViT patch features -> per-marker NPZ
# (mirrors reference alignment/tma_feature_extraction/run_tma_feature_extraction.sh)
set -euo pipefail
INPUT_DIR=${INPUT_DIR:?set INPUT_DIR (TMA core images)}
OUTPUT_DIR=${OUTPUT_DIR:?set OUTPUT_DIR (NPZ encodings)}
python -m multimodal_fusion_tpu.cli.extract_tma_features \
    --input_dir "$INPUT_DIR" \
    --output_dir "$OUTPUT_DIR" \
    ${UNI_WEIGHTS:+--weights "$UNI_WEIGHTS"} \
    --batch_size "${BATCH_SIZE:-64}"
