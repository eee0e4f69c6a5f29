#!/usr/bin/env bash
# Missing-modality robustness sweep over a finished results dir
# (mirrors reference downstream_survival/utils robust.sh)
set -euo pipefail
RESULTS_DIR=${1:?usage: robust.sh <results_dir>}
python - <<PY
from multimodal_fusion_tpu.utils.robust import robustness_sweep
import os
robustness_sweep(
    "${RESULTS_DIR}",
    os.environ["CSV_PATH"],
    os.environ["DATA_ROOT"],
    drop_probs=(0.0, 0.1, 0.2, 0.3, 0.4, 0.5),
)
PY
