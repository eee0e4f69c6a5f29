#!/bin/bash
set -euo pipefail
cd "$(dirname "$0")"
bash ablation_tau1.sh
bash ablation_tau2.sh
bash ablation_lambda1.sh
bash ablation_lambda2.sh
bash ablation_num_layers.sh
bash ablation_seed.sh
bash ablation_mismatch_ratio.sh
bash ablation_loss2_chunk_size.sh
