#!/usr/bin/env bash
# VAE training over living-patient WSI embeddings + reconstructed-feature
# writeback (mirrors reference vae/run_train.sh)
set -euo pipefail
CSV_PATH=${CSV_PATH:?set CSV_PATH}
DATA_ROOT_DIR=${DATA_ROOT_DIR:?set DATA_ROOT_DIR}
CKPT_DIR=${CKPT_DIR:-./vae_ckpt}
python -m multimodal_fusion_tpu.cli.train_vae \
    --csv_path "$CSV_PATH" \
    --data_root_dir "$DATA_ROOT_DIR" \
    --label_filter living \
    --batch_size "${BATCH_SIZE:-1024}" \
    --epochs "${EPOCHS:-200}" \
    --lr "${LEARNING_RATE:-1e-4}" \
    --latent_dim "${LATENT_DIM:-128}" \
    --hidden_dims ${HIDDEN_DIMS:-512 256} \
    --checkpoint_dir "$CKPT_DIR"
python -m multimodal_fusion_tpu.cli.generate_reconstructed_wsi \
    --csv_path "$CSV_PATH" \
    --data_root_dir "$DATA_ROOT_DIR" \
    --checkpoint "$CKPT_DIR/best.npz" \
    --latent_dim "${LATENT_DIM:-128}" \
    --hidden_dims ${HIDDEN_DIMS:-512 256}
