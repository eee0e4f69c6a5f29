"""The whole framework end to end on synthetic data:

feature extraction -> aligned NPZ -> alignment pretraining -> survival h5
(+ VAE reconstruction + hypergraph build) -> survival training with the
hypergraph-consuming model -> robustness sweep.

This chains all five reference pipelines (SURVEY §0) through the public APIs.
"""

import numpy as np
import pytest
from flax import nnx

from multimodal_fusion_tpu.io.fixtures import make_synthetic_dataset

D = 32


@pytest.fixture(scope="module")
def pipeline_root(tmp_path_factory):
    return tmp_path_factory.mktemp("full")


def test_stage1_extraction_to_alignment(pipeline_root):
    """Synthetic core images -> tiny ViT features -> per-marker NPZ ->
    alignment training -> checkpoint."""
    from multimodal_fusion_tpu.data.alignment import TMANpzAlignedWithNegDataset
    from multimodal_fusion_tpu.data.tma_extraction import (
        extract_marker_features,
        make_feature_extractor,
        save_marker_npz,
    )
    from multimodal_fusion_tpu.models.alignment import MultiModalAlignmentModel
    from multimodal_fusion_tpu.models.vit import ViT
    from multimodal_fusion_tpu.train.alignment import MultiModalAlignmentTrainer

    rng = np.random.default_rng(0)
    vit = ViT(img_size=32, patch_size=16, embed_dim=D, depth=1, num_heads=4,
              rngs=nnx.Rngs(0))
    extractor = make_feature_extractor(vit, batch_size=4)
    markers = ["cd3", "cd8"]
    for mk in markers:
        images = {
            f"{mk}_block1_x{i}_y{i}_patient{i:03d}": rng.integers(
                0, 255, (48, 48, 3)
            ).astype(np.uint8)
            for i in range(6)
        }
        feats = extract_marker_features(images, extractor, patch_size=32, stride=16)
        save_marker_npz(pipeline_root / f"tma_uni_tile_1024_{mk}.npz", feats)

    ds = TMANpzAlignedWithNegDataset(pipeline_root, markers)
    assert len(ds) > 6
    model = MultiModalAlignmentModel(markers, feature_dim=D, num_layers=2, rngs=nnx.Rngs(1))
    trainer = MultiModalAlignmentTrainer(model, learning_rate=1e-3, lambda2=0.1)
    out = trainer.train(ds, ds, max_steps=3, batch_size=4, val_interval=3,
                        save_path=pipeline_root / "align_ckpt.npz")
    assert np.isfinite(out["best_val_loss"])
    assert (pipeline_root / "align_ckpt.npz").exists()


def test_stage2_vae_hypergraph_survival(pipeline_root, tmp_path):
    """Survival h5 dataset -> VAE reconstruction written back -> hypergraph
    built into the same files -> cust_omics trained on hypergraph channels ->
    robustness sweep on the flagship."""
    import h5py

    from multimodal_fusion_tpu.config import Configs, ExperimentConfig, ModelConfig
    from multimodal_fusion_tpu.data.multimodal import MultimodalDataset
    from multimodal_fusion_tpu.data.splits import create_k_fold_splits
    from multimodal_fusion_tpu.data.vae_patches import WSIVAEDataset
    from multimodal_fusion_tpu.hypergraph.build import process_dataset
    from multimodal_fusion_tpu.models.vae import VAE
    from multimodal_fusion_tpu.train.survival import SurvivalTrainer
    from multimodal_fusion_tpu.train.vae import VAETrainer, generate_reconstructed_wsi

    root = tmp_path / "surv"
    csv_path = make_synthetic_dataset(
        root, n_patients=10, seed=3, min_wsi_patches=24, max_wsi_patches=40,
        feature_dim=D, n_tma_patches=3,
    )
    # flat tma/features for the hypergraph pipeline
    for line in csv_path.read_text().strip().split("\n")[1:]:
        rel = line.split(",")[-1]
        with h5py.File(root / rel, "a") as f:
            parts = [np.asarray(f[f"tma/{m}/features"]) for m in sorted(f["tma"].keys())]
            f["tma/features"] = np.concatenate(parts)

    # VAE: train 1 epoch, write reconstructed features back
    vae_ds = WSIVAEDataset(csv_path, root, label_filter="living", preload=True)
    vae = VAE(input_dim=D, encoder_hidden=[16], decoder_hidden=[16], latent_dim=8,
              rngs=nnx.Rngs(0))
    VAETrainer(vae, learning_rate=1e-3).fit(vae_ds, vae_ds, epochs=1, batch_size=16)
    done = generate_reconstructed_wsi(vae, csv_path, root, batch_size=32)
    assert len(done) == 10

    # hypergraph built into the same files
    stats, summary = process_dataset(csv_path, root, 6, 2, 2, 3)
    assert summary["files"] == 10 and all("error" not in s for s in stats)

    # survival training on hypergraph channels with cust_omics
    ds = MultimodalDataset(
        csv_path, root,
        channels=[
            "hypergraph=wsi_super_features", "hypergraph=tma_features",
            "hypergraph=edge_index", "clinical=val", "clinical=mask",
        ],
    )
    mc = ModelConfig(
        model_type="cust_omics", n_classes=2, input_dim=D, model_size="32*16",
        dropout=0.1, output_dim=D,
        channels_used_in_model=[
            "hypergraph=wsi_super_features", "hypergraph=tma_features",
            "clinical=val", "clinical=mask",
        ],
        channel_input_dims={"clinical=val": 16},
    )
    mc.extra["hypergraph_hidden_dims"] = [16, 16]
    mc.extra["hypergraph_node_dim"] = D
    ec = ExperimentConfig(
        exp_name="hg", seed=0, k_folds=3, max_epochs=1, batch_size=4,
        lr=1e-3, patience=3, min_epochs=0,
        target_channels=[
            "hypergraph=wsi_super_features", "hypergraph=tma_features",
            "hypergraph=edge_index", "clinical=val", "clinical=mask",
        ],
    )
    ec.extra["verbose"] = False
    cfgs = Configs(experiment_config=ec, model_config=mc)
    trainer = SurvivalTrainer(cfgs, tmp_path / "hg_run")
    splits = create_k_fold_splits(ds.labels, 3, seed=0)
    summary = trainer.train_fold(ds, splits[0], 0)
    assert np.isfinite(summary["test_acc"])

    # serving over the HYPERGRAPH run: predict must round-trip the config
    # (incl. the extra hypergraph_* model keys), rebuild the hypergraph
    # channels from the h5 groups and score every case — the one model
    # family cli.export_model refuses is still fully served here
    from multimodal_fusion_tpu.utils.predict import predict

    cfgs.save(tmp_path / "hg_run" / "configs_hg.json")
    res = predict(
        tmp_path / "hg_run", csv_path, root, folds=[0],
        output_path=tmp_path / "hg_pred",
    )
    assert res["n_cases_scored"] == 10
    probs = np.array([[c["prob_0"], c["prob_1"]] for c in res["cases"]])
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=1e-5)
