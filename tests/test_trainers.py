"""End-to-end trainer tests: survival k-fold, VAE, alignment — tiny configs
on synthetic fixtures."""

import json

import jax
import numpy as np
import pytest
from flax import nnx

from multimodal_fusion_tpu.config import Configs, ExperimentConfig, ModelConfig
from multimodal_fusion_tpu.data.multimodal import MultimodalDataset
from multimodal_fusion_tpu.data.splits import create_k_fold_splits
from multimodal_fusion_tpu.io.fixtures import (
    make_alignment_npz_fixtures,
    make_synthetic_dataset,
)


@pytest.fixture(scope="module")
def surv_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("surv")
    csv_path = make_synthetic_dataset(
        root, n_patients=12, seed=7, min_wsi_patches=20, max_wsi_patches=40,
        feature_dim=32, n_tma_patches=3,
    )
    ds = MultimodalDataset(
        csv_path, root,
        channels=["wsi=features", "tma=cd3=features", "clinical=val", "clinical=mask"],
    )
    return ds


def _configs(tmp_path):
    mc = ModelConfig(
        model_type="svd_gate_random_clam",
        n_classes=2,
        input_dim=32,
        model_size="32*16",
        dropout=0.1,
        output_dim=32,
        channels_used_in_model=["wsi=features", "tma=cd3=features", "clinical=val", "clinical=mask"],
        channel_input_dims={"clinical=val": 16},
    )
    ec = ExperimentConfig(
        exp_name="t", seed=0, k_folds=3, max_epochs=2, batch_size=4,
        lr=1e-3, patience=5, min_epochs=0, monitor_metric="auc",
        monitor_mode="max", weighted_sampling=True,
    )
    ec.extra["verbose"] = False
    return Configs(experiment_config=ec, model_config=mc)


def test_survival_train_fold(surv_dataset, tmp_path):
    from multimodal_fusion_tpu.train.survival import SurvivalTrainer

    cfgs = _configs(tmp_path)
    trainer = SurvivalTrainer(cfgs, tmp_path / "run")
    splits = create_k_fold_splits(surv_dataset.labels, 3, seed=0)
    summary = trainer.train_fold(surv_dataset, splits[0], 0)
    assert "test_auc" in summary and "val_auc" in summary
    assert len(summary["history"]) == 2
    assert (tmp_path / "run" / "s_0_checkpoint.npz").exists()
    assert (tmp_path / "run" / "splits_0.csv").exists()
    fold_json = json.loads((tmp_path / "run" / "fold_0_summary.json").read_text())
    assert "patient_results" in fold_json

    # eval-only path
    res = trainer.evaluate_fold(surv_dataset, splits[0], 0)
    assert "auc" in res and len(res["probs"]) == len(splits[0].test_idx)
    # modality dropout on the NON-detach flagship must fail loudly (the old
    # silent no-op faked robustness results — review finding); the detach
    # family is the drop_prob surface (test_robustness_sweep_and_plot)
    with pytest.raises(ValueError, match="does not support inference-time"):
        trainer.evaluate_fold(surv_dataset, splits[0], 0, drop_prob=0.5)


def test_survival_device_data_matches_host(surv_dataset, tmp_path):
    """exp.device_data=True (fold resident in device memory, windows as row
    gathers at a GLOBAL bucket size) must train identically to the host
    window path — same sampler order, same RNG stream, mask-aware padding
    invariance absorbs the bucket difference.  Alone and with scan_windows."""
    from multimodal_fusion_tpu.train.checkpoint import load_state
    from multimodal_fusion_tpu.train.survival import SurvivalTrainer

    def run(device_data, scan_windows, d):
        cfgs = _configs(tmp_path)
        cfgs.experiment_config.device_data = device_data
        cfgs.experiment_config.scan_windows = scan_windows
        trainer = SurvivalTrainer(cfgs, tmp_path / d)
        splits = create_k_fold_splits(surv_dataset.labels, 3, seed=0)
        summary = trainer.train_fold(surv_dataset, splits[0], 0)
        _, _, params, _ = trainer._fold_state
        return summary, params

    host, p_host = run(False, 1, "host")
    dev, p_dev = run(True, 1, "dev")
    dev_scan, p_dscan = run(True, 2, "dev_scan")
    for other, p_other in ((dev, p_dev), (dev_scan, p_dscan)):
        for h0, h1 in zip(host["history"], other["history"]):
            np.testing.assert_allclose(h0["train_loss"], h1["train_loss"], rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(h0["val_loss"], h1["val_loss"], rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(h0["val_auc"], h1["val_auc"], rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(host["test_auc"], other["test_auc"], rtol=1e-5, atol=1e-6)
        for a, b in zip(jax.tree.leaves(p_host), jax.tree.leaves(p_other)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
            )


def test_splits_modes(surv_dataset, tmp_path):
    labels = surv_dataset.labels
    splits = create_k_fold_splits(labels, 3, seed=1)
    assert len(splits) == 3
    for s in splits:
        all_idx = np.concatenate([s.train_idx, s.val_idx, s.test_idx])
        assert len(np.unique(all_idx)) == len(labels)
    # fixed mode
    spec = {"train": [str(i) for i in range(1, 9)], "test": [str(i) for i in range(9, 13)]}
    p = tmp_path / "split.json"
    p.write_text(json.dumps(spec))
    patient_ids = [surv_dataset.case_to_patient[c] for c in surv_dataset.case_ids]
    fixed = create_k_fold_splits(labels, 2, seed=1, patient_ids=patient_ids, fixed_split_path=p)
    test_set = set(fixed[0].test_idx.tolist())
    for s in fixed:
        assert set(s.test_idx.tolist()) == test_set
        assert not (set(s.train_idx.tolist()) & test_set)


def test_vae_fit_and_reconstruct(tmp_path):
    from multimodal_fusion_tpu.data.vae_patches import WSIVAEDataset
    from multimodal_fusion_tpu.models.vae import VAE
    from multimodal_fusion_tpu.train.vae import VAETrainer, generate_reconstructed_wsi
    from multimodal_fusion_tpu.io.h5io import read_channel

    root = tmp_path / "data"
    csv_path = make_synthetic_dataset(
        root, n_patients=4, seed=3, min_wsi_patches=30, max_wsi_patches=50, feature_dim=16
    )
    ds = WSIVAEDataset(csv_path, root, label_filter="living", preload=True)
    assert len(ds) > 0
    model = VAE(input_dim=16, encoder_hidden=[32, 16], decoder_hidden=[16, 32],
                latent_dim=8, rngs=nnx.Rngs(0))
    trainer = VAETrainer(model, learning_rate=1e-3, checkpoint_dir=tmp_path / "ckpt")
    out = trainer.fit(ds, ds, epochs=2, batch_size=16, verbose=False)
    assert np.isfinite(out["best_val_loss"])
    assert (tmp_path / "ckpt" / "best.npz").exists()

    # resume restores epoch counter
    tr2 = VAETrainer(model, checkpoint_dir=tmp_path / "ckpt")
    assert tr2.resume("latest")
    assert tr2.epoch == 1

    done = generate_reconstructed_wsi(model, csv_path, root, batch_size=32)
    assert len(done) == 4
    rel = csv_path.read_text().strip().split("\n")[1].split(",")[-1]
    rec = read_channel(root / rel, "wsi=reconstructed_features")
    orig = read_channel(root / rel, "wsi=features")
    assert rec.shape == orig.shape
    assert np.isfinite(rec).all()

    # writer is deterministic
    generate_reconstructed_wsi(model, csv_path, root, batch_size=32)
    rec2 = read_channel(root / rel, "wsi=reconstructed_features")
    np.testing.assert_array_equal(rec, rec2)


def test_vae_scan_steps_matches_sequential(tmp_path):
    """VAETrainer(scan_steps=S) must reproduce the sequential history and
    weights exactly (same batch order and RNG stream; the epoch tail that
    doesn't fill a scan group falls back to single steps)."""
    from multimodal_fusion_tpu.data.vae_patches import WSIVAEDataset
    from multimodal_fusion_tpu.models.vae import VAE
    from multimodal_fusion_tpu.train.vae import VAETrainer

    root = tmp_path / "data"
    csv_path = make_synthetic_dataset(
        root, n_patients=4, seed=3, min_wsi_patches=30, max_wsi_patches=50, feature_dim=16
    )
    ds = WSIVAEDataset(csv_path, root, label_filter="living", preload=True)

    def run(scan_steps):
        model = VAE(input_dim=16, encoder_hidden=[32, 16], decoder_hidden=[16, 32],
                    latent_dim=8, rngs=nnx.Rngs(0))
        tr = VAETrainer(model, learning_rate=1e-3, scan_steps=scan_steps)
        out = tr.fit(ds, ds, epochs=2, batch_size=8, verbose=False, resample=False)
        return out, nnx.state(model)

    seq, st1 = run(1)
    scan, st3 = run(3)
    for k in ("train_loss", "val_loss", "recon_loss", "kld_loss"):
        np.testing.assert_allclose(seq["history"][k], scan["history"][k], rtol=1e-5,
                                   err_msg=k)
    for a, b in zip(jax.tree.leaves(st1), jax.tree.leaves(st3)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)


def test_vae_device_data_matches_host(tmp_path):
    """fit(device_data=True) (patch subsample resident on device, batches as
    row gathers, table re-uploaded on resample) must reproduce the host
    path exactly — fresh same-seed datasets per run so the resample RNG
    streams line up; alone and combined with scan_steps."""
    from multimodal_fusion_tpu.data.vae_patches import WSIVAEDataset
    from multimodal_fusion_tpu.models.vae import VAE
    from multimodal_fusion_tpu.train.vae import VAETrainer

    root = tmp_path / "data"
    csv_path = make_synthetic_dataset(
        root, n_patients=4, seed=3, min_wsi_patches=120, max_wsi_patches=160,
        feature_dim=16,
    )

    def run(device_data, scan_steps):
        ds = WSIVAEDataset(csv_path, root, label_filter="living", preload=True, seed=9)
        model = VAE(input_dim=16, encoder_hidden=[32, 16], decoder_hidden=[16, 32],
                    latent_dim=8, rngs=nnx.Rngs(0))
        tr = VAETrainer(model, learning_rate=1e-3, scan_steps=scan_steps)
        out = tr.fit(ds, ds, epochs=3, batch_size=8, verbose=False,
                     resample=True, device_data=device_data)
        return out, nnx.state(model)

    host, st_h = run(False, 1)
    dev, st_d = run(True, 1)
    dev_scan, st_ds = run(True, 3)
    for other in (dev, dev_scan):
        for k in ("train_loss", "val_loss", "recon_loss", "kld_loss"):
            np.testing.assert_allclose(
                host["history"][k], other["history"][k], rtol=1e-5, err_msg=k
            )
    for st in (st_d, st_ds):
        for a, b in zip(jax.tree.leaves(st_h), jax.tree.leaves(st)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)


def test_alignment_training(tmp_path):
    from multimodal_fusion_tpu.data.alignment import TMANpzAlignedWithNegDataset
    from multimodal_fusion_tpu.models.alignment import MultiModalAlignmentModel
    from multimodal_fusion_tpu.train.alignment import (
        MultiModalAlignmentTrainer,
        make_alignment_apply_fn,
    )

    markers = ("cd3", "cd8", "he")
    paths = make_alignment_npz_fixtures(
        tmp_path, n_cores=10, patches_per_core=2, feature_dim=16, markers=markers
    )
    ds = TMANpzAlignedWithNegDataset(
        tmp_path, list(markers), filename_template="{marker}.npz", mismatch_ratio=1.0
    )
    assert len(ds) == 20
    model = MultiModalAlignmentModel(list(markers), feature_dim=16, num_layers=2, rngs=nnx.Rngs(0))
    trainer = MultiModalAlignmentTrainer(model, learning_rate=1e-3, lambda2=0.1)

    # 8:1:1-style split by tuple key
    keys = ds.normalized_keys
    groups = {"train": keys[:16], "val": keys[16:]}
    views = ds.split_by_ids_with_neg(groups, id_type="tuple")
    out = trainer.train(
        views["train"], views["val"], max_steps=6, batch_size=4,
        val_interval=3, save_path=tmp_path / "align.npz",
    )
    assert len(out["history"]["train_loss"]) <= 6
    assert np.isfinite(out["history"]["train_loss"][-1])
    assert np.isfinite(out["best_val_loss"])
    trainer.save_history(tmp_path / "align.history.json", config={"markers": list(markers)})
    hist = json.loads((tmp_path / "align.history.json").read_text())
    assert "history" in hist and "config" in hist

    # frozen predictor: only alignment layers move
    m2 = MultiModalAlignmentModel(list(markers), feature_dim=16, num_layers=2, rngs=nnx.Rngs(0))
    init_state = nnx.state(m2)
    pred_before = np.asarray(init_state["mlp_predictor"]["fc1"]["kernel"][...])
    pred_after = np.asarray(nnx.state(model)["mlp_predictor"]["fc1"]["kernel"][...])
    np.testing.assert_array_equal(pred_before, pred_after)
    align_before = np.asarray(init_state["alignment_layers"]["cd3"][0]["kernel"][...])
    align_after = np.asarray(nnx.state(model)["alignment_layers"]["cd3"][0]["kernel"][...])
    assert np.abs(align_before - align_after).max() > 0

    # dataset-side aligned-feature application
    fn = make_alignment_apply_fn(model)
    aligned = fn({"cd3": np.ones((2, 16), np.float32)})
    assert aligned["cd3"].shape == (2, 16)


def test_alignment_scan_steps_matches_sequential(tmp_path):
    """scan_steps=S (S updates fused into one lax.scan dispatch) must produce
    the identical step-indexed history and final weights as the sequential
    loop — same batch order, same RNG consumption, same update math."""
    from multimodal_fusion_tpu.data.alignment import TMANpzAlignedWithNegDataset
    from multimodal_fusion_tpu.models.alignment import MultiModalAlignmentModel
    from multimodal_fusion_tpu.train.alignment import MultiModalAlignmentTrainer

    markers = ("cd3", "cd8")
    make_alignment_npz_fixtures(
        tmp_path, n_cores=12, patches_per_core=1, feature_dim=8, markers=markers
    )
    ds = TMANpzAlignedWithNegDataset(
        tmp_path, list(markers), filename_template="{marker}.npz", mismatch_ratio=1.0
    )

    def run(scan_steps):
        model = MultiModalAlignmentModel(
            list(markers), feature_dim=8, num_layers=1, rngs=nnx.Rngs(3)
        )
        tr = MultiModalAlignmentTrainer(
            model, learning_rate=1e-3, lambda2=0.1, scan_steps=scan_steps
        )
        # val_interval=4 with scan_steps=3 exercises a partial chunk (3+1)
        out = tr.train(ds, ds, max_steps=8, batch_size=4, val_interval=4, seed=5)
        return out, nnx.state(model)

    seq, st1 = run(1)
    scan, st3 = run(3)
    assert seq["history"]["steps"] == scan["history"]["steps"]
    np.testing.assert_allclose(
        seq["history"]["train_loss"], scan["history"]["train_loss"], rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(seq["history"]["svd_values"]),
        np.asarray(scan["history"]["svd_values"]),
        rtol=1e-5,
    )
    for (a, b) in zip(
        [v["loss"] for v in seq["history"]["val_loss"]],
        [v["loss"] for v in scan["history"]["val_loss"]],
    ):
        np.testing.assert_allclose(a, b, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(st1), jax.tree.leaves(st3)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)


def test_alignment_device_data_matches_host(tmp_path):
    """device_data=True (dataset resident in device memory, batches as
    gathers) must reproduce the host-collate training exactly — same rows,
    same negative-pool slicing, same RNG — alone and combined with
    scan_steps."""
    from multimodal_fusion_tpu.data.alignment import TMANpzAlignedWithNegDataset
    from multimodal_fusion_tpu.models.alignment import MultiModalAlignmentModel
    from multimodal_fusion_tpu.train.alignment import MultiModalAlignmentTrainer

    markers = ("cd3", "cd8")
    make_alignment_npz_fixtures(
        tmp_path, n_cores=12, patches_per_core=1, feature_dim=8, markers=markers
    )
    ds = TMANpzAlignedWithNegDataset(
        tmp_path, list(markers), filename_template="{marker}.npz", mismatch_ratio=1.0
    )
    keys = ds.normalized_keys
    views = ds.split_by_ids_with_neg({"train": keys[:10], "val": keys[10:]})

    def run(device_data, scan_steps):
        model = MultiModalAlignmentModel(
            list(markers), feature_dim=8, num_layers=1, rngs=nnx.Rngs(3)
        )
        tr = MultiModalAlignmentTrainer(
            model, learning_rate=1e-3, lambda2=0.1, scan_steps=scan_steps
        )
        out = tr.train(views["train"], views["val"], max_steps=8, batch_size=4,
                       val_interval=4, seed=5, device_data=device_data)
        return out, nnx.state(model)

    host, st_h = run(False, 1)
    dev, st_d = run(True, 1)
    dev_scan, st_ds = run(True, 3)
    for other in (dev, dev_scan):
        np.testing.assert_allclose(
            host["history"]["train_loss"], other["history"]["train_loss"], rtol=1e-5
        )
        np.testing.assert_allclose(
            [v["loss"] for v in host["history"]["val_loss"]],
            [v["loss"] for v in other["history"]["val_loss"]],
            rtol=1e-5,
        )
    for st in (st_d, st_ds):
        for a, b in zip(jax.tree.leaves(st_h), jax.tree.leaves(st)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)


def test_volume_loss_training(tmp_path):
    from multimodal_fusion_tpu.data.alignment import TMANpzAlignedWithNegDataset
    from multimodal_fusion_tpu.models.alignment import MultiModalAlignmentModel
    from multimodal_fusion_tpu.train.alignment import MultiModalAlignmentTrainer

    markers = ("cd3", "cd8")
    make_alignment_npz_fixtures(
        tmp_path, n_cores=8, patches_per_core=1, feature_dim=8, markers=markers
    )
    ds = TMANpzAlignedWithNegDataset(
        tmp_path, list(markers), filename_template="{marker}.npz"
    )
    model = MultiModalAlignmentModel(list(markers), feature_dim=8, num_layers=1, rngs=nnx.Rngs(1))
    trainer = MultiModalAlignmentTrainer(model, loss_type="volume", lambda2=0.0)
    out = trainer.train(ds, ds, max_steps=3, batch_size=4, val_interval=3)
    assert np.isfinite(out["history"]["train_loss"][-1])


def test_cox_end_to_end(tmp_path):
    """CSV with time/event columns -> Cox head trains via group loss; eval
    reports C-index from the risk head."""
    import csv as _csv

    root = tmp_path / "coxdata"
    csv_path = make_synthetic_dataset(
        root, n_patients=12, seed=13, min_wsi_patches=16, max_wsi_patches=24,
        feature_dim=32, n_tma_patches=3,
    )
    # append time/event columns
    rows = list(_csv.DictReader(open(csv_path)))
    rng = np.random.default_rng(0)
    for r in rows:
        r["time"] = f"{rng.uniform(0.5, 5.0):.3f}"
        r["event"] = str(int(r["label"] == "deceased"))
    with open(csv_path, "w", newline="") as f:
        w = _csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)

    from multimodal_fusion_tpu.config import Configs, ExperimentConfig, ModelConfig
    from multimodal_fusion_tpu.train.survival import SurvivalTrainer

    ds = MultimodalDataset(
        csv_path, root,
        channels=["wsi=features", "tma=cd3=features", "clinical=val", "clinical=mask"],
    )
    assert ds.has_survival_time
    mc = ModelConfig(
        model_type="cox_svd_gate_random_clam", n_classes=2, input_dim=32,
        model_size="32*16", dropout=0.1, output_dim=32,
        channels_used_in_model=["wsi=features", "tma=cd3=features", "clinical=val", "clinical=mask"],
        channel_input_dims={"clinical=val": 16},
    )
    ec = ExperimentConfig(
        exp_name="cox", seed=0, k_folds=3, max_epochs=1, batch_size=4,
        lr=1e-3, patience=3, min_epochs=0,
    )
    ec.extra["verbose"] = False
    trainer = SurvivalTrainer(Configs(experiment_config=ec, model_config=mc), tmp_path / "coxrun")
    splits = create_k_fold_splits(ds.labels, 3, seed=0)
    summary = trainer.train_fold(ds, splits[0], 0)
    assert np.isfinite(summary["test_acc"])
    # C-index present in the final eval
    key = __import__("jax").random.key(0)
    model, graphdef, params, rest = trainer._fold_state[0], *trainer._fold_state[1:]
    res = trainer._evaluate(ds, splits[0].test_idx, trainer._make_eval_step(model, graphdef), params, rest, key)
    assert "c_index" in res
    assert np.isnan(res["c_index"]) or 0.0 <= res["c_index"] <= 1.0


def test_alignment_verbose_timing(tmp_path, capsys):
    from multimodal_fusion_tpu.data.alignment import TMANpzAlignedWithNegDataset
    from multimodal_fusion_tpu.models.alignment import MultiModalAlignmentModel
    from multimodal_fusion_tpu.train.alignment import MultiModalAlignmentTrainer

    markers = ("cd3", "cd8")
    make_alignment_npz_fixtures(
        tmp_path, n_cores=6, patches_per_core=1, feature_dim=8, markers=markers
    )
    ds = TMANpzAlignedWithNegDataset(tmp_path, list(markers), filename_template="{marker}.npz")
    model = MultiModalAlignmentModel(list(markers), feature_dim=8, num_layers=1, rngs=nnx.Rngs(0))
    trainer = MultiModalAlignmentTrainer(model, lambda2=0.0, verbose_timing=True)
    trainer.train(ds, ds, max_steps=2, batch_size=3, val_interval=2)
    report = capsys.readouterr().out
    assert "train_step" in report and "data_loading" in report
    assert trainer.timer.summary()["train_step"]["count"] == 2


def test_trainer_determinism(surv_dataset, tmp_path):
    """Same seed -> identical training history and final metrics."""
    from multimodal_fusion_tpu.train.survival import SurvivalTrainer

    def run(dir_):
        cfgs = _configs(tmp_path)
        trainer = SurvivalTrainer(cfgs, dir_)
        splits = create_k_fold_splits(surv_dataset.labels, 3, seed=0)
        return trainer.train_fold(surv_dataset, splits[0], 0)

    s1 = run(tmp_path / "r1")
    s2 = run(tmp_path / "r2")
    assert s1["history"][0]["train_loss"] == s2["history"][0]["train_loss"]
    assert s1["test_auc"] == s2["test_auc"] or (
        np.isnan(s1["test_auc"]) and np.isnan(s2["test_auc"])
    )
    np.testing.assert_array_equal(
        [h["val_loss"] for h in s1["history"]],
        [h["val_loss"] for h in s2["history"]],
    )


def test_weighted_sampler_balances_classes():
    from multimodal_fusion_tpu.data.splits import WeightedRandomSampler

    labels = np.array([0] * 90 + [1] * 10)
    s = WeightedRandomSampler(labels, seed=0)
    draws = np.concatenate([labels[s.sample_epoch()] for _ in range(30)])
    frac_pos = (draws == 1).mean()
    assert 0.4 < frac_pos < 0.6  # inverse-frequency => ~balanced
    # deterministic given seed
    a = WeightedRandomSampler(labels, seed=7).sample_epoch()
    b = WeightedRandomSampler(labels, seed=7).sample_epoch()
    np.testing.assert_array_equal(a, b)


def test_cli_scheduler_params_roundtrip(tmp_path):
    """--lr_scheduler + JSON params flow into the saved config and LRSchedule."""
    from multimodal_fusion_tpu.cli.main_survival import args_to_configs, build_parser
    from multimodal_fusion_tpu.train.optim import LRSchedule

    args = build_parser().parse_args([
        "--lr_scheduler", "step",
        "--lr_scheduler_params", '{"step_size": 3, "gamma": 0.1}',
        "--lr", "0.01",
    ])
    cfgs = args_to_configs(args, {})
    assert cfgs.experiment_config.scheduler == "step"
    sched = LRSchedule(0.01, {"type": "step", **cfgs.experiment_config.scheduler_params})
    assert sched.lr_for_epoch(0) == 0.01
    assert abs(sched.lr_for_epoch(3) - 0.001) < 1e-9
    # JSON round-trip preserves params
    p = tmp_path / "configs_x.json"
    cfgs.save(p)
    from multimodal_fusion_tpu.config import Configs

    loaded = Configs.load(p)
    assert loaded.experiment_config.scheduler_params == {"step_size": 3, "gamma": 0.1}


def test_bf16_eval_matches_f32(surv_dataset, tmp_path):
    """Opt-in bf16 inference (model_config.compute_dtype): probabilities
    within bf16 tolerance of the f32 path, same AUC on this fixture."""
    from multimodal_fusion_tpu.train.survival import SurvivalTrainer

    cfgs = _configs(tmp_path)
    trainer = SurvivalTrainer(cfgs, tmp_path / "run_bf16")
    splits = create_k_fold_splits(surv_dataset.labels, 3, seed=0)
    trainer.train_fold(surv_dataset, splits[0], 0)

    res32 = trainer.evaluate_fold(surv_dataset, splits[0], 0)
    cfgs.model_config.extra["compute_dtype"] = "bfloat16"
    res16 = trainer.evaluate_fold(surv_dataset, splits[0], 0)
    cfgs.model_config.extra.pop("compute_dtype")

    p32 = np.asarray(res32["probs"], np.float32)
    p16 = np.asarray(res16["probs"], np.float32)
    np.testing.assert_allclose(p16, p32, atol=4e-2)
    # tiny k=3 test split may be single-class (AUC undefined on both paths);
    # when defined, bf16 must agree with f32
    if np.isfinite(res32["auc"]):
        assert abs(res16["auc"] - res32["auc"]) < 0.05
    else:
        assert not np.isfinite(res16["auc"])
    assert np.isfinite(res16["loss"])


def test_remat_training_matches_baseline(surv_dataset, tmp_path):
    """exp.remat=True (jax.checkpoint per-case forwards) must be numerically
    identical training — same history losses and final AUCs."""
    from multimodal_fusion_tpu.train.survival import SurvivalTrainer

    splits = create_k_fold_splits(surv_dataset.labels, 3, seed=0)

    def run(remat, d):
        cfgs = _configs(tmp_path)
        cfgs.experiment_config.remat = remat
        tr = SurvivalTrainer(cfgs, tmp_path / d)
        return tr.train_fold(surv_dataset, splits[0], 0)

    base = run(False, "r0")
    rem = run(True, "r1")
    for h0, h1 in zip(base["history"], rem["history"]):
        np.testing.assert_allclose(h0["train_loss"], h1["train_loss"], rtol=1e-4, atol=1e-5)
    assert base["test_auc"] == rem["test_auc"] or abs(base["test_auc"] - rem["test_auc"]) < 1e-6 or (
        np.isnan(base["test_auc"]) and np.isnan(rem["test_auc"])
    )


def test_scan_windows_matches_sequential(surv_dataset, tmp_path):
    """exp.scan_windows=W (W window updates fused into one lax.scan dispatch)
    must train identically to the sequential per-window dispatch path: same
    RNG consumption order, same window order, same update math."""
    from multimodal_fusion_tpu.train.survival import SurvivalTrainer

    splits = create_k_fold_splits(surv_dataset.labels, 3, seed=0)

    def run(scan_windows, d):
        cfgs = _configs(tmp_path)
        cfgs.experiment_config.scan_windows = scan_windows
        tr = SurvivalTrainer(cfgs, tmp_path / d)
        summary = tr.train_fold(surv_dataset, splits[0], 0)
        ckpt = np.load(tmp_path / d / "s_0_checkpoint.npz")
        return summary, {k: ckpt[k] for k in ckpt.files}

    base, st0 = run(1, "s1")
    # W=2 exercises full scan groups AND an epoch-tail partial group
    # (12 patients / batch_size 4 -> 2 train windows of 4 + leftover)
    scan, st2 = run(2, "s2")
    for h0, h1 in zip(base["history"], scan["history"]):
        np.testing.assert_allclose(h0["train_loss"], h1["train_loss"], rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(h0["val_loss"], h1["val_loss"], rtol=1e-5, atol=1e-6)
    assert set(st0) == set(st2)
    for k in st0:
        np.testing.assert_allclose(st0[k], st2[k], rtol=1e-5, atol=1e-6, err_msg=k)


def test_vae_resume_restores_plateau_state(tmp_path):
    """The plateau tracker (_plateau_best/_plateau_count) must survive
    checkpoint/resume — the reference restores scheduler.state_dict
    (vae/train.py:267,293-294); resetting it delayed LR reductions by up to
    patience+1 epochs on resume (review finding)."""
    from multimodal_fusion_tpu.models.vae import VAE
    from multimodal_fusion_tpu.train.vae import VAETrainer

    model = VAE(input_dim=8, encoder_hidden=[8], decoder_hidden=[8],
                latent_dim=4, rngs=nnx.Rngs(0))
    tr = VAETrainer(model, checkpoint_dir=tmp_path)
    tr.plateau_step(0.5)
    tr.plateau_step(0.6)
    tr.plateau_step(0.6)
    assert tr._plateau_best == 0.5 and tr._plateau_count == 2
    tr.save_checkpoint("latest")

    tr2 = VAETrainer(model, checkpoint_dir=tmp_path)
    assert tr2.resume("latest")
    assert tr2._plateau_best == 0.5 and tr2._plateau_count == 2
    # torch rel-threshold semantics: noise-level drift is NOT an improvement
    tr2.plateau_step(0.5 - 1e-8)
    assert tr2._plateau_count == 3


def test_alignment_requires_negatives_for_loss_im(tmp_path):
    """lambda2 != 0 without a negative pool must raise like the reference
    (alignment/trainer.py:305-306), not silently optimise a different
    objective (review finding)."""
    import pytest

    from multimodal_fusion_tpu.data.alignment import TMANpzAlignedWithNegDataset
    from multimodal_fusion_tpu.models.alignment import MultiModalAlignmentModel
    from multimodal_fusion_tpu.train.alignment import MultiModalAlignmentTrainer

    markers = ("cd3", "cd8")
    make_alignment_npz_fixtures(
        tmp_path, n_cores=6, patches_per_core=1, feature_dim=8, markers=markers
    )
    ds = TMANpzAlignedWithNegDataset(
        tmp_path, list(markers), filename_template="{marker}.npz",
        mismatch_ratio=0.0,
    )  # empty negative pool
    model = MultiModalAlignmentModel(list(markers), feature_dim=8, num_layers=1,
                                     rngs=nnx.Rngs(0))
    trainer = MultiModalAlignmentTrainer(model, lambda2=0.1)
    with pytest.raises(RuntimeError, match="Negative features"):
        trainer.train(ds, ds, max_steps=2, batch_size=4)


def test_prefetched_windows_error_and_abort(tmp_path):
    """Producer h5/read errors must REACH the consumer (a swallowed error
    silently truncated the epoch), and closing the generator mid-epoch must
    not deadlock the producer on a full queue (review findings)."""
    import time as _time

    from multimodal_fusion_tpu.config import Configs, ExperimentConfig, ModelConfig
    from multimodal_fusion_tpu.train.survival import SurvivalTrainer

    mc = ModelConfig(
        model_type="mil", n_classes=2, input_dim=8, model_size="8*4",
        output_dim=8, channels_used_in_model=["wsi=features"],
    )
    ec = ExperimentConfig(exp_name="pf", seed=0, k_folds=2, max_epochs=1,
                          batch_size=2, lr=1e-3)
    tr = SurvivalTrainer(Configs(experiment_config=ec, model_config=mc), tmp_path)

    class FakeDataset:
        case_ids = [f"c{i}" for i in range(12)]
        has_survival_time = False

        def __init__(self, fail_at=None):
            self.fail_at = fail_at
            self.calls = 0

        def get_case(self, cid):
            self.calls += 1
            if self.fail_at is not None and self.calls >= self.fail_at:
                raise OSError("h5 read failed")
            rng = np.random.default_rng(0)
            return {"wsi=features": rng.standard_normal((4, 8)).astype(np.float32)}, 0

    # error propagation
    ds = FakeDataset(fail_at=5)
    gen = tr._windows_prefetched(ds, list(range(12)), G=2)
    with np.testing.assert_raises(OSError):
        for _ in gen:
            pass

    # abort without deadlock: consume one window, close, must return fast
    ds2 = FakeDataset()
    gen2 = tr._windows_prefetched(ds2, list(range(12)), G=2)
    next(gen2)
    t0 = _time.time()
    gen2.close()
    assert _time.time() - t0 < 5.0


def test_early_stopping_flag_gates_stop_and_restore(surv_dataset, tmp_path):
    """Without --early_stopping the reference trains ALL epochs and
    evaluates the FINAL weights (trainer.py:691-744); the flag previously
    did nothing and training always stopped/restored-best (review
    finding)."""
    from multimodal_fusion_tpu.train.survival import SurvivalTrainer

    cfgs = _configs(tmp_path)
    cfgs.experiment_config.early_stopping = False
    cfgs.experiment_config.max_epochs = 3
    cfgs.experiment_config.patience = 1
    cfgs.experiment_config.min_epochs = 0
    trainer = SurvivalTrainer(cfgs, tmp_path / "r_no_es")
    splits = create_k_fold_splits(surv_dataset.labels, 3, seed=0)
    summary = trainer.train_fold(surv_dataset, splits[0], 0)
    # all epochs ran (patience=1 would have stopped earlier if gated on)
    assert len(summary["history"]) == 3
    # final weights persisted for eval tools
    assert (tmp_path / "r_no_es" / "s_0_checkpoint.npz").exists()

    cfgs2 = _configs(tmp_path)
    cfgs2.experiment_config.early_stopping = True
    cfgs2.experiment_config.max_epochs = 3
    cfgs2.experiment_config.patience = 1
    cfgs2.experiment_config.min_epochs = 0
    trainer2 = SurvivalTrainer(cfgs2, tmp_path / "r_es")
    summary2 = trainer2.train_fold(surv_dataset, splits[0], 0)
    assert len(summary2["history"]) <= 3  # may stop early; ckpt = best
    assert (tmp_path / "r_es" / "s_0_checkpoint.npz").exists()


def test_vae_scalar_log_rows_appear_midtraining(tmp_path):
    """Live observability (reference TB scalars, vae/train.py:162-165): the
    scalar CSV must gain rows DURING training, not at exit — captured by
    snapshotting the file from inside the epoch loop via the validate hook."""
    from multimodal_fusion_tpu.data.vae_patches import WSIVAEDataset
    from multimodal_fusion_tpu.models.vae import VAE
    from multimodal_fusion_tpu.train.vae import VAETrainer

    root = tmp_path / "data"
    csv_path = make_synthetic_dataset(
        root, n_patients=4, seed=3, min_wsi_patches=30, max_wsi_patches=50,
        feature_dim=16,
    )
    ds = WSIVAEDataset(csv_path, root, label_filter="living", preload=True)
    model = VAE(input_dim=16, encoder_hidden=[32, 16], decoder_hidden=[16, 32],
                latent_dim=8, rngs=nnx.Rngs(0))
    log_path = tmp_path / "scalars.csv"
    trainer = VAETrainer(model, learning_rate=1e-3, scalar_log_path=log_path)

    seen_midtraining = []
    orig_validate = trainer.validate

    def spying_validate(*a, **k):
        # called once per epoch BEFORE the row for that epoch is written:
        # rows seen here were flushed by earlier epochs -> live emission
        seen_midtraining.append(log_path.read_text() if log_path.exists() else "")
        return orig_validate(*a, **k)

    trainer.validate = spying_validate
    trainer.fit(ds, ds, epochs=3, batch_size=16, verbose=False, resample=False)

    # by the 3rd epoch's validation, epochs 0 and 1 must already be on disk
    rows = [l for l in seen_midtraining[2].strip().splitlines() if l]
    assert len(rows) == 3  # header + 2 epochs
    assert rows[0].startswith("epoch,step,train_loss")
    final = [l for l in log_path.read_text().strip().splitlines() if l]
    assert len(final) == 4  # header + 3 epochs
    # columns parse as floats
    vals = final[1].split(",")
    assert float(vals[2]) > 0  # train_loss


def test_alignment_scalar_log_rows_appear_midtraining(tmp_path):
    """Alignment live scalars: a row per validation interval, flushed
    immediately (reference's tqdm live postfix equivalent)."""
    from multimodal_fusion_tpu.data.alignment import TMANpzAlignedWithNegDataset
    from multimodal_fusion_tpu.models.alignment import MultiModalAlignmentModel
    from multimodal_fusion_tpu.train.alignment import MultiModalAlignmentTrainer

    markers = ("cd3", "cd8")
    make_alignment_npz_fixtures(
        tmp_path, n_cores=12, patches_per_core=1, feature_dim=8, markers=markers
    )
    ds = TMANpzAlignedWithNegDataset(
        tmp_path, list(markers), filename_template="{marker}.npz", mismatch_ratio=1.0
    )
    model = MultiModalAlignmentModel(
        list(markers), feature_dim=8, num_layers=1, rngs=nnx.Rngs(3)
    )
    log_path = tmp_path / "align_scalars.csv"
    tr = MultiModalAlignmentTrainer(
        model, learning_rate=1e-3, lambda2=0.1, scalar_log_path=log_path
    )

    seen = []
    orig_validate = tr.validate

    def spying_validate(*a, **k):
        seen.append(log_path.read_text() if log_path.exists() else "")
        return orig_validate(*a, **k)

    tr.validate = spying_validate
    tr.train(ds, ds, max_steps=12, batch_size=4, val_interval=4, seed=5)

    # at the 3rd validation call, intervals 1 and 2 are already on disk
    rows = [l for l in seen[2].strip().splitlines() if l]
    assert len(rows) == 3  # header + 2 interval rows
    assert rows[0].startswith("step,train_loss,val_loss,svd_top")
    final = [l for l in log_path.read_text().strip().splitlines() if l]
    assert len(final) == 4  # header + 3 interval rows
    step, train_loss, val_loss, svd_top = final[1].split(",")
    assert int(step) == 4 and float(val_loss) > 0
