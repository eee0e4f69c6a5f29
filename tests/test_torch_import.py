"""User-facing torch-checkpoint import (utils/torch_import.py).

Each test trains nothing: it builds the ACTUAL reference torch model, saves
its checkpoint exactly as the reference trainers do (raw state_dict for
survival, ``model_state_dict`` dicts with torch.compile prefixes for
VAE/alignment), imports the file into our nnx model, and asserts forward
parity — the same bar as the transplant suites, but through the public
migration API and the on-disk artifact."""

import sys
import types
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference")
torch = pytest.importorskip("torch")
if not REF.exists():  # pragma: no cover
    pytest.skip("reference tree unavailable", allow_module_level=True)

sys.path.insert(0, str(REF / "downstream_survival"))
sys.path.insert(0, str(REF))


def _stub(name, attrs):
    parts = name.split(".")
    for i in range(1, len(parts) + 1):
        mod_name = ".".join(parts[:i])
        if mod_name not in sys.modules:
            sys.modules[mod_name] = types.ModuleType(mod_name)
    mod = sys.modules[name]
    for a, v in attrs.items():
        setattr(mod, a, v)


class _Dummy:
    def __init__(self, *a, **k):
        pass


_stub("libauc", {})
_stub("libauc.losses", {"AUCMLoss": _Dummy})
_stub("torch_geometric", {})
_stub("torch_geometric.nn", {"HypergraphConv": _Dummy, "GlobalAttention": _Dummy})
_stub("perceiver", {})
_stub("perceiver.model", {})
_stub("perceiver.model.core", {})
_stub("perceiver.model.core.modules", {"CrossAttentionLayer": _Dummy})

import jax.numpy as jnp
from flax import nnx

from multimodal_fusion_tpu.config import ModelConfig
from multimodal_fusion_tpu.models.factory import ModelFactory
from multimodal_fusion_tpu.utils.torch_import import (
    import_alignment_checkpoint,
    import_survival_checkpoint,
    import_vae_checkpoint,
)

D_IN, D_OUT, TAB = 48, 40, 12


def _inputs(seed=0, n_wsi=10, n_tma=4):
    rng = np.random.default_rng(seed)
    data = {
        "wsi=features": torch.tensor(
            rng.standard_normal((1, n_wsi, D_IN)), dtype=torch.float32
        ),
        "tma=cd3=features": torch.tensor(
            rng.standard_normal((1, n_tma, D_IN)), dtype=torch.float32
        ),
        "clinical=val": torch.tensor(
            rng.standard_normal((1, 1, TAB)), dtype=torch.float32
        ),
        "clinical=mask": torch.tensor(np.ones((1, 1, TAB)), dtype=torch.float32),
    }
    return data, torch.tensor([1])


def _jax_case(data):
    channels = {k: jnp.asarray(v.numpy()[0]) for k, v in data.items()}
    masks = {
        k: jnp.ones(channels[k].shape[0], bool)
        for k in channels
        if k.endswith("=features")
    }
    return {"channels": channels, "masks": masks}


def _roundtrip(tmp_path, ref_model, config, data, label, extra_cfg=None):
    """Save the torch state_dict as the survival trainer does, import it,
    return (ref_out, our model)."""
    with torch.no_grad():
        ref_out = ref_model(data, label)  # materialises lazy layers
    ckpt = tmp_path / "s_0_checkpoint.pt"
    torch.save(ref_model.state_dict(), ckpt)
    cfg = ModelConfig.from_dict({**config, **(extra_cfg or {})})
    mine = ModelFactory.create_model(cfg, seed=0)
    leftover = import_survival_checkpoint(mine, ckpt)
    return ref_out, mine, leftover


def test_import_svd_gate(tmp_path):
    from models.svd_gate_random_clam import SVDGateRandomClam as RefModel

    config = {
        "model_type": "svd_gate_random_clam", "n_classes": 2, "input_dim": D_IN,
        "model_size": "32*16", "dropout": 0.0, "output_dim": D_OUT,
        "channels_used_in_model": [
            "wsi=features", "tma=cd3=features", "clinical=val", "clinical=mask",
        ],
        "device": "cpu", "enable_svd": True, "enable_dynamic_gate": True,
        "enable_random_loss": False,
    }
    torch.manual_seed(0)
    ref = RefModel(config)
    ref.eval()
    data, label = _inputs()
    ref_out, mine, leftover = _roundtrip(
        tmp_path, ref, config, data, label,
        extra_cfg={"channel_input_dims": {"clinical=val": TAB}},
    )
    assert leftover == [], leftover

    data2, _ = _inputs(seed=7)
    with torch.no_grad():
        ref_out = ref(data2, torch.tensor([1]))
    out = mine(_jax_case(data2), jnp.asarray(1), train=False)
    np.testing.assert_allclose(
        np.asarray(out["logits"]), ref_out["logits"].numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["probabilities"]), ref_out["probabilities"].numpy(),
        rtol=1e-4, atol=1e-5,
    )


def test_import_clam_and_mil(tmp_path):
    from models.clam import CLAM as RefCLAM
    from models.mil import MIL_fc as RefMIL

    config = {
        "model_type": "clam", "n_classes": 2, "input_dim": D_IN,
        "model_size": "16*8", "dropout": 0.0, "output_dim": D_OUT,
        "channels_used_in_model": ["wsi=features"], "device": "cpu",
    }
    data, label = _inputs()
    for ref_cls, mt in ((RefCLAM, "clam"), (RefMIL, "mil")):
        torch.manual_seed(1)
        ref = ref_cls({**config, "model_type": mt})
        ref.eval()
        ref_out, mine, leftover = _roundtrip(
            tmp_path, ref, {**config, "model_type": mt}, data, label
        )
        assert leftover == [], (mt, leftover)
        with torch.no_grad():
            ref_out = ref(data, label)
        out = mine(_jax_case(data), jnp.asarray(1), train=False)
        np.testing.assert_allclose(
            np.asarray(out["logits"]), ref_out["logits"].numpy(),
            rtol=1e-4, atol=1e-5, err_msg=mt,
        )


def test_import_gate_mil(tmp_path):
    from models.gate_mil import GateMIL as RefModel

    config = {
        "model_type": "gate_mil", "n_classes": 2, "input_dim": D_IN,
        "model_size": "32*16", "dropout": 0.0, "output_dim": D_OUT,
        "channels_used_in_model": ["wsi=features", "clinical=val"],
        "device": "cpu", "confidence_weight": 1, "feature_weight_weight": 1,
    }
    torch.manual_seed(2)
    ref = RefModel(config)
    ref.eval()
    rng = np.random.default_rng(5)
    data = {
        "wsi=features": torch.tensor(
            rng.standard_normal((1, 6, D_IN)), dtype=torch.float32
        ),
        "clinical=val": torch.tensor(
            rng.standard_normal((1, 1, D_IN)), dtype=torch.float32
        ),
    }
    label = torch.tensor([1])
    ref_out, mine, leftover = _roundtrip(tmp_path, ref, config, data, label)
    # SampleAtt weights are dead in the reference (degenerate softmax) and
    # intentionally unmapped
    assert leftover and all(k.startswith("SampleAtt.") for k in leftover), leftover
    with torch.no_grad():
        ref_out = ref(data, label)
    case = {"channels": {k: jnp.asarray(v.numpy()[0]) for k, v in data.items()},
            "masks": {"wsi=features": jnp.ones(6, bool)}}
    out = mine(case, jnp.asarray(1), train=False)
    np.testing.assert_allclose(
        np.asarray(out["logits"]), ref_out["logits"].numpy(), rtol=1e-4, atol=1e-5
    )


def test_import_vae(tmp_path):
    from vae.models import VAE as RefVAE, Encoder as RefEnc, Decoder as RefDec

    from multimodal_fusion_tpu.models.vae import VAE as MyVAE

    torch.manual_seed(3)
    ref = RefVAE(RefEnc(D_IN, [32, 16], 8), RefDec(8, [16, 32], D_IN), device="cpu")
    ref.eval()
    # saved exactly as the reference trainer does, incl. torch.compile prefixes
    sd = {f"_orig_mod.{k}": v for k, v in ref.state_dict().items()}
    ckpt = tmp_path / "best.pt"
    torch.save({"model_state_dict": sd, "epoch": 3}, ckpt)

    mine = MyVAE(D_IN, [32, 16], [16, 32], 8, rngs=nnx.Rngs(0))
    leftover = import_vae_checkpoint(mine, ckpt)
    assert leftover == [], leftover

    x = np.random.default_rng(6).standard_normal((5, D_IN)).astype(np.float32)
    with torch.no_grad():
        mu_t, logvar_t = ref.encoder(torch.tensor(x))
        recon_t = ref.decoder(mu_t)
    mu_j, logvar_j = mine.encoder(jnp.asarray(x))
    recon_j = mine.decoder(mu_j)
    np.testing.assert_allclose(np.asarray(mu_j), mu_t.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(logvar_j), logvar_t.numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(recon_j), recon_t.numpy(), rtol=1e-4, atol=1e-5
    )


def test_import_alignment(tmp_path):
    from alignment.alignment_model import MultiModalAlignmentModel as RefModel

    from multimodal_fusion_tpu.models.alignment import MultiModalAlignmentModel as MyModel

    torch.manual_seed(4)
    ref = RefModel(["cd3", "cd8"], 16, num_layers=2)
    ref.eval()
    ckpt = tmp_path / "align.pt"
    torch.save({"model_state_dict": ref.state_dict(), "step": 10}, ckpt)

    mine = MyModel(["cd3", "cd8"], 16, num_layers=2, rngs=nnx.Rngs(0))
    leftover = import_alignment_checkpoint(mine, ckpt)
    assert leftover == [], leftover

    x = np.random.default_rng(8).standard_normal((3, 16)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref({"cd3": torch.tensor(x), "cd8": torch.tensor(x)})
    out = mine({"cd3": jnp.asarray(x), "cd8": jnp.asarray(x)})
    for m in ("cd3", "cd8"):
        np.testing.assert_allclose(
            np.asarray(out[m]), ref_out[m].numpy(), rtol=1e-4, atol=1e-5
        )


def test_import_alignment_then_export_chain(tmp_path):
    """Migration -> AOT deployment chain: a TRAINED torch reference
    alignment checkpoint converts to our npz, exports as a StableHLO
    artifact (--kind alignment), and the artifact's outputs match the torch
    original — reference weights servable with zero model code."""
    from alignment.alignment_model import MultiModalAlignmentModel as RefModel

    from multimodal_fusion_tpu.models.alignment import MultiModalAlignmentModel as MyModel
    from multimodal_fusion_tpu.train.checkpoint import save_model
    from multimodal_fusion_tpu.utils.export import (
        export_alignment_fn,
        load_serving_artifact,
        write_serving_artifact,
    )

    torch.manual_seed(11)
    ref = RefModel(["cd3", "cd8"], 16, num_layers=2)
    ref.eval()
    ckpt = tmp_path / "align.pt"
    torch.save({"model_state_dict": ref.state_dict(), "step": 10}, ckpt)

    mine = MyModel(["cd3", "cd8"], 16, num_layers=2, rngs=nnx.Rngs(0))
    assert import_alignment_checkpoint(mine, ckpt) == []
    save_model(tmp_path / "align.npz", mine)

    blob, meta = export_alignment_fn(tmp_path / "align.npz", platforms=["cpu"])
    write_serving_artifact(tmp_path / "art", blob, meta)
    art = load_serving_artifact(tmp_path / "art")
    assert art.meta["markers"] == ["cd3", "cd8"]

    x = np.random.default_rng(9).standard_normal((4, 16)).astype(np.float32)
    got = art({"cd3": x, "cd8": x})
    with torch.no_grad():
        want = ref({"cd3": torch.tensor(x), "cd8": torch.tensor(x)})
    for m in ("cd3", "cd8"):
        np.testing.assert_allclose(got[m], want[m].numpy(), rtol=1e-4, atol=1e-5)


def test_import_wrong_checkpoint_fails(tmp_path):
    """A checkpoint from a different architecture must raise, not silently
    partial-import."""
    from models.mil import MIL_fc as RefMIL

    config = {
        "model_type": "mil", "n_classes": 2, "input_dim": D_IN,
        "model_size": "16*8", "dropout": 0.0, "output_dim": D_OUT,
        "channels_used_in_model": ["wsi=features"], "device": "cpu",
    }
    torch.manual_seed(5)
    ref = RefMIL(config)
    ckpt = tmp_path / "mil.pt"
    torch.save(ref.state_dict(), ckpt)
    clam = ModelFactory.create_model(
        ModelConfig.from_dict({**config, "model_type": "clam"}), seed=0
    )
    with pytest.raises(KeyError):
        import_survival_checkpoint(clam, ckpt)

def test_import_results_dir_end_to_end(tmp_path):
    """Full migration: a reference-style results dir (configs_<exp>.json +
    torch fold checkpoints) converts to our npz layout, and cli.predict
    serves from the converted dir with fold-0 probabilities matching the
    torch model's forward."""
    import h5py
    import pandas as pd

    from models.svd_gate_random_clam import SVDGateRandomClam as RefModel

    from multimodal_fusion_tpu.cli.import_torch_results import import_results_dir
    from multimodal_fusion_tpu.cli.predict import main as predict_main
    from multimodal_fusion_tpu.config import Configs, ExperimentConfig

    channels = ["wsi=features", "tma=cd3=features"]
    mc = ModelConfig.from_dict({
        "model_type": "svd_gate_random_clam", "n_classes": 2, "input_dim": D_IN,
        "model_size": "32*16", "dropout": 0.0, "output_dim": D_OUT,
        "channels_used_in_model": channels, "enable_svd": True,
        "enable_dynamic_gate": True, "enable_random_loss": False,
    })
    ec = ExperimentConfig(
        exp_name="mig", seed=0, k_folds=2, max_epochs=1, batch_size=4,
        lr=1e-3, patience=5, min_epochs=0, monitor_metric="auc",
        monitor_mode="max", weighted_sampling=True,
    )
    ec.target_channels = channels
    src = tmp_path / "ref_results"
    src.mkdir()
    Configs(experiment_config=ec, model_config=mc).save(src / "configs_mig.json")

    torch.manual_seed(9)
    # drop our config's explicit Nones — the reference derives defaults
    # (e.g. alignment_channels) only for MISSING keys
    ref_cfg = {k: v for k, v in mc.to_dict().items() if v is not None}
    ref = RefModel({**ref_cfg, "device": "cpu"})
    ref.eval()
    data = {
        "wsi=features": torch.randn(1, 8, D_IN),
        "tma=cd3=features": torch.randn(1, 3, D_IN),
    }
    with torch.no_grad():
        ref(data, torch.tensor([0]))  # materialise lazy layers
    for fold in (0, 1):
        torch.save(ref.state_dict(), src / f"s_{fold}_checkpoint.pt")

    res = import_results_dir(src, tmp_path / "converted")
    assert res["folds"] == [0, 1] and res["unmapped_keys"] == {}

    # serve from the converted dir
    root = tmp_path / "data"
    root.mkdir()
    rng = np.random.default_rng(0)
    rows = []
    for i in range(3):
        with h5py.File(root / f"c{i}.h5", "w") as f:
            f["wsi/features"] = rng.standard_normal((8, D_IN)).astype(np.float32)
            f["tma/cd3/features"] = rng.standard_normal((3, D_IN)).astype(np.float32)
        rows.append({"patient_id": i, "case_id": f"c{i}", "label": "living",
                     "h5_file_path": f"c{i}.h5"})
    pd.DataFrame(rows).to_csv(root / "d.csv", index=False)
    predict_main([
        "--results_dir", str(tmp_path / "converted"),
        "--csv_path", str(root / "d.csv"), "--data_root_dir", str(root),
        "--output_path", str(tmp_path / "mig_pred"), "--folds", "0",
    ])
    dfp = pd.read_csv(tmp_path / "mig_pred.csv")
    assert len(dfp) == 3

    # fold-0 probabilities == the torch model's own forward on the same case
    for i in range(3):
        with h5py.File(root / f"c{i}.h5", "r") as f:
            tdata = {
                "wsi=features": torch.tensor(f["wsi/features"][...]).unsqueeze(0),
                "tma=cd3=features": torch.tensor(f["tma/cd3/features"][...]).unsqueeze(0),
            }
        with torch.no_grad():
            ref_out = ref(tdata, torch.tensor([0]))
        np.testing.assert_allclose(
            dfp[dfp.case_id == f"c{i}"]["prob_1"].iloc[0],
            ref_out["probabilities"].numpy()[0, 1],
            rtol=1e-3, atol=1e-4,
        )


@pytest.mark.parametrize("mt", ["ps3", "fbp", "mdlm", "svd_pool"])
def test_import_related_works(tmp_path, mt):
    """ps3/fbp/mdlm/svd_pool torch checkpoints import with empty leftover
    and forward parity (svd_pool compares on enable_svd alignment too)."""
    mods = {
        "ps3": ("models.ps3", "PS3"),
        "fbp": ("models.fbp", "FBP"),
        "mdlm": ("models.mdlm", "MDLM"),
        "svd_pool": ("models.svd_pool", "SVDPool"),
    }
    import importlib

    RefModel = getattr(importlib.import_module(mods[mt][0]), mods[mt][1])
    config = {
        "model_type": mt, "n_classes": 2, "input_dim": D_IN,
        "model_size": "32*16", "dropout": 0.0, "output_dim": D_OUT,
        "channels_used_in_model": [
            "wsi=features", "tma=cd3=features", "clinical=val", "clinical=mask",
        ],
        "device": "cpu",
    }
    if mt == "svd_pool":
        config.update(enable_svd=True, alignment_layer_num=2)
    torch.manual_seed(11)
    ref = RefModel(config)
    ref.eval()
    data, label = _inputs()
    ref_out, mine, leftover = _roundtrip(
        tmp_path, ref, config, data, label,
        extra_cfg={"channel_input_dims": {"clinical=val": TAB}},
    )
    assert leftover == [], (mt, leftover)
    data2, _ = _inputs(seed=13)
    with torch.no_grad():
        ref_out = ref(data2, torch.tensor([1]))
    out = mine(_jax_case(data2), jnp.asarray(1), train=False)
    np.testing.assert_allclose(
        np.asarray(out["logits"]), ref_out["logits"].numpy(),
        rtol=1e-3, atol=1e-4, err_msg=mt,
    )


def test_kfold_split_membership_matches_reference(tmp_path):
    """create_k_fold_splits must produce the reference's EXACT fold
    membership (review finding: the old even/odd val/test interleave
    diverged from the reference's nested StratifiedKFold, silently changing
    model selection and test metrics): random mode and fixed mode, including
    the reference's record-list JSON format."""
    import contextlib
    import json

    # only stub when absent: test_trained_parity installs a FUNCTIONAL AUROC
    # stub that must not be clobbered (suite-order GOTCHA)
    if "torchmetrics.classification" not in sys.modules or not hasattr(
        sys.modules["torchmetrics.classification"], "AUROC"
    ):
        _stub("torchmetrics", {})
        _stub("torchmetrics.classification", {"AUROC": _Dummy})

    @contextlib.contextmanager
    def _isolated(names):
        # evict/restore generic reference module names so suite order stays
        # irrelevant (CLAUDE.md GOTCHA: 'main' pulls 'trainer' with the
        # Dummy-AUROC binding, which would poison the golden parity tests)
        saved = {n: sys.modules.pop(n, None) for n in names}
        try:
            yield
        finally:
            for n in names:
                sys.modules.pop(n, None)
                if saved[n] is not None:
                    sys.modules[n] = saved[n]

    with _isolated(("main", "trainer")):
        import main as ref_main

    from multimodal_fusion_tpu.data.splits import create_k_fold_splits

    rng = np.random.default_rng(0)
    n = 40
    labels_str = np.asarray(["living" if x else "deceased" for x in rng.integers(0, 2, n)])
    label_int = (labels_str == "living").astype(int)
    case_ids = [f"patient_{i:03d}" for i in range(n)]

    class StubDS:
        def __len__(self):
            return n

    ds = StubDS()
    ds.case_ids = case_ids
    ds.case_to_label = dict(zip(case_ids, labels_str))

    # random mode
    ref_splits = ref_main.create_k_fold_splits(ds, k=4, seed=7)
    ours = create_k_fold_splits(label_int, 4, 7, patient_ids=case_ids)
    for f, (r, o) in enumerate(zip(ref_splits, ours)):
        for part in ("train", "val", "test"):
            np.testing.assert_array_equal(
                np.sort(np.asarray(r[part])), np.sort(getattr(o, f"{part}_idx")),
                err_msg=f"fold {f} {part}",
            )

    # fixed mode, reference record-list JSON
    records = [
        {"patient_id": case_ids[i], "dataset": "training" if i % 3 else "test"}
        for i in range(n)
    ]
    split_path = tmp_path / "split.json"
    split_path.write_text(json.dumps(records))
    fixed = ref_main.load_dataset_split(str(split_path))
    ref_splits = ref_main.create_k_fold_splits(ds, k=3, seed=5, fixed_test_split=fixed)
    ours = create_k_fold_splits(
        label_int, 3, 5, patient_ids=case_ids, fixed_split_path=split_path
    )
    for f, (r, o) in enumerate(zip(ref_splits, ours)):
        for part in ("train", "val", "test"):
            np.testing.assert_array_equal(
                np.asarray(r[part]), getattr(o, f"{part}_idx"),
                err_msg=f"fixed fold {f} {part}",
            )

    # unmatched train list raises informatively
    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps({"train": ["zz_9999"], "test": [case_ids[0]]}))
    with pytest.raises(ValueError, match="matched no dataset patient ids"):
        create_k_fold_splits(label_int, 3, 5, patient_ids=case_ids,
                             fixed_split_path=bad)


def test_import_results_dir_converts_alignment_checkpoint(tmp_path):
    """A reference results dir whose config names a torch alignment
    checkpoint migrates fully: the .pt converts to our npz, the copied
    config's path is rewritten, and the converted model's forward matches
    the torch original."""
    from alignment.alignment_model import MultiModalAlignmentModel as RefAlign

    from multimodal_fusion_tpu.cli.import_torch_results import import_results_dir
    from multimodal_fusion_tpu.config import Configs, ExperimentConfig
    from multimodal_fusion_tpu.models.alignment import (
        MultiModalAlignmentModel as MyAlign,
        infer_alignment_arch,
    )
    from multimodal_fusion_tpu.train.checkpoint import load_model
    from models.mil import MIL_fc as RefMIL

    src = tmp_path / "ref_results"
    src.mkdir()
    torch.manual_seed(12)
    ref_align = RefAlign(["cd3", "cd8"], 16, num_layers=2)
    torch.save({"model_state_dict": ref_align.state_dict()}, src / "align.pt")

    mc = ModelConfig.from_dict({
        "model_type": "mil", "n_classes": 2, "input_dim": D_IN,
        "model_size": "16*8", "dropout": 0.0, "output_dim": D_OUT,
        "channels_used_in_model": ["wsi=features"],
    })
    ec = ExperimentConfig(exp_name="m", seed=0, k_folds=1, max_epochs=1,
                          batch_size=4, lr=1e-3)
    ec.alignment_model_path = str(src / "align.pt")
    Configs(experiment_config=ec, model_config=mc).save(src / "configs_m.json")
    ref_mil = RefMIL({**mc.to_dict(), "device": "cpu"})
    torch.save(ref_mil.state_dict(), src / "s_0_checkpoint.pt")

    res = import_results_dir(src, tmp_path / "converted")
    assert res["alignment_model"] is not None
    conv = Path(res["alignment_model"])
    assert conv.exists()
    # rewritten config points at the converted npz
    cfg = Configs.load(tmp_path / "converted" / "configs_m.json")
    assert cfg.experiment_config.alignment_model_path == str(conv)
    # converted forward == torch original
    num_layers, dim = infer_alignment_arch(conv)
    mine = MyAlign(["cd3", "cd8"], feature_dim=dim, num_layers=num_layers,
                   rngs=nnx.Rngs(0))
    load_model(conv, mine)
    x = np.random.default_rng(2).standard_normal((3, 16)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref_align({"cd3": torch.tensor(x), "cd8": torch.tensor(x)})
    out = mine({"cd3": jnp.asarray(x), "cd8": jnp.asarray(x)})
    for m in ("cd3", "cd8"):
        np.testing.assert_allclose(
            np.asarray(out[m]), ref_out[m].numpy(), rtol=1e-4, atol=1e-5
        )
