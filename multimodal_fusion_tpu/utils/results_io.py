"""Shared bootstrap for tools that consume a trained survival results dir.

``cli.predict`` (serving), ``utils.robust`` (missing-modality sweep) and
``cli.export_model`` all start from the same artifact layout the trainer
persists (reference ``downstream_survival/trainer.py:741-745``):
``configs_<exp>.json`` + per-fold checkpoints + ``splits_<fold>.csv``.  This
module centralises that bootstrap so results-dir semantics — in particular
the PERSISTED ALIGNMENT MODEL (``exp.alignment_model_path`` /
``exp.aligned_channels``, applied at data-load time exactly as
``cli/main_survival.py`` does during training) — cannot silently diverge
between the tools.
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional, Tuple

from multimodal_fusion_tpu.config import Configs
from multimodal_fusion_tpu.data.multimodal import MultimodalDataset


def load_configs(results_dir: str | Path) -> Configs:
    results_dir = Path(results_dir)
    cfg_files = sorted(results_dir.glob("configs_*.json"))
    if not cfg_files:
        raise FileNotFoundError(f"no configs_*.json in {results_dir}")
    return Configs.load(cfg_files[0])


def discover_folds(results_dir: str | Path) -> List[int]:
    return [
        int(p.stem.split("_")[1])
        for p in sorted(Path(results_dir).glob("s_*_checkpoint.npz"))
    ]


def load_alignment(configs: Configs):
    """(alignment_apply_fn, align_channels_map) for the alignment model the
    config names, or ``(None, None)``.  Split out of ``build_dataset`` so a
    long-lived server (``utils/serve.py``) loads the checkpoint ONCE instead
    of per request."""
    exp = configs.experiment_config
    align_fn = None
    align_channels = None
    model_path = exp.get("alignment_model_path", None)
    if model_path and not Path(model_path).exists():
        # a named-but-missing alignment model must be a HARD error at
        # serving time: silently scoring raw features would be garbage
        raise FileNotFoundError(
            f"config names alignment_model_path={model_path!r} but the file "
            "does not exist on this host — copy the alignment checkpoint or "
            "clear the path in configs_*.json"
        )
    if model_path:
        from flax import nnx

        from multimodal_fusion_tpu.models.alignment import (
            MultiModalAlignmentModel,
            infer_alignment_arch,
        )
        from multimodal_fusion_tpu.train.alignment import make_alignment_apply_fn
        from multimodal_fusion_tpu.train.checkpoint import load_model

        # the persisted channel->modality MAP when present (colon-form
        # mappings); identity over the key list otherwise
        align_channels = dict(
            exp.get("aligned_channels_map", None)
            or {c: c for c in (exp.get("aligned_channels", None) or [])}
        )
        num_layers, feature_dim = infer_alignment_arch(model_path)
        model = MultiModalAlignmentModel(
            sorted(align_channels.values()),
            feature_dim=feature_dim,
            num_layers=num_layers,
            rngs=nnx.Rngs(0),
        )
        load_model(model_path, model)
        align_fn = make_alignment_apply_fn(model)
    return align_fn, align_channels


def build_dataset(configs: Configs, csv_path, data_root_dir,
                  align=None) -> MultimodalDataset:
    """Dataset over ``csv_path`` exactly as training built it: same target
    channels AND the persisted alignment model (when the config names one)
    producing ``aligned_<channel>`` features at load time.  Pass a preloaded
    ``align=(align_fn, align_channels)`` pair (from :func:`load_alignment`)
    to skip re-reading the alignment checkpoint."""
    align_fn, align_channels = align if align is not None else load_alignment(configs)
    return MultimodalDataset(
        csv_path,
        data_root_dir,
        channels=configs.experiment_config.target_channels,
        align_channels=align_channels,
        alignment_apply_fn=align_fn,
    )


def load_results_context(
    results_dir: str | Path,
    csv_path,
    data_root_dir,
    folds: Optional[List[int]] = None,
) -> Tuple[Configs, MultimodalDataset, "object", List[int]]:
    """(configs, dataset, trainer, folds) for a trained results dir."""
    from multimodal_fusion_tpu.train.survival import SurvivalTrainer

    results_dir = Path(results_dir)
    configs = load_configs(results_dir)
    dataset = build_dataset(configs, csv_path, data_root_dir)
    trainer = SurvivalTrainer(configs, results_dir)
    if folds is None:
        folds = discover_folds(results_dir)
    if not folds:
        raise FileNotFoundError(f"no s_<fold>_checkpoint.npz in {results_dir}")
    return configs, dataset, trainer, list(folds)
