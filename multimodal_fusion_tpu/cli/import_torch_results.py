"""Migrate a reference (torch) survival results dir into this framework.

Converts every ``s_<fold>_checkpoint.pt`` in a reference results dir
(``downstream_survival/trainer.py:741-745`` artifact layout) into our
``s_<fold>_checkpoint.npz`` format via the weight mappings in
``utils/torch_import.py``, and copies ``configs_<exp>.json`` (the JSON
schema is shared).  The output dir then works with every downstream tool:
``cli.predict`` (serving), ``SurvivalTrainer.evaluate_fold``,
``utils.robust.robustness_sweep`` and ``cli.export_model``.

Requires torch (CPU is fine) to read the .pt files; the reference's model
code is NOT needed.
"""

from __future__ import annotations

import argparse
import json
import shutil
from pathlib import Path

from flax import nnx

from multimodal_fusion_tpu.models.factory import ModelFactory
from multimodal_fusion_tpu.train.checkpoint import save_state
from multimodal_fusion_tpu.utils.torch_import import import_survival_checkpoint


def import_results_dir(src_dir: str | Path, out_dir: str | Path) -> dict:
    from multimodal_fusion_tpu.utils.results_io import load_configs

    src_dir, out_dir = Path(src_dir), Path(out_dir)
    configs = load_configs(src_dir)
    cfg_files = sorted(src_dir.glob("configs_*.json"))
    out_dir.mkdir(parents=True, exist_ok=True)
    cfg_out = out_dir / cfg_files[0].name
    shutil.copy2(cfg_files[0], cfg_out)
    for extra in src_dir.glob("splits_*.csv"):  # keep the persisted splits
        shutil.copy2(extra, out_dir / extra.name)

    # a torch-format alignment checkpoint named by the config converts too
    # (downstream tools hard-error on a missing/unreadable alignment model)
    align_path = configs.experiment_config.get("alignment_model_path", None)
    converted_alignment = None
    if align_path:
        src_align = Path(align_path)
        if not src_align.is_absolute():
            src_align = src_dir / src_align
        if src_align.exists() and src_align.suffix in (".pt", ".pth"):
            from multimodal_fusion_tpu.utils.torch_import import (
                convert_alignment_checkpoint,
            )

            converted_alignment = convert_alignment_checkpoint(
                src_align, out_dir / "alignment_model.npz"
            )
            raw = json.loads(cfg_out.read_text())
            raw["experiment_config"]["alignment_model_path"] = str(converted_alignment)
            cfg_out.write_text(json.dumps(raw, indent=2, sort_keys=True))
        elif not src_align.exists():
            print(f"WARNING: alignment_model_path {align_path!r} not found "
                  "next to the results dir; downstream tools will refuse to "
                  "run until the checkpoint is supplied or the path cleared")

    converted, leftovers = [], {}
    for ckpt in sorted(src_dir.glob("s_*_checkpoint.pt")):
        fold = int(ckpt.stem.split("_")[1])
        model = ModelFactory.create_model(
            configs.model_config, seed=configs.experiment_config.seed
        )
        leftover = import_survival_checkpoint(model, ckpt)
        _, params, rest = nnx.split(model, nnx.Param, ...)
        save_state(out_dir / f"s_{fold}_checkpoint.npz", {"params": params, "rest": rest})
        converted.append(fold)
        if leftover:
            leftovers[fold] = leftover
    if not converted:
        raise FileNotFoundError(f"no s_<fold>_checkpoint.pt in {src_dir}")
    return {
        "folds": converted,
        "out_dir": str(out_dir),
        "unmapped_keys": leftovers,
        "alignment_model": str(converted_alignment) if converted_alignment else None,
    }


def build_parser():
    p = argparse.ArgumentParser(
        description="Convert a reference torch results dir (configs + "
        "s_<fold>_checkpoint.pt) into this framework's npz checkpoints"
    )
    p.add_argument("--src_dir", type=str, required=True)
    p.add_argument("--out_dir", type=str, required=True)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    res = import_results_dir(args.src_dir, args.out_dir)
    print(json.dumps(res))
    return res


def script_main(argv=None):
    """Console-script entry (pyproject [project.scripts]): pip's generated
    wrapper runs sys.exit(script_main()) — main's return value (a
    Path/dict/list result for programmatic callers) would otherwise be
    passed to sys.exit and turn every successful run into exit status 1."""
    main(argv)
    return 0


if __name__ == "__main__":
    main()
