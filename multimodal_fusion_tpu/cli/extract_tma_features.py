"""TMA feature-extraction CLI
(reference: ``alignment/tma_feature_extraction/extract_tma_features_uni.py:322-438``).

Walks ``<input_dir>/<marker>/*.png``, patches each core (256/stride 128,
optional white filter), extracts ViT-L CLS features, writes
``tma_uni_tile_1024_<marker>.npz`` keyed by core stem.

Pretrained UNI weights load from a converted numpy state dict via
``--weights``; without weights the encoder runs randomly initialised (the
gated HF checkpoint is not fetchable here) — pipeline behaviour is identical.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np
from flax import nnx

from multimodal_fusion_tpu.channels import TMA_MARKERS
from multimodal_fusion_tpu.data.tma_extraction import (
    extract_marker_features,
    make_feature_extractor,
    save_marker_npz,
)
from multimodal_fusion_tpu.models.vit import load_timm_vit_weights, vit_large_16


def build_parser():
    p = argparse.ArgumentParser(description="Extract TMA core features to per-marker NPZ")
    p.add_argument("--input_dir", type=str, required=True,
                   help="directory with <marker>/ subdirs of core PNGs")
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--markers", type=str, nargs="+", default=list(TMA_MARKERS))
    p.add_argument("--weights", type=str, default=None,
                   help="npz of timm UNI state dict (converted offline)")
    p.add_argument("--patch_size", type=int, default=256)
    p.add_argument("--stride", type=int, default=128)
    p.add_argument("--white_threshold", type=float, default=None)
    p.add_argument("--min_content_ratio", type=float, default=None)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--compute_dtype", type=str, choices=["float32", "bfloat16"],
                   default="float32",
                   help="bfloat16 runs the ViT matmuls natively on the MXU "
                        "(features stay f32; CLS cosine agreement > 0.999)")
    p.add_argument("--mesh_data", type=int, default=None,
                   help="shard each batch over an N-device data mesh "
                        "(weights replicate; identical features)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    from PIL import Image

    model = vit_large_16(nnx.Rngs(args.seed))
    if args.weights:
        state = dict(np.load(args.weights))
        n = load_timm_vit_weights(model, state)
        print(f"loaded {n} weight tensors")
    mesh = None
    if args.mesh_data and args.mesh_data > 1:
        from multimodal_fusion_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(args.mesh_data)
    extractor = make_feature_extractor(
        model, args.batch_size, compute_dtype=args.compute_dtype, mesh=mesh
    )

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    written = {}
    for marker in args.markers:
        # accept both our flat layout and the reference's data tree
        # (tma_tumorcenter_<MARKER> with uppercase markers,
        # extract_tma_features_uni.py:391); missing dirs WARN like the
        # reference instead of silently writing nothing
        candidates = [
            Path(args.input_dir) / marker,
            Path(args.input_dir) / f"tma_tumorcenter_{marker.upper()}",
            Path(args.input_dir) / f"tma_tumorcenter_{marker}",
        ]
        marker_dir = next((d for d in candidates if d.exists()), None)
        if marker_dir is None:
            print(f"WARNING: no directory for marker {marker!r} "
                  f"(tried {[str(c) for c in candidates]})")
            continue

        def stream():
            # decode one core at a time: a marker dir of large cores would
            # otherwise sit fully in host RAM before extraction starts
            for img_path in sorted(marker_dir.glob("*.png")):
                img = Image.open(img_path)
                if img.mode != "RGB":
                    img = img.convert("RGB")
                yield img_path.stem, np.asarray(img)

        feats = extract_marker_features(
            stream(), extractor, args.patch_size, args.stride,
            args.white_threshold, args.min_content_ratio,
        )
        out_path = out_dir / f"tma_uni_tile_1024_{marker}.npz"
        save_marker_npz(out_path, feats)
        written[marker] = len(feats)
        print(f"{marker}: {len(feats)} cores -> {out_path}")
    return written


def script_main(argv=None):
    """Console-script entry (pyproject [project.scripts]): pip's generated
    wrapper runs sys.exit(script_main()) — main's return value (a
    Path/dict/list result for programmatic callers) would otherwise be
    passed to sys.exit and turn every successful run into exit status 1."""
    main(argv)
    return 0


if __name__ == "__main__":
    main()
