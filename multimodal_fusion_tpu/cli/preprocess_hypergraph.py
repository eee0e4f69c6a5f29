"""Hypergraph preprocessing CLI
(reference: ``build_hypergraph/preprocess_hypergraph.py:681-723``)."""

from __future__ import annotations

import argparse
import json

from multimodal_fusion_tpu.hypergraph.build import (
    batch_cache_similarity,
    batch_rebuild_hypergraph,
    process_dataset,
)


def build_parser():
    p = argparse.ArgumentParser(description="Build WSI+TMA hypergraphs into patient h5 files")
    p.add_argument("--csv_path", type=str, required=True)
    p.add_argument("--data_root_dir", type=str, required=True)
    p.add_argument("--num_wsi_super_patches", type=int, default=100)
    p.add_argument("--num_groups", type=int, default=10)
    p.add_argument("--hypergraph_k", type=int, default=5)
    p.add_argument("--num_hyperedges", type=int, default=10)
    p.add_argument("--lambda_h", type=float, default=1.0)
    p.add_argument("--lambda_g", type=float, default=1.0)
    p.add_argument("--output_stats_path", type=str, default=None)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--no_save_similarity", action="store_true", default=False)
    # same-shape files batched through one vmapped device program
    p.add_argument("--file_batch", type=int, default=1)
    # pad patch counts to bucket multiples: one compile serves the bucket
    # (heterogeneous N otherwise compiles per distinct patch count);
    # compute-on-read mode only
    p.add_argument("--bucket_patches", type=int, default=None)
    # on-demand similarity caching for files built with --no_save_similarity
    p.add_argument("--cache_similarity", action="store_true", default=False)
    # fast-rebuild mode from cached similarity matrices
    p.add_argument("--rebuild", action="store_true", default=False)
    p.add_argument("--threshold_median_ratio", type=float, default=None)
    # shard each slide's patch axis over N devices (intra-slide data
    # parallelism via GSPMD; for pod slices where one slide's [N,N] work
    # should split across ICI)
    p.add_argument("--mesh_data", type=int, default=None)
    # ship feature matrices as bfloat16 (half the host->device bytes; compute
    # stays f32 — structure unchanged, similarity stats move ~1%)
    p.add_argument("--upload_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"])
    # resume an interrupted dataset build: files that already carry a
    # complete hypergraph/ group (stats attr present) are skipped.
    # Presence-based — changing build parameters needs --rebuild instead.
    p.add_argument("--skip_existing", action="store_true", default=False)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.cache_similarity:
        out = batch_cache_similarity(
            args.csv_path, args.data_root_dir,
            lambda_h=args.lambda_h, lambda_g=args.lambda_g,
        )
        print(f"cached similarity for {len(out)} files")
        return out
    if args.rebuild:
        out = batch_rebuild_hypergraph(
            args.csv_path,
            args.data_root_dir,
            num_wsi_super_patches=args.num_wsi_super_patches,
            num_groups=args.num_groups,
            hypergraph_k=args.hypergraph_k,
            num_hyperedges=args.num_hyperedges,
            threshold_median_ratio=args.threshold_median_ratio,
            seed=args.seed,
        )
        print(f"rebuilt {len(out)} files")
        return out
    mesh = None
    if args.mesh_data and args.mesh_data > 1:
        from multimodal_fusion_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(args.mesh_data)
    stats, summary = process_dataset(
        args.csv_path,
        args.data_root_dir,
        num_wsi_super_patches=args.num_wsi_super_patches,
        num_groups=args.num_groups,
        hypergraph_k=args.hypergraph_k,
        num_hyperedges=args.num_hyperedges,
        lambda_h=args.lambda_h,
        lambda_g=args.lambda_g,
        output_stats_path=args.output_stats_path,
        seed=args.seed,
        save_similarity=not args.no_save_similarity,
        file_batch=args.file_batch,
        bucket_patches=args.bucket_patches,
        mesh=mesh,
        upload_dtype=args.upload_dtype,
        skip_existing=args.skip_existing,
    )
    print(json.dumps(summary))
    return stats


def script_main(argv=None):
    """Console-script entry (pyproject [project.scripts]): pip's generated
    wrapper runs sys.exit(script_main()) — main's return value (a
    Path/dict/list result for programmatic callers) would otherwise be
    passed to sys.exit and turn every successful run into exit status 1."""
    main(argv)
    return 0


if __name__ == "__main__":
    main()
