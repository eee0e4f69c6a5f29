"""Reconstructed-feature writer CLI
(reference: ``vae/generate_reconstructed_wsi.py:26-274``)."""

from __future__ import annotations

import argparse

from flax import nnx

from multimodal_fusion_tpu.models.vae import VAE
from multimodal_fusion_tpu.train.checkpoint import load_state, load_subtree
from multimodal_fusion_tpu.train.vae import generate_reconstructed_wsi


def build_parser():
    p = argparse.ArgumentParser(description="Write wsi/reconstructed_features from a trained VAE")
    p.add_argument("--csv_path", type=str, required=True)
    p.add_argument("--data_root_dir", type=str, required=True)
    p.add_argument("--checkpoint", type=str, required=True, help="best.npz from VAETrainer")
    p.add_argument("--input_dim", type=int, default=1024)
    p.add_argument("--hidden_dims", type=int, nargs="+", default=[512, 256])
    p.add_argument("--latent_dim", type=int, default=128)
    p.add_argument("--batch_size", type=int, default=256)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    model = VAE(
        input_dim=args.input_dim,
        encoder_hidden=args.hidden_dims,
        decoder_hidden=list(reversed(args.hidden_dims)),
        latent_dim=args.latent_dim,
        rngs=nnx.Rngs(0),
    )
    state = nnx.state(model)
    try:
        restored = load_subtree(args.checkpoint, state, prefix="model")
    except KeyError:
        restored, _ = load_state(args.checkpoint, state)
    nnx.update(model, restored)
    done = generate_reconstructed_wsi(
        model, args.csv_path, args.data_root_dir, batch_size=args.batch_size
    )
    print(f"reconstructed {len(done)} files")
    return done


def script_main(argv=None):
    """Console-script entry (pyproject [project.scripts]): pip's generated
    wrapper runs sys.exit(script_main()) — main's return value (a
    Path/dict/list result for programmatic callers) would otherwise be
    passed to sys.exit and turn every successful run into exit status 1."""
    main(argv)
    return 0


if __name__ == "__main__":
    main()
