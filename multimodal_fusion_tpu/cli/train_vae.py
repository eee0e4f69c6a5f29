"""VAE training CLI (reference: ``vae/train.py:340-651``)."""

from __future__ import annotations

import argparse
from flax import nnx

from multimodal_fusion_tpu.data.vae_patches import WSIVAEDataset
from multimodal_fusion_tpu.models.vae import VAE
from multimodal_fusion_tpu.train.vae import VAETrainer


def build_parser():
    p = argparse.ArgumentParser(description="WSI patch-embedding VAE training")
    p.add_argument("--csv_path", type=str, required=True)
    p.add_argument("--data_root_dir", type=str, required=True)
    p.add_argument("--label_filter", type=str, default="living")
    p.add_argument("--input_dim", type=int, default=1024)
    p.add_argument("--hidden_dims", type=int, nargs="+", default=[512, 256])
    p.add_argument("--latent_dim", type=int, default=128)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--weight_decay", type=float, default=1e-5)
    p.add_argument("--plateau_patience", type=int, default=10)
    p.add_argument("--use_all_data", action="store_true", default=False)
    p.add_argument("--checkpoint_dir", type=str, default="./vae_checkpoints")
    p.add_argument("--resume", action="store_true", default=False)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--verbose", action="store_true", default=False)
    p.add_argument("--scan_steps", type=int, default=8,
                   help="fuse S updates into one lax.scan dispatch (numerics "
                        "identical; default 8 — set 1 to opt out)")
    p.add_argument("--device_data", action="store_true", default=None,
                   help="force the patch subsample device-resident (default: "
                        "auto — on whenever it fits the HBM budget)")
    p.add_argument("--no_device_data", dest="device_data", action="store_false",
                   help="force the host batch path")
    p.add_argument("--mesh_data", type=int, default=0,
                   help="shard each batch over N devices (data parallelism)")
    p.add_argument("--mesh_replica", type=int, default=0,
                   help="outer replica axis for multi-slice/DCN meshes")
    p.add_argument("--scalar_log", type=str, default=None,
                   help="live per-epoch scalar CSV (default: "
                        "<checkpoint_dir>/scalars.csv; 'none' disables)")
    p.add_argument("--log_dir", type=str, default=None,
                   help="TensorBoard event-file dir (reference vae/train.py "
                        "log_dir; default: <checkpoint_dir>/tb; 'none' "
                        "disables)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    ds = WSIVAEDataset(
        args.csv_path, args.data_root_dir, label_filter=args.label_filter,
        use_all_data=args.use_all_data, seed=args.seed,
    )
    # DISJOINT 80/20 split at patch level (reference vae/train.py:414-417
    # random_split); a second full dataset as "val" overlapped the training
    # patches and contaminated the plateau/early-stop metric (review finding)
    from multimodal_fusion_tpu.data.vae_patches import split_train_val

    train, val = split_train_val(ds, val_frac=0.2, seed=args.seed)
    model = VAE(
        input_dim=args.input_dim,
        encoder_hidden=args.hidden_dims,
        decoder_hidden=list(reversed(args.hidden_dims)),
        latent_dim=args.latent_dim,
        rngs=nnx.Rngs(args.seed),
    )
    mesh_shape = None
    if args.mesh_data > 1 or args.mesh_replica > 1:
        mesh_shape = {"replica": args.mesh_replica, "data": args.mesh_data}
    scalar_log = args.scalar_log
    if scalar_log is None:
        scalar_log = f"{args.checkpoint_dir}/scalars.csv"
    elif scalar_log.lower() == "none":
        scalar_log = None
    tb_dir = args.log_dir
    if tb_dir is None:
        tb_dir = f"{args.checkpoint_dir}/tb"
    elif tb_dir.lower() == "none":
        tb_dir = None
    trainer = VAETrainer(
        model,
        learning_rate=args.lr,
        weight_decay=args.weight_decay,
        plateau_patience=args.plateau_patience,
        checkpoint_dir=args.checkpoint_dir,
        scan_steps=args.scan_steps,
        mesh_shape=mesh_shape,
        scalar_log_path=scalar_log,
        tb_log_dir=tb_dir,
    )
    if args.resume:
        trainer.resume("latest")
    return trainer.fit(
        train, val, epochs=args.epochs, batch_size=args.batch_size,
        seed=args.seed, verbose=args.verbose,
        device_data="auto" if args.device_data is None else args.device_data,
    )


def script_main(argv=None):
    """Console-script entry (pyproject [project.scripts]): pip's generated
    wrapper runs sys.exit(script_main()) — main's return value (a
    Path/dict/list result for programmatic callers) would otherwise be
    passed to sys.exit and turn every successful run into exit status 1."""
    main(argv)
    return 0


if __name__ == "__main__":
    main()
