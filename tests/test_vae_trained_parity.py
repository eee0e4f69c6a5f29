"""Golden trained-parity for the VAE: the torch reference's VAETrainer vs
ours on the same low-rank patch features.

RNG streams differ (reparameterisation sampling, init, loader order), so the
fixture is low-rank (true latent dim 4 == model latent dim): both trainers
must drive the val loss into the same band, pinning trained behavior of the
whole loop (vae_loss = MSE + KLD, Adam, plateau LR) — not just the
same-weights forward parity test_torch_parity already has.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference")
torch = pytest.importorskip("torch")
if not REF.exists():  # pragma: no cover
    pytest.skip("reference tree unavailable", allow_module_level=True)
# installs the downstream_survival sys.path + optional-dep stubs that the
# vae package's dataset import chain needs (datasets.multimodal_dataset ->
# models -> libauc/torch_geometric/perceiver)
import test_torch_parity  # noqa: F401, E402

import contextlib  # noqa: E402

from flax import nnx  # noqa: E402


@contextlib.contextmanager
def _isolated_ref_imports(path, names):
    """The reference's vae package uses GENERIC top-level module names
    (models, train, loss, dataset) that collide with the downstream_survival
    package other parity tests import.  Import under a temporary sys.path,
    then evict those names and restore whatever was there before — otherwise
    this test poisons sys.modules for the rest of the suite."""
    saved = {n: sys.modules.pop(n, None) for n in names}
    sys.path.insert(0, str(path))
    try:
        yield
    finally:
        sys.path.remove(str(path))
        for n in names:
            sys.modules.pop(n, None)
            if saved[n] is not None:
                sys.modules[n] = saved[n]


_VAE_NAMES = ("models", "train", "loss", "dataset")

N, D, LATENT = 512, 24, 4
EPOCHS = 5


def _lowrank_features(rng):
    z = rng.standard_normal((N, LATENT)).astype(np.float32)
    W = rng.standard_normal((LATENT, D)).astype(np.float32)
    x = z @ W + 0.05 * rng.standard_normal((N, D)).astype(np.float32)
    return (x / np.linalg.norm(x, axis=1, keepdims=True) * np.sqrt(D) * 0.3).astype(
        np.float32
    )


def _train_reference(x_train, x_val, tmp_path):
    from torch.utils.data import DataLoader

    # the reference passes verbose= to ReduceLROnPlateau (removed in modern
    # torch); shim the kwarg away so its trainer constructs unmodified
    import torch.optim.lr_scheduler as _lrs

    if not getattr(_lrs.ReduceLROnPlateau, "_verbose_shim", False):
        _orig = _lrs.ReduceLROnPlateau

        class _Plateau(_orig):
            _verbose_shim = True

            def __init__(self, *a, verbose=False, **kw):
                super().__init__(*a, **kw)

        _lrs.ReduceLROnPlateau = _Plateau
        torch.optim.lr_scheduler.ReduceLROnPlateau = _Plateau

    from models import VAE as RefVAE, Decoder as RefDec, Encoder as RefEnc
    from train import VAETrainer as RefTrainer

    torch.manual_seed(0)
    enc = RefEnc(D, [16, 8], LATENT)
    dec = RefDec(LATENT, [8, 16], D)
    vae = RefVAE(enc, dec, device="cpu")
    train_loader = DataLoader(torch.tensor(x_train), batch_size=64, shuffle=True,
                              generator=torch.Generator().manual_seed(0))
    val_loader = DataLoader(torch.tensor(x_val), batch_size=64)
    trainer = RefTrainer(
        vae, train_loader, val_loader, device="cpu", learning_rate=1e-3,
        save_dir=str(tmp_path / "ref_ckpt"), log_dir=str(tmp_path / "ref_logs"),
    )
    step = 0
    val = None
    for epoch in range(EPOCHS):
        _, step = trainer.train_epoch(epoch, step)
        val = trainer.validate(epoch)
    return float(val["loss"])


def _train_ours(x_train, x_val, tmp_path):
    from multimodal_fusion_tpu.models.vae import VAE
    from multimodal_fusion_tpu.train.vae import VAETrainer

    model = VAE(input_dim=D, encoder_hidden=[16, 8], decoder_hidden=[8, 16],
                latent_dim=LATENT, rngs=nnx.Rngs(0))
    trainer = VAETrainer(model, learning_rate=1e-3, checkpoint_dir=tmp_path / "our_ckpt")

    class _Arr:
        """Minimal dataset: the trainer consumes .batches(bs[, rng])."""

        def __init__(self, a):
            self.a = a

        def __len__(self):
            return len(self.a)

        def batches(self, batch_size, rng=None):
            idx = np.arange(len(self.a))
            if rng is not None:
                rng.shuffle(idx)
            for s in range(0, len(idx), batch_size):
                yield self.a[idx[s:s + batch_size]]

    out = trainer.fit(_Arr(x_train), _Arr(x_val), epochs=EPOCHS, batch_size=64,
                      verbose=False, resample=False)
    return float(out["best_val_loss"])


def test_vae_trained_loss_parity(tmp_path):
    rng = np.random.default_rng(0)
    x = _lowrank_features(rng)
    x_train, x_val = x[:448], x[448:]

    import io

    with _isolated_ref_imports(REF / "vae", _VAE_NAMES):
        with contextlib.redirect_stdout(io.StringIO()):
            ref_loss = _train_reference(x_train, x_val, tmp_path)
    our_loss = _train_ours(x_train, x_val, tmp_path)

    print(f"\nVAE trained val loss: reference={ref_loss:.4f} ours={our_loss:.4f}")
    # same band: trained losses within 2x of each other and both meaningfully
    # below the variance of the data (~0.09 per-dim => mse ~0.09 untrained)
    assert our_loss < 2.0 * ref_loss + 1e-3
    assert ref_loss < 2.0 * our_loss + 1e-3
