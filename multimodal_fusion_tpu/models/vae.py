"""Patch-embedding VAE.

Reference: ``vae/models.py:11-211`` (MLP encoder [512,256]->latent 128 with
GELU + Dropout(0.1) on intermediates, decoder mirror, reparameterisation) and
``vae/loss.py:15-70`` (L = MSE + KLD).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import nnx

from multimodal_fusion_tpu.models.common import dropout, split_keys, torch_linear


def infer_vae_arch(checkpoint_path) -> tuple:
    """(input_dim, encoder_hidden, decoder_hidden, latent_dim) read from a
    saved VAE checkpoint's keys (``encoder/layers/<i>/kernel`` chains +
    ``encoder/fc_mean/kernel``) — loaders (export, serving) should not have
    to re-supply the architecture the model was trained with."""
    import re

    import numpy as np

    data = np.load(checkpoint_path, allow_pickle=False)
    enc, dec = {}, {}
    for k in data.files:
        m = re.match(r"(encoder|decoder)/layers/(\d+)/kernel$", k)
        if m:
            (enc if m.group(1) == "encoder" else dec)[int(m.group(2))] = data[k].shape
    if (
        not enc
        or not dec
        or "encoder/fc_mean/kernel" not in data.files
        or "decoder/out/kernel" not in data.files
    ):
        # an encoder-only/truncated file must fail HERE — an empty
        # decoder_hidden would silently coerce to Decoder's default
        # [256, 512] and produce a confusing load error (or a wrong artifact)
        raise ValueError(
            f"{checkpoint_path} does not look like a complete VAE checkpoint "
            "(need encoder/layers + encoder/fc_mean + decoder/layers + "
            "decoder/out kernels)"
        )
    input_dim = enc[0][0]
    encoder_hidden = [enc[i][1] for i in sorted(enc)]
    decoder_hidden = [dec[i][1] for i in sorted(dec)]
    latent_dim = data["encoder/fc_mean/kernel"].shape[1]
    return int(input_dim), encoder_hidden, decoder_hidden, int(latent_dim)


class Encoder(nnx.Module):
    def __init__(self, input_dim: int, hidden_dims: Optional[List[int]], latent_dim: int, rngs: nnx.Rngs):
        hidden_dims = hidden_dims or [512, 256]
        dims = [input_dim] + list(hidden_dims)
        self.layers = nnx.List([torch_linear(dims[i], dims[i + 1], rngs) for i in range(len(dims) - 1)])
        self.fc_mean = torch_linear(hidden_dims[-1], latent_dim, rngs)
        self.fc_log_var = torch_linear(hidden_dims[-1], latent_dim, rngs)

    def __call__(self, x, *, key=None, train=False):
        keys = split_keys(key, len(self.layers))
        h = x
        for i, layer in enumerate(self.layers):
            h = jax.nn.gelu(layer(h), approximate=False)
            if i < len(self.layers) - 1:  # dropout on intermediates only
                h = dropout(h, 0.1, keys[i], train)
        return self.fc_mean(h), self.fc_log_var(h)


class Decoder(nnx.Module):
    def __init__(self, latent_dim: int, hidden_dims: Optional[List[int]], output_dim: int, rngs: nnx.Rngs):
        hidden_dims = hidden_dims or [256, 512]
        dims = [latent_dim] + list(hidden_dims)
        self.layers = nnx.List([torch_linear(dims[i], dims[i + 1], rngs) for i in range(len(dims) - 1)])
        self.out = torch_linear(hidden_dims[-1], output_dim, rngs)

    def __call__(self, z, *, key=None, train=False):
        keys = split_keys(key, len(self.layers))
        h = z
        for i, layer in enumerate(self.layers):
            h = jax.nn.gelu(layer(h), approximate=False)
            if i < len(self.layers) - 1:
                h = dropout(h, 0.1, keys[i], train)
        return self.out(h)


class VAE(nnx.Module):
    def __init__(
        self,
        input_dim: int = 1024,
        encoder_hidden: Optional[List[int]] = None,
        decoder_hidden: Optional[List[int]] = None,
        latent_dim: int = 128,
        *,
        rngs: nnx.Rngs,
    ):
        self.encoder = Encoder(input_dim, encoder_hidden, latent_dim, rngs)
        self.decoder = Decoder(latent_dim, decoder_hidden, input_dim, rngs)
        self.latent_dim = latent_dim
        self.input_dim = input_dim

    def reparameterize(self, mean, log_var, key):
        std = jnp.exp(0.5 * log_var)
        eps = jax.random.normal(key, mean.shape, mean.dtype)
        return mean + eps * std

    def __call__(self, x, *, key=None, train=False) -> Tuple[jax.Array, jax.Array, jax.Array]:
        if key is not None:
            k_enc, k_rep, k_dec = split_keys(key, 3)
        else:
            k_enc = k_rep = k_dec = None
        mean, log_var = self.encoder(x, key=k_enc, train=train)
        if k_rep is not None:
            z = self.reparameterize(mean, log_var, k_rep)
        else:
            z = mean  # deterministic encode at eval
        x_hat = self.decoder(z, key=k_dec, train=train)
        return x_hat, mean, log_var

    def encode(self, x):
        mean, _ = self.encoder(x, train=False)
        return mean

    def decode(self, z):
        return self.decoder(z, train=False)

    def reconstruct(self, x):
        """Deterministic reconstruction (mean latent), used by the
        reconstructed-feature writer."""
        x_hat, _, _ = self(x, train=False)
        return x_hat


def kld_loss(mean: jax.Array, log_var: jax.Array) -> jax.Array:
    """-(1/2) sum_j (1 + log var - mu^2 - var), mean over batch
    (reference vae/loss.py:15-36)."""
    kld = -0.5 * jnp.sum(1 + log_var - mean**2 - jnp.exp(log_var), axis=1)
    return jnp.mean(kld)


def vae_loss(x, x_hat, mean, log_var):
    """(total, recon MSE, KLD) — reference vae/loss.py:38-70."""
    recon = jnp.mean((x_hat - x) ** 2)
    reg = kld_loss(mean, log_var)
    return recon + reg, recon, reg
