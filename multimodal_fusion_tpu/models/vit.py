"""ViT encoder (UNI-style ViT-L/16) for TMA patch feature extraction.

Reference behaviour: ``alignment/tma_feature_extraction/extract_tma_features_
uni.py:38-87`` loads timm ``hf-hub:MahmoodLab/uni`` — a ViT-L/16 with
LayerScale (init_values=1e-5), 224x224 inputs, num_classes=0 so the CLS
feature (1024-d) is the output.

This is a from-scratch JAX/nnx ViT with the same architecture; pretrained
UNI weights can be loaded from a converted numpy state dict (the gated HF
checkpoint cannot be fetched in this environment), otherwise the encoder
runs with its random init — the extraction *pipeline* (patching, filtering,
batching, NPZ layout) is identical either way.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from multimodal_fusion_tpu.models.common import torch_linear

# ImageNet normalisation used by the timm transform for UNI.
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class ViTBlock(nnx.Module):
    def __init__(self, dim: int, num_heads: int, mlp_ratio: float, init_values: Optional[float], rngs: nnx.Rngs):
        self.norm1 = nnx.LayerNorm(dim, rngs=rngs)
        self.qkv = torch_linear(dim, 3 * dim, rngs)
        self.proj = torch_linear(dim, dim, rngs)
        self.norm2 = nnx.LayerNorm(dim, rngs=rngs)
        hidden = int(dim * mlp_ratio)
        self.fc1 = torch_linear(dim, hidden, rngs)
        self.fc2 = torch_linear(hidden, dim, rngs)
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        # 'auto' (shape-dispatched: fused Pallas kernel on TPU only where
        # it is measured faster than XLA's attention — ops/pallas_attention
        # .attention), 'xla', 'pallas', or 'pallas_interpret' (CPU test
        # mode).  Static python attr: baked into the graphdef at
        # nnx.split/trace time.
        self.attn_impl = "auto"
        if init_values is not None:
            self.ls1 = nnx.Param(jnp.full((dim,), init_values))
            self.ls2 = nnx.Param(jnp.full((dim,), init_values))
        else:
            self.ls1 = self.ls2 = None

    def __call__(self, x: jax.Array) -> jax.Array:  # [T, D]
        h = self.norm1(x)
        qkv = self.qkv(h).reshape(x.shape[0], 3, self.num_heads, self.head_dim)
        q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]  # [T, H, hd]
        from multimodal_fusion_tpu.ops.pallas_attention import attention

        out = attention(q, k, v, impl=self.attn_impl).reshape(x.shape[0], -1)
        out = self.proj(out)
        if self.ls1 is not None:
            out = out * self.ls1[...]
        x = x + out
        h = self.fc2(jax.nn.gelu(self.fc1(self.norm2(x)), approximate=False))
        if self.ls2 is not None:
            h = h * self.ls2[...]
        return x + h


class ViT(nnx.Module):
    """ViT backbone returning the CLS feature (num_classes=0 semantics)."""

    def __init__(
        self,
        img_size: int = 224,
        patch_size: int = 16,
        embed_dim: int = 1024,
        depth: int = 24,
        num_heads: int = 16,
        mlp_ratio: float = 4.0,
        init_values: Optional[float] = 1e-5,
        in_chans: int = 3,
        *,
        rngs: nnx.Rngs,
    ):
        self.patch_size = patch_size
        self.embed_dim = embed_dim
        n_patches = (img_size // patch_size) ** 2
        self.patch_proj = torch_linear(patch_size * patch_size * in_chans, embed_dim, rngs)
        self.cls_token = nnx.Param(jnp.zeros((1, embed_dim)))
        self.pos_embed = nnx.Param(
            0.02 * jax.random.normal(rngs.params(), (n_patches + 1, embed_dim))
        )
        self.blocks = nnx.List(
            [ViTBlock(embed_dim, num_heads, mlp_ratio, init_values, rngs) for _ in range(depth)]
        )
        self.norm = nnx.LayerNorm(embed_dim, rngs=rngs)

    def patchify(self, img: jax.Array) -> jax.Array:
        """[H, W, C] -> [N_patches, P*P*C] in row-major patch order."""
        H, W, C = img.shape
        P = self.patch_size
        x = img.reshape(H // P, P, W // P, P, C)
        x = jnp.transpose(x, (0, 2, 1, 3, 4)).reshape(-1, P * P * C)
        return x

    def __call__(self, img: jax.Array) -> jax.Array:
        """One image [H, W, C] -> CLS feature [embed_dim]."""
        tokens = self.patch_proj(self.patchify(img))
        tokens = jnp.concatenate([self.cls_token[...], tokens], axis=0)
        tokens = tokens + self.pos_embed[...]
        for blk in self.blocks:
            tokens = blk(tokens)
        return self.norm(tokens)[0]


def set_attention_impl(model: ViT, impl: str) -> None:
    """Select the attention implementation for every block: 'auto'
    (shape-dispatched — see ``ops.pallas_attention.attention``), 'xla',
    'pallas', or 'pallas_interpret'."""
    from multimodal_fusion_tpu.ops.pallas_attention import VALID_IMPLS

    if impl not in VALID_IMPLS:
        raise ValueError(f"unknown attention impl {impl!r}")
    for blk in model.blocks:
        blk.attn_impl = impl


def vit_large_16(rngs: nnx.Rngs, init_values: float = 1e-5) -> ViT:
    """UNI architecture: ViT-L/16, 1024-d, 24 blocks, LayerScale 1e-5."""
    return ViT(embed_dim=1024, depth=24, num_heads=16, init_values=init_values, rngs=rngs)


def preprocess_patch(patch_u8: np.ndarray, size: int = 224) -> np.ndarray:
    """uint8 [H, W, 3] -> normalised float32 [size, size, 3] (timm transform
    semantics: resize to 224 + ImageNet mean/std)."""
    img = patch_u8.astype(np.float32) / 255.0
    if img.shape[0] != size or img.shape[1] != size:
        # timm ViT transforms default to BICUBIC antialiased resampling;
        # jax.image.resize antialiases downscales by default, 'bicubic'
        # matches the kernel family (PIL vs jax filters still differ at the
        # sub-pixel level — documented in README parity)
        img = np.asarray(
            jax.image.resize(jnp.asarray(img), (size, size, 3), method="bicubic")
        )
    return (img - IMAGENET_MEAN) / IMAGENET_STD


def load_timm_vit_weights(model: ViT, state: Dict[str, np.ndarray]) -> int:
    """Load a timm ViT state dict (converted to numpy, e.g. via
    ``np.savez(path, **{k: v.numpy() for k, v in sd.items()})``).  Returns the
    number of tensors loaded."""
    n = 0

    def setp(param, value):
        nonlocal n
        param[...] = jnp.asarray(value)
        n += 1

    if "patch_embed.proj.weight" in state:
        w = state["patch_embed.proj.weight"]  # [D, C, P, P]
        # conv -> linear over [P*P*C] patch vectors (row-major HWC order)
        w = np.transpose(w, (2, 3, 1, 0)).reshape(-1, w.shape[0])
        setp(model.patch_proj.kernel, w)
        setp(model.patch_proj.bias, state["patch_embed.proj.bias"])
    if "cls_token" in state:
        setp(model.cls_token, state["cls_token"].reshape(1, -1))
    if "pos_embed" in state:
        setp(model.pos_embed, state["pos_embed"].reshape(-1, model.embed_dim))
    for i, blk in enumerate(model.blocks):
        p = f"blocks.{i}."
        if f"{p}norm1.weight" not in state:
            continue
        setp(blk.norm1.scale, state[f"{p}norm1.weight"])
        setp(blk.norm1.bias, state[f"{p}norm1.bias"])
        setp(blk.qkv.kernel, state[f"{p}attn.qkv.weight"].T)
        setp(blk.qkv.bias, state[f"{p}attn.qkv.bias"])
        setp(blk.proj.kernel, state[f"{p}attn.proj.weight"].T)
        setp(blk.proj.bias, state[f"{p}attn.proj.bias"])
        setp(blk.norm2.scale, state[f"{p}norm2.weight"])
        setp(blk.norm2.bias, state[f"{p}norm2.bias"])
        setp(blk.fc1.kernel, state[f"{p}mlp.fc1.weight"].T)
        setp(blk.fc1.bias, state[f"{p}mlp.fc1.bias"])
        setp(blk.fc2.kernel, state[f"{p}mlp.fc2.weight"].T)
        setp(blk.fc2.bias, state[f"{p}mlp.fc2.bias"])
        if blk.ls1 is not None and f"{p}ls1.gamma" in state:
            setp(blk.ls1, state[f"{p}ls1.gamma"])
            setp(blk.ls2, state[f"{p}ls2.gamma"])
    if "norm.weight" in state:
        setp(model.norm.scale, state["norm.weight"])
        setp(model.norm.bias, state["norm.bias"])
    return n
