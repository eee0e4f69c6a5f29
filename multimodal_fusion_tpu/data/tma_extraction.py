"""TMA core patching + feature extraction to per-marker NPZ.

Reference: ``alignment/tma_feature_extraction/extract_tma_features_uni.py``:
- sliding-window patches (size 256, stride 128) over each core PNG;
  cores smaller than a patch are resized whole (:106-153);
- optional white-region filter: a patch is kept when its non-white content
  ratio >= min_content_ratio, where white means all RGB channels >=
  white_threshold*255 (:156-178);
- features are batch-extracted by the encoder and written per marker to
  ``tma_uni_tile_1024_<marker>.npz``, one [N_patches, 1024] entry per core,
  keyed ``<stem>_block<b>_x<x>_y<y>_patient<pid>`` (:267-319).

The encoder here is the JAX ViT (``models.vit``) jit-batched on TPU; images
arrive as numpy uint8 arrays (PIL is used only in the CLI for decoding).
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_fusion_tpu.models.vit import ViT, preprocess_patch


def extract_patches_from_image(
    img: np.ndarray,
    patch_size: int = 256,
    stride: int = 128,
    white_threshold: Optional[float] = None,
    min_content_ratio: Optional[float] = None,
) -> List[np.ndarray]:
    """uint8 [H, W, 3] -> list of [patch_size, patch_size, 3] patches."""
    h, w = img.shape[:2]
    if h < patch_size or w < patch_size:
        whole = np.asarray(
            jax.image.resize(
                jnp.asarray(img, jnp.float32), (patch_size, patch_size, 3), "bilinear"
            )
        ).astype(np.uint8)
        return [whole]
    patches = []
    for y in range(0, h - patch_size + 1, stride):
        for x in range(0, w - patch_size + 1, stride):
            patch = img[y : y + patch_size, x : x + patch_size]
            if white_threshold is not None and min_content_ratio is not None:
                if not is_patch_valid(patch, white_threshold, min_content_ratio):
                    continue
            patches.append(patch)
    return patches


def is_patch_valid(patch: np.ndarray, white_threshold: float, min_content_ratio: float) -> bool:
    """content ratio = 1 - fraction of pixels with all RGB >= thr*255."""
    white = np.all(patch >= white_threshold * 255, axis=2)
    return (1.0 - float(white.mean())) >= min_content_ratio


def make_feature_extractor(model: ViT, batch_size: int = 32) -> Callable:
    """Batched jit CLS-feature extractor over preprocessed patches."""
    from flax import nnx

    graphdef, state = nnx.split(model)
    # model input resolution from its positional embedding
    n_grid = int(round((model.pos_embed[...].shape[0] - 1) ** 0.5))
    input_size = n_grid * model.patch_size

    @jax.jit
    def run(state, batch):  # [B, S, S, 3]
        m = nnx.merge(graphdef, state)
        return jax.vmap(m)(batch)

    def extract(patches: Sequence[np.ndarray]) -> np.ndarray:
        feats = []
        pre = np.stack([preprocess_patch(p, size=input_size) for p in patches])
        n = pre.shape[0]
        for start in range(0, n, batch_size):
            chunk = pre[start : start + batch_size]
            m = chunk.shape[0]
            if m < batch_size:  # static shapes for jit
                chunk = np.concatenate(
                    [chunk, np.zeros((batch_size - m,) + chunk.shape[1:], chunk.dtype)]
                )
            out = np.asarray(run(state, jnp.asarray(chunk)))[:m]
            feats.append(out)
        return np.concatenate(feats, axis=0)

    return extract


def extract_marker_features(
    image_files: Dict[str, np.ndarray],
    extractor: Callable,
    patch_size: int = 256,
    stride: int = 128,
    white_threshold: Optional[float] = None,
    min_content_ratio: Optional[float] = None,
) -> Dict[str, np.ndarray]:
    """{core_key: uint8 image} -> {core_key: [N_patches, D] features}."""
    out = {}
    for key, img in image_files.items():
        patches = extract_patches_from_image(
            img, patch_size, stride, white_threshold, min_content_ratio
        )
        if not patches:
            continue
        out[key] = extractor(patches)
    return out


def save_marker_npz(path: str | Path, features: Dict[str, np.ndarray]) -> None:
    np.savez_compressed(path, **features)
