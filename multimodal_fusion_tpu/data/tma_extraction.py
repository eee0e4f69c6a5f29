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

from multimodal_fusion_tpu.models.vit import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    ViT,
    preprocess_patch,
)


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
        # reference upsamples small cores with PIL LANCZOS
        # (extract_tma_features_uni.py:129-134): lanczos3 is jax's
        # equivalent kernel, and ROUND (not truncate) back to uint8
        whole = np.asarray(
            jnp.clip(
                jnp.round(
                    jax.image.resize(
                        jnp.asarray(img, jnp.float32),
                        (patch_size, patch_size, 3),
                        "lanczos3",
                    )
                ),
                0,
                255,
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


def make_feature_extractor(
    model: ViT, batch_size: int = 32, compute_dtype: str = "float32", mesh=None,
    attn_impl: str = "auto",
) -> Callable:
    """Batched jit CLS-feature extractor over preprocessed patches.

    ``compute_dtype="bfloat16"`` casts weights and inputs to bf16 so the
    ViT's matmuls run natively on the MXU (features returned as f32;
    CLS cosine agreement vs f32 > 0.999 — test_vit_bf16_extraction).

    ``attn_impl="auto"`` shape-dispatches attention per backend
    (ops/pallas_attention.attention): the fused Pallas kernel exactly
    where it measures faster than XLA's attention, the XLA einsum oracle
    elsewhere (which is what ViT-L's 257-token forward resolves to).

    ``mesh``: a ``jax.sharding.Mesh`` — extraction is embarrassingly
    data-parallel, so each chunk's batch axis shards over every mesh axis
    (weights replicate, no collectives in the forward); identical features
    to single-device (test_mesh_sharded_extraction). ``batch_size`` should
    divide by the mesh size."""
    from flax import nnx

    from multimodal_fusion_tpu.models.vit import set_attention_impl

    if attn_impl == "auto" and mesh is not None:
        # GSPMD cannot partition a Mosaic call (same constraint as the
        # Pallas similarity kernel, hypergraph/build.py) — mesh-sharded
        # extraction keeps the XLA attention unless explicitly overridden
        attn_impl = "xla"
    set_attention_impl(model, attn_impl)
    graphdef, state = nnx.split(model)
    cast = jnp.bfloat16 if compute_dtype == "bfloat16" else None
    if cast is not None:
        state = jax.tree.map(
            lambda x: x.astype(cast)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            state,
        )
    # model input resolution from its positional embedding
    n_grid = int(round((model.pos_embed[...].shape[0] - 1) ** 0.5))
    input_size = n_grid * model.patch_size

    batch_sh = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        batch_sh = NamedSharding(mesh, P(tuple(mesh.axis_names)))
        state = jax.device_put(state, NamedSharding(mesh, P()))

    def _place(chunk):
        if batch_sh is not None:
            # device_put the HOST array straight to its shard layout: an
            # intermediate jnp.asarray would upload the whole batch to
            # device 0 first and then reshard device-to-device — doubled
            # traffic on the upload-bound link (review finding)
            return jax.device_put(np.asarray(chunk), batch_sh)
        return jnp.asarray(chunk)

    @jax.jit
    def run(state, batch):  # [B, S, S, 3] preprocessed f32
        m = nnx.merge(graphdef, state)
        if cast is not None:
            batch = batch.astype(cast)
        return jax.vmap(m)(batch).astype(jnp.float32)

    @jax.jit
    def run_raw(state, batch_u8):  # [B, H, W, 3] raw uint8
        # the whole timm transform lives in-jit: /255, bilinear resize to the
        # model's input resolution, ImageNet normalise — the host ships raw
        # uint8 (4x smaller than preprocessed f32; through a remote TPU link
        # the upload, not the MXU, bounds extraction throughput)
        m = nnx.merge(graphdef, state)
        x = batch_u8.astype(jnp.float32) / 255.0
        if x.shape[1] != input_size or x.shape[2] != input_size:
            # bicubic like timm's ViT transform default (see preprocess_patch)
            x = jax.image.resize(
                x, (x.shape[0], input_size, input_size, 3), method="bicubic"
            )
        x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
        if cast is not None:
            x = x.astype(cast)
        return jax.vmap(m)(x).astype(jnp.float32)

    def extract(patches: Sequence[np.ndarray]) -> np.ndarray:
        # raw path: uniform uint8 patches ship as-is and preprocess on device
        raw = all(
            p.dtype == np.uint8 and p.shape == patches[0].shape for p in patches
        )
        pre = (
            np.stack(patches)
            if raw
            else np.stack([preprocess_patch(p, size=input_size) for p in patches])
        )
        step = run_raw if raw else run
        n = pre.shape[0]
        feats, sizes = [], []
        for start in range(0, n, batch_size):
            chunk = pre[start : start + batch_size]
            m = chunk.shape[0]
            if m < batch_size:  # static shapes for jit
                chunk = np.concatenate(
                    [chunk, np.zeros((batch_size - m,) + chunk.shape[1:], chunk.dtype)]
                )
            # dispatch only — JAX's async dispatch overlaps this chunk's
            # upload with the previous chunk's compute; one host sync at end
            feats.append(step(state, _place(chunk)))
            sizes.append(m)
        return np.concatenate(
            [np.asarray(f)[:m] for f, m in zip(feats, sizes)], axis=0
        )

    return extract


def extract_marker_features(
    image_files,
    extractor: Callable,
    patch_size: int = 256,
    stride: int = 128,
    white_threshold: Optional[float] = None,
    min_content_ratio: Optional[float] = None,
) -> Dict[str, np.ndarray]:
    """{core_key: uint8 image} (dict OR lazy (key, image) iterable — the CLI
    streams one decoded core at a time instead of holding a whole marker
    directory in RAM) -> {core_key: [N_patches, D] features}."""
    items = image_files.items() if hasattr(image_files, "items") else image_files
    out = {}
    for key, img in items:
        patches = extract_patches_from_image(
            img, patch_size, stride, white_threshold, min_content_ratio
        )
        if not patches:
            continue
        out[key] = extractor(patches)
    return out


def save_marker_npz(path: str | Path, features: Dict[str, np.ndarray]) -> None:
    np.savez_compressed(path, **features)
