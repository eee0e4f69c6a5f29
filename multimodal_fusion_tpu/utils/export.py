"""AOT serving artifacts: export a trained fold's eval forward as StableHLO.

TPU-native deployment extension (no reference equivalent — the reference
serves nothing; its closest artifact is a pickled state_dict).  The fold
checkpoint's eval forward — padded-bag channels + masks in, class
probabilities and risk out, parameters baked in as constants — is lowered
once with ``jax.export`` and serialized to a self-contained StableHLO
artifact that a serving process can run WITHOUT the model zoo, the trainer,
or any Python model code: just ``load_serving_artifact(...).call``.

The window (batch) axis is exported symbolically when possible, so one
artifact serves any batch size; patch axes are fixed at export time (pad
bags to the exported size and mask, exactly like training — masked stats
are the framework's core contract).  Artifacts can be lowered for several
platforms at once (default cpu+tpu) and refuse mismatched platforms at
load time.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Optional, Sequence, Tuple

import numpy as np



def _channel_specs(model_cfg, wsi_patches: int, tma_patches: int, window):
    """ShapeDtypeStructs for every channel the model consumes, mirroring the
    trainer's padded-window layout (data/batching.py): patch channels
    [B, N, D] + bool mask [B, N]; tabular channels [B, 1, dim]."""
    import jax.numpy as jnp
    from jax import ShapeDtypeStruct

    from multimodal_fusion_tpu.data.batching import is_bag_channel

    D = model_cfg.input_dim
    dims = dict(model_cfg.channel_input_dims or {})
    channels, masks = {}, {}
    for ch in model_cfg.channels_used_in_model:
        if ch.startswith("hypergraph="):
            # hypergraph node-set/incidence channels have model-specific
            # padded shapes (models/hypergraph_fusion.py) not covered by the
            # generic bag/tabular specs — fail clearly rather than trace-error
            raise NotImplementedError(
                f"export does not support hypergraph channels ({ch}); "
                "serve cust_omics/hypergraph models through cli.predict"
            )
        if is_bag_channel(ch):
            # the same bag/tabular split the batching layer uses — a
            # hand-rolled suffix check here missed tma=<mk>=patches bags
            n = wsi_patches if ch.startswith("wsi") else tma_patches
            channels[ch] = ShapeDtypeStruct((window, n, D), jnp.float32)
            masks[ch] = ShapeDtypeStruct((window, n), jnp.bool_)
        else:
            channels[ch] = ShapeDtypeStruct((window, 1, dims.get(ch, D)), jnp.float32)
    return channels, masks


def export_serving_fn(
    results_dir: str | Path,
    fold: int = 0,
    wsi_patches: int = 4096,
    tma_patches: int = 32,
    platforms: Sequence[str] = ("cpu", "tpu"),
    checkpoint_path: Optional[str | Path] = None,
    symbolic_batch: bool = True,
) -> Tuple[bytes, Dict]:
    """Lower the fold's eval forward to serialized StableHLO; returns
    (artifact bytes, metadata dict)."""
    import jax
    import jax.numpy as jnp
    from flax import nnx

    from multimodal_fusion_tpu.models.factory import ModelFactory
    from multimodal_fusion_tpu.train.checkpoint import load_state

    from multimodal_fusion_tpu.utils.results_io import load_configs

    results_dir = Path(results_dir)
    configs = load_configs(results_dir)
    mc = configs.model_config

    model = ModelFactory.create_model(mc, seed=configs.experiment_config.seed)
    if hasattr(model, "attention_blocks"):
        # a multi-platform StableHLO artifact cannot contain a Mosaic
        # (Pallas) call — the shape-dispatched 'auto' attention could pick
        # the fused kernel at trace time for large bags, so exports force
        # the XLA formulation (same guard as mesh runs, train/survival.py)
        for blk in model.attention_blocks.values():
            blk.attn_impl = "xla"
    graphdef, params, rest = nnx.split(model, nnx.Param, ...)
    path = Path(checkpoint_path or results_dir / f"s_{fold}_checkpoint.npz")
    restored, _ = load_state(path, {"params": params, "rest": rest})
    params, rest = restored["params"], restored["rest"]

    def serve(channels, masks):
        def one(ch, mk):
            m = nnx.merge(graphdef, params, rest)
            res = m({"channels": ch, "masks": mk}, jnp.asarray(0), train=False)
            # risk mirrors the trainer's eval step (train/survival.py:368):
            # Cox head output when present, positive-class logit otherwise
            risk = res["risk"][0] if "risk" in res else res["logits"][0, 1]
            return res["probabilities"][0], risk

        return jax.vmap(one)(channels, masks)

    def specs(window):
        return _channel_specs(mc, wsi_patches, tma_patches, window)

    exp, batch = _export_with_symbolic_batch(
        serve, specs, platforms, symbolic_batch
    )

    meta = {
        "model_type": mc.model_type,
        "fold": fold,
        "platforms": list(platforms),
        "batch": batch,
        "wsi_patches": wsi_patches,
        "tma_patches": tma_patches,
        "channels": list(mc.channels_used_in_model),
        "channel_input_dims": dict(mc.channel_input_dims or {}),
        "input_dim": mc.input_dim,
        "n_classes": mc.n_classes,
        "outputs": ["probabilities [B, n_classes]", "risk [B]"],
    }
    return exp.serialize(), meta


def _export_with_symbolic_batch(serve, specs, platforms, symbolic_batch):
    """Shared export harness: try a symbolic leading (batch) axis, fall back
    to a fixed batch=1 artifact with a warning.  ``specs(batch)`` may return
    one spec pytree (passed as the single argument) or a tuple of them
    (splatted — the survival exporter's (channels, masks) signature)."""
    import jax
    from jax import export as jexport

    def run(batch):
        spec = specs(batch)
        args = spec if isinstance(spec, tuple) else (spec,)
        return jexport.export(jax.jit(serve), platforms=list(platforms))(*args)

    if symbolic_batch:
        try:
            (b,) = jexport.symbolic_shape("b")
            return run(b), "symbolic"
        except Exception as e:
            import warnings

            warnings.warn(
                "symbolic-batch export failed; falling back to a FIXED "
                f"batch=1 artifact (callable only with batch 1): {e!r}",
                stacklevel=2,
            )
    return run(1), 1


def export_alignment_fn(
    checkpoint_path: str | Path,
    platforms: Sequence[str] = ("cpu", "tpu"),
    symbolic_batch: bool = True,
) -> Tuple[bytes, Dict]:
    """Lower a trained alignment model's apply pass ({marker: [B, D]} ->
    {marker: [B, D]} aligned features) to serialized StableHLO — the
    preprocessing half of deployment (the survival artifact consumes
    ``aligned_<channel>`` features this produces).  Architecture and marker
    set are inferred from the checkpoint keys."""
    import jax.numpy as jnp
    from flax import nnx
    from jax import ShapeDtypeStruct

    from multimodal_fusion_tpu.models.alignment import (
        MultiModalAlignmentModel,
        infer_alignment_arch,
        infer_alignment_markers,
    )
    from multimodal_fusion_tpu.train.checkpoint import load_model

    data = np.load(checkpoint_path, allow_pickle=False)
    num_layers, feature_dim = infer_alignment_arch(checkpoint_path, data=data)
    markers = infer_alignment_markers(checkpoint_path, data=data)
    model = MultiModalAlignmentModel(
        markers, feature_dim=feature_dim, num_layers=num_layers,
        rngs=nnx.Rngs(0),
    )
    load_model(checkpoint_path, model)
    graphdef, state = nnx.split(model)

    def serve(feats):
        return nnx.merge(graphdef, state)(feats)

    def specs(batch):
        return {
            m: ShapeDtypeStruct((batch, feature_dim), jnp.float32)
            for m in markers
        }

    exp, batch = _export_with_symbolic_batch(
        serve, specs, platforms, symbolic_batch
    )
    meta = {
        "kind": "alignment",
        "markers": markers,
        "feature_dim": feature_dim,
        "num_layers": num_layers,
        "platforms": list(platforms),
        "batch": batch,
        "outputs": ["{marker: aligned [B, feature_dim]}"],
    }
    return exp.serialize(), meta


def export_vae_fn(
    checkpoint_path: str | Path,
    platforms: Sequence[str] = ("cpu", "tpu"),
    symbolic_batch: bool = True,
) -> Tuple[bytes, Dict]:
    """Lower a trained VAE's deterministic reconstruction pass
    ([B, input_dim] -> (x_hat [B, input_dim], mu [B, latent_dim])) to
    serialized StableHLO.  Deterministic mean-latent decode — the same
    policy as ``generate_reconstructed_wsi`` (README "Parity": the
    reference's writer samples noise even in eval; ours is reproducible).
    Architecture is inferred from the checkpoint keys."""
    import jax.numpy as jnp
    from flax import nnx
    from jax import ShapeDtypeStruct

    from multimodal_fusion_tpu.models.vae import VAE, infer_vae_arch
    from multimodal_fusion_tpu.train.checkpoint import load_model

    input_dim, enc_hidden, dec_hidden, latent_dim = infer_vae_arch(checkpoint_path)
    model = VAE(
        input_dim=input_dim, encoder_hidden=enc_hidden,
        decoder_hidden=dec_hidden, latent_dim=latent_dim, rngs=nnx.Rngs(0),
    )
    load_model(checkpoint_path, model)
    graphdef, state = nnx.split(model)

    def serve(x):
        m = nnx.merge(graphdef, state)
        mu = m.encode(x)
        return m.decode(mu), mu

    def specs(batch):
        return ShapeDtypeStruct((batch, input_dim), jnp.float32)

    exp, batch = _export_with_symbolic_batch(
        serve, specs, platforms, symbolic_batch
    )
    meta = {
        "kind": "vae",
        "input_dim": input_dim,
        "encoder_hidden": enc_hidden,
        "decoder_hidden": dec_hidden,
        "latent_dim": latent_dim,
        "platforms": list(platforms),
        "batch": batch,
        "outputs": ["x_hat [B, input_dim]", "mu [B, latent_dim]"],
    }
    return exp.serialize(), meta


def write_serving_artifact(out_path: str | Path, blob: bytes, meta: Dict) -> Path:
    out = Path(out_path)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.with_suffix(".stablehlo").write_bytes(blob)
    out.with_suffix(".json").write_text(json.dumps(meta, indent=2))
    return out.with_suffix(".stablehlo")


class ServingArtifact:
    """Loaded artifact: ``call(channels, masks) -> (probabilities, risk)``.
    ``channels``/``masks`` follow the exported specs in ``meta`` — pad bags
    to the exported patch counts and set masks accordingly."""

    def __init__(self, exported, meta: Dict):
        import jax

        self._exported = exported
        # jit ONCE: a per-call jax.jit would retrace/recompile every request
        self._call = jax.jit(exported.call)
        self.meta = meta

    def call(self, channels: Dict[str, np.ndarray], masks: Dict[str, np.ndarray]):
        probs, risk = self._call(channels, masks)
        return np.asarray(probs), np.asarray(risk)

    def __call__(self, *args):
        """Generic invocation for non-survival artifacts (alignment: one
        {marker: [B, D]} dict -> aligned dict; vae: [B, input_dim] ->
        (x_hat, mu)) — outputs as numpy, structure per ``meta['outputs']``."""
        import jax

        return jax.tree.map(np.asarray, self._call(*args))


def load_serving_artifact(path: str | Path) -> ServingArtifact:
    from jax import export as jexport

    path = Path(path)
    blob = path.with_suffix(".stablehlo").read_bytes()
    meta = json.loads(path.with_suffix(".json").read_text())
    return ServingArtifact(jexport.deserialize(blob), meta)
