"""Benchmark: hypergraph build throughput (patches/sec) vs CPU torch reference.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The headline metric is the BASELINE.json north-star: hypergraph construction
throughput over cached patch-embedding matrices.  The baseline is the
reference implementation (torch/sklearn, CPU) run on identical synthetic
fixtures in-process; the candidate is this repo's JAX pipeline on the default
JAX backend (TPU when present).
"""

import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np


def _wait_for_backend(max_wait_s: float = 1500.0, probe_timeout_s: float = 300.0) -> bool:
    """Probe backend liveness in a SUBPROCESS with a hard timeout.

    The axon TPU relay occasionally goes unavailable; ``jax.devices()`` in
    that state blocks inside the plugin's C retry loop for ~30 minutes before
    erroring (observed live 2026-08-17).  An unattended driver bench run must
    never do that, so: probe in a child process (killable), retry up to
    ``max_wait_s`` for the relay to come back, and let the caller fall back
    to CPU if it never does — one JSON line is always printed either way.

    The probe only initialises the backend (no compile, no transfer — the
    operations whose mid-flight kill wedges the tunnel), and its 300s grace
    is ~30x a healthy init, so a merely-congested relay is not killed into
    a wedge (review finding r3).

    The probe FAILS (exit 3) when ``jax.devices()`` succeeds but returns CPU
    devices: when the plugin errors and the platform is not hard-pinned, jax
    silently falls back to CPU with returncode 0 — exactly what happened on
    the 2026-08-17 driver run, which recorded CPU throughput with no
    ``backend_fallback`` marker.  A probe success now means "an accelerator
    is actually reachable".
    """
    import subprocess

    if os.environ.get("BENCH_SKIP_PROBE"):
        return True
    probe_src = (
        "import jax, sys; d = jax.devices(); "
        "sys.exit(0 if d and d[0].platform != 'cpu' else 3)"
    )
    # A host that is DELIBERATELY CPU-only (no accelerator platform named in
    # the env, no plugin failure in the probe output) will exit 3 forever —
    # retrying 25 min there is pure waste.  Only retry exit-3 when the env
    # names an accelerator (the driver pins JAX_PLATFORMS=axon) or the probe
    # stderr shows a backend-init failure: those are the relay-down /
    # silent-CPU-fallback states that DO recover.
    env_platforms = os.environ.get("JAX_PLATFORMS", "").lower()
    env_wants_accel = any(
        p and p != "cpu" for p in env_platforms.replace(",", " ").split()
    )
    deadline = time.time() + max_wait_s
    while True:
        try:
            r = subprocess.run(
                [sys.executable, "-c", probe_src],
                timeout=probe_timeout_s,
                capture_output=True,
            )
            if r.returncode == 0:
                return True
            if r.returncode == 3 and not env_wants_accel and not any(
                s in (r.stderr or b"").lower()
                for s in (b"unable to initialize", b"axon")
            ):
                return False  # deliberate CPU host: don't stall the bench
        except subprocess.TimeoutExpired:
            pass
        if time.time() > deadline:
            return False
        time.sleep(30)


def _enable_compile_cache():
    # atomic-write cache enablement (utils/jaxcache): safe if a test suite or
    # CLI process shares the tree concurrently
    from multimodal_fusion_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache(Path(__file__).resolve().parent / ".jax_cache")

N_FILES = 8
N_PATCHES = 4096
N_TMA = 32
DIM = 1024
NUM_SUPER = 100
NUM_GROUPS = 10
K = 5
NUM_HYPEREDGES = 10


N_BLOBS = 12


def make_fixtures(root: Path, n_files: int):
    """Clustered-blob fixtures in the informative kernel regime.

    kappa = exp(-lambda*||d||^2) with lambda=1, so distances must be O(1) for
    the similarity / threshold / grouping stages to do real work: within-blob
    E||df||^2 = 0.5 (kappa_h ~ 0.61), across-blob ~ 4 (kappa_h ~ 0.02).
    Standard-normal 1024-d features (the round-1 fixture) put every pairwise
    kappa at exp(-2000) ~ 0 — a degenerate all-zeros matrix that collapsed the
    grouping KMeans (VERDICT r1, Weak #2).  Positions are spatial blobs on the
    same assignment so kappa_g is informative too; TMA cores sit near blob
    centers so the cross-modal similarity has structure.
    """
    import csv

    import h5py

    rng = np.random.default_rng(0)
    paths = []
    rows = []
    for i in range(n_files):
        centers = rng.standard_normal((N_BLOBS, DIM)) * np.sqrt(1.75 / DIM)
        pos_centers = rng.uniform(0.0, 4.0, (N_BLOBS, 2))
        assign = rng.integers(0, N_BLOBS, N_PATCHES)
        feats = centers[assign] + rng.standard_normal((N_PATCHES, DIM)) * np.sqrt(0.25 / DIM)
        pos = pos_centers[assign] + rng.normal(0.0, 0.3, (N_PATCHES, 2))
        tma_assign = rng.integers(0, N_BLOBS, N_TMA)
        tma = centers[tma_assign] + rng.standard_normal((N_TMA, DIM)) * np.sqrt(0.25 / DIM)
        p = root / f"case_{i}.h5"
        with h5py.File(p, "w") as f:
            f["wsi/features"] = feats.astype(np.float32)
            f["wsi/positions"] = pos.astype(np.float32)
            f["tma/features"] = tma.astype(np.float32)
        paths.append(p)
        rows.append(
            {"patient_id": i, "case_id": f"case_{i}", "label": "living", "h5_file_path": p.name}
        )
    with open(root / "dataset.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["patient_id", "case_id", "label", "h5_file_path"])
        w.writeheader()
        w.writerows(rows)
    return paths


def run_ours(root: Path, paths):
    from multimodal_fusion_tpu.hypergraph.build import (
        process_dataset,
        process_single_file,
    )

    # warmup/compile on the first file.  save_similarity=False is the
    # compute-on-read mode: the full [N,N] similarity is still computed on
    # device (exact stats, identical numeric work to the reference) but the
    # reconstructible cache is not shipped host-side/persisted — it can be
    # materialised on demand via `preprocess_hypergraph --cache_similarity`.
    # The device->host link dominates at [4k,4k]; see VERDICT r1 item 1.
    process_single_file(
        paths[0], NUM_SUPER, NUM_GROUPS, K, NUM_HYPEREDGES, save_similarity=False
    )
    best = 0.0
    # best-of-3: the TPU link here has ~2x run-to-run variance.
    # file_batch stays 1 here: this link is host->device UPLOAD-bound and the
    # per-file pipeline overlaps uploads with compute better than the
    # batched path (measured: 14.3k p/s unbatched vs 10.6k with
    # file_batch=4). --file_batch exists for direct-attached hosts where
    # dispatch latency, not link bandwidth, dominates.
    for _trial in range(3):
        t0 = time.time()
        stats, summary = process_dataset(
            root / "dataset.csv", root, NUM_SUPER, NUM_GROUPS, K, NUM_HYPEREDGES,
            pipeline_depth=4, save_similarity=False,
        )
        if any("error" in s for s in stats):
            raise RuntimeError(f"build errors: {stats}")
        dt = time.time() - t0
        best = max(best, len(paths) * N_PATCHES / dt)

    # opt-in bf16 feature upload: halves the shipped bytes on this
    # upload-bound link; compute stays f32 (structure identical, similarity
    # stats within ~1% — test_upload_dtype_bf16_build), so the HEADLINE
    # stays the exact-f32 mode and this is reported as a detail.
    process_single_file(
        paths[0], NUM_SUPER, NUM_GROUPS, K, NUM_HYPEREDGES,
        save_similarity=False, upload_dtype="bfloat16",
    )
    best_bf16 = 0.0
    for _trial in range(2):
        t0 = time.time()
        stats, _ = process_dataset(
            root / "dataset.csv", root, NUM_SUPER, NUM_GROUPS, K, NUM_HYPEREDGES,
            pipeline_depth=4, save_similarity=False, upload_dtype="bfloat16",
        )
        if any("error" in s for s in stats):
            raise RuntimeError(f"bf16 build errors: {stats}")
        best_bf16 = max(best_bf16, len(paths) * N_PATCHES / (time.time() - t0))
    return best, best_bf16


def run_reference(paths):
    """Reference torch/sklearn pipeline on CPU over the same fixtures."""
    ref = Path("/root/reference")
    if not ref.exists():
        return None
    sys.path.insert(0, str(ref))
    try:
        from build_hypergraph.preprocess_hypergraph import process_single_file as ref_process
    except Exception:
        return None
    import contextlib
    import io

    t0 = time.time()
    n = 0
    for p in paths:
        with contextlib.redirect_stdout(io.StringIO()):
            try:
                ref_process(str(p), NUM_SUPER, NUM_GROUPS, K, NUM_HYPEREDGES)
            except TypeError:
                # the reference's own stats-JSON step rejects np.int64 under
                # modern numpy; all compute stages have already run by then
                pass
        n += N_PATCHES
    return n / (time.time() - t0)


INF_WSI = 4096
INF_TMA = 32
INF_BATCH = 8


def _flagship_cfg():
    from multimodal_fusion_tpu.config import ModelConfig

    return ModelConfig(
        model_type="svd_gate_random_clam",
        n_classes=2,
        input_dim=DIM,
        model_size="64*32",
        dropout=0.25,
        output_dim=128,
        channels_used_in_model=[
            "wsi=features", "tma=cd3=features", "clinical=val", "clinical=mask",
        ],
        channel_input_dims={"clinical=val": 16},
    )


def run_inference_ours(n_batches: int = 32, bf16: bool = False) -> float:
    """Flagship eval forward, vmapped over a window of slides, jitted.
    32 batches amortize per-step dispatch through the TPU tunnel (8 batches
    under-measured steady-state throughput ~2.5x — dispatch-bound).
    ``bf16`` exercises the opt-in compute_dtype="bfloat16" path: params and
    inputs cast to bf16 so the trunk matmuls run as native MXU bf16; through
    this tunnel the step is dispatch-bound so bf16 is ~parity wall-clock
    (measured interleaved, ratio 0.98-1.12) — the option pays on directly
    attached hosts / larger windows."""
    import jax
    import jax.numpy as jnp
    from flax import nnx

    from multimodal_fusion_tpu.models.factory import ModelFactory

    model = ModelFactory.create_model(_flagship_cfg(), seed=0)
    graphdef, state = nnx.split(model)
    if bf16:
        state = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            state,
        )
    in_dtype = jnp.bfloat16 if bf16 else jnp.float32
    rng = np.random.default_rng(0)
    window = {
        "channels": {
            "wsi=features": jnp.asarray(
                rng.standard_normal((INF_BATCH, INF_WSI, DIM)), in_dtype
            ),
            "tma=cd3=features": jnp.asarray(
                rng.standard_normal((INF_BATCH, INF_TMA, DIM)), in_dtype
            ),
            "clinical=val": jnp.asarray(rng.standard_normal((INF_BATCH, 1, 16)), in_dtype),
            "clinical=mask": jnp.ones((INF_BATCH, 1, 16), in_dtype),
        },
        "masks": {
            "wsi=features": jnp.ones((INF_BATCH, INF_WSI), bool),
            "tma=cd3=features": jnp.ones((INF_BATCH, INF_TMA), bool),
        },
        "label": jnp.zeros((INF_BATCH,), jnp.int32),
    }

    @jax.jit
    def eval_step(state, window):
        def one(channels, masks, label):
            m = nnx.merge(graphdef, state)
            res = m({"channels": channels, "masks": masks}, label, train=False)
            return res["probabilities"]

        return jax.vmap(one)(window["channels"], window["masks"], window["label"])

    jax.block_until_ready(eval_step(state, window))  # compile
    best = 0.0
    for _trial in range(2):  # link variance: best-of-2
        t0 = time.time()
        for _ in range(n_batches):
            out = eval_step(state, window)
        jax.block_until_ready(out)
        best = max(best, n_batches * INF_BATCH / (time.time() - t0))

    # scan_windows eval path (the trainer's _evaluate fusion): W windows per
    # dispatch via lax.map
    W = 8
    windows = jax.tree.map(lambda x: jnp.broadcast_to(x, (W,) + x.shape), window)

    @jax.jit
    def eval_scanned(state, windows):
        def one_window(window):
            def one(channels, masks, label):
                m = nnx.merge(graphdef, state)
                res = m({"channels": channels, "masks": masks}, label, train=False)
                return res["probabilities"]

            return jax.vmap(one)(window["channels"], window["masks"], window["label"])

        return jax.lax.map(one_window, windows)

    jax.block_until_ready(eval_scanned(state, windows))
    best_scan = 0.0
    n_scan = max(2, n_batches // W)
    for _trial in range(2):
        t0 = time.time()
        for _ in range(n_scan):
            out = eval_scanned(state, windows)
        jax.block_until_ready(out)
        best_scan = max(best_scan, n_scan * W * INF_BATCH / (time.time() - t0))
    return best, best_scan


def run_training_ours(n_steps: int = 16) -> float:
    """Full training window step (fwd+bwd+SVD group loss+Adam) slides/sec."""
    import jax
    import jax.numpy as jnp
    import optax
    from flax import nnx

    from multimodal_fusion_tpu.models.factory import ModelFactory
    from multimodal_fusion_tpu.train.optim import make_optimizer

    cfg = _flagship_cfg()
    cfg.extra.update(enable_svd=True, enable_dynamic_gate=True, enable_random_loss=False)
    model = ModelFactory.create_model(cfg, seed=0)
    graphdef, params, rest = nnx.split(model, nnx.Param, ...)
    tx = make_optimizer("adam", 1e-4)
    opt_state = tx.init(params)
    G = INF_BATCH
    rng = np.random.default_rng(0)
    window = {
        "channels": {
            "wsi=features": jnp.asarray(
                rng.standard_normal((G, INF_WSI, DIM)), jnp.float32
            ),
            "tma=cd3=features": jnp.asarray(
                rng.standard_normal((G, INF_TMA, DIM)), jnp.float32
            ),
            "clinical=val": jnp.asarray(rng.standard_normal((G, 1, 16)), jnp.float32),
            "clinical=mask": jnp.ones((G, 1, 16), jnp.float32),
        },
        "masks": {
            "wsi=features": jnp.ones((G, INF_WSI), bool),
            "tma=cd3=features": jnp.ones((G, INF_TMA), bool),
        },
        "label": jnp.asarray(np.tile([0, 1], G // 2), jnp.int32),
    }

    @jax.jit
    def train_step(params, rest, opt_state, window, keys):
        def loss_fn(params):
            def one(channels, masks, label, key):
                m = nnx.merge(graphdef, params, rest)
                res = m({"channels": channels, "masks": masks}, label, key=key, train=True)
                return m.loss_fn(res["logits"], label[None], res), res

            losses, results = jax.vmap(one)(
                window["channels"], window["masks"], window["label"], keys
            )
            m = nnx.merge(graphdef, params, rest)
            gr = dict(results)
            gr["label"] = window["label"]
            return (jnp.sum(losses) + m.group_loss_fn(gr)) / G

        grads = jax.grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(
            params, jax.tree.map(lambda u: -1e-4 * u, updates)
        )
        return params, opt_state

    key = jax.random.key(0)
    keys = jax.random.split(key, G)
    params, opt_state = train_step(params, rest, opt_state, window, keys)  # compile
    jax.block_until_ready(params)
    best = 0.0
    for _trial in range(2):
        t0 = time.time()
        for _ in range(n_steps):
            params, opt_state = train_step(params, rest, opt_state, window, keys)
        jax.block_until_ready(params)
        best = max(best, n_steps * G / (time.time() - t0))

    # scan_windows path: W window updates fused into ONE dispatch via
    # lax.scan (the trainer's exp.scan_windows option) — removes the
    # per-step dispatch cost, which dominates through the TPU tunnel.
    W = 8
    windows = jax.tree.map(lambda x: jnp.broadcast_to(x, (W,) + x.shape), window)
    keys_w = jnp.broadcast_to(keys, (W,) + keys.shape)

    @jax.jit
    def train_steps_scanned(params, rest, opt_state, windows, keys_w):
        def body(carry, xs):
            params, opt_state = carry
            window, kk = xs

            def loss_fn(params):
                def one(channels, masks, label, key):
                    m = nnx.merge(graphdef, params, rest)
                    res = m({"channels": channels, "masks": masks}, label, key=key, train=True)
                    return m.loss_fn(res["logits"], label[None], res), res

                losses, results = jax.vmap(one)(
                    window["channels"], window["masks"], window["label"], kk
                )
                m = nnx.merge(graphdef, params, rest)
                gr = dict(results)
                gr["label"] = window["label"]
                return (jnp.sum(losses) + m.group_loss_fn(gr)) / G

            grads = jax.grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(
                params, jax.tree.map(lambda u: -1e-4 * u, updates)
            )
            return (params, opt_state), None

        (params, opt_state), _ = jax.lax.scan(body, (params, opt_state), (windows, keys_w))
        return params, opt_state

    params, opt_state = train_steps_scanned(params, rest, opt_state, windows, keys_w)
    jax.block_until_ready(params)
    best_scan = 0.0
    n_scan = max(2, n_steps // W)
    for _trial in range(2):
        t0 = time.time()
        for _ in range(n_scan):
            params, opt_state = train_steps_scanned(params, rest, opt_state, windows, keys_w)
        jax.block_until_ready(params)
        best_scan = max(best_scan, n_scan * W * G / (time.time() - t0))
    return best, best_scan


def run_mfu_report() -> dict:
    """Device-resident MFU/roofline accounting (VERDICT r2 next-step #1).

    Inputs pre-staged in HBM; the timed region is the jitted computation
    alone, so these numbers are the CHIP's, not the relay's.  Reported per
    stage: achieved TFLOP/s, MFU vs chip peak, arithmetic intensity and
    fraction-of-roofline (see multimodal_fusion_tpu.utils.mfu)."""
    import jax
    import jax.numpy as jnp
    from flax import nnx

    from multimodal_fusion_tpu.utils.mfu import chip_peaks, measure_device

    report: dict = {
        "chip": chip_peaks()[0],
        # provenance (advisor r4): these device-resident timings were
        # measured in THIS process at this refresh; when the dict instead
        # carries carried_over_from_prior_tpu_run, it was copied from an
        # earlier on-TPU report because this run fell back to CPU.
        "refreshed_utc": time.strftime("%Y-%m-%d %H:%M:%SZ", time.gmtime()),
    }
    rng = np.random.default_rng(0)

    # (a) fused hypergraph build, compute-on-read shapes (the headline
    # workload: similarity [N,N] + kmeans x3 + knn on device, f32)
    from multimodal_fusion_tpu.hypergraph.build import _fused_build

    feats = jax.device_put(
        jnp.asarray(rng.standard_normal((N_PATCHES, DIM)), jnp.float32)
    )
    pos = jax.device_put(jnp.asarray(rng.uniform(0, 4, (N_PATCHES, 2)), jnp.float32))
    tma = jax.device_put(jnp.asarray(rng.standard_normal((N_TMA, DIM)), jnp.float32))
    key = jax.device_put(jax.random.key(0))

    def build(key, feats, pos, tma):
        return _fused_build(
            key, feats, pos, tma, jnp.int32(N_PATCHES), 1.0, 1.0,
            NUM_SUPER, NUM_GROUPS, K, NUM_HYPEREDGES,
            full_stats=True, ship_cache=False,
        )

    # composite: timing only (flops_override=0 — XLA's cost analysis cannot
    # see the Pallas custom call or loop trip counts; the MFU story for the
    # dominant kernel is the similarity entry below)
    report["hypergraph_build"] = measure_device(
        build, (key, feats, pos, tma), iters=64, dtype="float32",
        work_items=N_PATCHES, flops_override=0,
    )

    # (a1) the large-N production path on-chip: EXACT blockwise [N,N]
    # statistics at N=65536 (2x past FULL_STATS_MAX_N — the regime where
    # the [N,N] f32 object would be 17 GB and the build streams O(B*N)
    # stripes instead; hypergraph/build.py:_blockwise_similarity_stats).
    # Analytic flops: two distance matmuls per stripe (features D + the
    # 2-d positions) + the fused exp/mask elementwise work.  No
    # bytes_override: real traffic depends on which stripe intermediates
    # XLA materialises between the matmuls and the fused reductions, so a
    # roofline classification from a guessed byte count would be noise —
    # achieved TFLOP/s vs the f32 ceiling is the honest number here.
    from multimodal_fusion_tpu.hypergraph.build import _blockwise_similarity_stats

    LN, LBLK = 65536, 1024
    lfeats = jax.device_put(
        jnp.asarray(rng.standard_normal((LN, DIM)) / 32.0, jnp.float32)
    )
    lpos = jax.device_put(jnp.asarray(rng.uniform(0, 4, (LN, 2)), jnp.float32))
    llab = jax.device_put(
        jnp.asarray(rng.integers(0, NUM_GROUPS, LN), jnp.int32)
    )
    ln_flops = 2.0 * LN * LN * (DIM + 2) + 14.0 * LN * LN
    # production route (r5): fused Pallas kernel stripes — the XLA
    # formulation spends most of a pass round-tripping its materialised
    # [B, N] matmul intermediates through HBM (375 vs ~95 ms of actual
    # matmul+epilogue work per sweep, measured)
    use_pallas = jax.default_backend() == "tpu"
    report["blockwise_stats_65k"] = measure_device(
        lambda f, p, l: _blockwise_similarity_stats(
            f, p, 1.0, 1.0, l, NUM_GROUPS, jnp.int32(LN), False, block=LBLK,
            use_pallas=use_pallas,
        ),
        (lfeats, lpos, llab), iters=4, dtype="float32", work_items=LN,
        flops_override=ln_flops,
    )
    report["blockwise_stats_65k"]["use_pallas_stripes"] = use_pallas
    del lfeats, lpos, llab

    # the kmeans super-patch stage on its own (timing-only, like the
    # composite): the dominant non-similarity stage of the build — while_loop
    # Lloyd + kmeans++ init x 10 vmapped restarts at bench shapes
    from multimodal_fusion_tpu.ops.kmeans import kmeans

    report["kmeans_super_stage"] = measure_device(
        lambda k_, f: kmeans(k_, f, k=NUM_SUPER, n_init=10).inertia,
        (key, feats), iters=32, dtype="float32",
        work_items=N_PATCHES, flops_override=0,
    )

    # the dominant kernel with exact analytic flops: fused Pallas similarity.
    # bytes = MINIMUM HBM traffic (each operand once + the output once) — an
    # upper bound on intensity; with it the kernel classifies compute-bound
    # (true on chip: measured 94% of the 6-pass f32 MXU ceiling, r3) and the
    # roofline bound is the flop peak rather than a tile-refetch guess.
    from multimodal_fusion_tpu.ops.pallas_similarity import pallas_combined_similarity

    n_pad, d_pad = N_PATCHES, 1024  # already tile-aligned at bench shapes
    sim_flops = 2 * n_pad * n_pad * d_pad + 9 * n_pad * n_pad
    sim_bytes = 4 * (2 * n_pad * d_pad + n_pad * n_pad)
    report["similarity_kernel"] = measure_device(
        lambda f, p: pallas_combined_similarity(f, p, 1.0, 1.0),
        (feats, pos), iters=512, dtype="float32", work_items=N_PATCHES,
        flops_override=sim_flops, bytes_override=sim_bytes,
    )
    # the --upload_dtype bfloat16 production variant: features are bf16-exact
    # so the 1-pass MXU dot is bit-identical (asserted live on TPU, r3) at
    # ~3.4x the HIGHEST rate; positions stay f32/HIGHEST (128-dim side term)
    feats_b = jax.device_put(feats.astype(jnp.bfloat16).astype(jnp.float32))
    sim_bytes_bf16 = (  # features staged bf16, positions f32, output f32
        2 * (2 * n_pad * d_pad) + 4 * (2 * n_pad * 128) + 4 * n_pad * n_pad
    )
    report["similarity_kernel_bf16_exact"] = measure_device(
        lambda f, p: pallas_combined_similarity(f, p, 1.0, 1.0, bf16_exact=True),
        (feats_b, pos), iters=2048, dtype="bfloat16", work_items=N_PATCHES,
        flops_override=sim_flops, bytes_override=sim_bytes_bf16,
    )

    # (b) flagship training window step (fwd+bwd+SVD group loss+Adam, f32)
    import optax

    from multimodal_fusion_tpu.models.factory import ModelFactory
    from multimodal_fusion_tpu.train.optim import make_optimizer

    cfg = _flagship_cfg()
    cfg.extra.update(enable_svd=True, enable_dynamic_gate=True, enable_random_loss=False)
    model = ModelFactory.create_model(cfg, seed=0)
    graphdef, params, rest = nnx.split(model, nnx.Param, ...)
    tx = make_optimizer("adam", 1e-4)
    opt_state = tx.init(params)
    G = INF_BATCH
    window = {
        "channels": {
            "wsi=features": jnp.asarray(rng.standard_normal((G, INF_WSI, DIM)), jnp.float32),
            "tma=cd3=features": jnp.asarray(rng.standard_normal((G, INF_TMA, DIM)), jnp.float32),
            "clinical=val": jnp.asarray(rng.standard_normal((G, 1, 16)), jnp.float32),
            "clinical=mask": jnp.ones((G, 1, 16), jnp.float32),
        },
        "masks": {
            "wsi=features": jnp.ones((G, INF_WSI), bool),
            "tma=cd3=features": jnp.ones((G, INF_TMA), bool),
        },
        "label": jnp.asarray(np.tile([0, 1], G // 2), jnp.int32),
    }
    window = jax.device_put(window)
    keys = jax.device_put(jax.random.split(jax.random.key(0), G))
    params = jax.device_put(params)
    rest = jax.device_put(rest)
    opt_state = jax.device_put(opt_state)

    def train_step(params, rest, opt_state, window, keys):
        def loss_fn(params):
            def one(channels, masks, label, key):
                m = nnx.merge(graphdef, params, rest)
                res = m({"channels": channels, "masks": masks}, label, key=key, train=True)
                return m.loss_fn(res["logits"], label[None], res), res

            losses, results = jax.vmap(one)(
                window["channels"], window["masks"], window["label"], keys
            )
            m = nnx.merge(graphdef, params, rest)
            gr = dict(results)
            gr["label"] = window["label"]
            return (jnp.sum(losses) + m.group_loss_fn(gr)) / G

        grads = jax.grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(
            params, jax.tree.map(lambda u: -1e-4 * u, updates)
        ), opt_state

    report["train_window_step"] = measure_device(
        train_step, (params, rest, opt_state, window, keys), iters=256,
        dtype="float32", work_items=G, mxu_dtype="bfloat16",
    )

    # (c) flagship eval forward (the inference path, f32)
    def eval_step(params, rest, window):
        def one(channels, masks, label):
            m = nnx.merge(graphdef, params, rest)
            res = m({"channels": channels, "masks": masks}, label, train=False)
            return res["probabilities"]

        return jax.vmap(one)(window["channels"], window["masks"], window["label"])

    # Analytic bytes (utils/mfu.analytic_step_bytes): XLA's per-consumer HLO
    # bytes implied >1 HBM-bandwidth of traffic for these fused steps
    # (suspect_roofline, r4).  Per-case [4096, 64] activation chains fuse in
    # VMEM on TPU — eval traffic is the window read + one weight read.
    from multimodal_fusion_tpu.utils.mfu import analytic_step_bytes, tree_bytes

    eval_bytes = analytic_step_bytes(
        input_bytes=tree_bytes(window),
        weight_bytes=tree_bytes((params, rest)),
        mode="eval",
    )
    report["eval_window_step"] = measure_device(
        eval_step, (params, rest, window), iters=512, dtype="float32",
        work_items=G, mxu_dtype="bfloat16", bytes_override=eval_bytes,
    )
    report["eval_window_step"]["bytes_model"] = "analytic"

    # (d) UNI ViT-L/16 extraction forward (raw-uint8 in-jit preprocess,
    # bf16 MXU matmuls — the bf16 reference point); same transform as
    # make_feature_extractor's run_raw
    from multimodal_fusion_tpu.data.tma_extraction import IMAGENET_MEAN, IMAGENET_STD
    from multimodal_fusion_tpu.models.vit import set_attention_impl, vit_large_16

    vit = vit_large_16(nnx.Rngs(0))
    # production attention config: shape-dispatched (ops/pallas_attention
    # .attention).  At ViT-L's 257-token shape this resolves to the XLA
    # formulation — measured FASTER than the fused Pallas kernel there
    # (XLA:TPU fuses the softmax at small T); the kernel takes over for
    # large score tensors (see mfmf_attention_bag4096 below).
    set_attention_impl(vit, "auto")
    vg, vs = nnx.split(vit)
    vs = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x,
        vs,
    )
    crops = jax.device_put(
        jnp.asarray(rng.integers(0, 255, (32, 256, 256, 3)), jnp.uint8)
    )

    def vit_fwd(vs, crops):
        x = crops.astype(jnp.float32) / 255.0
        x = jax.image.resize(x, (x.shape[0], 224, 224, 3), method="bicubic")
        x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
        m = nnx.merge(vg, vs)
        return jax.vmap(m)(x.astype(jnp.bfloat16)).astype(jnp.float32)

    vs = jax.device_put(vs)
    report["vit_extraction"] = measure_device(
        vit_fwd, (vs, crops), iters=16, dtype="bfloat16", work_items=32,
    )

    # breakdown: preprocess (f32 /255 + bicubic resize + normalise) vs the
    # pure bf16 transformer forward — answers where the composite's gap to
    # peak lives (preprocess is VPU/gather work with ~zero MXU FLOPs, so a
    # large share here means the fix is resize-as-matmul or bf16 resize, not
    # transformer work)
    # NOTE the f32 ``bias`` carrier: crops are uint8, and the chained timing
    # loop creates its data dependency by perturbing FLOAT leaves — an
    # all-integer-input body would be loop-invariant and hoisted (the exact
    # 1,887-TFLOP/s failure mode utils/mfu._perturb_floats documents)
    def vit_preprocess_only(bias, crops):
        x = crops.astype(jnp.float32) / 255.0 + bias
        x = jax.image.resize(x, (x.shape[0], 224, 224, 3), method="bicubic")
        return (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)

    zero = jax.device_put(jnp.float32(0.0))
    pre = jax.device_put(vit_preprocess_only(zero, crops).astype(jnp.bfloat16))

    def vit_forward_only(vs, pre):
        m = nnx.merge(vg, vs)
        return jax.vmap(m)(pre).astype(jnp.float32)

    report["vit_preprocess_only"] = measure_device(
        vit_preprocess_only, (zero, crops), iters=16, dtype="float32",
        work_items=32, flops_override=0,
    )
    report["vit_forward_only"] = measure_device(
        vit_forward_only, (vs, pre), iters=16, dtype="bfloat16", work_items=32,
    )

    # fused Pallas attention in its winning regime: an MFMF-sized
    # cross/self-attention over a 4096-patch bag (score tensor 8*4096^2 =
    # 134M elems — XLA materialises ~268MB to HBM, the kernel keeps each
    # head-group's scores in VMEM).  The pair quantifies the kernel's
    # contribution on the driver's own capture.
    if jax.default_backend() == "tpu":
        from multimodal_fusion_tpu.ops.pallas_attention import (
            fused_attention, xla_attention,
        )

        aq = jax.device_put(
            jnp.asarray(rng.standard_normal((4096, 8, 64)), jnp.bfloat16)
        )
        attn_flops = 2 * 2 * 8 * 4096 * 4096 * 64
        report["mfmf_attention_bag4096"] = measure_device(
            lambda q: fused_attention(q, q, q), (aq,), iters=32,
            dtype="bfloat16", work_items=1, flops_override=attn_flops,
        )
        report["mfmf_attention_bag4096_xla"] = measure_device(
            lambda q: xla_attention(q, q, q), (aq,), iters=32,
            dtype="bfloat16", work_items=1, flops_override=attn_flops,
        )

        # training path: fwd+bwd through the kernel's custom VJP (fused
        # recompute backward) vs differentiating the XLA formulation —
        # f32, the survival trainer's dtype (measured 4.2x on v5e)
        aqf = jax.device_put(
            jnp.asarray(rng.standard_normal((4096, 8, 64)), jnp.float32)
        )
        grad_flops = attn_flops * 3.5

        def attn_grad_pl(q):
            return jax.grad(lambda a: jnp.sum(fused_attention(a, a, a) ** 2))(q)

        def attn_grad_xla(q):
            return jax.grad(lambda a: jnp.sum(xla_attention(a, a, a) ** 2))(q)

        # f32 inputs, but the kernel's dot_generals (and XLA's default
        # einsums) run single bf16 MXU passes -> bf16 peak (advisor r3)
        report["mfmf_attention_bag4096_grad"] = measure_device(
            attn_grad_pl, (aqf,), iters=16, dtype="float32", work_items=1,
            flops_override=grad_flops, mxu_dtype="bfloat16",
        )
        report["mfmf_attention_bag4096_grad_xla"] = measure_device(
            attn_grad_xla, (aqf,), iters=16, dtype="float32", work_items=1,
            flops_override=grad_flops, mxu_dtype="bfloat16",
        )
        # hd=64 halves the usable MXU: the score dot contracts over 64 (half
        # the 128-deep systolic dim) and the value dot emits 64 output lanes
        # (half the width), so the ACHIEVABLE matmul peak at these MFMF
        # head dims is peak_bf16/2 — report the fraction of that ceiling
        # next to the raw-MFU number (0.35 raw = 0.70 of what hd=64 allows)
        for _k in (
            "mfmf_attention_bag4096", "mfmf_attention_bag4096_grad",
            "mfmf_attention_bag4096_xla", "mfmf_attention_bag4096_grad_xla",
        ):
            _e = report[_k]
            if _e.get("achieved_tflops"):
                _e["hd64_mxu_ceiling_tflops"] = _e["peak_tflops"] / 2
                _e["fraction_of_hd64_ceiling"] = (
                    _e["achieved_tflops"] / _e["hd64_mxu_ceiling_tflops"]
                )

    # (e) alignment pretraining step (8 markers x [256, 1024], rank1 SVD
    # loss + frozen-predictor BCE + AdamW — the reference's production
    # shapes, alignment/trainer.py:108-136)
    from multimodal_fusion_tpu.models.alignment import MultiModalAlignmentModel
    from multimodal_fusion_tpu.train.alignment import MultiModalAlignmentTrainer

    markers = [f"m{i}" for i in range(8)]
    amodel = MultiModalAlignmentModel(markers, feature_dim=DIM, rngs=nnx.Rngs(0))
    atr = MultiModalAlignmentTrainer(amodel, learning_rate=1e-4)
    B = 256
    pos = {m: jnp.asarray(rng.standard_normal((B, DIM)), jnp.float32) for m in markers}
    neg = {m: jnp.asarray(rng.standard_normal((B, DIM)), jnp.float32) for m in markers}
    astate = jax.device_put(atr.state)
    aopt = jax.device_put(atr.opt_state)
    pos, neg = jax.device_put((pos, neg))
    akey = jax.device_put(jax.random.key(1))

    def align_step(state, opt_state, pos, neg, key):
        state, opt_state, loss, _ = atr._step(
            state, opt_state, pos, neg, key, jnp.float32(1e-4),
            train=True, has_neg=True,
        )
        return state, opt_state, loss

    # trainable = the alignment layers only (the match predictor is frozen,
    # reference trainer.py:108-116); aligned pos/neg matmul outputs are the
    # only HBM-materialised activations (the Jacobi runs on [B, 8, 8] tiles)
    align_trainable = tree_bytes(
        jax.tree_util.tree_map_with_path(
            lambda p, x: x
            if any(str(getattr(k, "key", k)) == "alignment_layers" for k in p)
            else None,
            astate,
        )
    )
    align_bytes = analytic_step_bytes(
        input_bytes=tree_bytes((pos, neg)),
        weight_bytes=tree_bytes(astate),
        trainable_bytes=align_trainable,
        hbm_activation_bytes=tree_bytes((pos, neg)),
        mode="train",
    )
    report["alignment_train_step"] = measure_device(
        align_step, (astate, aopt, pos, neg, akey), iters=64,
        dtype="float32", work_items=B, mxu_dtype="bfloat16",
        bytes_override=align_bytes,
    )
    report["alignment_train_step"]["bytes_model"] = "analytic"

    # (f) VAE training step ([256, 1024] -> 512/256/128 VAE + Adam,
    # vae/train.py production shapes)
    from multimodal_fusion_tpu.models.vae import VAE
    from multimodal_fusion_tpu.train.vae import VAETrainer

    vmodel = VAE(DIM, [512, 256], [256, 512], 128, rngs=nnx.Rngs(0))
    vtr = VAETrainer(vmodel, learning_rate=1e-3)
    xv = jax.device_put(jnp.asarray(rng.standard_normal((B, DIM)), jnp.float32))
    vstate = jax.device_put(vtr.state)
    vopt = jax.device_put(vtr.opt_state)

    def vae_step(state, opt_state, x, key):
        state, opt_state, loss, recon, kld = vtr._train_step(
            state, opt_state, x, key, jnp.float32(1e-3)
        )
        return state, opt_state, loss

    # per-layer outputs at [256, 512/256/128] do round-trip HBM between the
    # matmul fusions: enc 512+256, mu/logvar/z 3*128, dec 256+512+1024
    vae_act = 4.0 * B * (512 + 256 + 3 * 128 + 256 + 512 + DIM)
    vae_bytes = analytic_step_bytes(
        input_bytes=float(xv.nbytes),
        weight_bytes=tree_bytes(vstate),
        trainable_bytes=tree_bytes(vstate),
        hbm_activation_bytes=vae_act,
        mode="train",
    )
    report["vae_train_step"] = measure_device(
        vae_step, (vstate, vopt, xv, akey), iters=64,
        dtype="float32", work_items=B, mxu_dtype="bfloat16",
        bytes_override=vae_bytes,
    )
    report["vae_train_step"]["bytes_model"] = "analytic"

    # the PRODUCTION path fuses scan_steps batch updates into one dispatch
    # (train/vae.py:train_steps_scanned, default-on in cli.train_vae): the
    # single-step entry above is dominated by fixed per-dispatch overhead
    # (~0.18 ms total at [256,1024] after the r5 flat-Adam change), so the
    # fused form is where the roofline fraction is meaningful
    S = 8
    xs8 = jax.device_put(
        jnp.asarray(rng.standard_normal((S, B, DIM)), jnp.float32)
    )
    keys8 = jax.device_put(jax.random.split(jax.random.key(2), S))

    def vae_steps_scanned(state, opt_state, xs, keys):
        def body(carry, inp):
            s, o = carry
            x, k = inp
            s, o, loss, recon, kld = vtr._train_step(
                s, o, x, k, jnp.float32(1e-3)
            )
            return (s, o), loss

        (s, o), losses = jax.lax.scan(body, (state, opt_state), (xs, keys))
        return s, o, losses

    report["vae_train_step_scanned8"] = measure_device(
        vae_steps_scanned, (vstate, vopt, xs8, keys8), iters=32,
        dtype="float32", work_items=S * B, mxu_dtype="bfloat16",
        bytes_override=S * vae_bytes,
    )
    report["vae_train_step_scanned8"]["bytes_model"] = "analytic"
    return report


def _stub_module(name, attrs=()):
    import types

    parts = name.split(".")
    for i in range(1, len(parts) + 1):
        mod = ".".join(parts[:i])
        if mod not in sys.modules:
            sys.modules[mod] = types.ModuleType(mod)
    for a in attrs:
        setattr(sys.modules[name], a, object)


def run_inference_reference(n_cases: int = 8) -> float:
    """Reference torch flagship forward per case on CPU."""
    sys.path.insert(0, str(Path("/root/reference") / "downstream_survival"))
    # the reference models package imports optional deps at __init__ time
    _stub_module("libauc")
    _stub_module("libauc.losses", ["AUCMLoss"])
    _stub_module("torch_geometric")
    _stub_module("torch_geometric.nn", ["HypergraphConv", "GlobalAttention"])
    _stub_module("perceiver")
    _stub_module("perceiver.model")
    _stub_module("perceiver.model.core")
    _stub_module("perceiver.model.core.modules", ["CrossAttentionLayer"])
    try:
        import torch

        from models.svd_gate_random_clam import SVDGateRandomClam as RefModel
    except Exception:
        return None
    config = {
        "n_classes": 2, "input_dim": DIM, "model_size": "64*32", "dropout": 0.25,
        "output_dim": 128, "device": "cpu",
        "channels_used_in_model": [
            "wsi=features", "tma=cd3=features", "clinical=val", "clinical=mask",
        ],
        "enable_svd": True, "enable_dynamic_gate": True, "enable_random_loss": False,
    }
    torch.manual_seed(0)
    model = RefModel(config)
    model.eval()
    rng = np.random.default_rng(0)
    data = {
        "wsi=features": torch.tensor(rng.standard_normal((1, INF_WSI, DIM)), dtype=torch.float32),
        "tma=cd3=features": torch.tensor(rng.standard_normal((1, INF_TMA, DIM)), dtype=torch.float32),
        "clinical=val": torch.tensor(rng.standard_normal((1, 1, 16)), dtype=torch.float32),
        "clinical=mask": torch.ones((1, 1, 16)),
    }
    label = torch.tensor([0])
    with torch.no_grad():
        model(data, label)  # warmup / lazy layers
        t0 = time.time()
        for _ in range(n_cases):
            model(data, label)
    return n_cases / (time.time() - t0)


def run_vit_extraction_ours(n_patches: int = 96) -> float:
    """UNI-architecture ViT-L/16 CLS extraction, raw-uint8 in-jit preprocess
    path (ship uint8 crops, /255+resize+normalise on device), bf16 matmuls.
    Reference: alignment/tma_feature_extraction/extract_tma_features_uni.py."""
    from flax import nnx

    from multimodal_fusion_tpu.data.tma_extraction import make_feature_extractor
    from multimodal_fusion_tpu.models.vit import vit_large_16

    rng = np.random.default_rng(0)
    model = vit_large_16(nnx.Rngs(0))
    patches = [
        rng.integers(0, 255, (256, 256, 3)).astype(np.uint8) for _ in range(n_patches)
    ]
    ex = make_feature_extractor(model, batch_size=32, compute_dtype="bfloat16")
    ex(patches[:32])  # compile
    best = 0.0
    for _trial in range(2):
        t0 = time.time()
        ex(patches)
        best = max(best, n_patches / (time.time() - t0))

    # Link ceiling for the SAME payload: end-to-end extraction ships one
    # [32, 256, 256, 3] uint8 chunk per batch, so pure-upload throughput of
    # that chunk bounds any shipped-extraction number through this tunnel
    # (uint8 crops are already the minimal lossless payload — 4x under f32,
    # 1.3x under pre-resized 224 crops which would change numerics).  The
    # measured link-bound fraction tells whether the pipeline, or the wire,
    # is the remaining gap (VERDICT r3 #3).
    import jax

    chunk = np.stack(patches[:32])
    up = jax.device_put(chunk)
    jax.block_until_ready(up)
    link_best = 0.0
    for _trial in range(3):
        t0 = time.time()
        for _ in range(3):
            jax.block_until_ready(jax.device_put(chunk))
        link_best = max(link_best, (3 * 32) / (time.time() - t0))
    return best, link_best


def run_vit_extraction_reference(n_patches: int = 3) -> float:
    """torch-CPU ViT-L/16 forward (timm-equivalent architecture, all CPU
    threads) as the reference extraction baseline."""
    import math

    import torch

    torch.set_num_threads(os.cpu_count() or 1)
    D, H, P, depth = 1024, 16, 16, 24

    class Block(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.n1 = torch.nn.LayerNorm(D, eps=1e-6)
            self.qkv = torch.nn.Linear(D, 3 * D)
            self.proj = torch.nn.Linear(D, D)
            self.ls1 = torch.nn.Parameter(1e-5 * torch.ones(D))
            self.n2 = torch.nn.LayerNorm(D, eps=1e-6)
            self.fc1 = torch.nn.Linear(D, 4 * D)
            self.fc2 = torch.nn.Linear(4 * D, D)
            self.ls2 = torch.nn.Parameter(1e-5 * torch.ones(D))

        def forward(self, x):
            B, T, _ = x.shape
            hd = D // H
            qkv = self.qkv(self.n1(x)).reshape(B, T, 3, H, hd)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            a = torch.softmax(torch.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(hd), -1)
            o = torch.einsum("bhqk,bkhd->bqhd", a, v).reshape(B, T, D)
            x = x + self.proj(o) * self.ls1
            return x + self.fc2(torch.nn.functional.gelu(self.fc1(self.n2(x)))) * self.ls2

    class TorchViT(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.pp = torch.nn.Linear(P * P * 3, D)
            self.cls = torch.nn.Parameter(torch.zeros(1, D))
            self.pos = torch.nn.Parameter(0.02 * torch.randn((224 // P) ** 2 + 1, D))
            self.blocks = torch.nn.ModuleList([Block() for _ in range(depth)])
            self.norm = torch.nn.LayerNorm(D, eps=1e-6)

        def forward(self, img):  # [B, 224, 224, 3]
            B = img.shape[0]
            x = img.reshape(B, 224 // P, P, 224 // P, P, 3).permute(0, 1, 3, 2, 4, 5)
            x = self.pp(x.reshape(B, -1, P * P * 3))
            x = torch.cat([self.cls.expand(B, 1, D), x], 1) + self.pos
            for b in self.blocks:
                x = b(x)
            return self.norm(x)[:, 0]

    torch.manual_seed(0)
    model = TorchViT().eval()
    imgs = torch.randn(n_patches, 224, 224, 3)
    with torch.no_grad():
        model(imgs[:1])  # warm
        t0 = time.time()
        model(imgs)
    return n_patches / (time.time() - t0)


def _carryover_mfu(details_path: Path) -> dict:
    """On a CPU-fallback run the MFU section is meaningless (Pallas entries
    can't even lower; nominal CPU peaks say nothing about the chip) — carry
    over the last TPU report from the existing BENCH_DETAILS, clearly
    marked, instead of clobbering it with an error stub."""
    try:
        prior = json.loads(Path(details_path).read_text()).get(
            "device_resident_mfu"
        )
        if isinstance(prior, dict) and "error" not in prior:
            prior["carried_over_from_prior_tpu_run"] = True
            return prior
    except Exception:
        pass
    return {"error": "skipped on CPU fallback; no prior TPU report to carry"}


def main():
    backend_note = None
    if not _wait_for_backend():
        import jax

        jax.config.update("jax_platforms", "cpu")
        backend_note = (
            "TPU relay unavailable after 25 min of probing — all 'ours' "
            "numbers below ran on the host CPU backend and massively "
            "under-represent the chip (see prior BENCH_r*.json for TPU runs)"
        )
    _enable_compile_cache()
    if backend_note is None:
        # Belt-and-braces: the probe subprocess saw an accelerator, but THIS
        # process must too — if the plugin failed only here (or fell back to
        # CPU because the platform is not hard-pinned), mark the run.
        import jax

        if jax.devices()[0].platform == "cpu":
            backend_note = (
                "bench process initialised a CPU backend"
                + (
                    " (BENCH_SKIP_PROBE set — no accelerator probe ran)"
                    if os.environ.get("BENCH_SKIP_PROBE")
                    else " despite a successful accelerator probe"
                )
                + " — all 'ours' numbers ran on the host CPU backend "
                "(see prior BENCH_r*.json for TPU runs)"
            )
    with tempfile.TemporaryDirectory() as td:
        root = Path(td)
        (root / "ours").mkdir(exist_ok=True)
        (root / "ref").mkdir(exist_ok=True)
        ours_paths = make_fixtures(root / "ours", N_FILES)
        ours_pps, ours_pps_bf16 = run_ours(root / "ours", ours_paths)

        n_ref = int(os.environ.get("BENCH_REF_FILES", "2"))
        ref_paths = make_fixtures(root / "ref", n_ref)
        ref_pps = run_reference(ref_paths)

    inf_ours, inf_ours_scan = run_inference_ours()
    inf_ours_bf16, _ = run_inference_ours(bf16=True)
    inf_ref = run_inference_reference()
    train_ours, train_ours_scan = run_training_ours()
    vit_ours, vit_link = run_vit_extraction_ours()
    try:
        vit_ref = run_vit_extraction_reference()
    except Exception:
        vit_ref = None
    if backend_note:
        mfu_report = _carryover_mfu(
            Path(__file__).resolve().parent / "BENCH_DETAILS.json"
        )
    else:
        try:
            mfu_report = run_mfu_report()
        except Exception as e:
            mfu_report = {"error": str(e)}

    vs = (ours_pps / ref_pps) if ref_pps else None
    details = {
        "hypergraph_build_patches_per_sec": {
            "ours": round(ours_pps, 1),
            "ours_bf16_upload": round(ours_pps_bf16, 1),
            "speedup_bf16_upload": round(ours_pps_bf16 / ref_pps, 2) if ref_pps else None,
            "reference_cpu": round(ref_pps, 1) if ref_pps else None,
            "speedup": round(vs, 2) if vs else None,
            "candidate_mode": "compute_on_read (save_similarity=False: full "
            "[N,N] computed on device for exact stats, cache not persisted; "
            "reference persists its caches — rebuild recomputes ours on "
            "device, or materialise via --cache_similarity)",
        },
        "survival_inference_slides_per_sec": {
            "ours": round(inf_ours, 2),
            "ours_scan_windows_8": round(inf_ours_scan, 2),
            "ours_bf16": round(inf_ours_bf16, 2),
            "reference_cpu": round(inf_ref, 2) if inf_ref else None,
            "speedup": round(inf_ours / inf_ref, 2) if inf_ref else None,
            "speedup_scan": round(inf_ours_scan / inf_ref, 2) if inf_ref else None,
            "speedup_bf16": round(inf_ours_bf16 / inf_ref, 2) if inf_ref else None,
        },
        "survival_training_slides_per_sec": {
            "ours": round(train_ours, 2),
            "ours_scan_windows_8": round(train_ours_scan, 2),
            "note": "full window step: fwd+bwd+SVD group loss+Adam on "
                    "4096-patch bags; the reference trains batch_size=1 "
                    "with gradient accumulation on CPU (no comparable "
                    "throughput mode). scan_windows_8 fuses 8 window "
                    "updates into one dispatch (exp.scan_windows=8, "
                    "numerics identical — test_scan_windows_matches_"
                    "sequential), removing per-step dispatch latency",
        },
        "vit_extraction_patches_per_sec": {
            "ours_bf16_raw_uint8": round(vit_ours, 1),
            "h2d_link_ceiling_patches_per_sec": round(vit_link, 1),
            "link_bound_fraction": round(vit_ours / vit_link, 3) if vit_link else None,
            "reference_torch_cpu": round(vit_ref, 2) if vit_ref else None,
            "speedup": round(vit_ours / vit_ref, 1) if vit_ref else None,
            "note": "UNI ViT-L/16 CLS extraction on 256x256 crops; ours "
                    "ships raw uint8 and runs /255+bicubic-resize+"
                    "normalise in-jit with bf16 MXU matmuls "
                    "(test_vit_raw_uint8_path_matches_host_preprocess, "
                    "test_vit_bf16_extraction); reference is a torch-CPU "
                    "ViT-L forward with all CPU threads",
        },
    }
    details["device_resident_mfu"] = mfu_report
    if backend_note:
        details["backend_fallback"] = backend_note
    Path(__file__).resolve().parent.joinpath("BENCH_DETAILS.json").write_text(
        json.dumps(details, indent=2)
    )
    # ONE JSON line; the headline stays the build metric, and a `metrics`
    # array carries the inference/training numbers so the driver artifact
    # records them round-over-round (VERDICT r2 weak #7).  Inference and
    # training report their DEFAULT-path numbers: scan_windows is on by
    # default since round 3.
    print(
        json.dumps(
            {
                "metric": "hypergraph_build_patches_per_sec",
                "value": round(ours_pps, 1),
                "unit": "patches/s",
                "vs_baseline": round(vs, 2) if vs else None,
                **({"backend_fallback": "cpu"} if backend_note else {}),
                "metrics": [
                    # the deployable fast path the link-bound f32 headline
                    # cannot show (VERDICT r4 weak #4): bf16-upload build +
                    # the on-device compute ceiling with no host link at all
                    {
                        "metric": "hypergraph_build_bf16_upload_patches_per_sec",
                        "value": round(ours_pps_bf16, 1),
                        "unit": "patches/s",
                        "vs_baseline": round(ours_pps_bf16 / ref_pps, 2)
                        if ref_pps
                        else None,
                    },
                    *(
                        [
                            {
                                "metric": "hypergraph_build_device_resident_patches_per_sec",
                                "value": round(
                                    mfu_report["hypergraph_build"]["items_per_sec"], 1
                                ),
                                "unit": "patches/s",
                                "vs_baseline": round(
                                    mfu_report["hypergraph_build"]["items_per_sec"]
                                    / ref_pps,
                                    2,
                                )
                                if ref_pps
                                else None,
                            }
                        ]
                        if isinstance(mfu_report.get("hypergraph_build"), dict)
                        and mfu_report["hypergraph_build"].get("items_per_sec")
                        else []
                    ),
                    {
                        "metric": "survival_inference_slides_per_sec",
                        "value": round(inf_ours_scan, 2),
                        "unit": "slides/s",
                        "vs_baseline": round(inf_ours_scan / inf_ref, 2) if inf_ref else None,
                    },
                    {
                        "metric": "survival_training_slides_per_sec",
                        "value": round(train_ours_scan, 2),
                        "unit": "slides/s",
                        "vs_baseline": None,
                    },
                    {
                        "metric": "vit_extraction_patches_per_sec",
                        "value": round(vit_ours, 1),
                        "unit": "patches/s",
                        "vs_baseline": round(vit_ours / vit_ref, 1) if vit_ref else None,
                    },
                ],
            }
        )
    )


if __name__ == "__main__":
    main()
