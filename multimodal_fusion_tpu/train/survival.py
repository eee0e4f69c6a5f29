"""K-fold survival trainer.

Reference semantics (``downstream_survival/trainer.py:580-1185``) mapped to
TPU-native execution:

- the reference's per-case Python loop with gradient accumulation over
  ``batch_size`` micro-steps becomes ONE jitted, vmapped **window step**:
  all cases of an accumulation window are padded to a shared bucket, the
  window loss is ``(sum per-case losses + group_loss) / G`` (reference
  trainer.py:799-831), and a single optimizer update fires per window;
- group losses (SVD/CLIP/AUCM) consume the stacked window results instead of
  stateful model lists;
- early stopping on configurable metric (auc/acc/loss, mode max/min) with
  ``stop_epoch`` minimum (reference :487-578);
- per-fold checkpoints, final val+test evaluation with AUROC, per-patient
  probability dump;
- eval path supports ``drop_prob`` modality dropout (reference :966-1042).
"""

from __future__ import annotations

import json
import time
from functools import partial
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import nnx

from multimodal_fusion_tpu.config import Configs
from multimodal_fusion_tpu.data.batching import make_window
from multimodal_fusion_tpu.data.multimodal import MultimodalDataset
from multimodal_fusion_tpu.data.splits import FoldSplit, WeightedRandomSampler, save_fold_split
from multimodal_fusion_tpu.models.factory import ModelFactory
from multimodal_fusion_tpu.train.checkpoint import load_state, save_state
from multimodal_fusion_tpu.train.metrics import (
    accuracy,
    binary_auroc,
    multiclass_auroc_macro,
)
from multimodal_fusion_tpu.train.optim import LRSchedule, make_optimizer
from multimodal_fusion_tpu.utils.jaxcache import guard_cpu_compile_cache


# HBM guard for exp.device_data="auto" (the default): the fold's stacked
# tables go device-resident only when they fit this budget — v5e has 16 GiB
# HBM per chip, leave headroom for model/activations/similarity buffers.
DEVICE_DATA_AUTO_BUDGET = 8 * 2**30


class EarlyStopping:
    def __init__(self, patience=25, stop_epoch=10, mode="max", min_delta=0.0):
        self.patience = patience
        self.stop_epoch = stop_epoch
        mode = str(mode).lower()
        if mode not in ("max", "min"):
            # the reference normalises and raises too — anything else would
            # silently take the min-branch and restore the WORST epoch
            raise ValueError(f"mode must be 'max' or 'min', got {mode!r}")
        self.mode = mode
        self.min_delta = min_delta
        self.counter = 0
        self.best_score = -np.inf if mode == "max" else np.inf
        self.early_stop = False

    def step(self, epoch: int, score: float) -> bool:
        """Returns True when this epoch improved (caller saves checkpoint)."""
        if self.mode == "max":
            better = score > self.best_score + self.min_delta
        else:
            better = score < self.best_score - self.min_delta
        if better:
            self.best_score = score
            self.counter = 0
            self._saved_once = True
            return True
        if not getattr(self, "_saved_once", False):
            # first evaluation with a degenerate metric (e.g. NaN AUC on a
            # single-class val split): still record a checkpoint, but keep
            # best_score open so any finite score later counts as improvement
            self._saved_once = True
            self.counter = 0
            return True
        self.counter += 1
        if self.counter >= self.patience and epoch > self.stop_epoch:
            self.early_stop = True
        return False


def _window_sig(window):
    """Shape signature of a window pytree (scanned steps require identical
    shapes across the group)."""
    leaves, treedef = jax.tree.flatten(window)
    return treedef, tuple(np.shape(x) for x in leaves)


class SurvivalTrainer:
    def __init__(self, configs: Configs, log_dir: str | Path):
        self.configs = configs
        self.exp = configs.experiment_config
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        # Opt-in data parallelism: exp.mesh_shape = {"data": N} shards every
        # window's leading axis over N devices; params replicate and XLA
        # inserts the gradient all-reduce (SURVEY §2.6 TPU-native equivalent).
        # Multi-host/multi-slice: {"replica": R, "data": N} builds a 2-axis
        # (replica=DCN, data=ICI) mesh — batches shard R*N ways, gradient
        # reduction lowers hierarchically (parallel/mesh.py docstring).
        from multimodal_fusion_tpu.parallel.mesh import mesh_from_shape

        self.mesh = mesh_from_shape(self.exp.mesh_shape)

    def _place_window(self, window, keys, n_cases: int):
        """Shard a full-size window over the data mesh (replicated fallback
        for leftover windows whose size doesn't divide the mesh)."""
        from multimodal_fusion_tpu.parallel.mesh import place_batch

        return place_batch(self.mesh, (window, keys), batch_size=n_cases)

    def _place_windows_scanned(self, windows, keys):
        """Shard a stacked [W, G, ...] scan group over the data mesh: the
        scan axis W stays unsharded (it is sequential), the case axis G
        shards over every mesh axis."""
        from multimodal_fusion_tpu.parallel.mesh import place_batch

        return place_batch(
            self.mesh, (windows, keys), scan=True,
            batch_size=windows["label"].shape[1],
        )

    def _constrain_window(self, window, keys):
        """In-jit analog of ``_place_window``: constrain a gathered window's
        case axis onto the data mesh (no-op without a mesh or when the
        window size doesn't divide the device count)."""
        if self.mesh is None:
            return window, keys
        n_dev = self.mesh.devices.size
        if window["label"].shape[0] % n_dev != 0:
            return window, keys
        from jax.sharding import NamedSharding, PartitionSpec as P

        sh = NamedSharding(self.mesh, P(tuple(self.mesh.axis_names)))
        con = lambda x: jax.lax.with_sharding_constraint(x, sh)
        return jax.tree.map(con, window), con(keys)

    def _device_tables(self, dataset, indices):
        """Materialise the cases at ``indices`` as ONE device-resident
        stacked table (every case padded to a global per-channel bucket), so
        a training/eval window becomes a row gather inside the jit step
        instead of a fresh host->device upload.

        The host path re-reads, re-pads and re-ships every window each epoch
        — through a remote TPU link that upload dominates training
        wall-clock. Numerics match the host path through the mask-aware
        padding invariance of every registered model (the global bucket is
        >= the per-window bucket; tested in test_device_data_matches_host).

        Returns ``(tables, row_of)``: tables is a window-shaped pytree with
        leading case axis, ``row_of`` maps dataset index -> table row."""
        from multimodal_fusion_tpu.data.batching import pad_case, stack_window, window_bag_sizes

        raws, labels, cids = [], [], []
        for i in indices:
            cid = dataset.case_ids[int(i)]
            raw, label = dataset.get_case(cid)
            raws.append(raw)
            labels.append(label)
            cids.append(cid)
        sizes = window_bag_sizes(raws)
        padded = [pad_case(r, l, sizes) for r, l in zip(raws, labels)]
        tables = stack_window(padded)
        if getattr(dataset, "has_survival_time", False):
            tables["time"] = np.asarray([dataset.case_to_time[c] for c in cids], np.float32)
            tables["event"] = np.asarray([dataset.case_to_event[c] for c in cids], np.float32)
        nbytes = sum(
            x.nbytes for x in jax.tree.leaves(tables) if hasattr(x, "nbytes")
        )
        if nbytes > DEVICE_DATA_AUTO_BUDGET:
            if self.exp.get("device_data", "auto") == "auto":
                # auto mode (the round-3 default): fall back to the host
                # path instead of risking an HBM OOM
                print(
                    f"device_data=auto: tables are {nbytes / 2**30:.1f} GiB "
                    f"(> {DEVICE_DATA_AUTO_BUDGET / 2**30:.0f} GiB budget) — "
                    "using the host window path"
                )
                return None, None
            print(
                f"device_data: tables are {nbytes / 2**30:.1f} GiB — "
                "ensure they fit device memory (or disable exp.device_data)"
            )
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            sh = NamedSharding(self.mesh, P())  # replicated; windows reshard in-jit
            tables = jax.tree.map(lambda x: jax.device_put(np.asarray(x), sh), tables)
        else:
            tables = jax.tree.map(jnp.asarray, tables)
        row_of = {int(i): r for r, i in enumerate(indices)}
        return tables, row_of

    @staticmethod
    def _gather_window(tables, idx):
        """Row-gather a window out of the device tables (inside jit)."""
        return jax.tree.map(lambda t: t[idx], tables)

    # ------------------------------------------------------------------
    # jitted step builders
    # ------------------------------------------------------------------

    def _build_model(self, fold_idx: int):
        model = ModelFactory.create_model(self.configs.model_config, seed=self.exp.seed + fold_idx)
        graphdef, params, rest = nnx.split(model, nnx.Param, ...)
        self._supports_drop_prob = getattr(model, "supports_drop_prob", False)
        return model, graphdef, params, rest

    def _vmap_cases(self, one, params, rest, batched_args, G: int):
        """vmap ``one(params, rest, *case_args)`` over the case axis.

        Under a mesh whose size divides G the vmap runs INSIDE ``shard_map``
        (manual partitioning, params/rest replicated, cases sharded over
        every mesh axis): each device computes its local case shard, so
        Pallas kernels — the fused attention of MFMF bags — dispatch
        per-device.  GSPMD cannot partition a Mosaic custom call, which
        used to force the XLA attention formulation on meshes exactly
        where the kernel matters most (VERDICT r3 #1).  shard_map(vmap)
        is mathematically identical to vmap (cases are independent), and
        reverse-mode AD through it psums the replicated params' cotangent
        (verified: mesh training == unmeshed training bit-for-bit on the
        parity tests).  Windows that don't divide the mesh (leftovers,
        replicated placements) fall back to GSPMD vmap with every Pallas
        attention dispatch forced to the XLA formulation at trace time
        (``ops.pallas_attention.force_xla``)."""

        def vm(p, r, *b):
            return jax.vmap(lambda *case: one(p, r, *case))(*b)

        if self.mesh is None:
            return vm(params, rest, *batched_args)
        n_dev = int(self.mesh.devices.size)
        if G % n_dev:
            from multimodal_fusion_tpu.ops.pallas_attention import force_xla

            with force_xla():
                return vm(params, rest, *batched_args)
        from jax.sharding import PartitionSpec as P

        try:
            from jax import shard_map
        except ImportError:  # pragma: no cover - older jax
            from jax.experimental.shard_map import shard_map

        axes = tuple(self.mesh.axis_names)
        smapped = shard_map(
            vm,
            mesh=self.mesh,
            in_specs=(P(), P()) + (P(axes),) * len(batched_args),
            out_specs=P(axes),
            check_vma=False,
        )
        return smapped(params, rest, *batched_args)

    def _window_update_fn(self, model, graphdef, tx):
        """The pure per-window update (fwd+bwd+group loss+optimizer step) —
        shared by the single-window jit and the scanned multi-window jit."""
        has_group = model.has_group_loss()
        remat = bool(getattr(self.exp, "remat", False))

        def train_step(params, rest, opt_state, window, keys, lr):
            labels = window["label"]
            G = labels.shape[0]

            def loss_fn(params):
                def one(params, rest, channels, masks, label, key):
                    m = nnx.merge(graphdef, params, rest)
                    case = {"channels": channels, "masks": masks}
                    res = m(case, label, key=key, train=True)
                    loss = m.loss_fn(res["logits"], label[None], res)
                    _, _, new_rest = nnx.split(m, nnx.Param, ...)
                    return loss, res, new_rest

                if remat:
                    # exp.remat: recompute each case's forward during the
                    # backward pass — activation HBM per window drops from
                    # O(G * bag * hidden) to O(G * outputs), letting window/
                    # bag sizes scale (jax.checkpoint; SURVEY §7 design note)
                    one = jax.checkpoint(one)

                losses, results, new_rests = self._vmap_cases(
                    one, params, rest,
                    (window["channels"], window["masks"], labels, keys), G,
                )
                total = jnp.sum(losses)
                if has_group:
                    m = nnx.merge(graphdef, params, rest)
                    gr = dict(results)
                    gr["label"] = labels
                    if "time" in window:  # Cox partial likelihood inputs
                        gr["time"] = window["time"]
                        gr["event"] = window["event"]
                    total = total + m.group_loss_fn(gr)
                return total / G, (results, new_rests, jnp.mean(losses))

            grads, (results, new_rests, mean_loss) = jax.grad(loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            updates = jax.tree.map(lambda u: -lr * u, updates)
            params = optax.apply_updates(params, updates)
            new_rest = jax.tree.map(lambda x: jnp.mean(x, axis=0), new_rests)
            return params, new_rest, opt_state, mean_loss, results

        return train_step

    def _make_train_step(self, model, graphdef, tx):
        # donate (params, rest, opt_state): Adam reads AND rewrites params +
        # both moments every step — donation lets XLA update them in place
        # instead of materialising fresh output buffers (the step is
        # memory-bound; callers always rebind the returned triple)
        return jax.jit(
            self._window_update_fn(model, graphdef, tx), donate_argnums=(0, 1, 2)
        )

    def _make_scanned_train_step(self, model, graphdef, tx):
        """W gradient-accumulation windows fused into ONE device dispatch:
        ``lax.scan`` threads (params, rest, opt_state) through W sequential
        window updates — numerics identical to W single-window dispatches,
        but the per-step host->device dispatch cost (which dominates training
        wall-clock through a remote TPU link) is paid once per W windows.
        Enabled by ``experiment_config.scan_windows = W``."""
        update = self._window_update_fn(model, graphdef, tx)

        @partial(jax.jit, donate_argnums=(0, 1, 2))
        def train_steps(params, rest, opt_state, windows, keys, lr):
            def body(carry, xs):
                params, rest, opt_state = carry
                window, kk = xs
                params, rest, opt_state, mean_loss, _ = update(
                    params, rest, opt_state, window, kk, lr
                )
                return (params, rest, opt_state), mean_loss

            (params, rest, opt_state), losses = jax.lax.scan(
                body, (params, rest, opt_state), (windows, keys)
            )
            return params, rest, opt_state, losses

        return train_steps

    def _make_dev_train_steps(self, model, graphdef, tx):
        """device_data step builders: windows are gathered from the
        device-resident tables by a [G] (or [W, G]) row-index vector inside
        the jit — the only per-step host->device payload is the indices."""
        update = self._window_update_fn(model, graphdef, tx)

        @partial(jax.jit, donate_argnums=(0, 1, 2))
        def step_dev(params, rest, opt_state, tables, idx, keys, lr):
            window = self._gather_window(tables, idx)
            window, keys = self._constrain_window(window, keys)
            return update(params, rest, opt_state, window, keys, lr)

        @partial(jax.jit, donate_argnums=(0, 1, 2))
        def steps_dev_scanned(params, rest, opt_state, tables, idxs, keys, lr):
            def body(carry, xs):
                params, rest, opt_state = carry
                idx, kk = xs
                window = self._gather_window(tables, idx)
                window, kk = self._constrain_window(window, kk)
                params, rest, opt_state, mean_loss, _ = update(
                    params, rest, opt_state, window, kk, lr
                )
                return (params, rest, opt_state), mean_loss

            (params, rest, opt_state), losses = jax.lax.scan(
                body, (params, rest, opt_state), (idxs, keys)
            )
            return params, rest, opt_state, losses

        return step_dev, steps_dev_scanned

    def _make_eval_step(self, model, graphdef, drop_prob: Optional[float] = None):
        if drop_prob is not None and not self._supports_drop_prob:
            # fail loudly like the reference (its non-detach forwards have no
            # drop_prob parameter, so passing one raises TypeError) — a
            # silent no-op would report fake perfect robustness sweeps
            raise ValueError(
                f"{type(model).__name__} does not support inference-time "
                "modality dropout (drop_prob); use a *_detach variant"
            )
        use_drop = drop_prob is not None and self._supports_drop_prob
        # Opt-in bf16 inference (model_config.compute_dtype="bfloat16"):
        # parameters and floating inputs cast to bf16, so the trunk matmuls
        # run as native MXU bf16 (accumulation stays f32 via the models'
        # preferred_element_type); logits/probabilities cast back to f32 for
        # metrics.  Training and all parity tests stay f32.
        cdtype = self.configs.model_config.get("compute_dtype", "float32")
        cast = jnp.bfloat16 if cdtype == "bfloat16" else None

        def _to_compute(tree):
            if cast is None:
                return tree
            return jax.tree.map(
                lambda x: x.astype(cast)
                if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
                else x,
                tree,
            )

        def eval_window(params, rest, window, keys):
            def one(params, rest, channels, masks, label, key):
                m = nnx.merge(graphdef, params, rest)
                case = {"channels": channels, "masks": masks}
                if use_drop:
                    res = m(case, label, key=key, train=False, drop_prob=drop_prob)
                else:
                    res = m(case, label, train=False)
                loss = m.loss_fn(res["logits"], label[None], res)
                # log-risk for C-index: Cox head output when present,
                # positive-class logit otherwise
                risk = res["risk"] if "risk" in res else res["logits"][0, 1:2]
                out = (res["logits"], res["probabilities"], res["predictions"], loss, risk)
                return jax.tree.map(
                    lambda x: x.astype(jnp.float32)
                    if jnp.issubdtype(x.dtype, jnp.floating) else x,
                    out,
                )

            return self._vmap_cases(
                one, params, rest,
                (window["channels"], window["masks"], window["label"], keys),
                int(window["label"].shape[0]),
            )

        @jax.jit
        def eval_step(params, rest, window, keys):
            params = _to_compute(params)
            rest = _to_compute(rest)
            window = dict(window, channels=_to_compute(window["channels"]))
            return eval_window(params, rest, window, keys)

        @jax.jit
        def eval_steps_scanned(params, rest, windows, keys):
            """W same-shape eval windows in ONE dispatch via lax.map (no
            carried state — outputs come back stacked [W, G, ...])."""
            params = _to_compute(params)
            rest = _to_compute(rest)
            windows = dict(windows, channels=_to_compute(windows["channels"]))
            return jax.lax.map(
                lambda wk: eval_window(params, rest, wk[0], wk[1]), (windows, keys)
            )

        @jax.jit
        def eval_step_dev(params, rest, tables, idx, keys):
            sub = {k: tables[k] for k in ("channels", "masks", "label")}
            window = self._gather_window(sub, idx)
            window, keys = self._constrain_window(window, keys)
            params = _to_compute(params)
            rest = _to_compute(rest)
            window = dict(window, channels=_to_compute(window["channels"]))
            return eval_window(params, rest, window, keys)

        @jax.jit
        def eval_steps_dev_scanned(params, rest, tables, idxs, keys):
            params = _to_compute(params)
            rest = _to_compute(rest)
            sub = {k: tables[k] for k in ("channels", "masks", "label")}

            def one_window(ik):
                idx, kk = ik
                window = self._gather_window(sub, idx)
                window, kk = self._constrain_window(window, kk)
                window = dict(window, channels=_to_compute(window["channels"]))
                return eval_window(params, rest, window, kk)

            return jax.lax.map(one_window, (idxs, keys))

        eval_step.scanned = eval_steps_scanned
        eval_step.dev = eval_step_dev
        eval_step.dev_scanned = eval_steps_dev_scanned
        # AUCM-family models accumulate group logits across the WHOLE
        # validation set and add ONE group loss (reference trainer.py:906-912
        # — the hasattr(model, 'group_logits') guard selects exactly these;
        # SVD/CLIP models do NOT add theirs in validation).  Bind the closure
        # to a COPY of the model state: the live model's arrays alias the
        # split params/rest, which the train steps DONATE — the initial
        # a/b/alpha values (the reference never steps them, see aucm_loss)
        # must survive the donation.
        eval_step.group_eval = None
        if getattr(model, "stashes_group_logits", False):
            gd_all, st_all = nnx.split(model)
            gmodel = nnx.merge(
                gd_all, jax.tree.map(lambda x: jnp.array(x, copy=True), st_all)
            )
            eval_step.group_eval = gmodel.group_loss_fn
        return eval_step

    # ------------------------------------------------------------------
    # epoch loops
    # ------------------------------------------------------------------

    def _windows(self, dataset, indices: Sequence[int], G: int):
        """Yield stacked window batches of <= G cases (+ survival time/event
        when the dataset CSV carries them, feeding the Cox group loss)."""
        case_ids = [dataset.case_ids[i] for i in indices]
        with_time = getattr(dataset, "has_survival_time", False)
        for start in range(0, len(case_ids), G):
            chunk = case_ids[start : start + G]
            raws, labels = [], []
            for cid in chunk:
                raw, label = dataset.get_case(cid)
                raws.append(raw)
                labels.append(label)
            window = make_window(raws, labels)
            if with_time:
                window["time"] = np.asarray(
                    [dataset.case_to_time[c] for c in chunk], np.float32
                )
                window["event"] = np.asarray(
                    [dataset.case_to_event[c] for c in chunk], np.float32
                )
            yield chunk, window

    def _windows_prefetched(self, dataset, indices: Sequence[int], G: int, depth: int = 2):
        """Producer-consumer wrapper over ``_windows``: the next windows'
        h5 reads + padding run on a background thread while the device
        trains on the current one (order and results identical).

        Abort-safety: if the consumer stops early (train_step raised, the
        generator is closed), the producer's bounded-timeout put notices the
        stop flag and exits — a plain blocking put would deadlock
        ``ThreadPoolExecutor.__exit__`` on the full queue.  Producer
        exceptions (h5 read errors mid-epoch) are re-raised in the consumer
        instead of masquerading as a clean end-of-data."""
        import queue as queue_mod
        from concurrent.futures import ThreadPoolExecutor
        from queue import Queue

        q: Queue = Queue(maxsize=depth)
        _SENTINEL = object()
        stop = False

        def producer():
            try:
                for item in self._windows(dataset, indices, G):
                    while True:
                        if stop:
                            return
                        try:
                            q.put(item, timeout=0.1)
                            break
                        except queue_mod.Full:
                            continue
            except BaseException as e:  # noqa: BLE001 — re-raised by consumer
                item = ("__error__", e)
                while not stop:
                    try:
                        q.put(item, timeout=0.1)
                        return
                    except queue_mod.Full:
                        continue
            else:
                while not stop:
                    try:
                        q.put(_SENTINEL, timeout=0.1)
                        return
                    except queue_mod.Full:
                        continue

        with ThreadPoolExecutor(max_workers=1) as pool:
            pool.submit(producer)
            try:
                while True:
                    item = q.get()
                    if item is _SENTINEL:
                        break
                    if isinstance(item, tuple) and len(item) == 2 and item[0] == "__error__":
                        raise item[1]
                    yield item
            finally:
                stop = True
                # drain so a producer blocked in put() sees the flag promptly
                while not q.empty():
                    try:
                        q.get_nowait()
                    except queue_mod.Empty:
                        break

    def _evaluate(
        self, dataset, indices, eval_step, params, rest, key,
        tables=None, row_of=None,
    ) -> Dict[str, Any]:
        if tables is not None:
            return self._evaluate_dev(
                dataset, indices, eval_step, params, rest, key, tables, row_of
            )
        all_probs, all_preds, all_labels, all_loss, all_risk, patient_ids = [], [], [], [], [], []
        G = min(self.exp.batch_size, 16)
        scanW = max(1, int(self.exp.get("scan_windows", 1) or 1))
        scanned = getattr(eval_step, "scanned", None) if scanW > 1 else None
        buf: List[Any] = []
        buf_sig = None

        all_logits = []

        def emit(logits, probs, preds, losses, risk):
            # keep results as device arrays so eval windows pipeline (JAX
            # async dispatch); one host sync after the last window
            all_logits.append(logits)
            all_probs.append(probs)
            all_preds.append(preds)
            all_loss.append(losses)
            all_risk.append(risk)

        def flush_buf():
            nonlocal buf, buf_sig
            if not buf:
                return
            if scanned is not None and len(buf) == scanW:
                windows = jax.tree.map(lambda *xs: np.stack(xs), *[w for _, w, _ in buf])
                kstack = jnp.stack([k for _, _, k in buf])
                # batched-inference mesh DP (SURVEY §2.6): case axis shards,
                # scan axis stays sequential — same placement as training
                windows, kstack = self._place_windows_scanned(windows, kstack)
                logits, probs, preds, losses, risk = scanned(params, rest, windows, kstack)
                # stacked [W, G, ...] -> flatten the scan axis
                emit(
                    logits.reshape((-1,) + logits.shape[2:]),
                    probs.reshape((-1,) + probs.shape[2:]),
                    preds.reshape((-1,) + preds.shape[2:]),
                    losses.reshape(-1),
                    risk.reshape((-1,) + risk.shape[2:]),
                )
            else:
                for _, window, keys in buf:
                    window, keys = self._place_window(
                        window, keys, window["label"].shape[0]
                    )
                    logits, probs, preds, losses, risk = eval_step(params, rest, window, keys)
                    emit(logits, probs, preds, losses, risk)
            buf = []
            buf_sig = None

        for chunk, window in self._windows(dataset, indices, G):
            window.pop("time", None)  # eval step consumes channels/masks/label
            window.pop("event", None)
            n = window["label"].shape[0]
            key, sub = jax.random.split(key)
            keys = jax.random.split(sub, n)
            all_labels.append(np.asarray(window["label"]))
            patient_ids.extend(chunk)
            if scanned is None:
                window, keys = self._place_window(window, keys, n)
                logits, probs, preds, losses, risk = eval_step(params, rest, window, keys)
                emit(logits, probs, preds, losses, risk)
                continue
            sig = _window_sig(window)
            if buf and sig != buf_sig:
                flush_buf()
            buf.append((chunk, window, keys))
            buf_sig = sig
            if len(buf) == scanW:
                flush_buf()
        flush_buf()
        return self._eval_summary(
            dataset, all_probs, all_preds, all_labels, all_loss, all_risk,
            patient_ids, all_logits=all_logits,
            group_eval=getattr(eval_step, "group_eval", None),
        )

    def _eval_summary(
        self, dataset, all_probs, all_preds, all_labels, all_loss, all_risk,
        patient_ids, all_logits=None, group_eval=None,
    ) -> Dict[str, Any]:
        probs = np.concatenate([np.asarray(p)[:, 0, :] for p in all_probs])
        preds = np.concatenate([np.asarray(p).reshape(-1) for p in all_preds])
        labels = np.concatenate(all_labels)
        risk = np.concatenate([np.asarray(r).reshape(-1) for r in all_risk])
        loss = float(np.concatenate([np.asarray(l) for l in all_loss]).mean())
        if group_eval is not None and all_logits:
            # ONE group loss over the whole evaluated set, added to the
            # case-mean like the reference's logger.batch_log['loss'] +=
            # group_loss; total / len(loader)
            logits_all = np.concatenate([np.asarray(x) for x in all_logits])
            gl = float(
                group_eval({"logits": jnp.asarray(logits_all), "label": jnp.asarray(labels)})
            )
            loss = loss + gl / max(len(labels), 1)
        out = {
            # macro multiclass AUROC above 2 classes (reference
            # trainer.py:916-921; the binary statistic is meaningless there)
            "auc": binary_auroc(probs[:, 1], labels)
            if probs.shape[1] == 2
            else multiclass_auroc_macro(probs, labels),
            "acc": accuracy(preds, labels),
            "loss": loss,
            "probs": probs,
            "preds": preds,
            "labels": labels,
            "risk": risk,
            "patient_ids": patient_ids,
        }
        if getattr(dataset, "has_survival_time", False):
            from multimodal_fusion_tpu.train.metrics import concordance_index

            time_arr = np.asarray([dataset.case_to_time[c] for c in patient_ids])
            event_arr = np.asarray([dataset.case_to_event[c] for c in patient_ids])
            out["c_index"] = concordance_index(risk, time_arr, event_arr)
        return out

    def _evaluate_dev(
        self, dataset, indices, eval_step, params, rest, key, tables, row_of
    ) -> Dict[str, Any]:
        """device_data evaluation: same window walk and RNG stream as the
        host ``_evaluate``, but each window is a row gather from the
        device-resident tables (eval_step.dev / .dev_scanned)."""
        all_probs, all_preds, all_labels, all_loss, all_risk, patient_ids = [], [], [], [], [], []
        G = min(self.exp.batch_size, 16)
        scanW = max(1, int(self.exp.get("scan_windows", 1) or 1))
        all_labels_arr = np.asarray(dataset.labels)  # property: hoist once
        rows = np.asarray([row_of[int(i)] for i in indices], np.int32)
        win_idx = [rows[s : s + G] for s in range(0, len(rows), G)]
        n_win = len(win_idx)
        n_full = n_win - (1 if n_win and len(win_idx[-1]) != G else 0)
        labels_np = all_labels_arr[np.asarray(indices, int)]
        patient_ids.extend(dataset.case_ids[int(i)] for i in indices)
        all_labels.append(labels_np)

        all_logits = []

        def emit(logits, probs, preds, losses, risk):
            all_logits.append(logits)
            all_probs.append(probs)
            all_preds.append(preds)
            all_loss.append(losses)
            all_risk.append(risk)

        keys_per_win = []
        for w in win_idx:
            key, sub = jax.random.split(key)
            keys_per_win.append(jax.random.split(sub, len(w)))

        p = 0
        while p < n_full:
            if scanW > 1 and n_full - p >= scanW:
                idxs = jnp.asarray(np.stack(win_idx[p : p + scanW]))
                kst = jnp.stack(keys_per_win[p : p + scanW])
                logits, probs, preds, losses, risk = eval_step.dev_scanned(
                    params, rest, tables, idxs, kst
                )
                emit(
                    logits.reshape((-1,) + logits.shape[2:]),
                    probs.reshape((-1,) + probs.shape[2:]),
                    preds.reshape((-1,) + preds.shape[2:]),
                    losses.reshape(-1),
                    risk.reshape((-1,) + risk.shape[2:]),
                )
                p += scanW
            else:
                logits, probs, preds, losses, risk = eval_step.dev(
                    params, rest, tables, jnp.asarray(win_idx[p]), keys_per_win[p]
                )
                emit(logits, probs, preds, losses, risk)
                p += 1
        if n_full < n_win:  # leftover partial window
            logits, probs, preds, losses, risk = eval_step.dev(
                params, rest, tables, jnp.asarray(win_idx[-1]), keys_per_win[-1]
            )
            emit(logits, probs, preds, losses, risk)
        return self._eval_summary(
            dataset, all_probs, all_preds, all_labels, all_loss, all_risk,
            patient_ids, all_logits=all_logits,
            group_eval=getattr(eval_step, "group_eval", None)
        )

    # ------------------------------------------------------------------

    # CPU-only: keep the large (scanned) train/eval executables out of the
    # persistent compile cache — XLA:CPU executable (de)serialization has
    # segfaulted in aged full-suite processes on exactly these programs
    # (alignment trainer twice, then this trainer's windowed train step at
    # tests/test_trained_parity.py — faulthandler trace ends in
    # compilation_cache.put_executable_and_time).  TPU caches normally.
    @guard_cpu_compile_cache
    def train_fold(
        self, dataset: MultimodalDataset, split: FoldSplit, fold_idx: int
    ) -> Dict[str, Any]:
        exp = self.exp
        save_fold_split(split, dataset.case_ids, self.log_dir / f"splits_{fold_idx}.csv")

        model, graphdef, params, rest = self._build_model(fold_idx)
        tx = make_optimizer(exp.optimizer, exp.weight_decay)
        opt_state = tx.init(params)
        # "auto" (the default since round 3) = use the device-resident path
        # whenever the fold's stacked tables fit the HBM budget; numerics are
        # identical either way (test_survival_device_data_matches_host)
        dev_mode = exp.get("device_data", "auto")
        use_dev = bool(dev_mode)  # "auto" and True both try; False skips
        scanW = max(1, int(exp.get("scan_windows", 1) or 1))
        eval_step = self._make_eval_step(model, graphdef)
        tables = row_of = dev_step = dev_scan = None
        if use_dev:
            all_idx = np.concatenate(
                [split.train_idx, split.val_idx, split.test_idx]
            ).astype(np.int64)
            tables, row_of = self._device_tables(dataset, all_idx)
            if tables is None:  # auto fallback: over the HBM budget
                use_dev = False
            else:
                dev_step, dev_scan = self._make_dev_train_steps(model, graphdef, tx)
        train_step = self._make_train_step(model, graphdef, tx) if not use_dev else None
        scan_step = (
            self._make_scanned_train_step(model, graphdef, tx)
            if scanW > 1 and not use_dev
            else None
        )
        schedule = LRSchedule(exp.lr, exp.scheduler_params if exp.scheduler else None)
        if exp.scheduler:
            schedule.config.setdefault("type", exp.scheduler)
            schedule.kind = schedule.config.get("type")

        train_labels = dataset.labels[split.train_idx]
        sampler = (
            WeightedRandomSampler(train_labels, exp.seed + fold_idx)
            if exp.weighted_sampling
            else None
        )
        shuffle_rng = np.random.default_rng(exp.seed + fold_idx)
        # the --early_stopping flag GATES both the stop and the best-ckpt
        # restore (reference trainer.py:691-744): without it the reference
        # trains all epochs and evaluates the FINAL weights (review finding:
        # we stopped/restored unconditionally)
        use_early_stop = bool(exp.get("early_stopping", True))
        stopper = EarlyStopping(
            patience=exp.patience,
            stop_epoch=exp.min_epochs,
            mode=exp.monitor_mode,
        )
        ckpt_path = self.log_dir / f"s_{fold_idx}_checkpoint.npz"
        key = jax.random.key(exp.seed * 1000 + fold_idx)
        history: List[Dict[str, float]] = []
        from multimodal_fusion_tpu.utils.logging import FoldLogger

        logger = FoldLogger(self.log_dir, fold_idx, self.configs.model_config.n_classes)

        for epoch in range(exp.max_epochs):
            t0 = time.time()
            if sampler is not None:
                order = split.train_idx[sampler.sample_epoch()]
            else:
                order = shuffle_rng.permutation(split.train_idx)
            lr = schedule.lr_for_epoch(epoch)
            # per-window mean losses stay ON DEVICE until epoch end: pulling
            # them per window (`float(mean_loss)`) would block the host on a
            # device round-trip every step, serializing dispatch through the
            # TPU link.  np.asarray at epoch end syncs once.
            epoch_losses: List[Any] = []

            if use_dev:
                # device-resident path: windows are [G] row-index vectors;
                # full windows scan in groups of scanW, the epoch tail
                # single-steps (same grouping the host path's flush gives)
                rows = np.asarray([row_of[int(i)] for i in order], np.int32)
                G = exp.batch_size
                win_idx = [rows[s : s + G] for s in range(0, len(rows), G)]
                n_win = len(win_idx)
                n_full = n_win - (1 if n_win and len(win_idx[-1]) != G else 0)
                p = 0
                while p < n_win:
                    if scanW > 1 and n_full - p >= scanW:
                        group = win_idx[p : p + scanW]
                        kl = []
                        for w in group:
                            key, sub = jax.random.split(key)
                            kl.append(jax.random.split(sub, len(w)))
                        params, rest, opt_state, losses = dev_scan(
                            params, rest, opt_state, tables,
                            jnp.asarray(np.stack(group)), jnp.stack(kl), lr,
                        )
                        epoch_losses.append(losses)
                        p += scanW
                    else:
                        w = win_idx[p]
                        key, sub = jax.random.split(key)
                        kk = jax.random.split(sub, len(w))
                        params, rest, opt_state, mean_loss, _ = dev_step(
                            params, rest, opt_state, tables, jnp.asarray(w), kk, lr
                        )
                        epoch_losses.append(mean_loss)
                        p += 1
            else:
                buf: List[Any] = []
                buf_sig = None

                def flush_buf():
                    nonlocal params, rest, opt_state, buf, buf_sig
                    if not buf:
                        return
                    if scan_step is not None and len(buf) == scanW:
                        windows = jax.tree.map(
                            lambda *xs: np.stack(xs), *[w for w, _ in buf]
                        )
                        kstack = jnp.stack([k for _, k in buf])
                        windows, kstack = self._place_windows_scanned(windows, kstack)
                        params, rest, opt_state, losses = scan_step(
                            params, rest, opt_state, windows, kstack, lr
                        )
                        epoch_losses.append(losses)
                    else:
                        # partial group (epoch tail / shape change): single steps
                        for window, keys in buf:
                            n = window["label"].shape[0]
                            window, keys = self._place_window(window, keys, n)
                            params, rest, opt_state, mean_loss, _ = train_step(
                                params, rest, opt_state, window, keys, lr
                            )
                            epoch_losses.append(mean_loss)
                    buf = []
                    buf_sig = None

                for _, window in self._windows_prefetched(dataset, order, exp.batch_size):
                    n = window["label"].shape[0]
                    key, sub = jax.random.split(key)
                    keys = jax.random.split(sub, n)
                    if scan_step is None:
                        window, keys = self._place_window(window, keys, n)
                        params, rest, opt_state, mean_loss, _ = train_step(
                            params, rest, opt_state, window, keys, lr
                        )
                        epoch_losses.append(mean_loss)
                        continue
                    # scanned windows must share shapes; bucketed bag sizes make
                    # consecutive windows usually identical — flush on change
                    sig = _window_sig(window)
                    if buf and sig != buf_sig:
                        flush_buf()
                    buf.append((window, keys))
                    buf_sig = sig
                    if len(buf) == scanW:
                        flush_buf()
                flush_buf()

            losses_np = (
                np.concatenate([np.atleast_1d(np.asarray(x)) for x in epoch_losses])
                if epoch_losses
                else np.asarray([])
            )
            key, sub = jax.random.split(key)
            val = self._evaluate(
                dataset, split.val_idx, eval_step, params, rest, sub,
                tables=tables, row_of=row_of,
            )
            metric = val[exp.monitor_metric]
            schedule.plateau_step(val["loss"])
            improved = stopper.step(epoch, metric)
            if improved and use_early_stop:
                save_state(ckpt_path, {"params": params, "rest": rest})
            history.append(
                {
                    "epoch": epoch,
                    "lr": lr,
                    "train_loss": float(losses_np.mean()) if losses_np.size else float("nan"),
                    "val_loss": val["loss"],
                    "val_auc": val["auc"],
                    "val_acc": val["acc"],
                    "time_s": time.time() - t0,
                }
            )
            logger.log_epoch(
                epoch, lr, history[-1]["train_loss"], val, history[-1]["time_s"]
            )
            if exp.get("verbose", True):
                h = history[-1]
                print(
                    f"fold {fold_idx} epoch {epoch}: train_loss={h['train_loss']:.4f} "
                    f"val_loss={h['val_loss']:.4f} val_auc={h['val_auc']:.4f}"
                )
            if use_early_stop and stopper.early_stop:
                break

        if use_early_stop:
            # restore best checkpoint
            if ckpt_path.exists():
                restored, _ = load_state(ckpt_path, {"params": params, "rest": rest})
                params, rest = restored["params"], restored["rest"]
        else:
            # reference without the flag: persist + evaluate FINAL weights
            save_state(ckpt_path, {"params": params, "rest": rest})

        key, k1, k2 = jax.random.split(key, 3)
        val = self._evaluate(
            dataset, split.val_idx, eval_step, params, rest, k1,
            tables=tables, row_of=row_of,
        )
        test = self._evaluate(
            dataset, split.test_idx, eval_step, params, rest, k2,
            tables=tables, row_of=row_of,
        )

        # per-patient probability dump (reference trainer.py:1013)
        patient_results = {
            pid: {"prob": test["probs"][i].tolist(), "label": int(test["labels"][i])}
            for i, pid in enumerate(test["patient_ids"])
        }
        summary = {
            "fold": fold_idx,
            "val_auc": val["auc"],
            "val_acc": val["acc"],
            "test_auc": test["auc"],
            "test_acc": test["acc"],
            "history": history,
        }
        (self.log_dir / f"fold_{fold_idx}_summary.json").write_text(
            json.dumps({**summary, "patient_results": patient_results}, indent=2)
        )
        logger.finalize(summary)
        self._fold_state = (model, graphdef, params, rest)
        return summary

    # ------------------------------------------------------------------

    @guard_cpu_compile_cache
    def evaluate_fold(
        self,
        dataset: MultimodalDataset,
        split: FoldSplit,
        fold_idx: int,
        checkpoint_path: Optional[str | Path] = None,
        drop_prob: Optional[float] = None,
        seed: int = 0,
    ) -> Dict[str, Any]:
        """Eval-only path: load a fold checkpoint, evaluate the test split
        under optional modality-dropout (reference trainer.py:1044-1169)."""
        model, graphdef, params, rest = self._build_model(fold_idx)
        path = Path(checkpoint_path or self.log_dir / f"s_{fold_idx}_checkpoint.npz")
        restored, _ = load_state(path, {"params": params, "rest": rest})
        params, rest = restored["params"], restored["rest"]
        eval_step = self._make_eval_step(model, graphdef, drop_prob=drop_prob)
        res = self._evaluate(
            dataset, split.test_idx, eval_step, params, rest, jax.random.key(seed)
        )
        return {k: res[k] for k in ("auc", "acc", "loss", "patient_ids")} | {
            "probs": res["probs"].tolist(),
            "labels": res["labels"].tolist(),
            "preds": res["preds"].tolist(),
            # risk = positive-class logit (Cox models: partial-hazard score);
            # a ranking score — the serving path (utils/predict.py) ensembles it
            "risk": res["risk"].tolist(),
        } | ({"c_index": res["c_index"]} if "c_index" in res else {})
