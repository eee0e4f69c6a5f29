"""Cross-modal alignment pretraining.

Reference: ``alignment/trainer.py:24-810`` — step-based loop over recycled
dataloader batches; rank-1 SVD or Gram-volume loss (+ loss_IM BCE vs global
negatives when lambda2 > 0); AdamW over the alignment layers ONLY (the match
predictor stays at init — reference :108-116, replicated); CosineAnnealingLR
(T_max=100, eta_min=1e-6) stepped on each epoch wrap; validation every
``val_interval`` steps with ``val_max_batches`` cap; best checkpoint +
periodic saves; early stopping on val loss; ``.history.json`` dump.

The whole train step (forward + loss + grad + AdamW update) is one jit.
"""

from __future__ import annotations

import json
import math
import time
from functools import partial
from pathlib import Path
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import nnx

from multimodal_fusion_tpu.models.alignment import MultiModalAlignmentModel
from multimodal_fusion_tpu.ops.losses import (
    binary_cross_entropy,
    rank1_svd_loss_from_dict,
    volume_loss,
)
from multimodal_fusion_tpu.train.checkpoint import save_state
from multimodal_fusion_tpu.utils.jaxcache import guard_cpu_compile_cache


def make_alignment_apply_fn(model: MultiModalAlignmentModel):
    """Numpy-in/numpy-out aligned-feature fn for dataset-side application
    (the counterpart of the reference's load-time alignment,
    multimodal_dataset.py:396-425)."""
    graphdef, state = nnx.split(model)

    @jax.jit
    def apply(state, feats):
        m = nnx.merge(graphdef, state)
        return m(feats)

    def fn(features: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        out = apply(state, {k: jnp.asarray(v) for k, v in features.items()})
        return {k: np.asarray(v) for k, v in out.items()}

    return fn


class MultiModalAlignmentTrainer:
    def __init__(
        self,
        model: MultiModalAlignmentModel,
        learning_rate: float = 1e-4,
        weight_decay: float = 1e-5,
        loss_type: str = "rank1",
        tau1: float = 0.1,
        tau2: float = 0.1,
        lambda1: float = 1.0,
        lambda2: float = 0.1,
        loss2_chunk_size: Optional[int] = None,
        val_max_batches: Optional[int] = None,
        early_stopping_patience: int = 10,
        early_stopping_min_delta: float = 1e-4,
        verbose_timing: bool = False,
        scan_steps: int = 1,
        mesh_shape=None,
        scalar_log_path: Optional[str | Path] = None,
        svd_impl: str = "gram",
    ):
        if loss_type not in ("rank1", "volume"):
            raise ValueError(f"unsupported loss type {loss_type}")
        if svd_impl not in ("gram", "svd"):
            raise ValueError(f"unsupported svd impl {svd_impl}")
        self.model = model
        self.loss_type = loss_type
        self.svd_impl = svd_impl
        self.tau1, self.tau2 = tau1, tau2
        self.lambda1, self.lambda2 = lambda1, lambda2
        self.loss2_chunk_size = loss2_chunk_size
        self.val_max_batches = val_max_batches
        self.patience = early_stopping_patience
        self.min_delta = early_stopping_min_delta
        self.base_lr = learning_rate
        # fuse S train steps into one lax.scan dispatch between validation/
        # save boundaries (numerics identical; pays when per-step dispatch
        # latency dominates — remote TPU links)
        self.scan_steps = max(1, int(scan_steps))

        self.graphdef, self.state = nnx.split(model)

        # Optimise alignment layers only (reference :108-116): mask the
        # match-predictor params out of the AdamW update.
        def is_alignment(path) -> bool:
            return any(str(getattr(p, "key", p)) == "alignment_layers" for p in path)

        labels = jax.tree_util.tree_map_with_path(
            lambda path, _: "train" if is_alignment(path) else "freeze", self.state
        )
        self.tx = optax.multi_transform(
            {
                # DECOUPLED AdamW like the reference's torch optim.AdamW
                # (alignment/trainer.py:112): decay is added AFTER the Adam
                # moment normalisation (the reversed order is Adam+L2, a
                # different optimizer; optim.py's "adamw" matches this)
                "train": optax.chain(
                    optax.scale_by_adam(),
                    optax.add_decayed_weights(weight_decay),
                ),
                "freeze": optax.set_to_zero(),
            },
            labels,
        )
        self.opt_state = self.tx.init(self.state)
        # Opt-in data parallelism (SURVEY §2.6: pjit batch sharding for
        # alignment training): each batch's sample axis shards over the mesh,
        # params replicate, XLA inserts the gradient all-reduce.  Same config
        # shape as the survival trainer ({"replica": R, "data": N}).
        from multimodal_fusion_tpu.parallel.mesh import mesh_from_shape, replicate

        self.mesh = mesh_from_shape(mesh_shape)
        if self.mesh is not None:
            self.state = replicate(self.mesh, self.state)
            self.opt_state = replicate(self.mesh, self.opt_state)
        # live scalar emission (reference tqdm live postfix + val logging,
        # alignment/trainer.py:334-342): one CSV row per validation interval,
        # flushed immediately — tails during a run
        self.scalars = None
        if scalar_log_path is not None:
            from multimodal_fusion_tpu.utils.scalars import ScalarWriter

            self.scalars = ScalarWriter(scalar_log_path)
        self._build_steps()

        # Per-stage wall-clock profiling (reference trainer.py:88-102).  The
        # reference times forward/loss1/loss2/loss3/backward separately; here
        # the whole update is ONE fused XLA program, so stages are
        # data_loading / train_step / validation — use utils.profiling.
        # device_trace (jax.profiler) for intra-step timelines.
        self.verbose_timing = verbose_timing
        self.timer = None
        if verbose_timing:
            from multimodal_fusion_tpu.utils.profiling import StageTimer

            self.timer = StageTimer()

        self.best_val_loss = float("inf")
        self.early_stop_counter = 0
        self.history: Dict[str, List] = {
            "train_loss": [], "val_loss": [], "svd_values": [], "steps": []
        }

    # ------------------------------------------------------------------

    def _loss(self, state, pos, neg, key, train):
        m = nnx.merge(self.graphdef, state)
        aligned = m(pos)
        if self.loss_type == "rank1":
            loss, svd_vals = rank1_svd_loss_from_dict(
                aligned, self.tau1, self.tau2, self.lambda1, self.loss2_chunk_size,
                impl=self.svd_impl,
            )
            if self.lambda2 != 0 and neg is not None:
                aligned_neg = m(neg)
                # INSERTION order (= modality_names through the collate), the
                # reference's torch.cat(feat_dict.values()) layout — the frozen
                # match predictor's input blocks must line up (sorted order
                # permuted them for non-alphabetical marker lists)
                keys_in_order = list(aligned)
                pos_fused = jnp.concatenate([aligned[k] for k in keys_in_order], axis=1)
                neg_fused = jnp.concatenate([aligned_neg[k] for k in keys_in_order], axis=1)
                allf = jnp.concatenate([pos_fused, neg_fused], axis=0)
                labels = jnp.concatenate(
                    [jnp.ones(pos_fused.shape[0]), jnp.zeros(neg_fused.shape[0])]
                )
                pred = m.predict_match(allf, key=key, train=train)
                loss = loss + self.lambda2 * binary_cross_entropy(pred[:, 0], labels)
        else:
            # insertion order: the volume loss anchors on feature_list[0]
            # (reference trainer.py:157-201), not the alphabetically first
            feats = [aligned[k] for k in list(aligned)]
            loss, svd_vals = volume_loss(feats, self.tau1)
        return loss, svd_vals

    def _build_steps(self):
        def update(state, opt_state, pos, neg, key, lr, train: bool, has_neg: bool):
            def loss_fn(sd):
                return self._loss(sd, pos, neg if has_neg else None, key, train)

            (loss, svd_vals), grads = jax.value_and_grad(loss_fn, has_aux=True)(state)
            updates, opt_state = self.tx.update(grads, opt_state, state)
            updates = jax.tree.map(lambda u: -lr * u, updates)
            state = optax.apply_updates(state, updates)
            return state, opt_state, loss, svd_vals

        step = partial(
            jax.jit, static_argnames=("train", "has_neg"), donate_argnums=(0, 1)
        )(update)

        @partial(
            jax.jit, static_argnames=("train", "has_neg"), donate_argnums=(0, 1)
        )
        def steps_scanned(state, opt_state, pos_s, neg_s, keys, lrs, train: bool, has_neg: bool):
            """S sequential updates in ONE dispatch; per-step (loss, svd_vals)
            come back stacked, so the step-indexed history is preserved."""

            def body(carry, xs):
                state, opt_state = carry
                pos, neg, key, lr = xs
                state, opt_state, loss, svd_vals = update(
                    state, opt_state, pos, neg, key, lr, train, has_neg
                )
                return (state, opt_state), (loss, svd_vals)

            (state, opt_state), (losses, svds) = jax.lax.scan(
                body, (state, opt_state), (pos_s, neg_s, keys, lrs)
            )
            return state, opt_state, losses, svds

        @partial(jax.jit, static_argnames=("has_neg",))
        def eval_loss(state, pos, neg, has_neg: bool):
            loss, svd_vals = self._loss(state, pos, neg if has_neg else None, None, False)
            return loss, svd_vals

        # Device-resident data variants: the whole aligned dataset lives in
        # HBM (data/alignment.py:device_tables) and a batch is two gathers —
        # the per-step host->device payload drops from ~MBs of features to a
        # [B] index vector, turning the upload-bound alignment step into a
        # dispatch-bound one (which scan_steps then amortises).
        def gather(feats, neg_idx, bp, start, need: int, has_neg: bool):
            pos = {m: feats[m][bp] for m in feats}
            if has_neg and need > 0:
                pool = next(iter(neg_idx.values())).shape[0]
                sel = (start + jnp.arange(need)) % pool
                neg = {m: feats[m][neg_idx[m][sel]] for m in feats}
            else:
                neg = pos
            return pos, neg

        @partial(
            jax.jit, static_argnames=("train", "has_neg", "need"),
            donate_argnums=(0, 1),
        )
        def step_dev(state, opt_state, feats, neg_idx, bp, start, key, lr,
                     train: bool, has_neg: bool, need: int):
            pos, neg = gather(feats, neg_idx, bp, start, need, has_neg)
            return update(state, opt_state, pos, neg, key, lr, train, has_neg)

        @partial(
            jax.jit, static_argnames=("train", "has_neg", "need"),
            donate_argnums=(0, 1),
        )
        def steps_dev_scanned(state, opt_state, feats, neg_idx, bps, starts,
                              keys, lrs, train: bool, has_neg: bool, need: int):
            def body(carry, xs):
                state, opt_state = carry
                bp, start, key, lr = xs
                pos, neg = gather(feats, neg_idx, bp, start, need, has_neg)
                state, opt_state, loss, svd_vals = update(
                    state, opt_state, pos, neg, key, lr, train, has_neg
                )
                return (state, opt_state), (loss, svd_vals)

            (state, opt_state), (losses, svds) = jax.lax.scan(
                body, (state, opt_state), (bps, starts, keys, lrs)
            )
            return state, opt_state, losses, svds

        self._step = step
        self._steps_scanned = steps_scanned
        self._step_dev = step_dev
        self._steps_dev_scanned = steps_dev_scanned
        self._eval_loss = eval_loss

    # ------------------------------------------------------------------

    def _shard_tree(self, tree, scan: bool = False):
        """Shard every leaf's batch axis over the data mesh.  ``scan=True``
        means leaves are [S, B, ...] (scan axis unsharded).  Per-leaf
        fallback: a leaf whose batch dim doesn't divide the device count
        (e.g. a small negative pool) stays replicated."""
        from multimodal_fusion_tpu.parallel.mesh import place_batch

        return place_batch(self.mesh, tree, scan=scan)

    def _lr_for_epoch(self, epoch: int) -> float:
        # CosineAnnealingLR(T_max=100, eta_min=1e-6), stepped per epoch wrap
        eta_min = 1e-6
        return eta_min + (self.base_lr - eta_min) * (1 + math.cos(math.pi * (epoch % 200) / 100)) / 2

    # CPU-only: keep this trainer's large scanned executables out of the
    # persistent compile cache — XLA:CPU (de)serialization of exactly these
    # programs segfaulted twice in aged full-suite processes (see
    # utils/jaxcache.no_cpu_compile_cache).  TPU runs cache normally.
    @guard_cpu_compile_cache
    def train(
        self,
        train_view,
        val_view,
        max_steps: int,
        batch_size: int = 64,
        val_interval: int = 100,
        save_path: Optional[str | Path] = None,
        save_interval: Optional[int] = None,
        seed: int = 42,
        verbose: bool = False,
        device_data="auto",
    ) -> Dict:
        """``train_view``/``val_view``: AlignedSubsetView (or the dataset
        itself) exposing __len__ and collate(batch_positions, batch_id).

        ``device_data`` uploads the training view ONCE (device_tables)
        and turns each batch into device-side gathers — numerically identical
        to the host collate (same rows, same negative-pool slicing), tested
        in test_alignment_device_data_matches_host.  "auto" (default since
        round 3) enables it whenever the feature tables fit the HBM budget;
        True forces it, False opts out."""
        if device_data == "auto":
            from multimodal_fusion_tpu.train.survival import DEVICE_DATA_AUTO_BUDGET

            can = hasattr(train_view, "device_tables")
            nbytes = 0
            if can:
                dim = getattr(self.model, "feature_dim", 1024)
                n_mod = len(getattr(self.model, "modality_names", [])) or 8
                nbytes = len(train_view) * 4 * dim * n_mod
            device_data = can and nbytes <= DEVICE_DATA_AUTO_BUDGET
            if can and not device_data:
                print(
                    f"device_data=auto: feature tables are ~{nbytes / 2**30:.1f} "
                    "GiB — using the host collate path"
                )
        rng = np.random.default_rng(seed)
        state = self.state
        opt_state = self.opt_state
        key = jax.random.key(seed)

        # reference resets early-stop state at the top of every train()
        # (trainer.py:715-721); inherited counters made resumed runs stop
        # after fewer than `patience` non-improvements
        self.best_val_loss = float("inf")
        self.early_stop_counter = 0

        n = len(train_view)
        # a batch can never exceed the dataset (DataLoader semantics); the
        # clamp also keeps the device path's STATIC negative count equal to
        # the host collate's per-batch count
        batch_size = min(batch_size, max(n, 1))
        if self.lambda2 != 0:
            # fail loudly like the reference (alignment/trainer.py:305-306)
            # instead of silently optimising a different objective
            _, probe_neg = train_view.collate(np.arange(min(2, n)), 0)
            if probe_neg is None:
                raise RuntimeError(
                    "Negative features not provided by dataset but "
                    f"lambda2={self.lambda2} requests loss_IM — build the "
                    "view with a mismatch pool or set lambda2=0"
                )
        order = rng.permutation(n)
        pos_in_epoch = 0
        epoch = 0
        t0 = time.time()

        # per-step (loss, svd_vals) stay on device until the next validation/
        # save boundary — pulling them every step would block the host on a
        # device round-trip per step (see SurvivalTrainer epoch loop)
        pending: List = []  # (n_steps, losses, svds)

        def flush_pending():
            for cnt, losses, svds in pending:
                la = np.atleast_1d(np.asarray(losses, dtype=np.float32))
                sa = np.asarray(svds)
                if cnt == 1:
                    sa = sa[None]
                base = len(self.history["train_loss"])
                for i in range(cnt):
                    self.history["train_loss"].append(float(la[i]))
                    self.history["svd_values"].append(sa[i].tolist())
                    self.history["steps"].append(base + i)
            pending.clear()

        def next_positions():
            nonlocal order, pos_in_epoch, epoch, key
            if pos_in_epoch >= n:
                order = rng.permutation(n)
                pos_in_epoch = 0
                epoch += 1
            # the PARTIAL tail batch trains too (reference DataLoader has no
            # drop_last, run.py:148): dropping it skipped up to b-1 rows per
            # epoch and advanced the cosine-LR epoch early
            batch_positions = order[pos_in_epoch : pos_in_epoch + batch_size]
            pos_in_epoch += len(batch_positions)
            key, sub = jax.random.split(key)
            return batch_positions, self._lr_for_epoch(epoch), sub

        def steps_until_ragged():
            # scan chunks need same-shape batches: stop a chunk before the
            # epoch's short tail batch (it runs as a single step)
            if n % batch_size == 0:
                return 1 << 30
            rem = n - pos_in_epoch
            full = rem // batch_size
            return full if full > 0 else 1

        def make_batch(step_id):
            batch_positions, lr, sub = next_positions()
            pos, neg = train_view.collate(batch_positions, step_id)
            has_neg = neg is not None and self.lambda2 != 0
            pos = self._shard_tree({k: jnp.asarray(v) for k, v in pos.items()})
            neg_j = (
                self._shard_tree({k: jnp.asarray(v) for k, v in neg.items()})
                if has_neg
                else pos
            )
            return pos, neg_j, has_neg, lr, sub

        feats_dev = neg_idx_dev = None
        if device_data:
            feats_np, neg_idx_np = train_view.device_tables()
            feats_dev = {m: jnp.asarray(v) for m, v in feats_np.items()}
            neg_idx_dev = {m: jnp.asarray(v) for m, v in neg_idx_np.items()}
            if self.mesh is not None:  # tables replicate; row gathers shard
                from multimodal_fusion_tpu.parallel.mesh import replicate

                feats_dev = replicate(self.mesh, feats_dev)
                neg_idx_dev = replicate(self.mesh, neg_idx_dev)
            pool_len = int(next(iter(neg_idx_np.values())).shape[0])
            ratio = float(getattr(train_view, "mismatch_ratio", 0.0))

            def make_batch_dev(step_id):
                batch_positions, lr, sub = next_positions()
                bp = self._shard_tree(jnp.asarray(batch_positions, jnp.int32))
                # PER-BATCH negative count, exactly the host collate's
                # (get_negatives_for_batch): tail batches need fewer
                # negatives and their start offset uses their own count
                need_b = int(np.ceil(len(batch_positions) * max(0.0, ratio)))
                has_neg_b = self.lambda2 != 0 and need_b > 0 and pool_len > 0
                start = (
                    jnp.int32((step_id * need_b) % pool_len)
                    if has_neg_b
                    else jnp.int32(0)
                )
                return bp, start, lr, sub, need_b, has_neg_b

        step_i = 0
        while step_i < max_steps:
            boundary = max_steps
            boundary = min(boundary, ((step_i // val_interval) + 1) * val_interval)
            if save_interval and save_path:
                boundary = min(boundary, ((step_i // save_interval) + 1) * save_interval)
            chunk = min(self.scan_steps, boundary - step_i, steps_until_ragged())
            t_data = time.perf_counter()
            if chunk >= 2 and device_data:
                batches = [make_batch_dev(step_i + j) for j in range(chunk)]
                bps = self._shard_tree(jnp.stack([b[0] for b in batches]), scan=True)
                starts = jnp.stack([b[1] for b in batches])
                lrs = jnp.asarray([b[2] for b in batches], jnp.float32)
                keys = jnp.stack([b[3] for b in batches])
                if self.timer:
                    self.timer.record("data_loading", time.perf_counter() - t_data)
                t_step = time.perf_counter()
                # chunks stop before ragged tails, so need/has_neg are
                # uniform across the chunk
                state, opt_state, losses, svds = self._steps_dev_scanned(
                    state, opt_state, feats_dev, neg_idx_dev, bps, starts,
                    keys, lrs, True, batches[0][5], batches[0][4],
                )
                pending.append((chunk, losses, svds))
                if self.timer:
                    jax.block_until_ready(losses)
                    self.timer.record("train_step", time.perf_counter() - t_step)
                step_i += chunk
            elif chunk >= 2:
                batches = [make_batch(step_i + j) for j in range(chunk)]
                has_neg = batches[0][2]
                pos_s = self._shard_tree(
                    jax.tree.map(lambda *xs: jnp.stack(xs), *[b[0] for b in batches]),
                    scan=True,
                )
                neg_s = self._shard_tree(
                    jax.tree.map(lambda *xs: jnp.stack(xs), *[b[1] for b in batches]),
                    scan=True,
                )
                lrs = jnp.asarray([b[3] for b in batches], jnp.float32)
                keys = jnp.stack([b[4] for b in batches])
                if self.timer:
                    self.timer.record("data_loading", time.perf_counter() - t_data)
                t_step = time.perf_counter()
                state, opt_state, losses, svds = self._steps_scanned(
                    state, opt_state, pos_s, neg_s, keys, lrs, True, has_neg
                )
                pending.append((chunk, losses, svds))
                if self.timer:
                    jax.block_until_ready(losses)
                    self.timer.record("train_step", time.perf_counter() - t_step)
                step_i += chunk
            elif device_data:
                bp, start, lr, sub, need_b, has_neg_b = make_batch_dev(step_i)
                if self.timer:
                    self.timer.record("data_loading", time.perf_counter() - t_data)
                t_step = time.perf_counter()
                state, opt_state, loss, svd_vals = self._step_dev(
                    state, opt_state, feats_dev, neg_idx_dev, bp, start, sub,
                    lr, True, has_neg_b, need_b,
                )
                if self.timer:
                    jax.block_until_ready(loss)
                    self.timer.record("train_step", time.perf_counter() - t_step)
                pending.append((1, loss, svd_vals))
                step_i += 1
            else:
                pos, neg_j, has_neg, lr, sub = make_batch(step_i)
                if self.timer:
                    self.timer.record("data_loading", time.perf_counter() - t_data)
                t_step = time.perf_counter()
                state, opt_state, loss, svd_vals = self._step(
                    state, opt_state, pos, neg_j, sub, lr, True, has_neg
                )
                if self.timer:
                    jax.block_until_ready(loss)
                    self.timer.record("train_step", time.perf_counter() - t_step)
                pending.append((1, loss, svd_vals))
                step_i += 1

            if save_interval and save_path and step_i % save_interval == 0:
                save_state(f"{save_path}.step_{step_i}", state)

            # reference validates ONLY on val_interval multiples
            # (trainer.py:761-776; no extra final-step validation)
            if step_i % val_interval == 0:
                flush_pending()
                t_val = time.perf_counter()
                val_loss = self.validate(val_view, state, batch_size)
                if self.timer:
                    self.timer.record("validation", time.perf_counter() - t_val)
                self.history["val_loss"].append({"step": step_i - 1, "loss": val_loss})
                if self.scalars is not None:
                    svd_last = self.history["svd_values"][-1] if self.history["svd_values"] else []
                    self.scalars.write(
                        {
                            "step": step_i,
                            "train_loss": self.history["train_loss"][-1]
                            if self.history["train_loss"]
                            else float("nan"),
                            "val_loss": val_loss,
                            "svd_top": svd_last[0] if svd_last else float("nan"),
                        }
                    )
                if verbose:
                    last = self.history["train_loss"][-1]
                    print(f"step {step_i}: train={last:.4f} val={val_loss:.4f}")
                # reference order (trainer.py:768-776): best checkpoint on a
                # PLAIN improvement; min_delta gates only the early-stop
                # bookkeeping (which alone updates best_val_loss)
                if val_loss < self.best_val_loss and save_path:
                    save_state(save_path, state, extra={"step": step_i - 1})
                if val_loss < self.best_val_loss - self.min_delta:
                    self.best_val_loss = val_loss
                    self.early_stop_counter = 0
                else:
                    self.early_stop_counter += 1
                    if self.patience > 0 and self.early_stop_counter >= self.patience:
                        break
        flush_pending()

        if self.timer:
            self.timer.print_report()
        # push final state back into the live model
        nnx.update(self.model, state)
        self.state = state
        self.opt_state = opt_state
        return {
            "history": self.history,
            "best_val_loss": self.best_val_loss,
            "elapsed_s": time.time() - t0,
        }

    @guard_cpu_compile_cache
    def validate(self, val_view, state=None, batch_size: int = 64) -> float:
        if state is None:
            state = self.state
        n = len(val_view)
        losses = []
        # ceil: the reference validates every loader batch incl. the partial
        # tail (trainer.py:647-649); flooring dropped up to batch_size-1
        # samples from the early-stop metric
        n_batches = max(1, -(-n // batch_size))
        max_batches = (
            self.val_max_batches if self.val_max_batches is not None else n_batches
        )
        for b in range(min(max_batches, n_batches)):
            positions = np.arange(b * batch_size, min((b + 1) * batch_size, n))
            if len(positions) == 0:
                continue  # reference averages over EVERY loader batch incl.
                # 1-sample tails (trainer.py:647-649)
            pos, neg = val_view.collate(positions, b)
            has_neg = neg is not None and self.lambda2 != 0
            pos = self._shard_tree({k: jnp.asarray(v) for k, v in pos.items()})
            neg_j = (
                self._shard_tree({k: jnp.asarray(v) for k, v in neg.items()})
                if has_neg
                else pos
            )
            loss, _ = self._eval_loss(state, pos, neg_j, has_neg)
            losses.append(float(loss))
        return float(np.mean(losses)) if losses else float("nan")

    def save_history(self, path: str | Path, config: Optional[Dict] = None):
        """.history.json dump (reference run.py:192-224)."""
        payload = {"history": self.history, "best_val_loss": self.best_val_loss}
        if config:
            payload["config"] = config
        Path(path).write_text(json.dumps(payload, indent=2))
