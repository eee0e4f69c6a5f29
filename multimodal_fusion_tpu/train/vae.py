"""VAE training + reconstructed-feature writer.

Reference: ``vae/train.py:23-651`` — AdamW + ReduceLROnPlateau(val loss);
checkpoint latest/best with optimizer/scheduler/history state and resume; the
LR-reduce-count drives a dynamic patch-resample schedule (0 reductions: every
10% of total epochs; 1: every 5%; >=2: every epoch); early stop once LR hits
the floor.  ``generate_reconstructed_wsi.py:26-274`` batches all patches of
each h5 through the best model and writes gzip ``wsi/reconstructed_features``.

(The reference's torch.compile `_orig_mod.` checkpoint-prefix handling is
obsolete here — jit is ambient and checkpoints are plain state trees.)
"""

from __future__ import annotations

import json
import time
from functools import partial
from pathlib import Path
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import nnx

from multimodal_fusion_tpu.io.h5io import write_channel
from multimodal_fusion_tpu.models.vae import VAE, vae_loss
from multimodal_fusion_tpu.train.checkpoint import load_state, save_state
from multimodal_fusion_tpu.utils.jaxcache import guard_cpu_compile_cache


class VAETrainer:
    def __init__(
        self,
        model: VAE,
        learning_rate: float = 1e-3,
        weight_decay: float = 1e-5,
        plateau_patience: int = 10,
        plateau_factor: float = 0.5,
        min_lr: float = 1e-6,
        checkpoint_dir: Optional[str | Path] = None,
        scan_steps: int = 1,
        plateau_threshold: float = 1e-4,
        early_stop_patience: int = 10,
        early_stop_min_delta: float = 1e-4,
        mesh_shape=None,
        scalar_log_path: Optional[str | Path] = None,
        tb_log_dir: Optional[str | Path] = None,
    ):
        self.model = model
        self.graphdef, self.state = nnx.split(model)
        self.tx = optax.chain(
            optax.scale_by_adam(),
            optax.add_decayed_weights(weight_decay),
        )
        self.opt_state = self.tx.init(self.state)
        self.base_lr = learning_rate
        self.lr = learning_rate
        self.min_lr = min_lr
        self.plateau_patience = plateau_patience
        self.plateau_factor = plateau_factor
        self.plateau_threshold = plateau_threshold
        self.early_stop_patience = early_stop_patience
        self.early_stop_min_delta = early_stop_min_delta
        self._plateau_best = float("inf")
        self._plateau_count = 0
        self.lr_reduce_count = 0
        self.checkpoint_dir = Path(checkpoint_dir) if checkpoint_dir else None
        self.history: Dict[str, List[float]] = {
            "train_loss": [], "val_loss": [], "recon_loss": [], "kld_loss": [], "lr": []
        }
        self.epoch = 0
        self.global_step = 0
        # fuse S batch updates into one lax.scan dispatch (numerics identical;
        # pays when per-step dispatch latency dominates — remote TPU links)
        self.scan_steps = max(1, int(scan_steps))
        # Opt-in data parallelism (SURVEY §2.6: pjit batch sharding for VAE
        # training): batches shard their leading axis over the mesh, params
        # replicate, XLA inserts the gradient all-reduce.  Same config shape
        # as the survival trainer ({"replica": R, "data": N}).
        from multimodal_fusion_tpu.parallel.mesh import mesh_from_shape

        self.mesh = mesh_from_shape(mesh_shape)
        # live scalar emission (reference TB scalars, vae/train.py:162-165):
        # one CSV row per epoch, flushed immediately — tails during a run
        self.scalars = None
        if scalar_log_path is not None:
            from multimodal_fusion_tpu.utils.scalars import ScalarWriter

            self.scalars = ScalarWriter(scalar_log_path)
        # drop-in TensorBoard event files with the reference's exact tag
        # names (vae/train.py:84,162-165,227-231) — existing TB dashboards
        # keep working; pure-Python emitter, no torch/tensorflow import
        self.tb = None
        if tb_log_dir is not None:
            from multimodal_fusion_tpu.utils.tbevents import TBEventWriter

            self.tb = TBEventWriter(tb_log_dir)
        self._build_steps()
        if self.mesh is not None:
            from multimodal_fusion_tpu.parallel.mesh import replicate

            self.state = replicate(self.mesh, self.state)
            self.opt_state = replicate(self.mesh, self.opt_state)

    def _build_steps(self):
        def update(state, opt_state, x, key, lr):
            def loss_fn(state):
                m = nnx.merge(self.graphdef, state)
                x_hat, mean, log_var = m(x, key=key, train=True)
                total, recon, kld = vae_loss(x, x_hat, mean, log_var)
                return total, (recon, kld)

            (loss, (recon, kld)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state)
            updates, opt_state = self.tx.update(grads, opt_state, state)
            updates = jax.tree.map(lambda u: -lr * u, updates)
            state = optax.apply_updates(state, updates)
            return state, opt_state, loss, recon, kld

        @partial(jax.jit, donate_argnums=(0, 1))
        def train_steps_scanned(state, opt_state, xs, keys, lr):
            def body(carry, inp):
                state, opt_state = carry
                x, key = inp
                state, opt_state, loss, recon, kld = update(state, opt_state, x, key, lr)
                return (state, opt_state), (loss, recon, kld)

            (state, opt_state), (losses, recons, klds) = jax.lax.scan(
                body, (state, opt_state), (xs, keys)
            )
            return state, opt_state, losses, recons, klds

        @jax.jit
        def eval_step(state, x, key):
            m = nnx.merge(self.graphdef, state)
            x_hat, mean, log_var = m(x, key=key, train=False)
            return vae_loss(x, x_hat, mean, log_var)

        # Device-resident variants: the (sub)sampled patch table lives in
        # device memory (uploaded once per resample, train/vae.py:fit) and a
        # batch is a row gather — per-step host->device payload drops from
        # [B, D] features to a [B] index vector.
        @partial(jax.jit, donate_argnums=(0, 1))
        def train_step_dev(state, opt_state, table, rows, key, lr):
            return update(state, opt_state, table[rows], key, lr)

        @partial(jax.jit, donate_argnums=(0, 1))
        def train_steps_dev_scanned(state, opt_state, table, rowss, keys, lr):
            def body(carry, inp):
                state, opt_state = carry
                rows, key = inp
                state, opt_state, loss, recon, kld = update(
                    state, opt_state, table[rows], key, lr
                )
                return (state, opt_state), (loss, recon, kld)

            (state, opt_state), (losses, recons, klds) = jax.lax.scan(
                body, (state, opt_state), (rowss, keys)
            )
            return state, opt_state, losses, recons, klds

        @jax.jit
        def eval_step_dev(state, table, rows, key):
            m = nnx.merge(self.graphdef, state)
            x = table[rows]
            x_hat, mean, log_var = m(x, key=key, train=False)
            return vae_loss(x, x_hat, mean, log_var)

        self._train_step = partial(jax.jit, donate_argnums=(0, 1))(update)
        self._train_steps_scanned = train_steps_scanned
        self._eval_step = eval_step
        self._train_step_dev = train_step_dev
        self._train_steps_dev_scanned = train_steps_dev_scanned
        self._eval_step_dev = eval_step_dev

    # ------------------------------------------------------------------

    def _shard_batch(self, x):
        """Shard a [B, ...] batch's leading axis over the data mesh
        (replicated fallback when B doesn't divide the device count)."""
        from multimodal_fusion_tpu.parallel.mesh import place_batch

        return place_batch(self.mesh, x)

    def _shard_scan(self, xs):
        """Shard a stacked [S, B, ...] scan group: scan axis S stays
        unsharded (sequential), batch axis B shards over every mesh axis."""
        from multimodal_fusion_tpu.parallel.mesh import place_batch

        return place_batch(self.mesh, xs, scan=True)

    @staticmethod
    def _index_batches(n: int, batch_size: int, shuffle_rng=None):
        """The index walk of ``WSIVAEDataset.batches`` (shuffle + wrap-around
        padding of the final short batch) without materialising features —
        drives the device-resident gather path with identical rows."""
        order = np.arange(n)
        if shuffle_rng is not None:
            shuffle_rng.shuffle(order)
        for start in range(0, n, batch_size):
            idxs = order[start : start + batch_size]
            if len(idxs) < batch_size:
                idxs = np.concatenate([idxs, order[: batch_size - len(idxs)]])
            yield idxs

    # CPU-only compile-cache guard: see train/survival.py train_fold — the
    # scanned VAE train executables are the same size class as the ones that
    # segfaulted XLA:CPU's executable (de)serialization in aged processes.
    @guard_cpu_compile_cache
    def train_epoch(
        self, dataset, batch_size: int, key, shuffle_rng, table=None
    ) -> Dict[str, float]:
        # per-batch losses stay on device until epoch end (one host sync)
        losses, recons, klds = [], [], []
        state, opt_state = self.state, self.opt_state
        buf: List = []
        dev = table is not None

        def flush():
            nonlocal state, opt_state
            if not buf:
                return
            if len(buf) == self.scan_steps and self.scan_steps > 1:
                xs = self._shard_scan(jnp.stack([b[0] for b in buf]))
                keys = jnp.stack([b[1] for b in buf])
                if dev:
                    state, opt_state, l, r, k2 = self._train_steps_dev_scanned(
                        state, opt_state, table, xs, keys, self.lr
                    )
                else:
                    state, opt_state, l, r, k2 = self._train_steps_scanned(
                        state, opt_state, xs, keys, self.lr
                    )
                losses.append(l)
                recons.append(r)
                klds.append(k2)
            else:
                for x, sub in buf:
                    if dev:
                        state, opt_state, loss, recon, kld = self._train_step_dev(
                            state, opt_state, table, x, sub, self.lr
                        )
                    else:
                        state, opt_state, loss, recon, kld = self._train_step(
                            state, opt_state, x, sub, self.lr
                        )
                    losses.append(loss)
                    recons.append(recon)
                    klds.append(kld)
            self.global_step += len(buf)
            buf.clear()

        batches = (
            self._index_batches(len(dataset), batch_size, shuffle_rng)
            if dev
            else dataset.batches(batch_size, shuffle_rng)
        )
        for x in batches:
            key, sub = jax.random.split(key)
            x = self._shard_batch(jnp.asarray(x))
            if buf and x.shape != buf[0][0].shape:
                flush()
            buf.append((x, sub))
            if len(buf) == self.scan_steps:
                flush()
        flush()
        self.state, self.opt_state = state, opt_state

        def agg(parts):
            if not parts:
                return float("nan")
            return float(np.mean(np.concatenate([np.atleast_1d(np.asarray(p)) for p in parts])))

        return {"loss": agg(losses), "recon": agg(recons), "kld": agg(klds)}

    @guard_cpu_compile_cache
    def validate(self, dataset, batch_size: int, key, table=None) -> float:
        losses = []
        if table is not None:
            for rows in self._index_batches(len(dataset), batch_size):
                key, sub = jax.random.split(key)
                total, _, _ = self._eval_step_dev(
                    self.state, table, self._shard_batch(jnp.asarray(rows)), sub
                )
                losses.append(total)
            if not losses:
                return float("nan")
            return float(np.mean(np.asarray([np.asarray(l) for l in losses])))
        for x in dataset.batches(batch_size):
            key, sub = jax.random.split(key)
            total, _, _ = self._eval_step(self.state, self._shard_batch(jnp.asarray(x)), sub)
            losses.append(total)
        if not losses:
            return float("nan")
        return float(np.mean(np.asarray([np.asarray(l) for l in losses])))

    def plateau_step(self, val_loss: float) -> None:
        """ReduceLROnPlateau(min) semantics + reduce-count tracking.

        Improvement uses torch's default rel threshold (1e-4): sub-threshold
        noise-level drift must NOT reset the patience counter, or the LR is
        never reduced and the resample/early-stop machinery never arms."""
        if val_loss < self._plateau_best * (1.0 - self.plateau_threshold):
            self._plateau_best = val_loss
            self._plateau_count = 0
        else:
            self._plateau_count += 1
            if self._plateau_count > self.plateau_patience:
                new_lr = max(self.lr * self.plateau_factor, self.min_lr)
                if new_lr < self.lr:
                    self.lr = new_lr
                    self.lr_reduce_count += 1
                self._plateau_count = 0

    def resample_interval(self, total_epochs: int) -> int:
        """Dynamic resample schedule driven by LR-reduce count
        (reference vae/train.py:302-333): 0 reductions -> every 10% of total
        epochs; 1 -> every 5%; >=2 -> every epoch."""
        if self.lr_reduce_count == 0:
            return max(1, total_epochs // 10)
        if self.lr_reduce_count == 1:
            return max(1, total_epochs // 20)
        return 1

    @property
    def lr_at_floor(self) -> bool:
        return self.lr <= self.min_lr

    # ------------------------------------------------------------------

    def save_checkpoint(self, tag: str) -> None:
        if self.checkpoint_dir is None:
            return
        self.checkpoint_dir.mkdir(parents=True, exist_ok=True)
        save_state(
            self.checkpoint_dir / f"{tag}.npz",
            {"model": self.state, "opt": self.opt_state},
            extra={
                "epoch": self.epoch,
                "global_step": self.global_step,
                "lr": self.lr,
                "lr_reduce_count": self.lr_reduce_count,
                # plateau tracker state: the reference checkpoints the full
                # scheduler.state_dict (vae/train.py:267); without these a
                # resumed run resets the patience window
                "plateau_best": self._plateau_best,
                "plateau_count": self._plateau_count,
            },
        )
        (self.checkpoint_dir / f"{tag}_history.json").write_text(json.dumps(self.history))

    def resume(self, tag: str = "latest") -> bool:
        if self.checkpoint_dir is None:
            return False
        path = self.checkpoint_dir / f"{tag}.npz"
        if not path.exists():
            return False
        restored, extras = load_state(path, {"model": self.state, "opt": self.opt_state})
        self.state, self.opt_state = restored["model"], restored["opt"]
        nnx.update(self.model, self.state)
        self.epoch = int(extras.get("epoch", 0))
        self.global_step = int(extras.get("global_step", 0))
        self.lr = float(extras.get("lr", self.base_lr))
        self.lr_reduce_count = int(extras.get("lr_reduce_count", 0))
        self._plateau_best = float(extras.get("plateau_best", float("inf")))
        self._plateau_count = int(extras.get("plateau_count", 0))
        hist_path = self.checkpoint_dir / f"{tag}_history.json"
        if hist_path.exists():
            self.history = json.loads(hist_path.read_text())
        return True

    # ------------------------------------------------------------------

    def fit(
        self,
        train_ds,
        val_ds,
        epochs: int,
        batch_size: int = 256,
        seed: int = 42,
        verbose: bool = False,
        resample: bool = True,
        device_data="auto",
    ) -> Dict:
        """``device_data`` keeps the current patch subsample resident in
        device memory (re-uploaded only on resample) and batches become row
        gathers — numerically identical to the host path, tested in
        test_vae_device_data_matches_host.  "auto" (default since round 3)
        enables it whenever the materialised tables fit the HBM budget;
        True forces it, False opts out."""
        if device_data == "auto":
            from multimodal_fusion_tpu.train.survival import DEVICE_DATA_AUTO_BUDGET

            nbytes = (len(train_ds) + len(val_ds)) * 4 * getattr(
                self.model, "input_dim", 1024
            )
            can = hasattr(train_ds, "materialize") and hasattr(val_ds, "materialize")
            device_data = can and nbytes <= DEVICE_DATA_AUTO_BUDGET
            if can and not device_data:
                print(
                    f"device_data=auto: patch tables are ~{nbytes / 2**30:.1f} "
                    "GiB — using the host batch path"
                )
        key = jax.random.key(seed)
        shuffle_rng = np.random.default_rng(seed)
        best_val = float("inf")
        early_stop_counter = 0
        t0 = time.time()
        start = self.epoch
        table_train = table_val = None

        def _up(arr):
            t = jnp.asarray(arr)
            if self.mesh is not None:  # tables replicate; row gathers shard
                from multimodal_fusion_tpu.parallel.mesh import replicated

                t = jax.device_put(t, replicated(self.mesh))
            return t

        if device_data:
            table_train = _up(train_ds.materialize())
            table_val = _up(val_ds.materialize())
        for epoch in range(start, epochs):
            self.epoch = epoch
            key, k_train, k_val = jax.random.split(key, 3)
            tr = self.train_epoch(
                train_ds, batch_size, k_train, shuffle_rng, table=table_train
            )
            val_loss = self.validate(val_ds, batch_size, k_val, table=table_val)
            reduces_before = self.lr_reduce_count
            self.plateau_step(val_loss)
            if self.tb is not None:  # reference tags, vae/train.py:162-165,227-243
                self.tb.add_scalar("Train/Loss", tr["loss"], epoch)
                self.tb.add_scalar("Train/ReconLoss", tr["recon"], epoch)
                self.tb.add_scalar("Train/KLDLoss", tr["kld"], epoch)
                self.tb.add_scalar("Train/LearningRate", self.lr, epoch)
                self.tb.add_scalar("Val/Loss", val_loss, epoch)
                if self.lr_reduce_count > reduces_before:
                    self.tb.add_scalar("Train/LRReduceCount", self.lr_reduce_count, epoch)
                self.tb.flush()
            self.history["train_loss"].append(tr["loss"])
            self.history["recon_loss"].append(tr["recon"])
            self.history["kld_loss"].append(tr["kld"])
            self.history["val_loss"].append(val_loss)
            self.history["lr"].append(self.lr)
            if self.scalars is not None:
                self.scalars.write(
                    {
                        "epoch": epoch,
                        "step": self.global_step,
                        "train_loss": tr["loss"],
                        "recon_loss": tr["recon"],
                        "kld_loss": tr["kld"],
                        "val_loss": val_loss,
                        "lr": self.lr,
                    }
                )
            if verbose:
                print(f"epoch {epoch}: train={tr['loss']:.4f} val={val_loss:.4f} lr={self.lr:.2e}")
            self.save_checkpoint("latest")
            # reference early-stop semantics (vae/train.py:596-627):
            # sufficient improvement (min_delta) saves best + resets the
            # counter; otherwise the counter advances ONLY once the run is
            # in its endgame (LR at floor OR >= 2 reductions), and training
            # stops after early_stop_patience non-improving epochs — not
            # instantly at the LR floor.
            if val_loss < best_val - self.early_stop_min_delta:
                best_val = val_loss
                early_stop_counter = 0
                self.save_checkpoint("best")
            elif self.lr_at_floor or self.lr_reduce_count >= 2:
                early_stop_counter += 1
                if early_stop_counter >= self.early_stop_patience:
                    break
            if resample and (epoch + 1) % self.resample_interval(epochs) == 0:
                train_ds.resample_patches()
                if device_data:
                    table_train = _up(train_ds.materialize())
                    if val_ds is train_ds:  # shared dataset: val resamples too
                        table_val = table_train
                    elif getattr(val_ds, "parent", None) is not None and (
                        getattr(val_ds, "parent", None)
                        is getattr(train_ds, "parent", None)
                    ):
                        # subset views over one dataset: the parent resample
                        # moved the val rows too (as the host path would see)
                        table_val = _up(val_ds.materialize())
        nnx.update(self.model, self.state)
        return {"best_val_loss": best_val, "elapsed_s": time.time() - t0, "history": self.history}


# ---------------------------------------------------------------------------
# Reconstruction writer (reference vae/generate_reconstructed_wsi.py)
# ---------------------------------------------------------------------------

def generate_reconstructed_wsi(
    model: VAE,
    csv_path,
    data_root_dir,
    batch_size: int = 256,
    pad_to: int = 256,
) -> Dict[str, int]:
    """Batch every patient's wsi patches through the (deterministic) VAE and
    write gzip ``wsi/reconstructed_features``."""
    import pandas as pd

    graphdef, state = nnx.split(model)

    @jax.jit
    def recon(state, x):
        m = nnx.merge(graphdef, state)
        x_hat, _, _ = m(x, train=False)
        return x_hat

    from multimodal_fusion_tpu.io.h5io import read_channel

    df = pd.read_csv(csv_path)
    done: Dict[str, int] = {}
    root = Path(data_root_dir)
    for _, row in df.iterrows():
        h5_path = root / row["h5_file_path"]
        if not h5_path.exists():
            continue
        feats = read_channel(h5_path, "wsi=features")
        n = feats.shape[0]
        out = np.empty_like(feats)
        for start in range(0, n, batch_size):
            chunk = feats[start : start + batch_size]
            m = chunk.shape[0]
            if m < batch_size:  # pad to keep the jit shape static
                chunk = np.concatenate(
                    [chunk, np.zeros((batch_size - m, feats.shape[1]), feats.dtype)]
                )
            out[start : start + m] = np.asarray(recon(state, jnp.asarray(chunk)))[:m]
        write_channel(h5_path, "wsi=reconstructed_features", out, compression="gzip")
        done[str(row.get("case_id", h5_path.stem))] = n
    return done
