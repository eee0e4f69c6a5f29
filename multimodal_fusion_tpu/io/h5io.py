"""HDF5 per-patient storage layer.

On-disk schema (kept byte-compatible with the reference so data produced for
either stack is interchangeable; reference: ``downstream_survival/main.py:
485-527``, ``build_hypergraph/README.md:58-75``,
``vae/generate_reconstructed_wsi.py:79-96``)::

    <patient>.h5
    ├── wsi/
    │   ├── features               [N, 1024] float32
    │   ├── positions              [N, 2]    float32/int
    │   └── reconstructed_features [N, 1024] float32 (written by the VAE)
    ├── tma/<marker>/features      [M_k, 1024] float32   (8 markers)
    ├── tma/<marker>/patches       optional raw patches
    ├── clinical|pathological|blood|icd|tma_cell_density/
    │   ├── val / ori_val          [D] float32
    │   └── mask                   [D] float32 (1 = present)
    └── hypergraph/
        ├── wsi_super/{features,positions}
        ├── tma/features
        ├── edge_index             [2, E] int64
        ├── edge_weights           [E]    float32
        ├── group_labels           [V]    int64
        └── similarity/{wsi_internal,wsi_tma}   cached similarity matrices
            (+ JSON 'stats' attribute on the hypergraph group)

Concurrency: h5py handles are not thread-safe; like the reference
(``multimodal_dataset.py:27-29,465-518``) we guard each file with a per-path
lock and retry reads with exponential backoff + jitter.
"""

from __future__ import annotations

import json
import random
import threading
import time
from pathlib import Path
from typing import Dict, Iterable, Optional

import h5py
import numpy as np

from multimodal_fusion_tpu.channels import h5_path_for_channel

def _json_default(o):
    """numpy scalars/arrays -> plain python for stats JSON."""
    if isinstance(o, np.integer):
        return int(o)
    if isinstance(o, np.floating):
        return float(o)
    if isinstance(o, np.ndarray):
        return o.tolist()
    raise TypeError(f"not JSON serializable: {type(o)}")


# RLock: composite operations (e.g. probe -> compute -> write in
# cache_similarity_matrices) hold the per-path lock across reads that
# themselves acquire it — re-entrancy keeps that deadlock-free.
_FILE_LOCKS: Dict[str, threading.RLock] = {}
_FILE_LOCKS_GUARD = threading.Lock()


def _lock_for(path: str) -> threading.RLock:
    with _FILE_LOCKS_GUARD:
        if path not in _FILE_LOCKS:
            _FILE_LOCKS[path] = threading.RLock()
        return _FILE_LOCKS[path]


import contextlib


def read_h5_retrying(
    h5_path: str | Path,
    fn,
    retries: int = 4,
    backoff: float = 0.05,
):
    """Run ``fn(h5py.File)`` under the per-path lock, retrying the WHOLE
    read unit (open + reads) with exponential backoff + jitter on transient
    ``OSError`` — NFS hiccups, or a writer in ANOTHER process truncating the
    file mid-read (the per-path lock is process-local, so only same-process
    writers are excluded).  ``fn`` must be a pure read (it may re-run).
    This is the single read path for every dataset/build hot path; the
    reference retries its dataset path the same way
    (multimodal_dataset.py:465-503)."""
    path = str(h5_path)
    last_err: Optional[Exception] = None
    for attempt in range(retries):
        with _lock_for(path):
            try:
                with h5py.File(path, "r") as f:
                    return fn(f)
            except FileNotFoundError:  # not transient — no point retrying
                raise
            except OSError as e:  # pragma: no cover - transient-IO path
                last_err = e
        if attempt + 1 < retries:  # no dead sleep after the final attempt
            time.sleep(backoff * (2**attempt) * (1 + random.random()))
    raise OSError(f"failed to read {path} after {retries} attempts: {last_err}")


@contextlib.contextmanager
def open_h5_retrying(
    h5_path: str | Path,
    mode: str = "r",
    retries: int = 4,
    backoff: float = 0.05,
):
    """Locked ``h5py.File`` handle whose OPEN is retried with backoff.

    The with-block body runs once (the context-manager protocol cannot
    re-enter a body), so mid-read failures inside the body are NOT retried —
    use ``read_h5_retrying`` for read units that need whole-unit retry.
    Appropriate for writes, where re-running a half-applied body is unsafe."""
    path = str(h5_path)
    last_err: Optional[Exception] = None
    for attempt in range(retries):
        with _lock_for(path):
            try:
                f = h5py.File(path, mode)
            except FileNotFoundError:
                if mode == "r":
                    raise  # read of a missing file is not transient
                last_err = FileNotFoundError(path)
            except OSError as e:  # pragma: no cover - transient-IO path
                last_err = e
            else:
                try:
                    yield f
                finally:
                    f.close()
                return
        if attempt + 1 < retries:
            time.sleep(backoff * (2**attempt) * (1 + random.random()))
    raise OSError(f"failed to open {path} after {retries} attempts: {last_err}")


def read_channel(
    h5_path: str | Path,
    channel: str,
    retries: int = 4,
    backoff: float = 0.05,
) -> np.ndarray:
    """Read one channel (``group=dataset[=dataset]``) from a patient file."""
    dset = h5_path_for_channel(channel)
    return read_h5_retrying(
        h5_path, lambda f: np.asarray(f[dset]), retries, backoff
    )


def has_channel(h5_path: str | Path, channel: str) -> bool:
    return read_h5_retrying(h5_path, lambda f: h5_path_for_channel(channel) in f)


def write_channel(
    h5_path: str | Path,
    channel: str,
    data: np.ndarray,
    compression: Optional[str] = "gzip",
) -> None:
    """Write/overwrite one channel dataset."""
    path = str(h5_path)
    dset = h5_path_for_channel(channel)
    with _lock_for(path):
        with h5py.File(path, "a") as f:
            if dset in f:
                del f[dset]
            f.create_dataset(dset, data=np.asarray(data), compression=compression)


class PatientH5:
    """Convenience wrapper around one patient file."""

    def __init__(self, path: str | Path):
        self.path = Path(path)

    def read(self, channel: str) -> np.ndarray:
        return read_channel(self.path, channel)

    def write(self, channel: str, data: np.ndarray) -> None:
        write_channel(self.path, channel, data)

    def has(self, channel: str) -> bool:
        return has_channel(self.path, channel)

    def channels(self) -> Dict[str, tuple]:
        """Map of all dataset paths -> shapes."""
        out: Dict[str, tuple] = {}

        def visit(name, obj):
            if isinstance(obj, h5py.Dataset):
                out[name] = obj.shape

        read_h5_retrying(self.path, lambda f: f.visititems(visit))
        return out


# ---------------------------------------------------------------------------
# Hypergraph group persistence (reference: preprocess_hypergraph.py:436-511)
# ---------------------------------------------------------------------------

HYPERGRAPH_KEYS = (
    "wsi_super/features",
    "wsi_super/positions",
    "tma/features",
    "edge_index",
    "edge_weights",
    "group_labels",
)
SIMILARITY_KEYS = ("similarity/wsi_internal", "similarity/wsi_tma")


def write_hypergraph_group(
    h5_path: str | Path,
    arrays: Dict[str, np.ndarray],
    stats: Optional[Dict] = None,
    save_similarity: bool = True,
    compression: Optional[str] = None,
) -> None:
    """Write the ``hypergraph/`` group.

    ``arrays`` maps relative keys (see ``HYPERGRAPH_KEYS``/``SIMILARITY_KEYS``)
    to arrays.  ``stats`` is stored as a JSON string attribute, matching the
    reference layout.  Datasets are uncompressed by default (the reference
    writes plain datasets; gzip on the [N,N] similarity cache would dominate
    build time).
    """
    path = str(h5_path)
    with _lock_for(path):
        with h5py.File(path, "a") as f:
            if "hypergraph" in f:
                del f["hypergraph"]
            grp = f.create_group("hypergraph")
            for key, arr in arrays.items():
                if not save_similarity and key.startswith("similarity/"):
                    continue
                grp.create_dataset(key, data=np.asarray(arr), compression=compression)
            if stats is not None:
                grp.attrs["stats"] = json.dumps(stats, default=_json_default)


def has_complete_hypergraph(
    h5_path: str | Path, require_similarity: bool = False
) -> bool:
    """True when ``h5_path`` already carries a COMPLETE ``hypergraph/``
    group: every structural key present plus the ``stats`` attribute —
    written last by :func:`write_hypergraph_group`, so it doubles as the
    completion marker after a crash mid-write (the writer deletes the old
    group first, so a partial group has no ``stats``).  Powers the build
    driver's ``skip_existing`` resume mode (the reference recomputes
    unconditionally, preprocess_hypergraph.py:475-492).

    ``require_similarity``: also require the persisted similarity caches —
    a resumed ``save_similarity=True`` build must NOT skip files produced by
    a ``--no_save_similarity`` run (they'd silently lack the caches the
    invocation asked for).  Reads go through :func:`read_h5_retrying` so an
    NFS hiccup can't misclassify a built slide as missing and trigger a
    full rebuild."""
    keys = HYPERGRAPH_KEYS + (SIMILARITY_KEYS if require_similarity else ())

    def probe(f):
        if "hypergraph" not in f:
            return False
        grp = f["hypergraph"]
        return "stats" in grp.attrs and all(k in grp for k in keys)

    try:
        return read_h5_retrying(h5_path, probe)
    except OSError:
        return False


def read_hypergraph_group(
    h5_path: str | Path, keys: Optional[Iterable[str]] = None
) -> Dict[str, np.ndarray]:
    """Read the ``hypergraph/`` group (all keys present, or a subset),
    through the module's retry layer like every other read path."""
    def read(f) -> Dict[str, np.ndarray]:
        out: Dict[str, np.ndarray] = {}
        if "hypergraph" not in f:
            raise KeyError(f"no hypergraph group in {h5_path}")
        grp = f["hypergraph"]
        if keys is None:
            def visit(name, obj):
                if isinstance(obj, h5py.Dataset):
                    out[name] = np.asarray(obj)
            grp.visititems(visit)
        else:
            for key in keys:
                if key in grp:
                    out[key] = np.asarray(grp[key])
        if "stats" in grp.attrs:
            out["__stats__"] = json.loads(grp.attrs["stats"])
        return out

    return read_h5_retrying(h5_path, read)
