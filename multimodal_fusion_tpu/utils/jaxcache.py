"""Persistent-compilation-cache enablement with ATOMIC writes.

jax 0.9.0's ``LRUCache.put`` (jax/_src/lru_cache.py:121) writes cache
entries with a bare ``Path.write_bytes`` and takes its file lock only when
eviction is enabled (``jax_compilation_cache_max_size`` set) — which this
repo never does.  Two processes sharing a cache dir (pytest + a concurrent
one-off pytest, or bench + a TPU CLI run) can therefore observe a
HALF-WRITTEN entry; ``backend.deserialize_executable`` on truncated bytes
segfaults the reader (observed twice: round-2 shared-root cache, and the
round-3 suite at tests/test_trainers.py::test_alignment_scan_steps...).

``enable_compilation_cache`` configures the cache dir AND monkeypatches
``LRUCache.put`` to write via tempfile + ``os.replace`` (atomic on POSIX):
readers then see either no file or a complete one.  The patch is
version-guarded — if jax's internals move, enablement still works and the
patch silently no-ops (the raw behavior is only racy, not wrong, for
single-process use).
"""

from __future__ import annotations

import contextlib
import functools
import os
import tempfile
from pathlib import Path

_PATCHED = False


_TLS = None  # threading.local() once the scoped patch is installed


def _install_scoped_disable():
    """Patch ``compilation_cache.{get,put}_executable_and_time`` with a
    thread-local off switch.  ``jax.config.enable_compilation_cache(False)``
    canNOT scope-disable the cache: ``is_cache_used`` latches its answer in a
    process-global on first use (compilation_cache.py:64-80), so a config
    context entered later is silently ignored — verified by a segfault that
    the config-based guard failed to prevent."""
    global _TLS
    if _TLS is not None:
        return _TLS
    import threading

    tls = threading.local()
    try:
        from jax._src import compilation_cache as _cc

        orig_get = _cc.get_executable_and_time
        orig_put = _cc.put_executable_and_time

        def get(*a, **k):
            if getattr(tls, "disabled", 0):
                return None, None
            return orig_get(*a, **k)

        def put(*a, **k):
            if getattr(tls, "disabled", 0):
                return None
            return orig_put(*a, **k)

        _cc.get_executable_and_time = get
        _cc.put_executable_and_time = put
        # compiler.py calls these as module attributes (compiler.py:778,829),
        # so module-level rebinding is sufficient.
        _TLS = tls
    except Exception:  # pragma: no cover - jax internals moved
        _TLS = tls  # guard becomes a no-op, caching stays fully on
    return _TLS


@contextlib.contextmanager
def no_cpu_compile_cache():
    """Skip the persistent compile cache for this scope ON THE CPU BACKEND.

    XLA:CPU's ``executable.serialize()`` / ``deserialize_executable`` has
    segfaulted four times (round 3) on trainer-sized scanned executables —
    three times under the alignment trainer, then under the survival
    trainer's windowed train step (tests/test_trained_parity.py;
    faulthandler trace ends in compilation_cache.put_executable_and_time)
    — and only deep into a full-suite process (the same compile serializes
    fine in a fresh process or any suite subset), i.e. an upstream
    aged-process flakiness we cannot fix.  Inside this scope cache reads
    return a miss and writes no-op, so affected compiles neither serialize
    nor deserialize.  All trainer entry points (survival
    train_fold/evaluate_fold, VAE train_epoch/validate, alignment
    train/validate) carry the decorator.  TPU (and every other backend)
    keeps full caching — the bug has only ever manifested on CPU, and
    tunnel-side recompiles are the expensive case.
    """
    import jax

    try:
        on_cpu = jax.default_backend() == "cpu"
    except Exception:
        on_cpu = False
    if not on_cpu:
        yield
        return
    tls = _install_scoped_disable()
    prev = getattr(tls, "disabled", 0)
    tls.disabled = prev + 1
    try:
        yield
    finally:
        tls.disabled = prev


def guard_cpu_compile_cache(fn):
    """Decorator form of :func:`no_cpu_compile_cache`."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with no_cpu_compile_cache():
            return fn(*args, **kwargs)

    return wrapped


def _patch_atomic_put() -> None:
    global _PATCHED
    if _PATCHED:
        return
    try:
        from jax._src import lru_cache as _lru

        _orig_put = _lru.LRUCache.put

        def put(self, key, val):
            if not key:
                raise ValueError("key cannot be empty")
            # eviction mode takes the inter-process file lock already and
            # tracks sizes; keep jax's own logic there.
            if getattr(self, "eviction_enabled", False):
                return _orig_put(self, key, val)
            cache_path = Path(self.path) / f"{key}{_lru._CACHE_SUFFIX}"
            if cache_path.exists():
                return
            fd, tmp = tempfile.mkstemp(
                dir=str(self.path), prefix=f".{key}.", suffix=".tmp"
            )
            try:
                with os.fdopen(fd, "wb") as f:
                    f.write(val)
                os.replace(tmp, cache_path)  # atomic publish
            except BaseException:
                try:
                    os.unlink(tmp)
                except OSError:
                    pass
                raise

        _lru.LRUCache.put = put
        _PATCHED = True
    except Exception:  # pragma: no cover - jax internals moved
        pass


def enable_compilation_cache(
    cache_dir: str | os.PathLike,
    min_compile_time_secs: float = 0.5,
) -> None:
    """Enable jax's persistent compilation cache at ``cache_dir`` with
    atomic entry writes (safe for concurrent processes sharing the dir)."""
    import jax

    path = Path(cache_dir)
    path.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(path))
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", min_compile_time_secs
    )
    _patch_atomic_put()
