"""Standalone repro attempt: XLA:CPU executable (de)serialization segfault.

VERDICT r4 #7.  The full test suite has segfaulted XLA:CPU five times across
rounds 3-4, always deep into an aged process (~180+ tests in), with two
distinct signatures:

  1. ``compilation_cache.put_executable_and_time`` while SERIALIZING a
     trainer-scale scanned executable (alignment x3, survival window step x1)
     — worked around by ``utils.jaxcache.guard_cpu_compile_cache`` (scoped
     cache disable on trainer entry points, CPU backend only);
  2. inside ``backend_compile_and_load`` on a tiny compile, in a process
     whose only unusual history was compiles issued from non-main HTTP
     handler threads (the serve test) — worked around by
     ``jax.clear_caches()`` in that test's finally.

This script recreates the "aged process" conditions WITHOUT the suite: many
hundreds of distinct executables (varied shapes/structures, some compiled
from worker threads), interleaved with trainer-scale ``lax.scan`` train-step
compiles, persistent cache enabled (serialize + deserialize both exercised
by clearing jax's in-memory caches between rounds).  Run it as:

    JAX_PLATFORMS=cpu python tools/repro_cpu_cache_segfault.py [rounds]

Exit 0 = no crash reproduced (the round-4/5 outcome; see CLAUDE.md).  A
crash prints a faulthandler trace — please capture it and the jax/jaxlib
versions alongside.

OBSERVED (round 5, no crash but suspicious): every persistent-cache
DESERIALIZE on this host logs ``cpu_aot_loader.cc: ... Machine type used
for XLA:CPU compilation doesn't match the machine type for execution ...
could lead to execution errors such as SIGILL`` — the compile-time target
carries XLA's ``+prefer-no-scatter,+prefer-no-gather`` pseudo-features
(and a few AMX bits) that the loader's host-feature probe doesn't report.
Same process, same machine, fresh cache dir.  If the suite crashes recur,
this loader path (reload of an "incompatible" AOT result) is the first
suspect to rule out — e.g. by disabling the persistent cache entirely for
one suite run.
"""

from __future__ import annotations

import faulthandler
import sys
import tempfile
import threading
import time

faulthandler.enable()

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import optax
from flax import nnx

from multimodal_fusion_tpu.utils.jaxcache import enable_compilation_cache


def trainer_scale_compile(seed: int, scan_len: int = 8):
    """A trainer-sized scanned train step (VAE-shaped), freshly compiled."""
    from multimodal_fusion_tpu.models.vae import VAE, vae_loss

    model = VAE(256 + seed % 3, [128, 64], [64, 128], 32, rngs=nnx.Rngs(seed))
    graphdef, state = nnx.split(model)
    tx = optax.adam(1e-3)
    opt = tx.init(state)

    @jax.jit
    def steps(state, opt, xs, keys):
        def body(carry, inp):
            state, opt = carry
            x, key = inp

            def loss_fn(state):
                m = nnx.merge(graphdef, state)
                x_hat, mean, log_var = m(x, key=key, train=True)
                return vae_loss(x, x_hat, mean, log_var)[0]

            loss, grads = jax.value_and_grad(loss_fn)(state)
            up, opt = tx.update(grads, opt)
            return (optax.apply_updates(state, up), opt), loss

        return jax.lax.scan(body, (state, opt), (xs, keys))

    xs = jnp.zeros((scan_len, 16, 256 + seed % 3), jnp.float32)
    keys = jax.random.split(jax.random.key(seed), scan_len)
    (state, opt), losses = steps(state, opt, xs, keys)
    jax.block_until_ready(losses)


def tiny_compiles(base: int, n: int = 60):
    """Many distinct small executables (shape-varied so none cache-hit)."""
    for i in range(n):
        k = base * 1000 + i
        x = jnp.ones((4 + k % 37, 3 + k % 11), jnp.float32)

        @jax.jit
        def f(x, k=k):
            return jnp.tanh(x @ x.T * (1 + k % 7)).sum() + k

        jax.block_until_ready(f(x))


def threaded_compiles(base: int, n_threads: int = 4):
    """Compiles issued from non-main threads (the serve-test signature)."""
    def work(t):
        x = jnp.ones((8 + (base + t) % 13, 5), jnp.float32)

        @jax.jit
        def g(x):
            return jax.nn.softmax(x @ x.T, axis=-1).mean() * (base + t)

        jax.block_until_ready(g(x))

    ts = [threading.Thread(target=work, args=(t,)) for t in range(n_threads)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    tmp = tempfile.mkdtemp(prefix="jaxcache_repro_")
    enable_compilation_cache(tmp, min_compile_time_secs=0.0)
    t0 = time.time()
    for r in range(rounds):
        tiny_compiles(r)
        threaded_compiles(r)
        trainer_scale_compile(r)
        if r % 2 == 1:
            # drop in-memory executables so the NEXT round's identical-shape
            # compiles go through cache DESERIALIZATION too
            jax.clear_caches()
        print(
            f"round {r + 1}/{rounds} ok "
            f"({time.time() - t0:.0f}s, live_arrays={len(jax.live_arrays())})",
            flush=True,
        )
    print("NO CRASH REPRODUCED", flush=True)


if __name__ == "__main__":
    main()
