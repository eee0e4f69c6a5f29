"""Device-resident performance accounting: MFU + roofline position.

Every number in earlier rounds' BENCH_DETAILS measured the TCP relay in
front of the chip, not the chip (VERDICT r2 missing #2).  This module
measures PURE DEVICE throughput: inputs are pre-staged in HBM, the timed
region is the jitted computation alone (block_until_ready fencing), and the
work estimate comes from XLA's own cost analysis of the compiled executable
— so the report is

    achieved FLOP/s, MFU = achieved / peak(chip, dtype),
    arithmetic intensity I = flops / bytes_accessed,
    roofline bound = min(peak_flops, I * peak_hbm_bw),
    fraction_of_roofline = achieved / bound.

``fraction_of_roofline`` is the honest "how close to speed-of-light" number:
an op with low intensity is HBM-bound and can sit at tiny MFU while running
at its roofline.

Caveat on the byte counts: XLA's ``cost_analysis()`` reports HLO-level
"bytes accessed" — an operand re-used by k consumers counts k times, and
post-fusion HBM traffic is lower still.  So ``bytes_per_call`` is an UPPER
bound on true HBM traffic, ``arithmetic_intensity`` a LOWER bound, and the
"memory"-bound classification conservative (a vmapped ViT-L forward counts
its weights once per layer-consumer, ~30x the real weight traffic).  ``mfu``
(achieved/peak) is unaffected — compare kernels on that when in doubt.

Peak numbers per chip generation: bf16 and HBM are published figures (per
chip); the f32 column is the EFFECTIVE peak of precision-HIGHEST f32
matmuls, which lower onto the bf16 MXU as a 6-pass decomposition
(peak_bf16 / 6) — the numerically-safe mode this framework's f32 kernels
use (the similarity norm-expansion cancels catastrophically below it).

| kind        | bf16 FLOP/s | f32(x6) FLOP/s | HBM B/s   |
| v5e / v5lite| 197e12      | 33e12          | 819e9     |
| v5p         | 459e12      | 76e12          | 2765e9    |
| v4          | 275e12      | 46e12          | 1228e9    |
| v3          | 123e12      | 61e12 (native) | 900e9     |
| v6e/trillium| 918e12      | 153e12         | 1640e9    |
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, Optional, Tuple

import jax

_PEAKS = {
    # substring of device_kind (lowercased) ->
    #   (bf16 flop/s, effective precision-HIGHEST f32 flop/s, hbm b/s)
    "v5 lite": (197e12, 33e12, 819e9),
    "v5e": (197e12, 33e12, 819e9),
    "v5p": (459e12, 76e12, 2765e9),
    "v4": (275e12, 46e12, 1228e9),
    "v3": (123e12, 61e12, 900e9),
    "v6": (918e12, 153e12, 1640e9),
    "trillium": (918e12, 153e12, 1640e9),
    "cpu": (1e12, 5e11, 1e11),  # nominal; keeps the report well-defined off-TPU
}


def chip_peaks(device=None) -> Tuple[str, float, float, float]:
    """(device_kind, peak_bf16, peak_f32, peak_hbm_bw) for one chip."""
    dev = device or jax.devices()[0]
    kind = str(getattr(dev, "device_kind", dev.platform)).lower()
    for sub, peaks in _PEAKS.items():
        if sub in kind:
            return kind, *peaks
    return kind, *_PEAKS["v5e"]  # default to the CI target generation


def _cost_analysis(fn: Callable, *args) -> Dict[str, float]:
    """XLA's flops/bytes estimate for the compiled executable."""
    try:
        compiled = jax.jit(fn).lower(*args).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        return {
            "flops": float(ca.get("flops", 0.0)),
            "bytes": float(ca.get("bytes accessed", 0.0)),
        }
    except Exception:
        return {"flops": 0.0, "bytes": 0.0}


def _perturb_floats(tree, eps):
    """Add a vanishing eps-dependent term to EVERY floating leaf — the data
    dependency that forces sequential device execution in the chained timing
    loop (without changing values: eps * 1e-30 underflows against any
    normal-scale data).  Perturbing only the first leaf is not enough: if
    that particular leaf is unused by the measured function (e.g. a
    train-only parameter in an eval forward), the body is loop-invariant and
    XLA hoists the whole computation out of the loop — measured as an
    impossible 1,887 TFLOP/s eval step on a v5e before this fix."""

    def f(x):
        if hasattr(x, "dtype") and jax.numpy.issubdtype(
            x.dtype, jax.numpy.floating
        ):
            return x + (eps * 1e-30).astype(x.dtype)
        return x

    return jax.tree.map(f, tree)


def _digest(tree):
    """Scalar that depends on EVERY element of every output leaf.

    Chaining only one element lets XLA dead-code-eliminate everything that
    does not feed it (a vmapped batch collapses to its first row; whole
    pipeline stages vanish) — measured as 13,000 "TFLOP/s" before this fix.
    A full-reduction digest keeps the entire computation live at negligible
    extra cost."""
    import jax.numpy as jnp

    total = jnp.float32(0.0)
    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.number):
            total = total + jnp.sum(leaf).astype(jnp.float32)
        elif hasattr(leaf, "dtype"):  # bool
            total = total + jnp.sum(leaf.astype(jnp.float32))
    return total


def _first_scalar(tree):
    """Cheapest possible scalar touching the inputs (for the overhead probe:
    full RPC/dispatch/fetch cost, near-zero device work)."""
    import jax.numpy as jnp

    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            return leaf.ravel()[0].astype(jnp.float32)
    return jnp.float32(0.0)


def tree_bytes(tree) -> float:
    """Total array bytes across a pytree (params, optimizer state, batches)."""
    total = 0.0
    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "nbytes"):
            total += float(leaf.nbytes)
        elif hasattr(leaf, "size") and hasattr(leaf, "dtype"):
            total += float(leaf.size) * leaf.dtype.itemsize
    return total


def analytic_step_bytes(
    *,
    input_bytes: float,
    weight_bytes: float,
    trainable_bytes: float = 0.0,
    hbm_activation_bytes: float = 0.0,
    mode: str = "train",
) -> float:
    """Analytic HBM-traffic model for one fused train/eval step.

    XLA's ``cost_analysis()`` bytes are HLO-level: every operand counts once
    PER CONSUMER and fusion is invisible, so for a whole fused train step the
    estimate lands on the wrong side of physics — the committed r4
    alignment/VAE/eval entries implied 0.9-1.9 TB/s of HBM traffic on a
    819 GB/s part (``suspect_roofline``).  This model counts what must
    actually cross HBM:

    - ``input_bytes``: the batch, read once.
    - ``weight_bytes``: ALL parameters the forward touches.  Read once in
      eval; twice in training (forward pass + re-read by the backward's
      transposed matmuls — rematerialised fusions hide some of this, so 2x
      is the conservative ceiling).
    - ``trainable_bytes``: parameters the optimizer updates.  Counted 6x for
      an Adam-family step: gradient write (1) + first/second-moment read (2)
      and write (2) + parameter write (1).  The parameter READ is already in
      ``weight_bytes``.
    - ``hbm_activation_bytes``: intermediates that provably round-trip HBM
      (counted 2x: forward write + backward read).  Per-case activation
      chains whose tiles fit VMEM fuse end-to-end on TPU and never hit HBM —
      e.g. the flagship's [4096, 64] per-slide tensors — so DON'T count
      those; do count scan carries, attention score tensors, and anything
      bigger than a few MB per fusion.

    The result is an engineering estimate (documented terms, not a
    measurement); entries carrying it set ``bytes_model: "analytic"`` in
    BENCH_DETAILS so readers know which bytes column they are looking at.
    """
    if mode == "eval":
        return input_bytes + weight_bytes + 2.0 * hbm_activation_bytes
    return (
        input_bytes
        + 2.0 * weight_bytes
        + 6.0 * trainable_bytes
        + 2.0 * hbm_activation_bytes
    )


def measure_device(
    fn: Callable,
    args: Tuple,
    iters: int = 10,
    dtype: str = "float32",
    work_items: Optional[float] = None,
    flops_override: Optional[float] = None,
    bytes_override: Optional[float] = None,
    mxu_dtype: Optional[str] = None,
) -> Dict[str, Any]:
    """Time ``fn(*args)`` device-resident and report MFU/roofline.

    Timing method: ``iters`` dependency-chained executions inside ONE jit
    (a ``fori_loop`` whose body perturbs the first input leaf by the
    previous iteration's output, so the device cannot overlap or elide
    them), closed by a single scalar fetch.  A host-side
    ``block_until_ready`` loop is NOT trustworthy here: through the axon
    TCP relay it returns as soon as the dispatch queue drains, yielding
    physically impossible rates (measured: "2 exaFLOP/s").  The one-call
    RPC/fetch overhead is measured with an empty chained loop and
    subtracted.  ``work_items`` (e.g. patches, slides) adds an items/sec
    field.  ``flops_override`` replaces XLA's estimate when the caller has
    a better analytic count."""
    import jax.numpy as jnp

    @jax.jit
    def chained(*a):
        def body(_, acc):
            out = fn(*_perturb_floats(a, acc))
            return _digest(out)

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    @jax.jit
    def empty(*a):
        return jnp.float32(0.0) + _first_scalar(a)

    float(chained(*args))  # compile + warm
    float(empty(*args))
    overhead = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(empty(*args))
        overhead = min(overhead, time.perf_counter() - t0)
    best = float("inf")
    signal = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained(*args))
        elapsed = time.perf_counter() - t0
        signal = max(signal, elapsed - overhead)
        best = min(best, max(elapsed - overhead, 1e-9) / iters)
    # SNR guard: through a TCP relay the one-fetch RTT varies by multiple
    # ms run-to-run; if the chained loop's compute signal is not well above
    # that noise floor, the per-call number is meaningless — callers must
    # raise `iters`.  Flag it rather than report garbage.
    low_snr = signal < 5 * overhead

    cost = _cost_analysis(fn, *args)
    flops = flops_override if flops_override is not None else cost["flops"]
    bytes_accessed = (
        bytes_override if bytes_override is not None else cost["bytes"]
    )
    kind, peak_bf16, peak_f32, peak_bw = chip_peaks()
    # ``dtype`` is the INPUT dtype; ``mxu_dtype`` the EFFECTIVE precision of
    # the dominant matmul passes, which sets the honest peak.  f32 inputs
    # through DEFAULT-precision dots (every model trunk / the attention
    # kernel's dot_generals) run single bf16 MXU passes — measuring those
    # against the 6-pass HIGHEST f32 column published physically impossible
    # roofline fractions (2.1x, advisor r3).  HIGHEST-precision f32 kernels
    # (the similarity kernel's f32 path) keep mxu_dtype unset.
    eff = mxu_dtype or dtype
    peak = peak_bf16 if eff == "bfloat16" else peak_f32
    rep = {
        "device_kind": kind,
        "compute_dtype": dtype,
        "mxu_dtype": eff,
        "sec_per_call": best,
        "timing_iters": iters,
        "fetch_overhead_sec": overhead,
        "low_snr": low_snr,
    }
    if work_items:
        rep["items_per_sec"] = work_items / best
    if not flops:
        # XLA's cost analysis cannot see Pallas custom calls and counts
        # while/scan bodies once, so a composite like the fused build has no
        # honest static FLOP count — report timing only and let per-kernel
        # entries (with analytic flops_override) carry the MFU story.
        rep["flops_per_call"] = None
        return rep
    achieved = flops / best if best > 0 else 0.0
    intensity = flops / bytes_accessed if bytes_accessed else float("inf")
    ridge = peak / peak_bw
    bound = min(peak, intensity * peak_bw) if bytes_accessed else peak
    rep.update(
        {
            "flops_per_call": flops,
            "bytes_per_call": bytes_accessed,
            # provenance of the bytes number (advisor r4): an explicit
            # override is always an analytic model supplied by the caller;
            # otherwise the bytes came from XLA's cost analysis, whose
            # per-consumer accounting overstates fused-step traffic
            "bytes_model": (
                "analytic" if bytes_override is not None else "xla_cost_analysis"
            ),
            "achieved_tflops": achieved / 1e12,
            "peak_tflops": peak / 1e12,
            "mfu": achieved / peak if peak else 0.0,
            "arithmetic_intensity_flop_per_byte": intensity,
            "ridge_intensity": ridge,
            "bound": "compute" if intensity >= ridge else "memory",
            "roofline_tflops": bound / 1e12,
            "fraction_of_roofline": achieved / bound if bound else 0.0,
        }
    )
    if rep["fraction_of_roofline"] > 1.05:
        # physically impossible: the peak/bytes model for this entry is
        # wrong (mis-set mxu_dtype, stale bytes_override, or an XLA
        # cost-analysis artifact) — flag loudly instead of publishing it
        rep["suspect_roofline"] = True
    return rep
