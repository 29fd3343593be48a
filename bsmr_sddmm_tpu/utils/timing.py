"""Kernel timing.

The reference times with CUDA events averaged over 10 iterations
(include/CudaTimeCalculator.cuh:14-54, src/sddmmKernel.cu:2561-2659).

On this TPU platform two runtime behaviors make naive wall timing lie:

1. ``jax.block_until_ready`` returns before device execution finishes
   (verified: a 1.1-TFLOP matmul "blocks" in 0.1 ms). Completion can only
   be forced by a device-to-host readback of (a tiny slice of) the result.
2. The readback round trip is ~26 ms and jitters by a few ms, so a naive
   per-call wall time is all noise for sub-ms kernels.

``time_jitted`` therefore times two batches of calls at different
iteration counts and reports the *slope* — which cancels the fixed round
trip and any constant dispatch overhead — rescaling the batch until the
measured work dwarfs the jitter. Device execution is in-order, so forcing
the last result forces the whole batch. Inputs cycle through a small pool
of perturbed variants (paranoia against result caching; repeated
identical submissions measured the same as distinct ones, so the pool is
belt-and-braces, not load-bearing).
"""

from __future__ import annotations

import time
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


_EPS = {jnp.dtype(jnp.float64): 1e-12, jnp.dtype(jnp.float32): 1e-6,
        jnp.dtype(jnp.bfloat16): 1e-2, jnp.dtype(jnp.float16): 1e-3}


def _perturbed(args, i: int):
    """Distinct per-iteration input buffers whose *contents* differ.

    Every floating leaf scales by (1 + i * ulp-ish): content changes but
    results stay within validation tolerance (rel error <=
    iterations * eps << 1e-3 for fp32)."""
    def leaf(x):
        if isinstance(x, jax.Array) and jnp.issubdtype(x.dtype,
                                                       jnp.floating):
            eps = _EPS.get(jnp.dtype(x.dtype), 1e-6)
            return x * x.dtype.type(1.0 + i * eps)
        return x
    return jax.tree.map(leaf, args)


def force(result) -> None:
    """Force device completion of ``result`` (and everything queued before
    it) via a tiny d2h readback."""
    leaf = jax.tree.leaves(result)[0]
    np.asarray(jax.device_get(jnp.ravel(leaf)[0:1]))


_RTT_S: Optional[float] = None


def _rtt() -> float:
    """Measured cost of one forced trivial call (submission + readback
    round trip): the noise scale the slope must dwarf. ~26 ms through the
    TPU tunnel, ~0.1 ms on local CPU."""
    global _RTT_S
    if _RTT_S is None:
        f = jax.jit(lambda x: x + 1.0)
        x = jnp.zeros((8, 128), jnp.float32)
        force(f(x))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            force(f(x))
            ts.append(time.perf_counter() - t0)
        _RTT_S = max(min(ts), 1e-4)
    return _RTT_S


def time_jitted(fn: Callable, *args, iterations: int = 10,
                warmup: int = 2) -> Tuple[float, object]:
    """Return (mean milliseconds per call, a representative result).

    The readback round trip is noisy (+-ms), so the per-call time is the
    *slope* between two batch sizes; when the measured batch is not much
    bigger than the jitter, the batch is rescaled so signal dominates.
    Input variants come from a small cycled pool (distinct buffers, ulp
    perturbation) and call counts are capped by output size so deep
    submission queues cannot exhaust device memory."""
    if not args:
        raise ValueError("time_jitted needs at least one argument")
    warmup = max(warmup, 1)

    result = None
    for i in range(warmup):
        result = fn(*_perturbed(args, i))
    force(result)

    def nbytes(tree):
        return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(tree)
                   if hasattr(x, "size"))

    out_bytes = max(nbytes(result), 1)
    in_bytes = max(nbytes(args), 1)
    # queue depth cap: outputs of enqueued calls reserve device memory
    # (6 GB of a v5e's 16 GB HBM; too low a cap limits the batch below
    # the round-trip jitter and produces 2-3x run-to-run variance on
    # sub-ms kernels with large outputs)
    n_cap = int(max(8, min(512, (6 << 30) // out_bytes)))
    pool_n = int(max(4, min(16, (1 << 30) // in_bytes)))
    pool = [_perturbed(args, warmup + i) for i in range(pool_n)]
    force(pool[-1])

    def batch(n: int) -> float:
        t0 = time.perf_counter()
        r = None
        for i in range(n):
            r = fn(*pool[i % pool_n])
        force(r)
        return time.perf_counter() - t0

    def slope(n_iters: int):
        n_lo = max(1, n_iters // 2)
        n_hi = n_lo + n_iters
        t_lo = batch(n_lo)
        t_hi = batch(n_hi)
        ms = (t_hi - t_lo) / (n_hi - n_lo) * 1e3
        upper_ms = t_hi / n_hi * 1e3  # includes RTT/n
        return ms, upper_ms, t_hi

    ms, upper, t_hi = slope(min(iterations, n_cap))
    # rescale so the measured batch dwarfs round-trip jitter
    if t_hi < 2.5 * _rtt():
        est_s = max(ms, 0.05 * upper, 1e-3) / 1e3
        n = int(min(max(iterations, 3.0 * _rtt() / est_s), n_cap))
        ms, upper, t_hi = slope(n)
        # second estimate at the same scale: take the min (transient
        # contention on the shared link only ever inflates a slope)
        ms2, upper2, _ = slope(n)
        if ms2 > 0.05 * upper2:
            ms = min(ms, ms2) if ms > 0.05 * upper else ms2
            upper = min(upper, upper2)
    if ms <= 0.05 * upper:  # still degenerate: report the safe upper bound
        ms = upper
    return max(ms, 1e-6), result


def _perturb_row0(A, c):
    """Carry-dependent one-row perturbation: a fresh array VALUE each
    iteration (so the loop body cannot be hoisted or CSE'd) at the cost
    of one (1, K) dynamic-update-slice — NOT a full elementwise pass.

    The old harness used ``A * (1.0 + c)``, which streams the whole A
    (read + write) every rep. The reference times ONLY its two kernel
    launches per iteration (src/sddmmKernel.cu:2563-2652, matrixA
    untouched between iters), so that extra stream was a pure harness
    artifact — ~70-100 us/rep at M~50k, K=128, DOMINATING sub-0.1 ms
    matrices (skirt measured 0.077 ms total). Like the old scale, the
    multiplier rounds to exactly 1.0 in fp32 (c ~ 1e-37): hoisting is
    blocked by the data dependence on the carry, not by the value, and
    validation-tolerance drift is zero."""
    row0 = jax.lax.dynamic_slice_in_dim(A, 0, 1, 0)
    row0 = (row0 * (1.0 + c)).astype(A.dtype)
    return jax.lax.dynamic_update_slice_in_dim(A, row0, 0, 0)


def time_tier_inprogram(body: Callable, A, Bt, dplan,
                        opaque: bool = False,
                        target_s: float = 0.15,
                        iterations: int = 10) -> float:
    """In-program timing of a single-array body (an ``only_tier``
    callable): same harness as time_rphm_inprogram — jitted fori_loop,
    carry-perturbed input, output consumed (first+last elements when the
    output is an opaque pallas_call, full sum otherwise)."""
    def make_rep(reps: int):
        def fn(A, Bt, dplan):
            def step(_, carry):
                A_c, c = carry
                A_c = _perturb_row0(A_c, c)
                out = body(A_c, Bt, dplan)
                # fp32 probes regardless of the body's out_dtype (an
                # fp16 sum overflows; fp16 * 1e-30 underflows to 0)
                probe = ((out.ravel()[0]
                          + out.ravel()[-1]).astype(jnp.float32)
                         if opaque
                         else jnp.sum(out, dtype=jnp.float32) * 1e-30)
                return A_c, probe * 1e-37
            return jax.lax.fori_loop(0, reps, step,
                                     (A, jnp.float32(0.0)))[1]
        return jax.jit(fn)

    def timed_batches(fn_rep, reps, n_batches=2):
        ts = []
        for _ in range(n_batches):
            t0 = time.perf_counter()
            force(fn_rep(A, Bt, dplan))
            ts.append(time.perf_counter() - t0)
        return max((min(ts) - _rtt()) / reps * 1e3, 1e-6)

    pilot_reps = max(iterations, 4)
    f = make_rep(pilot_reps)
    force(f(A, Bt, dplan))
    pilot_ms = timed_batches(f, pilot_reps)
    pilot = max(pilot_ms / 1e3, 1e-6)
    reps = int(min(max(pilot_reps, target_s / pilot), 4096))
    if reps <= pilot_reps * 1.5:
        return pilot_ms
    g = make_rep(reps)
    force(g(A, Bt, dplan))
    return timed_batches(g, reps)


def time_rphm_inprogram(body: Callable, A, Bt, dplan,
                        dense_opaque: bool = True,
                        target_s: float = 0.15,
                        iterations: int = 10) -> float:
    """Device time per call of an ``emit="rphm"`` SDDMM body, measured by
    IN-PROGRAM repetition: one jitted fori_loop runs the body R times, so
    submission overhead (~0.16 ms/call through the tunnel) and readback
    jitter are paid once per *batch* instead of once per call — the only
    honest way to time sub-millisecond kernels over a ~26 ms RTT link.

    Hoisting/DCE hardening (both verified to bite on this platform):
    * the loop carries A and perturbs ONE row per iteration through a
      carry-dependent dynamic-update-slice (see _perturb_row0), so the
      body is not loop-invariant and cannot be hoisted — without the
      old full `A * (1 + c)` stream per rep, which charged the kernel
      ~2 x |A| bytes of harness artifact the reference's timed region
      (two kernel launches, src/sddmmKernel.cu:2563-2652) never pays;
    * the carry consumes every output tier: the gathered and residual
      tiers via full sums (XLA could legally narrow a sliced dot), the
      dense tier via one element when it is an opaque pallas_call
      (partial consumption still runs the whole kernel) or a full sum
      otherwise.
    """
    def make_rep(reps: int):
        def fn(A, Bt, dplan):
            def step(_, carry):
                A_c, c = carry
                A_c = _perturb_row0(A_c, c)
                d, p, g, r = body(A_c, Bt, dplan)
                # opaque pallas outputs (dense + packed tiers on the
                # pallas backend): one element keeps the whole call
                # alive; XLA tiers take full sums (a sliced dot can be
                # legally narrowed)
                # fp32 probes regardless of the body's out_dtype (an
                # fp16 sum overflows; fp16 * 1e-30 underflows to 0)
                probe = (d.ravel()[0].astype(jnp.float32) if dense_opaque
                         else jnp.sum(d, dtype=jnp.float32) * 1e-30)
                pprobe = ((p.ravel()[0].astype(jnp.float32)
                           if p.size else jnp.float32(0.0))
                          if dense_opaque
                          else jnp.sum(p, dtype=jnp.float32) * 1e-30)
                s = (probe * 1e-30 + pprobe * 1e-30
                     + jnp.sum(g, dtype=jnp.float32) * 1e-30
                     + jnp.sum(r, dtype=jnp.float32))
                return A_c, s * 1e-37
            return jax.lax.fori_loop(0, reps, step,
                                     (A, jnp.float32(0.0)))[1]
        return jax.jit(fn)

    def timed_batches(fn_rep, reps, n_batches=2):
        # min over batches: transient tunnel/device hiccups only ever
        # INFLATE a batch (a single spiked pilot once reported 18 ms for
        # a 1.2 ms kernel)
        ts = []
        for _ in range(n_batches):
            t0 = time.perf_counter()
            force(fn_rep(A, Bt, dplan))
            ts.append(time.perf_counter() - t0)
        # clamp: an RTT overestimate on a small batch must not produce a
        # zero/negative time (=> inf/negative GFLOPS downstream)
        return max((min(ts) - _rtt()) / reps * 1e3, 1e-6)

    # pilot: estimate per-call cost with a small in-program batch
    pilot_reps = max(iterations, 4)
    f = make_rep(pilot_reps)
    force(f(A, Bt, dplan))  # compile + warm
    pilot_ms = timed_batches(f, pilot_reps)
    pilot = max(pilot_ms / 1e3, 1e-6)
    reps = int(min(max(pilot_reps, target_s / pilot), 4096))
    if reps <= pilot_reps * 1.5:
        return pilot_ms
    g = make_rep(reps)
    force(g(A, Bt, dplan))
    return timed_batches(g, reps)
