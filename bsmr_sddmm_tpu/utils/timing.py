"""Kernel timing.

The reference times with CUDA events averaged over 10 iterations
(include/CudaTimeCalculator.cuh:14-54, src/sddmmKernel.cu:2561-2659).

On this TPU platform two runtime behaviors make naive wall timing lie:

1. ``jax.block_until_ready`` returns before device execution finishes
   (verified: a 1.1-TFLOP matmul "blocks" in 0.1 ms). Completion can only
   be forced by a device-to-host readback of (a tiny slice of) the result.
2. Re-submitting the same (executable, argument buffers) pair can be
   deduplicated by the runtime, so every timed call must use a distinct
   input buffer.

``time_jitted`` therefore times two batches of distinct-input calls at
different iteration counts, forces each with a 4-byte readback, and reports
the *slope* — which cancels the fixed tunnel round-trip (~28 ms here) and
any constant dispatch overhead. Device execution is in-order, so forcing
the last result forces the whole batch.
"""

from __future__ import annotations

import time
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np


_EPS = {jnp.dtype(jnp.float64): 1e-12, jnp.dtype(jnp.float32): 1e-6,
        jnp.dtype(jnp.bfloat16): 1e-2, jnp.dtype(jnp.float16): 1e-3}


def _perturbed(args, i: int):
    """Distinct per-iteration input buffers whose *contents* differ.

    The runtime (observed on the axon TPU relay) deduplicates repeated
    submissions whose executable and input contents match, timing them as
    ~0; a same-buffer or numerically-absorbed perturbation (x + 1e-30 in
    fp32) does NOT defeat it. So scale every floating leaf by
    (1 + i * ulp-ish): content changes, results stay within validation
    tolerance (rel error <= iterations * eps << 1e-3 for fp32)."""
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


def time_jitted(fn: Callable, *args, iterations: int = 10,
                warmup: int = 2) -> Tuple[float, object]:
    """Return (mean milliseconds per call, a representative result)."""
    if not args:
        raise ValueError("time_jitted needs at least one argument")
    warmup = max(warmup, 1)
    n_lo = max(1, iterations // 2)
    n_hi = n_lo + iterations
    total = warmup + n_lo + n_hi
    variants = [_perturbed(args, i) for i in range(total)]
    # materialize all inputs before timing
    force(variants[-1])

    result = None
    for i in range(warmup):
        result = fn(*variants[i])
    force(result)

    def batch(lo: int, n: int) -> float:
        t0 = time.perf_counter()
        rs = [fn(*variants[lo + i]) for i in range(n)]
        force(rs[-1])
        return time.perf_counter() - t0

    t_lo = batch(warmup, n_lo)
    t_hi = batch(warmup + n_lo, n_hi)
    ms = (t_hi - t_lo) / (n_hi - n_lo) * 1e3
    return max(ms, 1e-6), result
