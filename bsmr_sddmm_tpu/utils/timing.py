"""Kernel timing.

The reference times with CUDA events averaged over 10 iterations
(include/CudaTimeCalculator.cuh:14-54, src/sddmmKernel.cu:2561-2659). The
TPU equivalent is wall time around ``jax.block_until_ready`` after a
warm-up/compile call, averaged the same way.
"""

from __future__ import annotations

import time
from typing import Callable, Tuple


def time_jitted(fn: Callable, *args, iterations: int = 10,
                warmup: int = 2) -> Tuple[float, object]:
    """Return (mean milliseconds per call, last result)."""
    result = None
    for _ in range(max(warmup, 1)):
        result = jax_block(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iterations):
        result = fn(*args)
    jax_block(result)
    elapsed = (time.perf_counter() - t0) / iterations
    return elapsed * 1e3, result


def jax_block(x):
    import jax
    return jax.block_until_ready(x)
