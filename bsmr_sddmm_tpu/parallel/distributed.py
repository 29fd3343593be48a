"""Multi-host initialization and scaling measurement helpers.

The reference is single-process/single-GPU (SURVEY.md section 2d); this
is the framework's *new* distributed layer. Usage on a TPU pod slice:

    from bsmr_sddmm_tpu.parallel import distributed
    distributed.initialize()          # jax.distributed, once per process
    mesh = make_mesh()                # all devices across all hosts

Sharding/collectives are expressed per-array (parallel.sharding); this
module only owns process bootstrap and the weak-scaling measurement the
BASELINE targets ask for (nnz/s at 1 chip / 1 host / N hosts).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed for multi-host execution. No-ops when
    single-process (the common case on one host: all local chips are
    already visible). Arguments default to the standard JAX cluster
    environment variables."""
    import jax
    if num_processes in (None, 1) and not coordinator_address \
            and "JAX_COORDINATOR_ADDRESS" not in os.environ:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)


def weak_scaling(plan_fn, device_counts: Sequence[int],
                 iterations: int = 10) -> dict:
    """Measure nnz/s at each device count (same per-device work: the
    caller's plan_fn(n) returns (fn, args, nnz) for an n-device mesh).

    Returns {n: {"ms": ..., "nnz_per_s": ..., "efficiency": ...}} with
    efficiency relative to perfect scaling from the smallest count."""
    from bsmr_sddmm_tpu.utils.timing import time_jitted
    results = {}
    base_rate = None
    for n in device_counts:
        fn, args, nnz = plan_fn(n)
        ms, _ = time_jitted(fn, *args, iterations=iterations)
        rate = nnz / (ms * 1e-3)
        if base_rate is None:
            base_rate = rate / n
        results[n] = {"ms": ms, "nnz_per_s": rate,
                      "efficiency": rate / (base_rate * n)}
    return results
