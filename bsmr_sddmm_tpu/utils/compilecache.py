"""Persistent XLA compilation cache for harness entry points.

The reference amortizes nothing here (nvcc compiles happen at build
time); under JAX every distinct plan-shape bucket costs a fresh XLA
compile at runtime (tens of seconds through the remote-compile tunnel).
A disk cache keyed by XLA's own fingerprint makes repeated harness runs
(bench.py, the replica suite, the driver's end-of-round bench) reuse
executables across processes: warm the cache once in a session, and
every later run skips straight to execution.

Opt-in per entry point (like utils.hostmem.tune_malloc): the library
never mutates global JAX config on import.
"""

from __future__ import annotations

import os

#: default cache location — inside the repo (this container's only
#: guaranteed-writable, persistent path) but gitignored.
DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable_compile_cache(path: str | None = None) -> str | None:
    """Turn on JAX's persistent compilation cache. Returns the cache
    directory, or None if the runtime rejects the config (old jaxlib
    or a PJRT plugin without executable serialization — callers
    proceed uncached)."""
    d = path or os.environ.get("BSMR_JAX_CACHE_DIR") or DEFAULT_DIR
    try:
        import jax
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        # cache every compile that took >= 1 s; the default (.256 s? 1 s
        # depending on version) is fine but make it explicit
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
        # accept cache hits regardless of which process wrote them
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        return d
    except Exception:
        return None
