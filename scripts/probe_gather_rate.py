"""Row-gather rate vs operand size / result size / formulation (v5e)."""
import numpy as np, jax, jax.numpy as jnp
from bsmr_sddmm_tpu.utils.timing import time_jitted

K = 128
R = 500_000   # rows gathered
for n_rows in (16384, 65536, 131072, 262144):
    op_mb = n_rows * K * 4 >> 20
    Bt = jnp.asarray(np.random.default_rng(0).normal(size=(n_rows, K)).astype(np.float32))
    idx = jnp.asarray(np.random.default_rng(1).integers(0, n_rows, R).astype(np.int32))
    ms, _ = time_jitted(jax.jit(lambda b, i: jnp.take(b, i, axis=0)), Bt, idx, iterations=8)
    rate = R / (ms * 1e3)
    # windowed: sort idx, gather per 16MB window slice
    wr = max((16 << 20) // (K * 4), 128)
    idx_np = np.sort(np.asarray(idx))
    groups = []
    for base in range(0, n_rows, wr):
        s = np.searchsorted(idx_np, base); e = np.searchsorted(idx_np, min(base+wr, n_rows))
        if e > s: groups.append((base, s, e))
    idx_sorted = jnp.asarray(idx_np)
    def windowed(b, i):
        parts = []
        for base, s, e in groups:
            w = jax.lax.slice_in_dim(b, base, min(base+wr, n_rows))
            parts.append(jnp.take(w, jax.lax.slice_in_dim(i, s, e) - base, axis=0))
        return jnp.concatenate(parts, 0)
    ms2, _ = time_jitted(jax.jit(windowed), Bt, idx_sorted, iterations=8)
    rate2 = R / (ms2 * 1e3)
    # chunked scan gather (8 chunks)
    C = R // 8
    def scanned(b, i):
        def step(_, ic):
            return None, jnp.take(b, ic, axis=0)
        _, out = jax.lax.scan(step, None, i.reshape(8, C))
        return out
    ms3, _ = time_jitted(jax.jit(scanned), Bt, idx, iterations=8)
    rate3 = R / (ms3 * 1e3)
    print(f"op {op_mb:4d} MB: single {ms:.3f} ms ({rate:.0f} M rows/s) | "
          f"windowed16 {ms2:.3f} ms ({rate2:.0f}) | scan8 {ms3:.3f} ms ({rate3:.0f})",
          flush=True)
