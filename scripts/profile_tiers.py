"""Per-tier time breakdown across suite regimes (round-2 perf recon)."""
import sys
import numpy as np
from bsmr_sddmm_tpu.config import SddmmConfig
from bsmr_sddmm_tpu.datasets import SUITE, EXTRA
SUITE = SUITE + EXTRA
from bsmr_sddmm_tpu.formats import make_dense
from bsmr_sddmm_tpu.sddmm import BsmrSddmm

K = int(sys.argv[1]) if len(sys.argv) > 1 else 128
names = sys.argv[2].split(",") if len(sys.argv) > 2 else None
for name, gen in SUITE:
    if names and name not in names:
        continue
    csr = gen()
    cfg = SddmmConfig(k=K, panel_height=32, num_iterations=10)
    pipe = BsmrSddmm(csr, cfg)
    A = make_dense(csr.rows, K, seed=1337)
    B = make_dense(K, csr.cols, seed=1338)
    for delta in (0.02,):
        log = pipe.benchmark(A, B, alpha=0.3, delta=delta, file=name,
                             tier_times=True)
        e = log.extras
        T = log.num_dense_blocks
        Tg = log.num_gathered_blocks
        dn, gn, rn = log.dense_nnz, log.gathered_nnz, log.residual_nnz
        d_ms = float(e["tier_dense_ms"]); g_ms = float(e["tier_gathered_ms"])
        r_ms = float(e["tier_residual_ms"])
        print(f"{name} d={delta} K={K}: {log.gflops:.0f} GFLOPS total {log.sddmm_ms:.3f} ms | "
              f"dense {d_ms:.3f} ms ({T} tiles, {dn} nnz, {d_ms*1e6/max(T,1):.0f} ns/tile) | "
              f"gath {g_ms:.3f} ms ({Tg} tiles, {gn} nnz, {g_ms*1e6/max(Tg,1):.0f} ns/tile) | "
              f"res {r_ms:.3f} ms ({rn} nnz, {r_ms*1e6/max(rn,1):.1f} ns/nnz) | "
              f"overlap {e['tier_overlap_efficiency']}", flush=True)
