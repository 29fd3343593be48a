"""Hardware config sweep: ph x delta (+ dense fallback) per suite matrix."""
import sys
import numpy as np
from bsmr_sddmm_tpu.config import SddmmConfig
from bsmr_sddmm_tpu.datasets import SUITE, EXTRA
SUITE = SUITE + EXTRA
from bsmr_sddmm_tpu.formats import make_dense
from bsmr_sddmm_tpu.sddmm import BsmrSddmm

K = 128
names = sys.argv[1].split(",")
for name in names:
    csr = dict(SUITE)[name]()
    A = make_dense(csr.rows, K, seed=1337)
    B = make_dense(K, csr.cols, seed=1338)
    for ph in (16, 32):
        cfg = SddmmConfig(k=K, panel_height=ph, num_iterations=10)
        pipe = BsmrSddmm(csr, cfg)
        for delta in (0.002, 0.006, 0.02):
            log = pipe.benchmark(A, B, alpha=0.3, delta=delta, file=name)
            print(f"{name} ph={ph} d={delta}: {log.gflops:.0f} GFLOPS "
                  f"({log.sddmm_ms:.3f} ms) dnnz={log.dense_nnz} "
                  f"gnnz={log.gathered_nnz} rnnz={log.residual_nnz}",
                  flush=True)
    # dense fallback
    cfg = SddmmConfig(k=K, num_iterations=10)
    log = BsmrSddmm(csr, cfg).benchmark(A, B, delta="dense", file=name)
    print(f"{name} DENSE: {log.gflops:.0f} GFLOPS ({log.sddmm_ms:.3f} ms)",
          flush=True)
