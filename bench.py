"""Round benchmark: hybrid BSMR-SDDMM throughput at K=128 on the real TPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "GFLOPS", "vs_baseline": N}

Baseline: the reference's K=128 geometric-mean GFLOPS over its SuiteSparse
suite, best per matrix over the alpha x delta sweep = 2927 GFLOPS on an
RTX 4090 (BASELINE.md; scripts/results_suiteSparse_dataset/k128/
results_128.csv). The SuiteSparse tarballs cannot be downloaded here (zero
egress), so the suite is a deterministic synthetic stand-in for the
reference's filtered dataset (m,n >= 10000, nnz >= 100000,
exclude_invalid_dataset.py:47): R-MAT power-law graphs, banded FEM/mesh
matrices, latent-community graphs, and one uniform-noise worst case
(bsmr_sddmm_tpu/datasets.py). Per matrix we sweep delta (row reordering
cached per alpha, as the reference test mode does) and keep the best,
mirroring the reference's best-config-per-matrix methodology
(scripts/analyze_results.cpp:316-331).
"""

import json
import sys

import numpy as np


K = 128
ALPHAS = (0.3,)
# TPU break-even: a zero-gather BSR tile costs ~130 ns on v5e vs ~5.3 ns
# per per-nnz residual entry, so a (panel, cblock) pair is worth tiling
# from ~24 nonzeros = delta ~0.006 at 32x128 — far below the GPU
# reference's 0.3 sweet spot (measured: 0.02 beats 0.3 by 2-3x on every
# structured regime). Sweep the TPU regime.
DELTAS = (0.006, 0.02, 0.05)
BASELINE_GEOMEAN_GFLOPS = 2927.0  # reference K=128, RTX 4090

SUITE = None  # bsmr_sddmm_tpu.datasets.SUITE, imported in main()


def main() -> int:
    from bsmr_sddmm_tpu.config import SddmmConfig
    from bsmr_sddmm_tpu.datasets import SUITE
    from bsmr_sddmm_tpu.formats import make_dense
    from bsmr_sddmm_tpu.sddmm import BsmrSddmm

    best_gflops = []
    for name, gen in SUITE:
        csr = gen()
        cfg = SddmmConfig(k=K, panel_height=32, num_iterations=10)
        pipe = BsmrSddmm(csr, cfg)
        A = make_dense(csr.rows, K, seed=1337)
        B = make_dense(K, csr.cols, seed=1338)
        per_matrix = 0.0
        for alpha in ALPHAS:
            for delta in DELTAS:
                log = pipe.benchmark(A, B, alpha=alpha, delta=delta,
                                     file=name)
                per_matrix = max(per_matrix, log.gflops)
                print(f"# {log.file} a={alpha} d={delta} "
                      f"k={K}: {log.gflops:.0f} GFLOPS "
                      f"({log.sddmm_ms:.3f} ms, dense {log.dense_nnz}, "
                      f"gath {log.gathered_nnz}, "
                      f"res {log.residual_nnz})", file=sys.stderr)
        best_gflops.append(per_matrix)
    geomean = float(np.exp(np.mean(np.log(np.maximum(best_gflops, 1e-9)))))
    print(json.dumps({
        "metric": "sddmm_geomean_gflops_k128_suite8",
        "value": round(geomean, 1),
        "unit": "GFLOPS",
        "vs_baseline": round(geomean / BASELINE_GEOMEAN_GFLOPS, 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
