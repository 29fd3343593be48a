"""Per-tier timing of the K=32 cost-model anomaly pair.

Pre-outage full-grid sweep (results/v5e_r3/bench_fullgrid_preoutage.log)
shows banded_mesh_32k K=32 d=0.002 at 1.065 ms vs d=0.006 at 1.898 ms,
consistently across alphas, while the two plans are structurally
near-identical (9216/8192 dense tiles, G=32 both, 735/834 gathered
tiles, est 0.97 ms both). This probe measures the per-tier split
(`benchmark(tier_times=True)`, the sddmmKernel.cu:2834-2844 analogue)
for both plans to find which tier actually diverges.
"""
import json
import sys


def main() -> int:
    from bsmr_sddmm_tpu.utils.hostmem import tune_malloc
    tune_malloc()   # packing is allocation-bound here (PERF.md)
    from bsmr_sddmm_tpu.config import SddmmConfig
    from bsmr_sddmm_tpu.datasets import SUITE
    from bsmr_sddmm_tpu.formats import make_dense
    from bsmr_sddmm_tpu.sddmm import BsmrSddmm

    out_path = (sys.argv[1] if len(sys.argv) > 1
                else "results/v5e_r3/k32_anomaly_tiers.json")
    gens = dict(SUITE)
    rows = []
    # (matrix, K, [(alpha, delta), ...]) — the pre-outage sweep's two
    # divergence families: K=32 adjacent-delta 1.8x (banded_32k), and
    # K=256 alpha=0.3 2.4x slower than alpha=0.1 (banded_64k)
    for name, k, cases in (
            ("banded_mesh_32k", 32, [(0.3, 0.002), (0.3, 0.006)]),
            ("banded_mesh_64k", 128, [(0.3, 0.002), (0.3, 0.006)]),
            ("banded_mesh_64k", 256, [(0.1, 0.002), (0.3, 0.002),
                                      (0.3, 0.006)])):
        csr = gens[name]()
        A = make_dense(csr.rows, k, seed=1337)
        B = make_dense(k, csr.cols, seed=1338)
        pipe = BsmrSddmm(csr, SddmmConfig(k=k, panel_height=32,
                                          subpack_min_nnz=0))
        for alpha, d in cases:
            log = pipe.benchmark(A, B, alpha=alpha, delta=d,
                                 tier_times=True, time_csr_emit=False,
                                 file=name)
            row = {"matrix": name, "k": k, "alpha": alpha, "delta": d,
                   "total_ms": log.sddmm_ms, "gflops": log.gflops,
                   **{key: log.extras.get(key) for key in
                      ("tier_dense_ms", "tier_packed_ms",
                       "tier_gathered_ms", "tier_residual_ms",
                       "tier_overlap_efficiency")}}
            rows.append(row)
            print(json.dumps(row), flush=True)
    with open(out_path, "w") as f:
        json.dump(rows, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
