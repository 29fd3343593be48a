"""Round benchmark: hybrid BSMR-SDDMM throughput at K in {32,64,128,256}.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "GFLOPS", "vs_baseline": N,
   "per_k_geomean": {...}, "per_k_vs_baseline": {...}}

Headline value = K=128 geomean. Baselines: the reference's per-K
geometric-mean GFLOPS over its SuiteSparse suite, best per matrix over the
alpha x delta sweep, on an RTX 4090 (BASELINE.md;
scripts/results_suiteSparse_dataset/k*/results_*.csv). The SuiteSparse
tarballs cannot be downloaded here (zero egress), so the suite is a
deterministic synthetic stand-in for the reference's filtered dataset
(m,n >= 10000, nnz >= 100000, exclude_invalid_dataset.py:47): R-MAT
power-law graphs, banded FEM/mesh matrices, latent-community graphs, and
one uniform-noise worst case (bsmr_sddmm_tpu/datasets.py). Per matrix we
sweep delta (row reordering cached per alpha, as the reference test mode
does) and keep the best, mirroring the reference's best-config-per-matrix
methodology (scripts/analyze_results.cpp:316-331).
"""

import json
import sys

import numpy as np


KS = (32, 64, 128, 256)
# Best-over-(alpha x delta) per matrix, the reference's committed
# methodology (scripts/analyze_results.cpp:316-331). Row reordering is
# cached per alpha inside BsmrSddmm; alphas whose row permutation equals
# an already-swept alpha's are skipped (banded matrices cluster the same
# at every alpha — no point re-timing identical plans).
ALPHAS = (0.1, 0.3, 0.5)
# TPU break-even: a zero-gather BSR tile costs ~80 ns on v5e vs ~5.3 ns
# per per-nnz residual entry, so a (panel, cblock) pair is worth tiling
# from ~15-24 nonzeros = delta ~0.002-0.006 at 32x128 — far below the GPU
# reference's 0.3 sweet spot (measured round 2: 0.002 beats 0.02 on
# banded, 0.006 wins community/rmat). Round 3 adds the hot-column packed
# tier as a swept dimension: (delta, subpack_min_nnz) pairs — the tier
# wins +20-25% on hub-heavy masks (rmat/community at low delta) and is
# neutral-to-negative elsewhere, so both arms compete per matrix like
# the reference's alpha x delta best-of.
CONFIGS = ((0.002, 0), (0.006, 0), (0.002, 12), (0.02, 12))
# non-headline K values re-time only the top-N K=128 combos (see loop)
N_TRANSFER = 4
# skip plans whose device-resident maps exceed this (the tile scatter map
# costs 16 KB/tile regardless of K; a 262k-row power-law mask at delta
# 0.002 packs ~150k mostly-empty tiles = a multi-GB upload through the
# tunnel for a plan the cost model would never pick)
MAX_PLAN_BYTES = 1 << 30
#: reference per-K geomeans (RTX 4090, best-over-sweep per matrix)
BASELINE_GEOMEAN_GFLOPS = {32: 1851.0, 64: 2601.0, 128: 2927.0,
                           256: 2710.0}


def main() -> int:
    from bsmr_sddmm_tpu.utils.hostmem import tune_malloc
    tune_malloc()   # packing is allocation-bound on this host (PERF.md)
    from bsmr_sddmm_tpu.config import SddmmConfig
    from bsmr_sddmm_tpu.datasets import SUITE
    from bsmr_sddmm_tpu.formats import make_dense
    from bsmr_sddmm_tpu.sddmm import BsmrSddmm

    import os
    only = os.environ.get("BENCH_MATRICES")   # comma-separated subset
    suite = [(n, g) for n, g in SUITE
             if only is None or n in only.split(",")]
    if not suite:
        print(f"BENCH_MATRICES={only!r} matched nothing; suite names: "
              f"{[n for n, _ in SUITE]}", file=sys.stderr)
        return 1
    best = {k: [] for k in KS}        # best over all arms incl. fp16-out
    best32 = {k: [] for k in KS}      # fp32-emission arms only
    for name, gen in suite:
        csr = gen()
        base_cfg = SddmmConfig(k=128, panel_height=32, num_iterations=10)
        pipes = {sub: BsmrSddmm(csr,
                                base_cfg.replace(subpack_min_nnz=sub))
                 for sub in {s for _, s in CONFIGS}}
        pipe0 = next(iter(pipes.values()))
        for pipe in pipes.values():   # one row clustering per alpha
            pipe._row_cache = pipe0._row_cache
        # dedup alphas that reorder identically (their plans are identical)
        alphas, seen_perms = [], set()
        for alpha in ALPHAS:
            key = hash(pipe0._row_reordering(alpha).row_perm.tobytes())
            if key not in seen_perms:
                seen_perms.add(key)
                alphas.append(alpha)
        # The full (alpha x config) grid runs at K=128 (the headline);
        # the other K values re-time only the top-N_TRANSFER combos of
        # the K=128 grid. Measured on the full-grid log: top-4 transfer
        # keeps >= 97.4% of the full-grid best per (matrix, K) at half
        # the wall time; this is a documented selective sweep, not a
        # silent cap.
        scores = {}   # (alpha, config) -> K=128 gflops
        pipes16 = {}  # fp16-emission pipes, lazily built per subpack arm

        def run_one(K, A, B, alpha, delta, sub, pmap=None, tag=""):
            pipe = (pmap if pmap is not None else pipes)[sub]
            plan = pipe.plan(alpha, delta, k=K)
            plan_bytes = 4 * (
                plan.tile_scatter.size + plan.g_scatter.size
                + plan.sp_scatter.size + plan.sp_sub.size
                + plan.sp_colperm.size
                + plan.tile_cols.size + plan.g_cols.size
                + 3 * plan.res_arow.size + plan.rphm_to_csr.size)
            if plan_bytes > MAX_PLAN_BYTES:
                print(f"# {name} a={alpha} d={delta} k={K}: "
                      f"skipped (plan maps {plan_bytes >> 20} MB)",
                      file=sys.stderr, flush=True)
                return None
            try:
                log = pipe.benchmark(A, B, alpha=alpha, delta=delta,
                                     time_csr_emit=False, file=name)
            except Exception as e:   # transient device hiccup: retry once
                print(f"# {name} a={alpha} d={delta} k={K}{tag}: "
                      f"RETRY after {type(e).__name__}: {e}",
                      file=sys.stderr, flush=True)
                try:
                    log = pipe.benchmark(A, B, alpha=alpha, delta=delta,
                                         time_csr_emit=False, file=name)
                except Exception as e2:   # skip the config, keep the run
                    print(f"# {name} a={alpha} d={delta} k={K}{tag}: "
                          f"SKIPPED after second failure "
                          f"({type(e2).__name__}: {e2})",
                          file=sys.stderr, flush=True)
                    return None
            print(f"# {log.file} a={alpha} d={delta} "
                  f"k={K}{tag}: {log.gflops:.0f} GFLOPS "
                  f"({log.sddmm_ms:.3f} ms, dense {log.dense_nnz},"
                  f" gath {log.gathered_nnz}, "
                  f"res {log.residual_nnz}, "
                  f"fill {log.average_tile_density:.4f})",
                  file=sys.stderr, flush=True)
            return log.gflops

        for K in sorted(KS, key=lambda k: k != 128):   # K=128 first
            # upload A/Bt ONCE per (matrix, K): the axon tunnel retains
            # every h2d byte in host RSS (see ops.sddmm.device_plan), so
            # per-config re-uploads OOM a long sweep
            import jax.numpy as jnp
            A = jnp.asarray(make_dense(csr.rows, K, seed=1337))
            B = jnp.asarray(np.ascontiguousarray(
                make_dense(K, csr.cols, seed=1338).T))   # (N, K)
            per_matrix = 0.0
            if K == 128 or os.environ.get("BENCH_FULL_GRID"):
                combos = [(a, c) for a in alphas for c in CONFIGS]
            else:
                combos = sorted(scores, key=scores.get,
                                reverse=True)[:N_TRANSFER]
            best_combo = None
            for alpha, (delta, sub) in combos:
                gf = run_one(K, A, B, alpha, delta, sub)
                if gf is None:
                    continue
                if gf >= per_matrix:
                    best_combo = (alpha, (delta, sub))
                per_matrix = max(per_matrix, gf)
                if K == 128:
                    scores[(alpha, (delta, sub))] = gf
            # fp16-emission arm on the best fp32 combo: fp32 MXU
            # accumulate, fp16 store — halves every tier's output bytes
            # (the dense tier's largest DMA term) and passes the
            # reference tolerance (SddmmConfig.out_dtype; validated in
            # the replica suite / verify drive). The ` dt=f16` tag keeps
            # these lines out of check_autotune's positional parser.
            per_matrix32 = per_matrix
            if best_combo is not None and os.environ.get(
                    "BENCH_FP16", "1") != "0":
                alpha16, (delta16, sub16) = best_combo
                if sub16 not in pipes16:
                    pipes16[sub16] = BsmrSddmm(
                        csr, base_cfg.replace(subpack_min_nnz=sub16,
                                              out_dtype="float16"))
                    pipes16[sub16]._row_cache = pipe0._row_cache
                gf16 = run_one(K, A, B, alpha16, delta16, sub16,
                               pmap=pipes16, tag=" dt=f16")
                if gf16 is not None:
                    per_matrix = max(per_matrix, gf16)
            if per_matrix == 0.0:
                # every delta skipped by the plan-size guard: fall back to
                # the dense-fallback arm so the geomean reflects a real
                # run instead of silently cratering through the 1e-9 floor
                log = pipe0.benchmark(A, B, delta="dense", file=name)
                per_matrix = per_matrix32 = log.gflops
                print(f"# {name} k={K}: all tiled plans skipped -> "
                      f"dense fallback {log.gflops:.0f} GFLOPS",
                      file=sys.stderr, flush=True)
            best[K].append(per_matrix)
            best32[K].append(per_matrix32)

    def geomean(xs):
        return float(np.exp(np.mean(np.log(np.maximum(xs, 1e-9)))))

    per_k = {str(k): round(geomean(best[k]), 1) for k in KS}
    per_k_vs = {str(k): round(geomean(best[k])
                              / BASELINE_GEOMEAN_GFLOPS[k], 4)
                for k in KS}
    g128 = geomean(best[128])
    print(json.dumps({
        "metric": "sddmm_geomean_gflops_k128_suite8",
        "value": round(g128, 1),
        "unit": "GFLOPS",
        "vs_baseline": round(g128 / BASELINE_GEOMEAN_GFLOPS[128], 4),
        "per_k_geomean": per_k,
        "per_k_vs_baseline": per_k_vs,
        # fp32-emission-only geomeans (the fp16-out arm excluded), so
        # the mixed headline is always attributable: the reference
        # stores fp32; our fp16 arm passes the same tolerance gate but
        # is reported separately too
        "per_k_geomean_fp32out": {str(k): round(geomean(best32[k]), 1)
                                  for k in KS},
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
