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
power-law graphs, banded FEM/mesh matrices, latent-community graphs
(bsmr_sddmm_tpu/datasets.py).

Sweep modes (the reference's best-config-per-matrix methodology,
scripts/analyze_results.cpp:316-331):

* default (selective): per (matrix, K) time the best arm of the
  round-4 full alpha x (delta, subpack) x dtype hardware grid
  (results/v5e_r4/bench_fullgrid.log, 405 measured cells) plus its
  fp16-emission sibling where that arm won. ~44 timed cells — sized so
  the driver's end-of-round run finishes inside its timeout (round 4's
  full grid hit rc=124 and the round lost its headline to it).
  BENCH_EXTRA_ARMS=1 adds the host-side autotuner's pick per cell when
  it differs (the tuner competing against the committed grid best).
* BENCH_FULL_GRID=1: the full grid (alphas x CONFIGS at every K),
  fp16 arm on each cell's best combo — the mode that produced the
  committed table; use for re-deriving R4_BEST after kernel changes.

A wall-clock budget (BENCH_BUDGET_S, default 1500 s) is enforced
between cells: on exhaustion the JSON still prints, geomeans over the
measured cells, with the skipped cells listed — a partial line beats a
timeout with no line.
"""

import json
import os
import sys
import time

import numpy as np


KS = (32, 64, 128, 256)
ALPHAS = (0.1, 0.3, 0.5)
# (delta, subpack_min_nnz) arms for the full grid. TPU break-even: a
# zero-gather BSR tile costs ~80 ns on v5e vs ~5.3 ns per per-nnz
# residual entry, so tiling pays from ~15-24 nonzeros = delta
# 0.002-0.006 at 32x128 — far below the GPU reference's 0.3 sweet spot.
# The subpack>0 arms add the hot-column packed tier (wins on hub-heavy
# masks, neutral-to-negative elsewhere; both compete per matrix).
CONFIGS = ((0.002, 0), (0.006, 0), (0.002, 12), (0.02, 12))
N_TRANSFER = 4          # full-grid mode: non-headline K re-times top-N
MAX_PLAN_BYTES = 1 << 30
#: reference per-K geomeans (RTX 4090, best-over-sweep per matrix)
BASELINE_GEOMEAN_GFLOPS = {32: 1851.0, 64: 2601.0, 128: 2927.0,
                           256: 2710.0}

# Best arm per (matrix, K) from the round-4 full-grid hardware sweep
# (results/v5e_r4/bench_fullgrid.log; parsed in bench_fullgrid_summary
# .json): (alpha, delta, subpack, fp16_won). fp16_won means the
# fp16-emission run of this combo beat every fp32 cell — the selective
# sweep then times both the fp32 and fp16 arms of the combo so the
# fp32-only geomean stays attributable.
R4_BEST = {
    ("banded_mesh_12k", 32): (0.3, 0.006, 0, False),
    ("banded_mesh_12k", 64): (0.3, 0.006, 0, False),
    ("banded_mesh_12k", 128): (0.1, 0.006, 0, False),
    ("banded_mesh_12k", 256): (0.1, 0.002, 12, False),
    ("banded_mesh_20k", 32): (0.3, 0.006, 0, False),
    ("banded_mesh_20k", 64): (0.3, 0.006, 0, False),
    ("banded_mesh_20k", 128): (0.5, 0.002, 0, True),
    ("banded_mesh_20k", 256): (0.3, 0.006, 0, False),
    ("banded_mesh_32k", 32): (0.3, 0.002, 0, False),
    ("banded_mesh_32k", 64): (0.3, 0.002, 0, False),
    ("banded_mesh_32k", 128): (0.3, 0.002, 12, False),
    ("banded_mesh_32k", 256): (0.1, 0.002, 12, False),
    ("banded_mesh_64k", 32): (0.3, 0.006, 0, False),
    ("banded_mesh_64k", 64): (0.3, 0.006, 0, False),
    ("banded_mesh_64k", 128): (0.3, 0.006, 0, True),
    ("banded_mesh_64k", 256): (0.5, 0.006, 0, False),
    ("community_16k", 32): (0.1, 0.006, 0, False),
    ("community_16k", 64): (0.1, 0.006, 0, False),
    ("community_16k", 128): (0.1, 0.006, 0, True),
    ("community_16k", 256): (0.1, 0.006, 0, True),
    ("community_20k", 32): (0.1, 0.002, 12, False),
    ("community_20k", 64): (0.1, 0.002, 12, False),
    ("community_20k", 128): (0.1, 0.002, 12, True),
    ("community_20k", 256): (0.1, 0.002, 12, False),
    ("community_32k", 32): (0.5, 0.002, 0, False),
    ("community_32k", 64): (0.5, 0.002, 0, False),
    ("community_32k", 128): (0.1, 0.002, 0, True),
    ("community_32k", 256): (0.1, 0.006, 0, True),
    ("rmat_16", 32): (0.3, 0.002, 0, False),
    ("rmat_16", 64): (0.3, 0.002, 12, False),
    ("rmat_16", 128): (0.5, 0.002, 12, True),
    ("rmat_16", 256): (0.3, 0.002, 12, False),
}


def main() -> int:
    t_start = time.time()
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "1500"))
    from bsmr_sddmm_tpu.utils.hostmem import tune_malloc
    tune_malloc()   # packing is allocation-bound on this host (PERF.md)
    from bsmr_sddmm_tpu.utils.compilecache import enable_compile_cache
    enable_compile_cache()   # reuse executables across harness runs
    from bsmr_sddmm_tpu.config import SddmmConfig
    from bsmr_sddmm_tpu.datasets import SUITE
    from bsmr_sddmm_tpu.formats import make_dense
    from bsmr_sddmm_tpu.sddmm import BsmrSddmm

    full_grid = os.environ.get("BENCH_FULL_GRID")
    extra_arms = os.environ.get("BENCH_EXTRA_ARMS")
    only = os.environ.get("BENCH_MATRICES")   # comma-separated subset
    suite = [(n, g) for n, g in SUITE
             if only is None or n in only.split(",")]
    if not suite:
        print(f"BENCH_MATRICES={only!r} matched nothing; suite names: "
              f"{[n for n, _ in SUITE]}", file=sys.stderr)
        return 1
    best = {k: {} for k in KS}        # name -> best over all arms
    best32 = {k: {} for k in KS}      # name -> best fp32-emission arm
    skipped_cells = []

    def out_of_budget():
        return time.time() - t_start > budget_s

    for name, gen in suite:
        csr = gen()
        # disk-cached row reorders (prewarmed by earlier suite runs; the
        # pattern digest keys them, so identical synthetic matrices hit)
        base_cfg = SddmmConfig(k=128, panel_height=32, num_iterations=10,
                               reorder_cache=True)
        pipes, pipes16 = {}, {}

        def get_pipe(sub, f16):
            pool = pipes16 if f16 else pipes
            if sub not in pool:
                pool[sub] = BsmrSddmm(csr, base_cfg.replace(
                    subpack_min_nnz=sub,
                    **({"out_dtype": "float16"} if f16 else {})))
                if pipes:   # share one row-reordering cache across arms
                    pool[sub]._row_cache = \
                        next(iter(pipes.values()))._row_cache
            return pool[sub]

        def run_one(K, A, B, alpha, delta, sub, f16=False):
            pipe = get_pipe(sub, f16)
            plan = pipe.plan(alpha, delta, k=K)
            plan_bytes = 4 * (
                plan.tile_scatter.size + plan.g_scatter.size
                + plan.sp_scatter.size + plan.sp_sub.size
                + plan.sp_colperm.size
                + plan.tile_cols.size + plan.g_cols.size
                + 3 * plan.res_arow.size + plan.rphm_to_csr.size)
            tag = " dt=f16" if f16 else ""
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

        def record(K, gf, f16):
            if gf is None:
                return
            best[K][name] = max(best[K].get(name, 0.0), gf)
            if not f16:
                best32[K][name] = max(best32[K].get(name, 0.0), gf)

        scores = {}   # full-grid mode: (alpha, config) -> K=128 gflops
        # K=128 first: it is the headline and seeds full-grid transfer
        for K in sorted(KS, key=lambda k: k != 128):
            if out_of_budget():
                skipped_cells.append(f"{name}:k{K}")
                continue
            # upload A/Bt ONCE per (matrix, K): the axon tunnel retains
            # every h2d byte in host RSS (see ops.sddmm.device_plan), so
            # per-config re-uploads OOM a long sweep
            import jax.numpy as jnp
            A = jnp.asarray(make_dense(csr.rows, K, seed=1337))
            B = jnp.asarray(np.ascontiguousarray(
                make_dense(K, csr.cols, seed=1338).T))   # (N, K)
            if full_grid:
                if K == 128:
                    combos = [(a, c) for a in ALPHAS for c in CONFIGS]
                else:
                    combos = sorted(scores, key=scores.get,
                                    reverse=True)[:N_TRANSFER]
                best_combo, best_gf = None, 0.0
                for alpha, (delta, sub) in combos:
                    if out_of_budget():
                        skipped_cells.append(
                            f"{name}:k{K}:a{alpha}d{delta}s{sub}")
                        continue
                    gf = run_one(K, A, B, alpha, delta, sub)
                    record(K, gf, f16=False)
                    if gf is not None and gf >= best_gf:
                        best_combo, best_gf = (alpha, (delta, sub)), gf
                    if K == 128 and gf is not None:
                        scores[(alpha, (delta, sub))] = gf
                if best_combo is not None and not out_of_budget():
                    alpha, (delta, sub) = best_combo
                    record(K, run_one(K, A, B, alpha, delta, sub,
                                      f16=True), f16=True)
            else:
                alpha, delta, sub, f16_won = R4_BEST[(name, K)]
                record(K, run_one(K, A, B, alpha, delta, sub),
                       f16=False)
                if f16_won and not out_of_budget():
                    record(K, run_one(K, A, B, alpha, delta, sub,
                                      f16=True), f16=True)
                if extra_arms and not out_of_budget():
                    # autotuner challenger: its (alpha, delta, subpack)
                    # pick, timed only when it differs from the table
                    pipe = get_pipe(sub, False)
                    try:
                        choice = pipe.choose(alpha="auto", k=K)
                        pick = (choice.alpha, choice.plan.delta_used,
                                choice.plan.num_packed > 0)
                    except Exception as e:
                        print(f"# {name} k={K}: autotune failed "
                              f"({type(e).__name__}: {e})",
                              file=sys.stderr, flush=True)
                        pick = None
                    if pick is not None and \
                            pick[:2] != (alpha, delta):
                        record(K, run_one(K, A, B, choice.alpha,
                                          choice.plan.delta_used, sub),
                               f16=False)
            if name not in best[K]:
                if out_of_budget():
                    continue
                # every arm skipped/failed: dense-fallback so the
                # geomean reflects a real run instead of cratering
                log = get_pipe(0, False).benchmark(
                    A, B, delta="dense", file=name)
                best[K][name] = best32[K][name] = log.gflops
                print(f"# {name} k={K}: all tiled plans skipped -> "
                      f"dense fallback {log.gflops:.0f} GFLOPS",
                      file=sys.stderr, flush=True)

    def geomean(d):
        xs = list(d.values())
        if not xs:
            return 0.0
        return float(np.exp(np.mean(np.log(np.maximum(xs, 1e-9)))))

    if not best[128]:
        print("no cells measured (device unavailable?)", file=sys.stderr)
        return 1
    per_k = {str(k): round(geomean(best[k]), 1) for k in KS}
    per_k_vs = {str(k): round(geomean(best[k])
                              / BASELINE_GEOMEAN_GFLOPS[k], 4)
                for k in KS}
    g128 = geomean(best[128])
    out = {
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
        "matrices_per_k": {str(k): len(best[k]) for k in KS},
    }
    if skipped_cells:
        out["budget_skipped"] = skipped_cells
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
