"""Measure autotune pick quality with and without measured refinement.

For each probed (matrix, K): time the full (alpha x delta x subpack)
candidate grid on hardware (the ground-truth best), then compare
  host pick     = choose_config(refine_top=0) — pure cost model
  refined pick  = choose_config(refine_top=3) — top-3 re-timed in-program
as fractions of the swept best. The round-4 host-side checker bottomed
out at 0.44-0.48 on cells where the fused XLA schedule diverges from the
sum-of-tiers model (PERF.md); refinement should hold >= 0.9 everywhere
by construction (it measures the same way the sweep does).
"""
import argparse
import json
import os
import sys
import time

import numpy as np

CELLS = [
    ("banded_mesh_32k", 32),    # the round-3/4 fusion-pathology cell
    ("banded_mesh_64k", 256),   # tier_serialize home turf
    ("community_20k", 128),     # packed-tier undervaluation cell
    ("rmat_16", 128),
]
ALPHAS = (0.1, 0.3, 0.5)
DELTAS = (0.002, 0.006, 0.02)
SUBS = (0, 12)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="results/v5e_r5/refine_pick.json")
    p.add_argument("--iterations", type=int, default=10)
    args = p.parse_args()

    from bsmr_sddmm_tpu.utils.hostmem import tune_malloc
    tune_malloc()
    from bsmr_sddmm_tpu.utils.compilecache import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp

    from bsmr_sddmm_tpu.autotune import choose_config
    from bsmr_sddmm_tpu.config import SddmmConfig
    from bsmr_sddmm_tpu.datasets import SUITE
    from bsmr_sddmm_tpu.formats import make_dense
    from bsmr_sddmm_tpu.sddmm import BsmrSddmm

    gens = dict(SUITE)
    out = []
    for name, K in CELLS:
        csr = gens[name]()
        cfg = SddmmConfig(k=K, panel_height=32, reorder_cache=True,
                          num_iterations=args.iterations,
                          subpack_min_nnz=12)
        pipes = {s: BsmrSddmm(csr, cfg.replace(subpack_min_nnz=s))
                 for s in SUBS}
        p0 = next(iter(pipes.values()))
        for pp in pipes.values():
            pp._row_cache = p0._row_cache
        A = jnp.asarray(make_dense(csr.rows, K, seed=1337))
        B = jnp.asarray(np.ascontiguousarray(
            make_dense(K, csr.cols, seed=1338).T))
        sweep = {}
        for alpha in ALPHAS:
            for delta in DELTAS:
                for sub in SUBS:
                    try:
                        log = pipes[sub].benchmark(
                            A, B, alpha=alpha, delta=delta,
                            time_csr_emit=False, file=name)
                    except Exception as e:
                        print(f"# {name} k={K} a={alpha} d={delta} "
                              f"s={sub}: {type(e).__name__}: {e}",
                              file=sys.stderr, flush=True)
                        continue
                    sweep[(alpha, delta, sub)] = log.sddmm_ms
                    print(f"# {name} k={K} a={alpha} d={delta} s={sub}: "
                          f"{log.sddmm_ms:.3f} ms", file=sys.stderr,
                          flush=True)
        best_key = min(sweep, key=sweep.get)
        best_ms = sweep[best_key]

        def pick_ms(refine):
            choice = choose_config(csr, p0._row_reordering, cfg,
                                   alphas=ALPHAS, candidates=DELTAS,
                                   k=K, allow_dense=False,
                                   refine_top=refine)
            key = (choice.alpha, choice.delta, choice.subpack)
            if key not in sweep:   # pick outside the swept grid: time it
                log = pipes[choice.subpack].benchmark(
                    A, B, alpha=choice.alpha, delta=choice.delta,
                    time_csr_emit=False, file=name)
                sweep[key] = log.sddmm_ms
            return key, sweep[key]

        host_key, host_ms = pick_ms(0)
        ref_key, ref_ms = pick_ms(3)
        row = dict(matrix=name, k=K,
                   sweep_best=[list(best_key), round(best_ms, 4)],
                   host_pick=[list(host_key), round(host_ms, 4),
                              round(best_ms / host_ms, 3)],
                   refined_pick=[list(ref_key), round(ref_ms, 4),
                                 round(best_ms / ref_ms, 3)])
        out.append(row)
        print("#", json.dumps(row), file=sys.stderr, flush=True)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    fr_host = [r["host_pick"][2] for r in out]
    fr_ref = [r["refined_pick"][2] for r in out]
    print(json.dumps({
        "host_fraction_min": min(fr_host), "host_fraction_mean":
            round(float(np.mean(fr_host)), 3),
        "refined_fraction_min": min(fr_ref), "refined_fraction_mean":
            round(float(np.mean(fr_ref)), 3),
        "out": args.out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
