"""Probe: aggressive hot-column packing (subpack_min_nnz 4/8).

Economics (PERF.md): all three tiled tiers write the same 16 KB out
tile; they differ in B-operand acquisition — dense ~80 ns/tile
(contiguous), packed ~191 (S=4 block DMAs of the permuted hot-column
copy), gathered ~470 (128 row descriptors). The committed arms use
subpack_min_nnz=12; sub-blocks with 4-11 in-panel entries still land in
the gathered tier. Lowering the threshold moves them to packed tiles at
2.5x lower per-tile cost IF the added packed tiles (S sub-blocks each)
don't outnumber the displaced gathered tiles. Per-matrix empirical
question -> measure end to end on the suite's community/rmat/banded
representatives at the committed best (alpha, delta) per (matrix, K).
"""
import argparse
import json
import sys
import time

import numpy as np


# committed best (alpha, delta) per (matrix, K) at sub in {0, 12}
# (bench.py R4_BEST); the probe sweeps sub on those anchor points.
ANCHORS = {
    ("community_20k", 128): (0.1, 0.002),
    ("community_20k", 32): (0.1, 0.002),
    ("community_32k", 128): (0.1, 0.002),
    ("rmat_16", 128): (0.5, 0.002),
    ("rmat_16", 32): (0.3, 0.002),
    ("banded_mesh_12k", 128): (0.1, 0.006),
    ("banded_mesh_32k", 128): (0.3, 0.002),
}


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--subs", type=int, nargs="*", default=[0, 4, 8, 12])
    p.add_argument("--matrices", nargs="*", default=None)
    p.add_argument("--out", default="results/v5e_r5/subpack_arms.json")
    args = p.parse_args()

    from bsmr_sddmm_tpu.utils.hostmem import tune_malloc
    tune_malloc()
    from bsmr_sddmm_tpu.utils.compilecache import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp

    from bsmr_sddmm_tpu.config import SddmmConfig
    from bsmr_sddmm_tpu.datasets import SUITE
    from bsmr_sddmm_tpu.formats import make_dense
    from bsmr_sddmm_tpu.sddmm import BsmrSddmm

    gens = dict(SUITE)
    rows = []
    names = sorted({m for m, _ in ANCHORS}
                   if args.matrices is None else set(args.matrices))
    for name in names:
        csr = gens[name]()
        ks = sorted({k for m, k in ANCHORS if m == name})
        base_cfg = SddmmConfig(k=128, panel_height=32,
                               num_iterations=10, reorder_cache=True)
        pipes = {}
        for K in ks:
            alpha, delta = ANCHORS[(name, K)]
            A = jnp.asarray(make_dense(csr.rows, K, seed=1337))
            B = jnp.asarray(np.ascontiguousarray(
                make_dense(K, csr.cols, seed=1338).T))
            for sub in args.subs:
                if sub not in pipes:
                    pipes[sub] = BsmrSddmm(csr, base_cfg.replace(
                        subpack_min_nnz=sub))
                    if len(pipes) > 1:
                        pipes[sub]._row_cache = \
                            next(iter(pipes.values()))._row_cache
                pipe = pipes[sub]
                t0 = time.time()
                try:
                    log = pipe.benchmark(A, B, alpha=alpha, delta=delta,
                                         time_csr_emit=False, file=name)
                except Exception as e:
                    print(f"# {name} k={K} sub={sub}: FAILED "
                          f"{type(e).__name__}: {e}", file=sys.stderr,
                          flush=True)
                    continue
                row = dict(matrix=name, k=K, alpha=alpha, delta=delta,
                           sub=sub, gflops=round(log.gflops, 1),
                           ms=round(log.sddmm_ms, 4),
                           packed_tiles=log.num_packed_blocks,
                           gathered_tiles=log.num_gathered_blocks,
                           dense_tiles=log.num_dense_blocks,
                           packed_nnz=log.packed_nnz,
                           gathered_nnz=log.gathered_nnz,
                           wall_s=round(time.time() - t0, 1))
                rows.append(row)
                print("#", json.dumps(row), file=sys.stderr, flush=True)
    import os
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=1)
    print(json.dumps({"cells": len(rows), "out": args.out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
