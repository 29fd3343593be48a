"""Batched small-K benchmark (VERDICT r2 missing #6): does the batch
dimension amortize the descriptor/plan overheads that make K=32
descriptor-bound?

Reference analogue: sddmm_gpu_batch (src/sddmmKernel.cu:2764-2850) runs
Z problems sharing one mask over grid.z — the multi-head attention case.
Here: make_batched_sddmm_fn (vmap on XLA / lax.map on pallas) at K=32,
Z in {1, 8}, per-head GFLOPS compared to the single-run rate.
"""
import argparse
import json
import sys
import time

import numpy as np


def main() -> int:
    from bsmr_sddmm_tpu.utils.hostmem import tune_malloc
    tune_malloc()   # packing is allocation-bound here (PERF.md)
    p = argparse.ArgumentParser()
    p.add_argument("--k", type=int, default=32)
    p.add_argument("--zs", type=int, nargs="*", default=[1, 8])
    p.add_argument("--deltas", type=float, nargs="*",
                   default=[0.002, 0.02])
    p.add_argument("--out", default="results/v5e_r3/batched_smallk.json")
    p.add_argument("--limit", type=int, default=4,
                   help="number of suite matrices (CPU smoke: 1)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from bsmr_sddmm_tpu.config import SddmmConfig
    from bsmr_sddmm_tpu.datasets import SUITE
    from bsmr_sddmm_tpu.formats import make_dense
    from bsmr_sddmm_tpu.ops.sddmm import (device_plan,
                                          make_batched_sddmm_fn,
                                          make_sddmm_body)
    from bsmr_sddmm_tpu.sddmm import BsmrSddmm
    from bsmr_sddmm_tpu.utils.timing import time_tier_inprogram

    K = args.k
    rows = []
    for name, gen in SUITE[:args.limit]:
        csr = gen()
        cfg = SddmmConfig(k=K, panel_height=32)
        pipe = BsmrSddmm(csr, cfg)
        best = {}
        for Z in args.zs:
            rng = np.random.default_rng(0)
            A = rng.normal(size=(Z, csr.rows, K)).astype(np.float32)
            Bt = rng.normal(size=(Z, csr.cols, K)).astype(np.float32)
            A1, Bt1 = A[0], Bt[0]
            for delta in args.deltas:
                plan = pipe.plan(0.3, delta, k=K)
                body = make_sddmm_body(plan, cfg, emit="rphm")
                dplan = device_plan(plan, emit="rphm")
                if Z == 1:
                    from bsmr_sddmm_tpu.utils.timing import \
                        time_rphm_inprogram
                    arms = [("single", None, time_rphm_inprogram(
                        body, jnp.asarray(A1), jnp.asarray(Bt1), dplan,
                        dense_opaque=True))]
                else:
                    # both batch arms, in-program timed: the default
                    # vmap-of-XLA-body (gathers stay single big takes
                    # with a batch dim) and the opt-in lax.map of the
                    # pallas hybrid (its scan puts row gathers inside a
                    # scan — the measured v5e pathology — measured here
                    # so the comparison is recorded, not assumed)
                    from bsmr_sddmm_tpu.ops.sddmm import \
                        make_sddmm_body as _mk, resolve_backend
                    arms = []
                    bodies = {"vmap_xla": jax.vmap(
                        _mk(plan, cfg, "xla", emit="rphm"),
                        in_axes=(0, 0, None))}
                    if resolve_backend(cfg.backend) == "pallas":
                        def bat_pallas(a, b, d):
                            return jax.lax.map(
                                lambda ab: body(ab[0], ab[1], d), (a, b))
                        bodies["map_pallas"] = bat_pallas
                    for arm, bat in bodies.items():
                        opaque_arm = arm == "map_pallas"

                        def probe_body(a, b, d, bat=bat,
                                       opq=opaque_arm):
                            dd, pp, g, r = bat(a, b, d)
                            # pallas map: first+last elements keep every
                            # scanned opaque call live. XLA vmap: full
                            # sums (partial consumption of a vmapped dot
                            # could legally narrow it).
                            dprobe = (dd.ravel()[0] + dd.ravel()[-1]
                                      if opq else jnp.sum(dd) * 1e-30)
                            pprobe = (pp.ravel()[0] if pp.size else 0.0)
                            return (dprobe + pprobe * 1e-30
                                    + jnp.sum(g) * 1e-30 + jnp.sum(r))

                        arms.append((arm, bat, time_tier_inprogram(
                            probe_body, jnp.asarray(A), jnp.asarray(Bt),
                            dplan, opaque=True)))
                for arm, _, ms in arms:
                    per_head_ms = ms / Z
                    gf = 2.0 * csr.nnz * K / (per_head_ms * 1e6)
                    key = f"z{Z}" if Z == 1 else f"z{Z}_{arm}"
                    if gf > best.get(key, 0.0):
                        best[key] = round(gf, 1)
                    print(f"{name} Z={Z} d={delta} {arm}: "
                          f"{gf:.0f} GFLOPS/head ({ms:.3f} ms total)",
                          flush=True)
        rows.append({"matrix": name, "nnz": csr.nnz, **best})

    def geo(key):
        vals = [r[key] for r in rows if r.get(key)]
        return round(float(np.exp(np.mean(np.log(vals)))), 1) \
            if vals else 0.0

    out = {
        "metric": f"batched_smallk_k{K}",
        "note": ("per-head GFLOPS, best over delta; Z heads share one "
                 "mask/plan (reference sddmm_gpu_batch semantics)"),
        "rows": rows,
        "geomean_per_head": {
            key: geo(key)
            for key in sorted({k for r in rows for k in r
                               if k.startswith("z")})},
    }
    import os
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["geomean_per_head"]))
    return 0


if __name__ == "__main__":
    sys.exit(main())
