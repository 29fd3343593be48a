"""Measure the packed sub-block tier on hardware vs the gathered tier.

For each K: build a mask whose structure lands in the probed tier, time
the tier body alone (in-program), report ns/tile and ns/nnz. Then an
end-to-end A/B on suite matrices: best-over-delta GFLOPS with subpack on
vs off.
"""
import argparse
import sys
import time

import numpy as np


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--ks", type=int, nargs="*", default=[32, 128, 256])
    p.add_argument("--skip-e2e", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from bsmr_sddmm_tpu.config import SddmmConfig
    from bsmr_sddmm_tpu.formats import make_dense, random_mask
    from bsmr_sddmm_tpu.ops.sddmm import device_plan, make_sddmm_body
    from bsmr_sddmm_tpu.pack import pack_tiles
    from bsmr_sddmm_tpu.reorder import bsmr
    from bsmr_sddmm_tpu.utils.timing import time_tier_inprogram

    # mask: 32x32 blocks at 50% fill below the BSR delta -> packed tier
    csr = random_mask(8192, 8192, 500_000, seed=5, block_rows=32,
                      block_cols=32, block_fill=0.6)

    def tier_probe(tier, cfg, k, backend):
        config = cfg.replace(k=k, backend=backend)
        reord = bsmr(csr, config)
        plan = pack_tiles(csr, reord, config)
        units = {"packed": plan.sp_panel.shape[0],
                 "gathered": plan.g_panel.shape[0],
                 "dense": plan.tile_panel.shape[0]}[tier]
        nnzs = {"packed": plan.packed_nnz, "gathered": plan.gathered_nnz,
                "dense": plan.dense_nnz}[tier]
        if not units:
            return None
        body = make_sddmm_body(plan, config, only_tier=tier)
        A = jnp.asarray(make_dense(csr.rows, k, seed=1))
        Bt = jnp.asarray(make_dense(csr.cols, k, seed=2))
        opaque = backend == "pallas" and tier in ("packed", "dense")
        ms = time_tier_inprogram(body, A, Bt, device_plan(plan, emit="rphm"),
                                 opaque=opaque)
        return dict(ms=ms, units=units, nnz=nnzs,
                    ns_per_unit=ms * 1e6 / units,
                    ns_per_nnz=ms * 1e6 / max(nnzs, 1))

    cfg_packed = SddmmConfig(panel_height=32, delta=1.1,
                             residual_tile_min_nnz=1 << 30,
                             subpack_min_nnz=12)
    cfg_gath = SddmmConfig(panel_height=32, delta=1.1,
                           residual_tile_min_nnz=16, subpack_min_nnz=0)
    for k in args.ks:
        for tier, cfg, backends in (
                ("packed", cfg_packed, ("pallas", "xla")),
                ("gathered", cfg_gath, ("xla",))):
            for backend in backends:
                t0 = time.time()
                r = tier_probe(tier, cfg, k, backend)
                if r is None:
                    print(f"K={k} {tier}/{backend}: no tiles")
                    continue
                print(f"K={k} {tier}/{backend}: {r['ns_per_unit']:.0f} "
                      f"ns/tile, {r['ns_per_nnz']:.2f} ns/nnz "
                      f"({r['units']} tiles, {r['nnz']} nnz, "
                      f"{r['ms']:.3f} ms, wall {time.time()-t0:.0f}s)",
                      flush=True)

    if args.skip_e2e:
        return 0

    # end-to-end A/B on the bench suite
    from bsmr_sddmm_tpu.datasets import SUITE
    from bsmr_sddmm_tpu.sddmm import BsmrSddmm
    deltas = (0.002, 0.006, 0.02)
    for name, gen in SUITE:
        csr2 = gen()
        A = make_dense(csr2.rows, 128, seed=1337)
        B = make_dense(128, csr2.cols, seed=1338)
        row = {}
        for label, sub in (("on", 12), ("off", 0)):
            cfg = SddmmConfig(k=128, panel_height=32,
                              subpack_min_nnz=sub)
            pipe = BsmrSddmm(csr2, cfg)
            best = 0.0
            best_log = None
            for d in deltas:
                log = pipe.benchmark(A, B, alpha=0.3, delta=d,
                                     time_csr_emit=False, file=name)
                if log.gflops > best:
                    best, best_log = log.gflops, log
            row[label] = best
            if label == "on" and best_log is not None:
                row["packed_tiles"] = best_log.num_packed_blocks
                row["packed_nnz"] = best_log.packed_nnz
        print(f"E2E {name}: subpack_on {row['on']:.0f} vs off "
              f"{row['off']:.0f} GFLOPS ({row['on']/max(row['off'],1e-9):.2f}x,"
              f" {row.get('packed_tiles', 0)} packed tiles, "
              f"{row.get('packed_nnz', 0)} nnz)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
