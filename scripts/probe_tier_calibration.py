"""Per-tier hardware timing of the cost model's divergent cells.

The offline audit (scripts/audit_cost_model.py over the committed r2
replica logs, results/v5e_r4/cost_model_audit.json) shows three
systematic misses beyond the known K=32 banded anomaly: opt-regime
(TSOPF block-dense) cells underpriced 3-7.6x at every K, K=256
underpriced across regimes (geomean measured/est 1.37), and the 150us
fixed floor overpricing sub-0.1ms matrices ~3x. This probe measures the
per-tier split (`benchmark(tier_times=True)`) on the worst audit cells
so the misses can be attributed to a tier and fitted.

Usage: python scripts/probe_tier_calibration.py \
    [--audit results/v5e_r4/cost_model_audit.json] \
    [--out results/v5e_r4/tier_calibration.json] [--top 10]
"""
import argparse
import json
import math
import os
import sys


def pick_cells(audit: dict, top: int):
    """Worst |log ratio| cells overall plus each K's worst, deduped by
    (matrix, k) — one delta per pair is enough to attribute the miss."""
    rows = [r for r in audit["rows"] if r.get("ratio")]
    rows.sort(key=lambda r: -abs(math.log(r["ratio"])))
    picked, seen = [], set()
    per_k_worst = {}
    for r in rows:
        per_k_worst.setdefault(r["k"], r)
    for r in list(per_k_worst.values()) + rows:
        key = (r["matrix"], r["k"])
        if key in seen:
            continue
        seen.add(key)
        picked.append(r)
        if len(picked) >= top:
            break
    return picked


def main() -> int:
    from bsmr_sddmm_tpu.utils.hostmem import tune_malloc
    tune_malloc()   # packing is allocation-bound here (PERF.md)
    from bsmr_sddmm_tpu.utils.compilecache import enable_compile_cache
    enable_compile_cache()   # reuse XLA executables across runs
    p = argparse.ArgumentParser()
    p.add_argument("--audit",
                   default="results/v5e_r4/cost_model_audit.json")
    p.add_argument("--out",
                   default="results/v5e_r4/tier_calibration.json")
    p.add_argument("--dataset-dir", default="/tmp/replica_dataset")
    p.add_argument("--top", type=int, default=10)
    args = p.parse_args()

    from bsmr_sddmm_tpu.autotune import estimate_plan_ms
    from bsmr_sddmm_tpu.config import SddmmConfig
    from bsmr_sddmm_tpu.formats import make_dense
    from bsmr_sddmm_tpu.replicas import load_manifest, make_replica_cached
    from bsmr_sddmm_tpu.sddmm import BsmrSddmm

    audit = json.load(open(args.audit))
    cells = pick_cells(audit, args.top)
    specs = {s.name: s for s in load_manifest()}
    out_rows = []
    pipes = {}
    for c in cells:
        spec = specs[c["matrix"]]
        if c["matrix"] not in pipes:
            csr = make_replica_cached(spec, args.dataset_dir)
            pipes[c["matrix"]] = BsmrSddmm(
                csr, SddmmConfig(k=c["k"], panel_height=32,
                                 subpack_min_nnz=0, reorder_cache=True))
        pipe = pipes[c["matrix"]]
        csr = pipe.csr
        A = make_dense(csr.rows, c["k"], seed=1337)
        B = make_dense(c["k"], csr.cols, seed=1338)
        log = pipe.benchmark(A, B, alpha=c["alpha"], delta=c["delta"],
                             tier_times=True, time_csr_emit=False,
                             file=c["matrix"])
        plan = pipe.plan(c["alpha"], c["delta"], k=c["k"])
        # Host-side structural features: exact dense-tier DMA traffic.
        # The CPU pre-analysis (PERF.md round 4) shows the worst TSOPF
        # cells move K-scaled bytes at an implied ~30 GB/s if the dense
        # tier carries the whole miss — 20x below stream rate, i.e. a
        # latency/pipelining problem, not a bandwidth misprice. These
        # fields let the fit distinguish the two on every probed cell.
        T = int(plan.tile_panel.shape[0])
        sc = plan.step_cblock
        refetch = (1 + int((sc[1:] != sc[:-1]).sum())
                   if sc is not None else T)
        ph, bw = plan.panel_height, plan.block_width
        dense_bytes = (T * ph * c["k"] * 4          # A panel DMAs
                       + refetch * bw * c["k"] * 4  # B block DMAs
                       + T * ph * bw * 4)           # out tiles
        row = {"matrix": c["matrix"], "regime": c["regime"],
               "k": c["k"], "alpha": c["alpha"], "delta": c["delta"],
               "audit_ratio": c["ratio"],
               "measured_ms": log.sddmm_ms,
               "est_ms": round(estimate_plan_ms(plan), 4),
               "tiles": T,
               "fat_group": int(plan.fat_group),
               "steps": T // max(int(plan.fat_group), 1),
               "b_refetches": refetch,
               "dense_dma_mb": round(dense_bytes / 1e6, 1),
               "num_panels": int(plan.num_panels),
               "gathered": int(plan.num_gathered),
               "residual": int(plan.num_residual),
               **{key: log.extras.get(key) for key in
                  ("tier_dense_ms", "tier_packed_ms",
                   "tier_gathered_ms", "tier_residual_ms",
                   "tier_overlap_efficiency")}}
        if row.get("tier_dense_ms"):
            row["dense_implied_gbps"] = round(
                dense_bytes / 1e6 / float(row["tier_dense_ms"]), 1)
        out_rows.append(row)
        print(json.dumps(row), flush=True)
    # --- fat-group sweep on the worst dense-heavy cell ------------------
    # If the dense tier carries the miss, is it per-STEP matmul
    # efficiency (cost should fall as G grows: bigger (G*ph, K) x
    # (K, bw) matmuls) or B-block locality (G-independent)? Time the
    # dense tier alone at forced G values.
    dense_heavy = [r for r in out_rows
                   if r.get("tier_dense_ms")
                   and float(r["tier_dense_ms"]) > 0.5 * r["measured_ms"]]
    if dense_heavy:
        import jax.numpy as jnp
        from bsmr_sddmm_tpu.ops.sddmm import device_plan, make_sddmm_body
        from bsmr_sddmm_tpu.pack import pack_tiles
        from bsmr_sddmm_tpu.utils.timing import time_tier_inprogram
        r0 = max(dense_heavy, key=lambda r: r["audit_ratio"])
        pipe = pipes[r0["matrix"]]
        csr = pipe.csr
        reord = pipe.reorder(r0["alpha"], r0["delta"])
        A = jnp.asarray(make_dense(csr.rows, r0["k"], seed=1337))
        Bt = jnp.asarray(make_dense(csr.cols, r0["k"], seed=1338))
        sweep = []
        for G in (1, 4, 8, 16, 32):
            plan = pack_tiles(csr, reord, pipe.config, k=r0["k"],
                              fat_group_override=G)
            if plan.fat_group != G:
                continue
            body = make_sddmm_body(plan, pipe.config, only_tier="dense")
            ms = time_tier_inprogram(body, A, Bt,
                                     device_plan(plan, emit="rphm"),
                                     opaque=False)
            sweep.append({"G": G,
                          "tiles": int(plan.tile_panel.shape[0]),
                          "dense_ms": round(ms, 4),
                          "ns_per_tile": round(
                              ms * 1e6 / plan.tile_panel.shape[0], 1)})
            print(json.dumps(sweep[-1]), flush=True)
        # Pallas-vs-XLA A/B on the same dense tier: if the XLA arm is
        # materially faster here, the miss is a Mosaic pipelining
        # problem on this plan geometry and the body should flip arms
        # (both arms exist behind SddmmConfig.backend).
        plan = pipes[r0["matrix"]].plan(r0["alpha"], r0["delta"],
                                        k=r0["k"])
        xla_body = make_sddmm_body(plan, pipe.config, backend="xla",
                                   only_tier="dense")
        xla_ms = time_tier_inprogram(xla_body, A, Bt,
                                     device_plan(plan, emit="rphm"),
                                     opaque=False)
        print(json.dumps({"xla_dense_ms": round(xla_ms, 4)}), flush=True)
        out_rows.append({"matrix": r0["matrix"], "k": r0["k"],
                         "alpha": r0["alpha"], "delta": r0["delta"],
                         "fat_group_sweep": sweep,
                         "xla_dense_ms": round(xla_ms, 4)})
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out_rows, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
