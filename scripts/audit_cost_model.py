"""Offline cost-model audit: predicted vs MEASURED over the committed
replica-suite logs (results/v5e_r2/logs*), without touching the device.

For every bsmr record (matrix, K, alpha, delta) the plan is rebuilt
host-side from the cached replica + reorder caches (packing is
deterministic), priced with autotune.estimate_plan_ms, and compared to
the measured kernel ms in the log. Output: per-cell ratios + per-K and
per-regime summaries + the worst cells, as JSON — the data that tells us
WHERE the affine tier model is wrong (VERDICT r3 weak #2: K=32 banded
misses up to 2.3x) before the per-tier hardware probe lands.

Usage: PYTHONPATH=. python scripts/audit_cost_model.py \
    [--log-root results/v5e_r2] [--dataset-dir /tmp/replica_dataset] \
    [--out results/v5e_r4/cost_model_audit.json]
"""
import argparse
import collections
import glob
import json
import os
import re
import sys

import numpy as np

FIELD = re.compile(r"\[(\w+) : ([^\]]+)\]")


def parse_records(log_root):
    """-> [{file, k, alpha, delta, ms, ...}] from BSMR_*.log files."""
    recs = []
    for path in sorted(glob.glob(os.path.join(log_root, "logs*",
                                              "BSMR_*.log"))):
        for block in open(path).read().split("---New data---"):
            fields = dict(FIELD.findall(block))
            if "bsmr_sddmm" not in fields:
                continue
            recs.append(dict(
                file=fields["File"].replace(".mtx", ""),
                k=int(fields["K"]),
                alpha=float(fields["alpha"]),
                delta=float(fields["delta"]),
                ms=float(fields["bsmm_sddmm"]
                         if "bsmm_sddmm" in fields
                         else fields["bsmr_sddmm"]),
                dense_blocks=int(fields.get("numDenseBlocks", 0)),
                gathered_blocks=int(fields.get("numGatheredBlocks", 0)),
                residual_nnz=int(fields.get("residualNNZ", 0)),
            ))
    return recs


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--log-root", default="results/v5e_r2")
    p.add_argument("--dataset-dir", default="/tmp/replica_dataset")
    p.add_argument("--out", default="results/v5e_r4/cost_model_audit.json")
    p.add_argument("--subpack", type=int, default=0,
                   help="subpack_min_nnz the logged runs used (r2: 0)")
    args = p.parse_args()

    from bsmr_sddmm_tpu.utils.hostmem import tune_malloc
    tune_malloc()
    from bsmr_sddmm_tpu.autotune import estimate_plan_ms
    from bsmr_sddmm_tpu.config import SddmmConfig
    from bsmr_sddmm_tpu.replicas import load_manifest, make_replica_cached
    from bsmr_sddmm_tpu.sddmm import BsmrSddmm

    recs = parse_records(args.log_root)
    print(f"{len(recs)} measured records", flush=True)
    specs = {s.name: s for s in load_manifest()}

    pipes = {}
    rows = []
    for r in sorted(recs, key=lambda r: (r["file"], r["k"])):
        spec = specs.get(r["file"])
        if spec is None:
            continue
        if r["file"] not in pipes:
            csr = make_replica_cached(spec, args.dataset_dir)
            pipes[r["file"]] = BsmrSddmm(
                csr, SddmmConfig(k=128, panel_height=32,
                                 subpack_min_nnz=args.subpack,
                                 reorder_cache=True))
        pipe = pipes[r["file"]]
        try:
            plan = pipe.plan(r["alpha"], r["delta"], k=r["k"])
        except Exception as e:
            print(f"# {r['file']} k={r['k']} d={r['delta']}: pack "
                  f"failed ({e})", file=sys.stderr, flush=True)
            continue
        est = estimate_plan_ms(plan)
        rows.append(dict(
            matrix=r["file"], regime=spec.regime, k=r["k"],
            alpha=r["alpha"], delta=r["delta"],
            measured_ms=r["ms"], est_ms=round(est, 4),
            ratio=round(r["ms"] / est, 3) if est else None,
            tiles=int(plan.tile_panel.shape[0]),
            fat_group=int(plan.fat_group),
            gathered=int(plan.num_gathered),
            residual=int(plan.num_residual),
            windowed=plan.window_rows is not None,
        ))
        print(f"{r['file']} k={r['k']} a={r['alpha']} d={r['delta']}: "
              f"measured {r['ms']:.3f} est {est:.3f} "
              f"ratio {rows[-1]['ratio']}", flush=True)

    def summary(sel):
        ratios = np.array([x["ratio"] for x in sel if x["ratio"]])
        if not ratios.size:
            return None
        return dict(n=int(ratios.size),
                    geomean=round(float(np.exp(np.mean(np.log(ratios)))),
                                  3),
                    median=round(float(np.median(ratios)), 3),
                    p10=round(float(np.percentile(ratios, 10)), 3),
                    p90=round(float(np.percentile(ratios, 90)), 3),
                    max=round(float(ratios.max()), 3),
                    min=round(float(ratios.min()), 3))

    per_k = {str(k): summary([x for x in rows if x["k"] == k])
             for k in sorted({x["k"] for x in rows})}
    per_regime_k = {}
    for reg in sorted({x["regime"] for x in rows}):
        per_regime_k[reg] = {
            str(k): summary([x for x in rows
                             if x["k"] == k and x["regime"] == reg])
            for k in sorted({x["k"] for x in rows})}
    worst = sorted([x for x in rows if x["ratio"]],
                   key=lambda x: -abs(np.log(x["ratio"])))[:15]
    out = dict(note=("measured/est ratio per (matrix, K, alpha, delta); "
                     "ratio > 1 = model too optimistic"),
               cells=len(rows), per_k=per_k, per_regime_k=per_regime_k,
               worst=worst, rows=rows)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"per_k": per_k}, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
