"""Refit the tier cost table from audit cells (offline least squares).

The model is LINEAR in its constants: for a cell with plan stats
(tiles T, fat group G, gathered Tg, residual E, contraction K),

  ms = fixed + T*(fb + fk*K) + (T/G)*(sb + sk*K)
       + Tg*(gb + gk*K) + E*(rb + rk*K)

so all nine constants solve in one weighted least squares over the audit
rows (weights 1/measured: minimizes RELATIVE error, else the big cells
dominate). Negative solutions are clamped to the checked-in defaults —
a negative rate is the fit borrowing a term it cannot see, not physics.

Prints before/after quality (geomean |log ratio| per K) and optionally
writes the refit table to the autotune disk-cache format
(--write-cache DEVICE_KIND). By default it only reports — the per-tier
hardware probe (scripts/probe_tier_calibration.py) should confirm the
attribution before the defaults move.

RESULT on the r2 audit (2026-08-18): the blind refit is WORSE than the
checked-in defaults at K<=128 (1.54/1.60/1.70 vs 1.39/1.42/1.53) and
barely better at K=256 — i.e. no setting of these nine constants
explains the data. The model is missing a STRUCTURAL term (same tile
counts, same K, 5x different per-tile cost between banded and TSOPF
masks — a matrix-dependent variable the basis doesn't carry, e.g.
per-step matmul efficiency at small fat groups or B-block locality).
The hints it does give: gathered_k wants ~2.4 ns/K (vs 0.8) and pernnz
wants a K slope (~0.011 vs 0) — "K-independent" descriptor terms are
not, at scale. Attribution needs the per-tier probe.
"""
import argparse
import json
import sys

import numpy as np


def design_row(r, k):
    T, G = r["tiles"], max(r["fat_group"], 1)
    Tg, E = r["gathered"], r["residual"]
    return [1.0,                       # fixed (ms)
            T, T * k,                  # dense floor base/k (ns)
            T / G, T / G * k,          # step base/k
            Tg, Tg * k,                # gathered base/k
            E, E * k]                  # pernnz base/k


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--audit",
                   default="results/v5e_r4/cost_model_audit.json")
    p.add_argument("--write-cache", default=None, metavar="DEVICE_KIND",
                   help="write the refit table to the autotune cost "
                        "cache for this device kind (else report only)")
    args = p.parse_args()

    from bsmr_sddmm_tpu.autotune import (V5E_COSTS, _cache_path,
                                         estimate_plan_ms)  # noqa: F401

    rows = [r for r in json.load(open(args.audit))["rows"]
            if r.get("ratio") and not r.get("windowed")]
    A = np.array([design_row(r, r["k"]) for r in rows])
    y = np.array([r["measured_ms"] for r in rows])
    w = 1.0 / y
    sol, *_ = np.linalg.lstsq(A * w[:, None], y * w, rcond=None)
    names = ["fixed_ms", "dense_floor_base_ns", "dense_floor_k_ns",
             "dense_step_base_ns", "dense_step_k_ns",
             "gathered_base_ns", "gathered_k_ns",
             "pernnz_base_ns", "pernnz_k_ns"]
    # constants are in mixed units: fixed in ms, the rest ns * count/1e6
    fit = dict(zip(names, sol))
    defaults = dict(fixed_ms=V5E_COSTS["fixed_us"] / 1e3,
                    **{n: V5E_COSTS[n] * 1e-6 for n in names[1:]})
    clamped = {}
    for n in names:
        v = fit[n]
        clamped[n] = v if v > 0 else defaults[n]
    pred0 = A @ np.array([defaults[n] for n in names])
    pred1 = A @ np.array([clamped[n] for n in names])

    def quality(pred):
        out = {}
        for k in sorted({r["k"] for r in rows}):
            sel = [i for i, r in enumerate(rows) if r["k"] == k]
            lr = np.abs(np.log(y[sel] / np.maximum(pred[sel], 1e-9)))
            out[str(k)] = round(float(np.exp(np.mean(lr))), 3)
        return out

    print("geomean |ratio| error per K (1.0 = perfect):")
    print("  defaults:", json.dumps(quality(pred0)))
    print("  refit:   ", json.dumps(quality(pred1)))
    table = {"fixed_us": round(clamped["fixed_ms"] * 1e3, 2),
             **{n: round(clamped[n] * 1e6, 4) for n in names[1:]}}
    print(json.dumps(table, indent=1))
    if args.write_cache:
        path = _cache_path(args.write_cache)
        with open(path, "w") as f:
            json.dump({k: v for k, v in table.items()
                       if k != "fixed_us"}, f)
        print("wrote", path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
