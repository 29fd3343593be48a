"""A/B the tier_serialize barrier on the fusion-pathology cells.

Round-4 finding (results/v5e_r4/k32_anomaly_tiers.json): on banded plans
the fused 4-tier program runs up to 2.4x slower than its per-tier sum
(overlap efficiency 0.43); on TSOPF-like plans fusion wins (1.9-8x).
This probe times the fused body with and without the
lax.optimization_barrier chain (SddmmConfig.tier_serialize) on both
kinds of cell, so the arm can be adopted where it wins and left off
where fusion helps.

Usage: python scripts/probe_tier_serialize.py [out.json]
"""
import json
import sys


def main() -> int:
    from bsmr_sddmm_tpu.utils.hostmem import tune_malloc
    tune_malloc()
    from bsmr_sddmm_tpu.utils.compilecache import enable_compile_cache
    enable_compile_cache()   # reuse XLA executables across runs
    import jax.numpy as jnp

    from bsmr_sddmm_tpu.config import SddmmConfig
    from bsmr_sddmm_tpu.datasets import SUITE
    from bsmr_sddmm_tpu.formats import make_dense
    from bsmr_sddmm_tpu.ops.sddmm import device_plan, make_sddmm_body
    from bsmr_sddmm_tpu.utils.timing import time_rphm_inprogram
    from bsmr_sddmm_tpu.sddmm import BsmrSddmm

    out_path = (sys.argv[1] if len(sys.argv) > 1
                else "results/v5e_r4/tier_serialize.json")
    gens = dict(SUITE)
    # (matrix, k, alpha, delta): the measured overlap<1 cells plus one
    # overlap>1 control (community) — the arm must not regress fusion
    # wins
    cells = [
        ("banded_mesh_32k", 32, 0.3, 0.006),   # overlap 0.425
        ("banded_mesh_32k", 32, 0.3, 0.002),   # overlap 0.964
        ("banded_mesh_64k", 256, 0.3, 0.002),  # overlap 0.878 (windowed)
        ("community_16k", 128, 0.1, 0.006),    # control (fusion helps)
    ]
    rows = []
    pipes = {}
    for name, k, alpha, delta in cells:
        if name not in pipes:
            pipes[name] = BsmrSddmm(gens[name](),
                                    SddmmConfig(k=k, panel_height=32))
        pipe = pipes[name]
        csr = pipe.csr
        A = jnp.asarray(make_dense(csr.rows, k, seed=1337))
        Bt = jnp.asarray(make_dense(csr.cols, k, seed=1338))
        plan = pipe.plan(alpha, delta, k=k)
        dplan = device_plan(plan, emit="rphm")
        row = {"matrix": name, "k": k, "alpha": alpha, "delta": delta}
        for tag, cfg in [("fused", pipe.config.replace(k=k)),
                         ("serialized", pipe.config.replace(
                             k=k, tier_serialize=True))]:
            body = make_sddmm_body(plan, cfg, emit="rphm")
            ms = time_rphm_inprogram(body, A, Bt, dplan,
                                     dense_opaque=True)
            row[f"{tag}_ms"] = round(ms, 4)
            row[f"{tag}_gflops"] = round(2.0 * csr.nnz * k / (ms * 1e6),
                                         1)
        row["speedup"] = round(row["fused_ms"] / row["serialized_ms"], 3)
        rows.append(row)
        print(json.dumps(row), flush=True)
    with open(out_path, "w") as f:
        json.dump(rows, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
