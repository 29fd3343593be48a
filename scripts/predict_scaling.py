"""Commit the analytic weak-scaling predictions for the bench suite.

Multi-chip hardware is unavailable (1 chip) and virtual-mesh wall-clock
on a 1-core host is non-evidence, so the committed scaling story is the
structural model in bsmr_sddmm_tpu/parallel/scaling_model.py: per-shard
predicted kernel times from the measured v5e cost table + ring transfer
bound. Output: results/v5e_r3/scaling_model.json.
"""
import json
import os
import sys


def main() -> int:
    from bsmr_sddmm_tpu.utils.hostmem import tune_malloc
    tune_malloc()
    from bsmr_sddmm_tpu.config import SddmmConfig
    from bsmr_sddmm_tpu.datasets import SUITE
    from bsmr_sddmm_tpu.parallel.scaling_model import predict_suite

    out_path = (sys.argv[1] if len(sys.argv) > 1
                else "results/v5e_r3/scaling_model.json")
    cfg = SddmmConfig(k=128, panel_height=32, delta=0.006,
                      reorder_cache=True)
    preds = predict_suite(SUITE, cfg)
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(preds, f, indent=1)
    for name, per_n in preds.items():
        if name == "assumptions":
            continue
        effs = {n: p["predicted_efficiency_overlapped"]
                for n, p in per_n.items() if n != "layout_choice"}
        print(name, effs,
              "layout:", per_n["layout_choice"]["layout"], flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
