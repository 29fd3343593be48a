"""Weak scaling of the real sharded SDDMM on the virtual CPU mesh.

The box has ONE real TPU chip; multi-chip scaling is validated
structurally on an 8-virtual-device CPU mesh. NOTE: this host has a
single CPU core, so all 8 virtual devices timeshare one core — measured
"efficiency" reflects host-core throughput, not ICI/device scaling, and
observed wall time grows SUPERLINEARLY with total work (2x work measured
~3.8x time at n=2: the single core also pays per-device XLA runtime
scheduling and cache pressure). The wall numbers are therefore
non-evidence for device scaling either way; the meaningful evidence is
(a) per-shard shapes/compile stay constant as the mesh grows, and
(b) the hot path adds NO collectives (replicated B) — both asserted in
tests/test_harness.py::test_weak_scaling_real_sddmm.
"""
import json
import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
import jax
jax.config.update("jax_platforms", "cpu")

from bsmr_sddmm_tpu.config import SddmmConfig
from bsmr_sddmm_tpu.parallel import distributed

cfg = SddmmConfig(k=64, panel_height=32)
res = distributed.sddmm_weak_scaling(
    [1, 2, 4, 8], rows_per_device=4096, nnz_per_device=250_000,
    cols=8192, k=64, bandwidth=128, config=cfg, iterations=4)
out = {str(n): {k: float(v) for k, v in d.items()}
       for n, d in res.items()}
payload = {
    "metric": "virtual_mesh_weak_scaling",
    "host_cores": os.cpu_count(),
    "note": ("8 virtual devices timeshare ONE host core; efficiency "
             "reflects host throughput, not device scaling. Constant "
             "per-shard work + zero hot-path collectives are the "
             "structural evidence."),
    "per_device": out,
}
print(json.dumps(payload, indent=1))
os.makedirs("results/v5e_r3", exist_ok=True)
with open("results/v5e_r3/weak_scaling_virtual.json", "w") as f:
    json.dump(payload, f, indent=1)
