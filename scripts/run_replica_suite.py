"""Round-2 hardware suite: >=30 shape-matched SuiteSparse replicas at
K=128 through the standard harness chain (generate .mtx -> bsmr-run-suite
-> bsmr-analyze), mirroring the reference's committed-results methodology
(scripts/results_suiteSparse_dataset/k128/)."""
import argparse
import os
import sys

from bsmr_sddmm_tpu.formats import save_mtx
from bsmr_sddmm_tpu.replicas import load_manifest, make_replica, \
    select_suite
from bsmr_sddmm_tpu.bench.runner import run_suite


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--count", type=int, default=32)
    p.add_argument("--max-nnz", type=int, default=2_500_000)
    p.add_argument("--dataset-dir", default="/tmp/replica_dataset")
    p.add_argument("--log-dir", default="/tmp/replica_logs")
    p.add_argument("--deltas", type=float, nargs="*",
                   default=[0.002, 0.02])
    p.add_argument("--baselines", nargs="*",
                   default=["bcoo", "gather_dot"])
    p.add_argument("--timeout", type=float, default=1200.0)
    args = p.parse_args()

    specs = select_suite(count=args.count, max_nnz=args.max_nnz)
    os.makedirs(args.dataset_dir, exist_ok=True)
    paths = []
    for s in specs:
        path = os.path.join(args.dataset_dir, f"{s.name}.mtx")
        if not os.path.exists(path):
            csr = make_replica(s)
            save_mtx(path, csr)
            print(f"generated {s.name}: {csr.rows}x{csr.cols} "
                  f"nnz={csr.nnz} ({s.regime})", flush=True)
        paths.append(path)

    statuses = run_suite(paths, args.log_dir, ks=(128,), alphas=(0.3,),
                         deltas=tuple(args.deltas),
                         baselines=args.baselines, backend="auto",
                         validate=True, fast_bench=True,
                         timeout_s=args.timeout)
    bad = [s for s in statuses if s["returncode"] != 0]
    print(f"{len(statuses) - len(bad)}/{len(statuses)} runs ok")
    for s in bad:
        print("FAILED:", s)
    return 0


if __name__ == "__main__":
    sys.exit(main())
