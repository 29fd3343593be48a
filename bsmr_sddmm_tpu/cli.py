"""CLI driver — reference parity with ./BSMR-sddmm (src/main.cu:6-42,
include/Options.hpp:49-76): `-f` matrix file, `-k` K, `-a` alpha,
`-d` delta, `-t` test mode, `-l` log dir, plus TPU-native extras
(--backend, --panel-height, --validate)."""

from __future__ import annotations

import argparse
import os
import sys



def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="bsmr-sddmm",
        description="TPU-native block-structured SDDMM (BSMR capabilities)")
    p.add_argument("-f", "--file", required=True, help="matrix file "
                   "(.mtx/.smtx/.txt, optionally .gz)")
    p.add_argument("-k", type=int, default=32, help="K dim (default 32)")
    p.add_argument("-a", "--alpha", type=float, default=0.3,
                   help="row-similarity threshold (default 0.3)")
    p.add_argument("-d", "--delta", type=float, default=0.3,
                   help="block-density threshold (default 0.3)")
    p.add_argument("-t", "--test-mode", action="store_true",
                   help="alpha x delta x K sweep (reference -t 1, "
                        "src/sddmm.cu:62-118)")
    p.add_argument("-l", "--log-dir", default="",
                   help="directory for [key : value] log files")
    p.add_argument("--backend", choices=["auto", "xla", "pallas"],
                   default="auto")
    p.add_argument("--panel-height", type=int, default=32)
    p.add_argument("--col-mode", choices=["bsr", "reorder"], default="bsr")
    p.add_argument("--residual-mode", choices=["gathered", "pernnz"],
                   default="gathered")
    p.add_argument("--row-strategy", choices=["exact", "fast", "none"],
                   default="fast")
    p.add_argument("--subpack-min-nnz", type=int, default=12,
                   help="nonzeros a 32-wide aligned column sub-block "
                        "needs to join the packed tile tier (0 disables)")
    p.add_argument("--subblock-width", type=int, default=32)
    p.add_argument("--out-dtype", choices=["float32", "float16"],
                   default="float32",
                   help="output value dtype; float16 halves every "
                        "tier's output bytes (fp32 accumulate, narrow "
                        "store) and still passes the reference "
                        "tolerance")
    p.add_argument("--validate", action="store_true",
                   help="check against the fp64 CPU oracle (reference "
                        "#define VALIDATE, src/sddmm.cu:7)")
    p.add_argument("--iterations", type=int, default=10)
    p.add_argument("--reorder-cache", action="store_true",
                   help="cache row reorderings on disk (resume sweeps "
                        "without re-clustering)")
    p.add_argument("--evaluate", action="store_true",
                   help="append reordered-vs-original tiling statistics "
                        "to the log (reference evaluationReordering)")
    p.add_argument("--tier-times", action="store_true",
                   help="measure and log the per-tier time split "
                        "(dense/gathered/residual ms + overlap "
                        "efficiency; three extra compiles)")
    p.add_argument("--fast-bench", action="store_true",
                   help="skip the separately-timed CSR-order emission "
                        "(one fewer compile per shape bucket; the rphm "
                        "headline timing and validation still run)")
    p.add_argument("--auto-delta", action="store_true",
                   help="pick delta per matrix from the measured cost "
                        "model instead of -d")
    p.add_argument("--auto-alpha", action="store_true",
                   help="also put alpha in the autotuner's choice set "
                        "(prices the full alpha x delta x subpack grid, "
                        "the reference test-mode sweep host-side; "
                        "implies --auto-delta)")
    p.add_argument("--refine-top", type=int, default=0,
                   help="with --auto-alpha/--auto-delta: re-time the N "
                        "best-priced plans on the device and pick the "
                        "measured argmin (fused-schedule overlap the "
                        "host-side cost model cannot see)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from bsmr_sddmm_tpu.config import (SWEEP_ALPHAS, SWEEP_DELTAS, SWEEP_KS,
                                       SddmmConfig)
    from bsmr_sddmm_tpu.formats import load_matrix, make_dense
    from bsmr_sddmm_tpu.sddmm import BsmrSddmm

    csr = load_matrix(args.file)
    name = os.path.basename(args.file)
    print(f"[File : {name}] [M : {csr.rows}] [N : {csr.cols}] "
          f"[NNZ : {csr.nnz}]")

    cfg = SddmmConfig(k=args.k, alpha=args.alpha, delta=args.delta,
                      panel_height=args.panel_height,
                      backend=args.backend,
                      col_mode=args.col_mode,
                      residual_mode=args.residual_mode,
                      row_strategy=args.row_strategy,
                      subpack_min_nnz=args.subpack_min_nnz,
                      subblock_width=args.subblock_width,
                      out_dtype=args.out_dtype,
                      reorder_cache=args.reorder_cache,
                      num_iterations=args.iterations,
                      autotune_refine_top=args.refine_top)
    pipe = BsmrSddmm(csr, cfg)

    if args.log_dir:
        os.makedirs(args.log_dir, exist_ok=True)

    def emit(log, tag):
        text = log.to_text()
        print(text)
        if args.log_dir:
            path = os.path.join(args.log_dir, tag + ".log")
            with open(path, "a") as f:
                f.write(text)

    if not args.test_mode:
        A = make_dense(csr.rows, args.k, seed=1337)
        B = make_dense(args.k, csr.cols, seed=1338)
        delta = "auto" if (args.auto_delta or args.auto_alpha) else None
        alpha = "auto" if args.auto_alpha else None
        log = pipe.benchmark(A, B, alpha=alpha, delta=delta,
                             validate=args.validate,
                             time_csr_emit=not args.fast_bench,
                             tier_times=args.tier_times, file=name)
        if args.evaluate:
            from bsmr_sddmm_tpu.evaluate import evaluate_reordering
            ev = evaluate_reordering(csr, cfg.replace(delta=log.delta))
            log.extras.update(ev.as_extras())
        tag_a = "auto" if args.auto_alpha else args.alpha
        tag_d = "auto" if delta == "auto" else args.delta
        emit(log, f"BSMR_k_{args.k}_a_{tag_a}_d_{tag_d}")
        return 0 if (not args.validate or log.check_result == "pass") else 1

    # test mode: sweep alpha x delta x K, row reordering reused per alpha
    # (src/sddmm.cu:62-118); log file naming matches the reference
    # (src/sddmm.cu:104-114)
    failures = 0
    for alpha in SWEEP_ALPHAS:
        for delta in SWEEP_DELTAS:
            for k in SWEEP_KS:
                A = make_dense(csr.rows, k, seed=1337)
                B = make_dense(k, csr.cols, seed=1338)
                pipe.config = cfg.replace(k=k)
                log = pipe.benchmark(A, B, alpha=alpha, delta=delta,
                                     validate=args.validate,
                                     time_csr_emit=not args.fast_bench,
                                     file=name)
                emit(log, f"BSMR_k_{k}_a_{alpha}_d_{delta}")
                if args.validate and log.check_result != "pass":
                    failures += 1
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
