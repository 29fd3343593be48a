"""Hardware replica suite: shape-matched SuiteSparse replicas,
mirroring the reference's committed-results methodology
(scripts/results_suiteSparse_dataset/k128/): best over an
alpha x delta sweep per matrix, gather_dot everywhere, bcoo where it
compiles, validation on every run.

Runs IN-PROCESS by default: on this environment the first Pallas/Mosaic
compile in a fresh process pays a ~6-minute tunnel warmup, which makes
the subprocess-per-matrix harness (bsmr-run-suite, the reference's
test_script.sh semantics — still available via --isolate) impractical
for a 30+-matrix sweep. Logs use the same append-only [key : value]
schema either way, so bsmr-analyze consumes them identically.
"""
import argparse
import os
import sys
import time


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--count", type=int, default=32)
    p.add_argument("--max-nnz", type=int, default=2_500_000)
    p.add_argument("--dataset-dir", default="/tmp/replica_dataset")
    p.add_argument("--log-dir", default="/tmp/replica_logs")
    p.add_argument("--configs", type=str, nargs="*",
                   default=["0.002:0", "0.002:12", "0.02:12"],
                   help="delta:subpack_min_nnz pairs swept per matrix "
                        "(best-of, like the reference's alpha x delta "
                        "sweep; the packed tier competes as its own arm)")
    p.add_argument("--deltas", type=float, nargs="*", default=None,
                   help="override: sweep these deltas at the default "
                        "subpack setting")
    p.add_argument("--alphas", type=float, nargs="*", default=[0.1, 0.3],
                   help="best-over-(alpha x delta) per matrix, the "
                        "reference's committed methodology "
                        "(analyze_results.cpp:316-331); alphas whose "
                        "row permutation duplicates an earlier one are "
                        "skipped")
    p.add_argument("--baselines", nargs="*", default=["gather_dot"])
    p.add_argument("--bcoo-max-n", type=int, default=20000,
                   help="also run the bcoo baseline on matrices with "
                        "N below this (its XLA compile is minutes-slow "
                        "at large N)")
    p.add_argument("--isolate", action="store_true",
                   help="subprocess-per-run via bsmr-run-suite")
    p.add_argument("--timeout", type=float, default=1200.0)
    p.add_argument("--no-skip-existing", action="store_true",
                   help="by default a matrix whose BSMR log already "
                        "exists in --log-dir is skipped, so a killed "
                        "sweep resumes where it stopped (the analyzer "
                        "dedups best-per-matrix over appended records, "
                        "the reference's re-run-and-merge semantics — "
                        "analyze_results.cpp:1340-1360); pass this to "
                        "force re-running everything")
    p.add_argument("--stop-file", default="/tmp/replica_suite.stop",
                   help="graceful shutdown: create this file and the "
                        "sweep stops after the current matrix (never "
                        "kill the process mid-device-call — a killed "
                        "call wedges the device tunnel)")
    p.add_argument("--auto-arm", action="store_true",
                   help="also run the autotuner's own (alpha, delta, "
                        "subpack) pick per matrix as an extra arm in "
                        "the same log - suite-scale evidence for the "
                        "adaptive path (fraction-of-swept-best is "
                        "printed per matrix)")
    p.add_argument("--fp16-arm", action="store_true",
                   help="after the config sweep, re-run each matrix's "
                        "best config with out_dtype=float16 (validated "
                        "against the fp64 oracle); logs go to "
                        "<log-dir>_fp16 so the analyzer never mixes "
                        "them with the fp32 bsmr method")
    p.add_argument("-k", type=int, default=128)
    p.add_argument("--max-rss-gb", type=float, default=80.0,
                   help="exit 3 (clean resume point) when host RSS "
                        "exceeds this between matrices: the axon tunnel "
                        "retains every h2d byte in RSS (platform leak, "
                        "PERF.md round 4), so long sweeps must recycle "
                        "the process; scripts/run_suite_resumable.sh "
                        "relaunches while rc==3")
    args = p.parse_args()

    from bsmr_sddmm_tpu.formats import save_mtx
    from bsmr_sddmm_tpu.replicas import (make_replica,
                                         make_replica_cached,
                                         select_suite)
    from bsmr_sddmm_tpu.utils.hostmem import tune_malloc
    tune_malloc()   # packing is allocation-bound on this host (PERF.md)
    from bsmr_sddmm_tpu.utils.compilecache import enable_compile_cache
    enable_compile_cache()   # reuse XLA executables across runs

    if args.deltas is not None:
        configs = [(d, 12) for d in args.deltas]
    else:
        configs = [(float(c.split(":")[0]), int(c.split(":")[1]))
                   for c in args.configs]
    specs = select_suite(count=args.count, max_nnz=args.max_nnz)
    os.makedirs(args.dataset_dir, exist_ok=True)
    os.makedirs(args.log_dir, exist_ok=True)

    if args.isolate:
        from bsmr_sddmm_tpu.bench.runner import run_suite
        paths = []
        for s in specs:
            path = os.path.join(args.dataset_dir, f"{s.name}.mtx")
            if not os.path.exists(path):
                save_mtx(path, make_replica(s))
            paths.append(path)
        statuses = run_suite(paths, args.log_dir, ks=(args.k,),
                             alphas=tuple(args.alphas),
                             deltas=tuple(d for d, _ in configs),
                             baselines=args.baselines, backend="auto",
                             validate=True, fast_bench=True,
                             timeout_s=args.timeout)
        bad = [s for s in statuses if s["returncode"] != 0]
        print(f"{len(statuses) - len(bad)}/{len(statuses)} runs ok")
        return 1 if bad else 0

    # in-process: one tunnel warmup for the whole sweep
    from bsmr_sddmm_tpu.baselines import benchmark_baseline
    from bsmr_sddmm_tpu.config import SddmmConfig
    from bsmr_sddmm_tpu.formats import make_dense
    from bsmr_sddmm_tpu.sddmm import BsmrSddmm

    import numpy as np
    import jax.numpy as jnp

    K = args.k
    n_fail = 0

    def with_retry(fn, what, tries=4):
        import time as _t
        for attempt in range(tries):
            try:
                return fn()
            except Exception as e:
                msg = repr(e)
                transient = ("FAILED_PRECONDITION" in msg
                             or "INTERNAL" in msg or "UNAVAILABLE" in msg)
                if not transient or attempt == tries - 1:
                    raise
                wait = 120 * (attempt + 1)
                print(f"    {what}: transient device error, retry in "
                      f"{wait}s ({msg[:80]})", flush=True)
                _t.sleep(wait)

    for i, s in enumerate(specs):
        if args.stop_file and os.path.exists(args.stop_file):
            print(f"stop file {args.stop_file} present; stopping after "
                  f"{i}/{len(specs)} matrices", flush=True)
            break
        name = f"{s.name}.mtx"
        logpath_probe = os.path.join(args.log_dir, f"BSMR_{s.name}.log")
        if not args.no_skip_existing and os.path.exists(logpath_probe):
            print(f"[{i+1}/{len(specs)} {s.name}] skip (log exists)",
                  flush=True)
            continue
        from bsmr_sddmm_tpu.utils.hostmem import rss_gb
        rss = rss_gb()
        if rss > args.max_rss_gb:
            print(f"RSS {rss:.1f} GB > {args.max_rss_gb} GB after "
                  f"{i}/{len(specs)} matrices; exiting 3 for a clean "
                  f"restart (resume skips existing logs)", flush=True)
            return 3
        t0 = time.time()
        csr = make_replica_cached(s, args.dataset_dir)
        # ONE h2d upload per matrix (axon retains every uploaded byte
        # in host RSS; benchmark() accepts device-resident operands)
        A = jnp.asarray(make_dense(csr.rows, K, seed=1337))
        B = jnp.asarray(np.ascontiguousarray(
            make_dense(K, csr.cols, seed=1338).T))   # (N, K)
        base_cfg = SddmmConfig(k=K, panel_height=32, num_iterations=10,
                               reorder_cache=True)
        pipes = {sub: BsmrSddmm(csr, base_cfg.replace(subpack_min_nnz=sub))
                 for sub in {c[1] for c in configs}}
        pipe0 = next(iter(pipes.values()))
        logpath = os.path.join(args.log_dir, f"BSMR_{s.name}.log")
        # dedup alphas that reorder identically (identical plans)
        alphas, seen_perms = [], set()
        for alpha in args.alphas:
            try:
                key = hash(pipe0._row_reordering(alpha).row_perm.tobytes())
            except Exception:
                alphas.append(alpha)
                continue
            if key not in seen_perms:
                seen_perms.add(key)
                alphas.append(alpha)
        for sub in pipes:
            pipes[sub]._row_cache = pipe0._row_cache  # share reorderings
        validated_subs = set()
        best_run = None   # (gflops, alpha, delta, sub)
        for alpha in alphas:
            for delta, sub in configs:
                pipe = pipes[sub]
                # the fp64 oracle costs seconds per multi-M-nnz matrix on
                # this 1-core host: validate one config per (matrix,
                # subpack arm) — every matrix checked on both tier mixes
                validate = sub not in validated_subs
                validated_subs.add(sub)
                try:
                    log = with_retry(
                        lambda: pipe.benchmark(A, B, alpha=alpha,
                                               delta=delta,
                                               validate=validate,
                                               time_csr_emit=False,
                                               file=name),
                        f"{s.name} a={alpha} d={delta}")
                    with open(logpath, "a") as f:
                        f.write(log.to_text())
                    # only a validated-and-failed check counts as a
                    # failure ("untested" = validation deliberately
                    # skipped on this config, see the validate comment)
                    n_fail += 1 if log.check_result == "fail" else 0
                    if (best_run is None
                            or log.gflops > best_run[0]):
                        best_run = (log.gflops, alpha, delta, sub)
                    print(f"[{i+1}/{len(specs)} {s.name} a={alpha} "
                          f"d={delta} sub={sub}] {log.gflops:.0f} GFLOPS "
                          f"({log.sddmm_ms:.3f} ms, fill "
                          f"{log.average_tile_density:.4f}) check="
                          f"{log.check_result} "
                          f"ref={s.ref_bsmr_gflops.get(K)}"
                          f" {time.time()-t0:.0f}s", flush=True)
                except Exception as e:  # keep sweeping (isolation)
                    n_fail += 1
                    print(f"[{i+1}/{len(specs)} {s.name} a={alpha} "
                          f"d={delta} sub={sub}] FAILED: {e!r}",
                          flush=True)
        if args.auto_arm:
            # the autotuner's own pick as one more arm in the same log:
            # suite-scale evidence for the adaptive path (reference
            # behavior is the hardware test-mode sweep; ours prices the
            # (alpha, delta, subpack) grid host-side). Runs with
            # subpack candidates enabled regardless of the swept grid.
            try:
                pipe_auto = BsmrSddmm(csr, base_cfg.replace(
                    subpack_min_nnz=12))
                pipe_auto._row_cache = pipe0._row_cache
                loga = with_retry(
                    lambda: pipe_auto.benchmark(
                        A, B, alpha="auto", delta="auto",
                        validate=False, time_csr_emit=False, file=name),
                    f"{s.name} auto")
                with open(logpath, "a") as f:
                    f.write(loga.to_text())
                frac = (loga.gflops / best_run[0]
                        if best_run and best_run[0] else float("nan"))
                if best_run is None or loga.gflops > best_run[0]:
                    best_run = (loga.gflops, loga.alpha, loga.delta, 12)
                print(f"    auto a={loga.alpha} d={loga.delta}: "
                      f"{loga.gflops:.0f} GFLOPS "
                      f"({frac:.2f}x of swept best)", flush=True)
            except Exception as e:
                print(f"    auto FAILED: {e!r}", flush=True)
        if args.fp16_arm and best_run is not None:
            # fp16-emission arm on the matrix's best config, VALIDATED —
            # per-matrix hardware evidence that the narrow store passes
            # the reference tolerance (SddmmConfig.out_dtype)
            _, b_alpha, b_delta, b_sub = best_run
            pipe16 = BsmrSddmm(csr, base_cfg.replace(
                subpack_min_nnz=b_sub, out_dtype="float16"))
            pipe16._row_cache = pipe0._row_cache
            try:
                log16 = with_retry(
                    lambda: pipe16.benchmark(A, B, alpha=b_alpha,
                                             delta=b_delta,
                                             validate=True,
                                             time_csr_emit=False,
                                             file=name),
                    f"{s.name} fp16")
                d16 = args.log_dir + "_fp16"
                os.makedirs(d16, exist_ok=True)
                with open(os.path.join(d16,
                                       f"BSMR_{s.name}.log"), "a") as f:
                    f.write(log16.to_text())
                n_fail += 1 if log16.check_result != "pass" else 0
                print(f"    fp16 a={b_alpha} d={b_delta} sub={b_sub}: "
                      f"{log16.gflops:.0f} GFLOPS (vs fp32 best "
                      f"{best_run[0]:.0f}) check={log16.check_result}",
                      flush=True)
            except Exception as e:
                n_fail += 1
                print(f"    fp16 FAILED: {e!r}", flush=True)
        for base in args.baselines:
            if base == "bcoo" and csr.cols > args.bcoo_max_n:
                continue
            try:
                blog = with_retry(
                    lambda: benchmark_baseline(base, csr, A, B,
                                               validate=True, file=name),
                    f"{s.name} {base}")
                with open(os.path.join(args.log_dir,
                                       f"{base}_{s.name}.log"), "a") as f:
                    f.write(blog.to_text())
                print(f"    {base}: {blog.gflops:.0f} GFLOPS "
                      f"check={blog.check_result}", flush=True)
            except Exception as e:
                print(f"    {base} FAILED: {e!r}", flush=True)
        if "bcoo" not in args.baselines and csr.cols <= args.bcoo_max_n:
            try:
                blog = with_retry(
                    lambda: benchmark_baseline("bcoo", csr, A, B,
                                               validate=True, file=name),
                    f"{s.name} bcoo")
                with open(os.path.join(args.log_dir,
                                       f"bcoo_{s.name}.log"), "a") as f:
                    f.write(blog.to_text())
                print(f"    bcoo: {blog.gflops:.0f} GFLOPS "
                      f"check={blog.check_result}", flush=True)
            except Exception as e:
                print(f"    bcoo FAILED: {e!r}", flush=True)
    print(f"done; {n_fail} failures")
    return 0


if __name__ == "__main__":
    sys.exit(main())
