"""End-to-end verification drive on the real TPU (the verify-skill
recipe as one script): library surface with the fp64 oracle, CLI
surface, all-dense / all-residual ablations, the Pallas backend,
malformed-input errors, and one model training step (custom-VJP
backward through the kernels on hardware).

Exit 0 iff every probe passes.
"""
import os
import subprocess
import sys
import tempfile


def main() -> int:
    from bsmr_sddmm_tpu.utils.hostmem import tune_malloc
    tune_malloc()   # packing is allocation-bound here (PERF.md)
    from bsmr_sddmm_tpu.utils.compilecache import enable_compile_cache
    enable_compile_cache()   # reuse XLA executables across runs
    import jax
    import numpy as np

    import bsmr_sddmm_tpu as bs

    print("devices:", jax.devices(), flush=True)
    failures = []

    S = bs.formats.random_mask(4096, 4096, 120_000, seed=7)
    path = os.path.join(tempfile.mkdtemp(), "user.mtx")
    bs.formats.save_mtx(path, S)
    A = bs.make_dense(S.rows, 128, seed=1337)
    B = bs.make_dense(128, S.cols, seed=1338)

    # library surface + ablations + pallas backend
    for tag, kw in [
        ("hybrid d=0.3", dict(delta=0.3)),
        ("all-dense d=0.0", dict(delta=0.0)),
        ("all-residual d=1.1", dict(delta=1.1)),
        ("pallas backend", dict(delta=0.3, backend="pallas")),
        ("packed sub=12", dict(delta=0.02, subpack=12)),
        ("fp16 emission", dict(delta=0.3, out_dtype="float16")),
        ("fp16 pallas", dict(delta=0.3, out_dtype="float16",
                             backend="pallas")),
    ]:
        cfg = bs.SddmmConfig(k=128, alpha=0.3, delta=kw["delta"],
                             subpack_min_nnz=kw.get("subpack", 0),
                             out_dtype=kw.get("out_dtype", "float32"))
        if "backend" in kw:
            cfg = cfg.replace(backend=kw["backend"])
        log = bs.BsmrSddmm(S, cfg).benchmark(A, B, validate=True,
                                             file="user.mtx")
        ok = log.check_result == "pass"
        print(f"{tag}: check={log.check_result} "
              f"{log.gflops:.0f} GFLOPS", flush=True)
        if not ok:
            failures.append(tag)

    # CLI surface
    r = subprocess.run(
        [sys.executable, "-m", "bsmr_sddmm_tpu.cli", "-f", path,
         "-k", "128", "-a", "0.3", "-d", "0.3", "--validate"],
        capture_output=True, text=True, env=dict(os.environ))
    cli_ok = r.returncode == 0 and "pass" in (r.stdout + r.stderr)
    print(f"cli: rc={r.returncode} pass={'pass' in (r.stdout + r.stderr)}",
          flush=True)
    if not cli_ok:
        print(r.stdout[-2000:], r.stderr[-2000:], flush=True)
        failures.append("cli")

    # malformed .mtx must raise MatrixFormatError
    bad = path.removesuffix(".mtx") + "_bad.mtx"
    with open(bad, "w") as f:
        f.write("%%MatrixMarket matrix coordinate pattern general\n"
                "4 4 2\n1 1\n9 1\n")
    try:
        bs.load_matrix(bad)
        failures.append("malformed-mtx (no error raised)")
        print("malformed-mtx: NO ERROR (fail)", flush=True)
    except bs.formats.MatrixFormatError as e:
        print(f"malformed-mtx: raised ({e})", flush=True)

    # model training step on hardware (custom-VJP backward)
    from bsmr_sddmm_tpu.models import sparse_transformer as st
    import jax.numpy as jnp
    m = st.SparseTransformer(seq_len=2048, vocab_size=64, head_dim=128,
                             num_heads=2, num_layers=1)
    fwd, dplan, _ = st.make_forward(m, window=128, stride=64)
    params = st.init_params(m)
    opt_init, step = st.make_train_step(m, fwd)
    tok = jnp.asarray(np.random.default_rng(0).integers(0, 64, 2048))
    _, _, loss = jax.jit(step)(params, opt_init(params), tok, dplan)
    finite = bool(np.isfinite(float(loss)))
    print(f"train step: loss={float(loss):.4f} finite={finite}",
          flush=True)
    if not finite:
        failures.append("train step")

    print("VERIFY", "PASS" if not failures else f"FAIL {failures}",
          flush=True)
    return 0 if not failures else 1


if __name__ == "__main__":
    sys.exit(main())
