"""Hybrid SDDMM execution: dense MXU tiles + sparse residual.

TPU-native replacement of the reference's dual-stream kernel pair
(src/sddmmKernel.cu): the dense path maps reordered tiles onto MXU matmuls
(reference: WMMA m16n16k8 pipeline, sddmmKernel.cu:213-351), the residual
path is a fused gather/multiply/reduce over COO entries (reference: CUDA-core
shuffle kernel, sddmmKernel.cu:1994-2104). Where the reference scatters from
tensor-core fragments inside the kernel epilogue (sddmmKernel.cu:332-350),
we scatter outside the matmul into a ``nnz+1`` vector whose trailing slot
absorbs masked/padded lanes — XLA fuses this into cheap dynamic-update ops
and the MXU loop stays pure.

Both paths live inside one jitted function, chunked with ``lax.scan`` so
live memory stays bounded regardless of tile count. The two "streams" of
the reference (sddmmKernel.cu:2555-2648) become one XLA program; overlap is
the compiler's job, and the hybrid split itself is what saves the flops.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from bsmr_sddmm_tpu.config import SddmmConfig
from bsmr_sddmm_tpu.formats import CSR
from bsmr_sddmm_tpu.pack import TilePlan

_PRECISION = {
    "default": jax.lax.Precision.DEFAULT,
    # XLA's HIGH is the same 3-pass bf16 decomposition the Pallas kernels
    # do by hand (see ops/pallas_dense._tile_matmul)
    "bf16x3": jax.lax.Precision.HIGH,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}


def resolve_backend(backend: str) -> str:
    if backend == "auto":
        return "xla" if jax.default_backend() == "cpu" else "pallas"
    return backend


class DevicePlan(NamedTuple):
    """Device-resident TilePlan arrays (reference: the h2d block at
    BSMR.cpp:252-264). ``tile_src`` is per-tile column-block ids (T,) in
    bsr mode, or gathered column ids (T, bw) in reorder mode."""

    row_perm_padded: jax.Array   # (num_panels*ph,) int32
    tile_panel: jax.Array        # (T,) int32
    tile_src: jax.Array          # (T,) cblock ids | (T, bw) col ids
    tile_scatter: jax.Array      # (T, ph, bw) int32
    sp_panel: jax.Array          # (Tp,) int32  (packed sub-block tier)
    sp_sub: jax.Array            # (Tp, S) int32 sub-block ids into Bt2
    sp_scatter: jax.Array        # (Tp, ph, bw) int32
    sp_colperm: jax.Array        # (H,) int32; Bt2 = take(Bt, sp_colperm)
    g_panel: jax.Array           # (Tg,) int32
    g_cols: jax.Array            # (Tg, bw) int32
    g_scatter: jax.Array         # (Tg, ph, bw) int32
    res_arow: jax.Array          # (E,) int32
    res_col: jax.Array           # (E,) int32
    res_out: jax.Array           # (E,) int32
    rphm_to_csr: jax.Array       # (nnz,) int32 (empty in shard-local plans)


def device_plan(plan: TilePlan, emit: str = "csr") -> DevicePlan:
    """Upload a TilePlan's arrays (reference h2d: BSMR.cpp:252-264).

    ``emit="rphm"`` uploads only what the rphm-emit body reads and
    replaces the five output-placement maps (tile/sp/g scatter, res_out,
    rphm_to_csr) with empty arrays: those maps are >95% of a plan's
    bytes ((T, ph, bw) int32 = 16 KB/tile vs 4 B/tile of gather ids) and
    the rphm hot path never touches them. This matters doubly on the
    axon tunnel, where every h2d upload's bytes are retained in host RSS
    for the life of the process (platform leak, measured round 4:
    244 MB retained per 256 MB upload; d2h is clean) — a full-grid sweep
    uploading full plans OOM-killed a 125 GB host."""
    if plan.mode != "bsr":
        tile_src = plan.tile_cols
    elif plan.fat_group > 1:
        tile_src = plan.step_cblock       # one cblock per fat step
    else:
        tile_src = plan.tile_cblock
    light = emit == "rphm"
    empty = np.zeros(0, np.int32)

    def maps(arr, fallback_shape=(0,)):
        if light:
            return jnp.asarray(empty)
        if arr is None:
            return jnp.asarray(np.zeros(fallback_shape, np.int32))
        return jnp.asarray(arr)

    return DevicePlan(
        row_perm_padded=jnp.asarray(plan.row_perm_padded),
        tile_panel=jnp.asarray(plan.tile_panel),
        tile_src=jnp.asarray(tile_src),
        tile_scatter=maps(plan.tile_scatter),
        sp_panel=jnp.asarray(plan.sp_panel if plan.sp_panel is not None
                             else np.zeros(0, np.int32)),
        sp_sub=jnp.asarray(plan.sp_sub if plan.sp_sub is not None
                           else np.zeros((0, 1), np.int32)),
        sp_scatter=maps(plan.sp_scatter,
                        (0, plan.panel_height, plan.block_width)),
        sp_colperm=jnp.asarray(
            plan.sp_colperm if plan.sp_colperm is not None
            else np.zeros(0, np.int32)),
        g_panel=jnp.asarray(plan.g_panel),
        g_cols=jnp.asarray(plan.g_cols),
        g_scatter=maps(plan.g_scatter),
        res_arow=jnp.asarray(plan.res_arow),
        res_col=jnp.asarray(plan.res_col),
        res_out=maps(plan.res_out),
        rphm_to_csr=maps(plan.rphm_to_csr),
    )


def _serialize_tiers(plan: TilePlan, config: SddmmConfig) -> bool:
    """Decide the tier_serialize arm (see SddmmConfig.tier_serialize).

    "auto" = big-gather-footprint plan (windowed, or B at/past ~48 MB
    — the near-cliff regime) whose residual tier is the predicted-
    dominant cost: the measured discriminator for XLA's fusion
    pathology (banded_mesh_64k K=256 d=0.002 runs 1.98x faster
    serialized; its d=0.006 sibling and every small-footprint control
    prefer fusion — results/v5e_r4/tier_serialize.json)."""
    mode = config.tier_serialize
    if mode in (True, "on"):
        return True
    if mode in (False, "off"):
        return False
    from bsmr_sddmm_tpu.autotune import (_big_gather_footprint,
                                         current_costs, estimate_plan_ms)
    if plan.window_rows is None and not _big_gather_footprint(plan):
        return False
    costs = current_costs()
    k = plan.k
    res_ms = plan.num_residual * (
        costs["pernnz_big_base_ns"]
        + costs["pernnz_big_k_ns"] * k) / 1e6
    total_ms = max(estimate_plan_ms(plan, costs)
                   - costs["fixed_us"] / 1e3, 1e-9)
    # 0.45 splits the two measured K=256 banded cells: d=0.002 (share
    # 0.49, serialize wins 1.98x) vs d=0.006 (share 0.40, fusion wins
    # 1.5x). Conservative on purpose — a wrong serialize costs more than
    # a missed one; force with tier_serialize="on" to experiment.
    return res_ms / total_ms > 0.45


def make_sddmm_body(plan: TilePlan, config: SddmmConfig,
                    backend: Optional[str] = None,
                    emit: str = "csr",
                    only_tier: Optional[str] = None) -> Callable:
    """Build the un-jitted hybrid SDDMM body for one TilePlan shape bucket.

    ``fn(A, Bt, dplan)`` where A is (M, K) row-major, Bt is (N, K) — i.e.
    B^T, so both operand gathers are row gathers. Output layout:

    * ``emit="csr"``: (nnz,) — the result in original CSR value order
      (the reference contract: matrixP in CSR value order,
      sddmmKernel.cu:332-350), emitted as ONE gather along the
      precomputed ``rphm_to_csr`` map.
    * ``emit="rphm"``: ``(dense_out (T, ph, bw), packed_out (Tp, ph, bw),
      gathered_out (Tg, ph, bw), res_vals (E,))`` — the values in the
      plan's own four-tier layout, no per-element reorder anywhere;
      ``TilePlan.rphm_to_csr`` is the static bijection back to CSR order.
    * ``emit="csr_scatter"``: like "csr" but via per-slot scatter with a
      trailing trash slot — slower, but non-owned slots become zeros,
      which is what the shard_map psum combine needs.

    ``only_tier`` ("dense" | "gathered" | "residual") restricts the body
    to a single tier's output (emit is ignored) — the measurement hook
    behind the per-tier time split in RunLog (the reference's analogue is
    the dense/sparse overlap-efficiency measurement,
    src/sddmmKernel.cu:2834-2844).

    Shared by the single-chip jit and the shard_map multi-chip wrapper.
    """
    backend = resolve_backend(config.backend if backend is None else backend)
    if emit not in ("csr", "csr_scatter", "rphm"):
        raise ValueError(f"unknown emit {emit!r}")
    if only_tier not in (None, "dense", "packed", "gathered", "residual"):
        raise ValueError(f"unknown only_tier {only_tier!r}")
    ph, bw, k = plan.panel_height, plan.block_width, plan.k
    num_panels = max(plan.num_panels, 1)
    T = plan.tile_panel.shape[0]
    E = plan.res_arow.shape[0]
    nnz = plan.nnz
    precision = _PRECISION[config.matmul_precision]
    # fp16 emission: fp32 MXU accumulate, narrow store — halves every
    # tier's output bytes (the dense tier's largest DMA term) and passes
    # the reference tolerance (see SddmmConfig.out_dtype)
    out_dt = (jnp.float16 if config.out_dtype == "float16"
              else jnp.float32)
    def _chunk_of(n: int, want: int) -> int:
        """Largest chunk <= want that divides n exactly (plans from
        pack.exec_size are already exact multiples; shard-local plans are
        arbitrary slices, so fall back to the gcd)."""
        import math
        c = max(8, min(want, n))
        return c if n % c == 0 else max(math.gcd(n, c), 1)

    dense_chunk = _chunk_of(T, config.dense_chunk)
    res_chunk = _chunk_of(E, config.residual_chunk)

    interpret = jax.default_backend() == "cpu"  # no Mosaic on CPU
    mode = plan.mode
    G = plan.fat_group
    if backend == "pallas":
        if mode == "bsr" and G > 1:
            from bsmr_sddmm_tpu.ops.pallas_dense import make_bsr_fat_kernel
            dense_kernel = make_bsr_fat_kernel(
                num_panels=num_panels, ph=ph, bw=bw, k=k, n_cols=plan.cols,
                fat_group=G, precision=config.matmul_precision,
                interpret=interpret, out_dtype=out_dt)
        elif mode == "bsr":
            from bsmr_sddmm_tpu.ops.pallas_dense import make_bsr_dense_kernel
            dense_kernel = make_bsr_dense_kernel(
                num_panels=num_panels, ph=ph, bw=bw, k=k, n_cols=plan.cols,
                precision=config.matmul_precision, interpret=interpret,
                out_dtype=out_dt)
        else:
            from bsmr_sddmm_tpu.ops.pallas_dense import make_dense_tile_kernel
            dense_kernel = make_dense_tile_kernel(
                num_panels=num_panels, ph=ph, bw=bw, k=k,
                chunk=dense_chunk, precision=config.matmul_precision,
                interpret=interpret, out_dtype=out_dt)
    else:
        dense_kernel = None

    n_cblocks = -(-plan.cols // bw)

    budget_bytes = config.tier_memory_mb << 20

    def dense_out_fn(A_panels, Bt, dplan):
        """Compute all dense tiles -> (T, ph, bw).

        Plan counts are exact execution-chunk multiples (pack.exec_size),
        so no runtime pad-then-slice copies happen anywhere here."""
        if backend == "pallas" and mode == "bsr":
            # the Pallas grid is the loop; the pipeline's live memory is
            # one block per operand — chunk only when the OUTPUT exceeds
            # the tier budget
            if T * ph * bw * 4 <= max(budget_bytes, 1 << 28):
                return dense_kernel(A_panels, Bt, dplan.tile_panel,
                                    dplan.tile_src)
            pchunk = -(-max(dense_chunk, 4096) // G) * G
            parts = []
            for s in range(0, T, pchunk):
                e = min(s + pchunk, T)
                parts.append(dense_kernel(
                    A_panels, Bt, jax.lax.slice_in_dim(
                        dplan.tile_panel, s, e),
                    jax.lax.slice_in_dim(dplan.tile_src, s // G, e // G)))
            return jnp.concatenate(parts, axis=0)

        if mode == "bsr" and G > 1:
            # XLA fat path: chunk over steps; one B-block gather + one
            # (C, G*ph, bw) batched matmul per chunk
            n_steps = T // G
            step_chunk = _chunk_of(n_steps, dense_chunk)
            S = n_steps // step_chunk
            npad2 = n_cblocks * bw - plan.cols
            Bt_pad2 = jnp.pad(Bt, ((0, npad2), (0, 0))) if npad2 else Bt
            B_blocks2 = Bt_pad2.reshape(n_cblocks, bw, k)

            def fat_step(_, chunk):
                cb_c, tp_c = chunk
                b = jnp.take(B_blocks2, cb_c, axis=0)       # (C, bw, K)
                a = jnp.take(A_panels, tp_c, axis=0) \
                    .reshape(step_chunk, G * ph, k)
                out = jax.lax.dot_general(
                    a, b, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    precision=precision,
                    preferred_element_type=jnp.float32)  # (C, G*ph, bw)
                return None, out.astype(out_dt)

            chunks = (dplan.tile_src.reshape(S, step_chunk),
                      dplan.tile_panel.reshape(S, step_chunk * G))
            if S == 1:
                out = fat_step(None, jax.tree.map(lambda x: x[0],
                                                  chunks))[1]
            else:
                _, out = jax.lax.scan(fat_step, None, chunks)
            return out.reshape(T, ph, bw)

        S = T // dense_chunk

        if mode == "bsr":
            npad = n_cblocks * bw - plan.cols
            Bt_pad = jnp.pad(Bt, ((0, npad), (0, 0))) if npad else Bt
            B_blocks = Bt_pad.reshape(n_cblocks, bw, k)

            def gather_b(src_c):
                # whole-block gather: 64 KB slices, near-peak HBM BW
                return jnp.take(B_blocks, src_c, axis=0)  # (C, bw, K)
        else:
            def gather_b(src_c):
                b = jnp.take(Bt, src_c.reshape(-1), axis=0)
                return b.reshape(-1, bw, k)

        if backend == "pallas":
            def matmul(b, panel_c):
                return dense_kernel(A_panels, b, panel_c)
        else:
            def matmul(b, panel_c):
                a = jnp.take(A_panels, panel_c, axis=0)    # (C, ph, K)
                return jax.lax.dot_general(
                    a, b,
                    dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    precision=precision,
                    preferred_element_type=jnp.float32,
                ).astype(out_dt)                           # (C, ph, bw)

        if backend != "pallas" and T * bw * k * 4 <= budget_bytes:
            # single-shot: one gather + one batched matmul
            return matmul(gather_b(dplan.tile_src), dplan.tile_panel)

        def dense_step(_, chunk):
            panel_c, src_c = chunk
            return None, matmul(gather_b(src_c), panel_c)

        src_shape = ((S, dense_chunk) if dplan.tile_src.ndim == 1
                     else (S, dense_chunk, bw))
        chunks = (dplan.tile_panel.reshape(S, dense_chunk),
                  dplan.tile_src.reshape(src_shape))
        if S == 1:
            out = dense_step(None, jax.tree.map(lambda x: x[0], chunks))[1]
        else:
            _, out = jax.lax.scan(dense_step, None, chunks)
            out = out.reshape(T, ph, bw)
        return out

    # --- hot-column packed tier -------------------------------------------
    Tp = plan.sp_panel.shape[0] if plan.sp_panel is not None else 0
    sw = plan.subblock_width
    S = plan.sp_sub.shape[1] if (Tp and plan.sp_sub is not None) else 0
    H_cp = (plan.sp_colperm.shape[0]
            if (Tp and plan.sp_colperm is not None) else 0)
    n_sb = H_cp // sw if sw else 0
    if backend == "pallas" and Tp:
        from bsmr_sddmm_tpu.ops.pallas_dense import make_subpack_kernel
        subpack_kernel = make_subpack_kernel(
            num_panels=num_panels, ph=ph, bw=bw, k=k, n_cols=H_cp,
            sw=sw, precision=config.matmul_precision,
            interpret=interpret, out_dtype=out_dt)
    else:
        subpack_kernel = None

    def packed_out_fn(A_panels, Bt, dplan):
        """Compute all hot-column packed tiles -> (Tp, ph, bw).

        Bt2 = take(Bt, colperm) is ONE full-bandwidth gather per call
        (hot residual columns made contiguous); each tile's B operand is
        then S contiguous (sw, K) slices of Bt2 — block DMAs instead of
        the gathered tier's 512-byte row-gather descriptors."""
        if Tp == 0:
            return jnp.zeros((0, ph, bw), out_dt)
        Bt2 = jnp.take(Bt, dplan.sp_colperm, axis=0)    # (H, K)
        if backend == "pallas":
            if Tp * ph * bw * 4 <= max(budget_bytes, 1 << 28):
                return subpack_kernel(A_panels, Bt2, dplan.sp_panel,
                                      dplan.sp_sub)
            pchunk = _chunk_of(Tp, max(dense_chunk, 4096))
            parts = []
            for s in range(0, Tp, pchunk):
                e = min(s + pchunk, Tp)
                parts.append(subpack_kernel(
                    A_panels, Bt2,
                    jax.lax.slice_in_dim(dplan.sp_panel, s, e),
                    jax.lax.slice_in_dim(dplan.sp_sub, s, e)))
            return jnp.concatenate(parts, axis=0)
        # XLA path: block-gather the sub-blocks, one batched matmul
        B_sub = Bt2.reshape(n_sb, sw, k)

        def tiles_matmul(pc, sc):
            n_t = pc.shape[0]
            b = jnp.take(B_sub, sc.reshape(-1), axis=0) \
                .reshape(n_t, bw, k)
            a = jnp.take(A_panels, pc, axis=0)       # (C, ph, K)
            return jax.lax.dot_general(
                a, b, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                precision=precision,
                preferred_element_type=jnp.float32).astype(out_dt)

        if Tp * bw * k * 4 <= budget_bytes:
            return tiles_matmul(dplan.sp_panel, dplan.sp_sub)
        pchunk = _chunk_of(Tp, dense_chunk)
        pc_big = max(pchunk, Tp // 32)
        pc_big = pc_big if Tp % pc_big == 0 else pchunk
        parts = []
        for s in range(0, Tp, pc_big):
            parts.append(tiles_matmul(
                jax.lax.slice_in_dim(dplan.sp_panel, s, s + pc_big),
                jax.lax.slice_in_dim(dplan.sp_sub, s, s + pc_big)))
        return jnp.concatenate(parts, axis=0)

    Tg = plan.g_panel.shape[0]

    fused_gathered = None
    if (config.gathered_backend == "fused" and Tg
            and plan.g_groups is None):
        # opt-in pallas arm: per-tile row DMAs issued in-kernel, double-
        # buffered under the previous tile's matmul (see
        # SddmmConfig.gathered_backend; probe_fused_gathered.py measures
        # it against the xla arm before adoption)
        from bsmr_sddmm_tpu.ops.pallas_dense import (
            make_fused_gathered_kernel)
        fused_gathered = make_fused_gathered_kernel(
            num_panels=max(num_panels, 1), ph=ph, bw=bw, k=k,
            precision=config.matmul_precision, interpret=interpret)

    def gathered_out_fn(A_panels, Bt, dplan):
        """Compute all gathered-column tiles -> (Tg, ph, bw).

        The B operand is a row gather of each tile's 128 columns — one
        take() per chunk, then a batched matmul. The tier is serialized
        (XLA runs the gather, then the matmul), so its floor is gather
        descriptor time (~584M rows/s on v5e) plus the bytes moved; the
        plain XLA dot_general formulation measured faster than both
        pallas variants tried (fp32-retile and bf16 hi/lo-pair gathers —
        bf16 blocks force Mosaic relayouts that cost more than the
        conversion traffic they save).
        """
        g_chunk = _chunk_of(Tg, dense_chunk)

        def tiles_matmul(pc, cc, B_src):
            n_t = pc.shape[0]
            b = jnp.take(B_src, cc.reshape(-1), axis=0) \
                .reshape(n_t, bw, k)
            a = jnp.take(A_panels, pc, axis=0)       # (C, ph, K)
            return jax.lax.dot_general(
                a, b, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                precision=precision,
                preferred_element_type=jnp.float32).astype(out_dt)

        if plan.g_groups is not None and plan.num_gathered:
            # windowed gathers: each static (base, start, end) group of
            # window-pure tiles gathers from the static window slice
            # Bt[base : base + window_rows] (the >64 MB gather cliff)
            W = plan.window_rows
            parts = []
            for base, s0, e0 in plan.g_groups:
                window = jax.lax.slice_in_dim(Bt, base, base + W)
                for c0 in range(s0, e0, g_chunk):
                    c1 = min(c0 + g_chunk, e0)
                    pc = jax.lax.slice_in_dim(dplan.g_panel, c0, c1)
                    cc = jax.lax.slice_in_dim(dplan.g_cols, c0, c1) - base
                    parts.append(tiles_matmul(pc, cc, window))
            tail = Tg - plan.num_gathered
            if tail:
                parts.append(jnp.zeros((tail, ph, bw), out_dt))
            return jnp.concatenate(parts, axis=0)

        if fused_gathered is not None:
            # in-kernel DMA gather overlapped with the MXU (opt-in arm)
            return fused_gathered(
                A_panels.astype(jnp.float32), Bt,
                dplan.g_panel, dplan.g_cols.reshape(-1)).astype(out_dt)

        if Tg * bw * k * 4 <= budget_bytes:
            # single-shot: one row gather + one batched matmul (measured
            # ~15-25% faster than the chunked scan on v5e)
            return tiles_matmul(dplan.g_panel, dplan.g_cols, Bt)

        # above budget: UNROLLED chunk loop, never lax.scan — scanned row
        # gathers collapse to ~85 M rows/s on v5e (vs ~345 single-shot;
        # independent unrolled chunks pipeline normally)
        gc = max(g_chunk, Tg // 32)   # cap the unroll length
        gc = gc if Tg % gc == 0 else g_chunk
        parts = []
        for s in range(0, Tg, gc):
            pc = jax.lax.slice_in_dim(dplan.g_panel, s, s + gc)
            cc = jax.lax.slice_in_dim(dplan.g_cols, s, s + gc)
            parts.append(tiles_matmul(pc, cc, Bt))
        return jnp.concatenate(parts, axis=0)

    def res_vals_fn(A_perm, Bt, dplan):
        """Compute all residual values -> (E,)."""
        def dots(arow_c, col_c, B_src):
            a = jnp.take(A_perm, arow_c, axis=0)   # (C, K)
            b = jnp.take(B_src, col_c, axis=0)     # (C, K)
            return jnp.sum(a * b, axis=-1).astype(out_dt)  # fp32 VPU acc

        if plan.res_groups is not None and plan.num_residual:
            # windowed gathers on either/both operands (gather cliff)
            Wb = plan.window_rows
            Wa = plan.a_window_rows
            parts = []
            for a_base, b_base, s0, e0 in plan.res_groups:
                B_src = (jax.lax.slice_in_dim(Bt, b_base, b_base + Wb)
                         if b_base >= 0 else Bt)
                A_src = (jax.lax.slice_in_dim(A_perm, a_base,
                                              a_base + Wa)
                         if a_base >= 0 else A_perm)
                for c0 in range(s0, e0, res_chunk):
                    c1 = min(c0 + res_chunk, e0)
                    ar = jax.lax.slice_in_dim(dplan.res_arow, c0, c1)
                    rc = jax.lax.slice_in_dim(dplan.res_col, c0, c1)
                    if a_base >= 0:
                        ar = ar - a_base
                    if b_base >= 0:
                        rc = rc - b_base
                    a = jnp.take(A_src, ar, axis=0)
                    b = jnp.take(B_src, rc, axis=0)
                    parts.append(jnp.sum(a * b, axis=-1).astype(out_dt))
            tail = E - plan.num_residual
            if tail:
                parts.append(jnp.zeros(tail, out_dt))
            return jnp.concatenate(parts)

        if E * k * 4 * 2 <= budget_bytes:
            return dots(dplan.res_arow, dplan.res_col, Bt)

        # unrolled chunks (same scanned-gather pathology as the gathered
        # tier — see gathered_out_fn)
        rc = max(res_chunk, E // 32)
        rc = rc if E % rc == 0 else res_chunk
        parts = []
        for s in range(0, E, rc):
            ar = jax.lax.slice_in_dim(dplan.res_arow, s, s + rc)
            cl = jax.lax.slice_in_dim(dplan.res_col, s, s + rc)
            parts.append(dots(ar, cl, Bt))
        return jnp.concatenate(parts)

    def fn(A: jax.Array, Bt: jax.Array, dplan: DevicePlan):
        A = A.astype(jnp.float32)
        Bt = Bt.astype(jnp.float32)
        A_perm = jnp.take(A, dplan.row_perm_padded, axis=0)  # (P*ph, K)
        A_panels = A_perm.reshape(num_panels, ph, k)
        if only_tier == "dense":
            return dense_out_fn(A_panels, Bt, dplan)
        if only_tier == "packed":
            return packed_out_fn(A_panels, Bt, dplan)
        if only_tier == "gathered":
            return gathered_out_fn(A_panels, Bt, dplan)
        if only_tier == "residual":
            return res_vals_fn(A_perm, Bt, dplan)
        if _serialize_tiers(plan, config):
            # force tier-at-a-time scheduling: XLA's free interleaving of
            # the tiers is pathological on windowed residual-dominant
            # plans (1.98x measured, PERF.md round 4); the barrier
            # threads each tier's output into the next tier's operands
            # so the compiler cannot overlap them
            dense_out = dense_out_fn(A_panels, Bt, dplan)
            dense_out, A_panels, Bt = jax.lax.optimization_barrier(
                (dense_out, A_panels, Bt))
            packed_out = packed_out_fn(A_panels, Bt, dplan)
            packed_out, A_panels, Bt = jax.lax.optimization_barrier(
                (packed_out, A_panels, Bt))
            gathered_out = gathered_out_fn(A_panels, Bt, dplan)
            gathered_out, A_perm, Bt = jax.lax.optimization_barrier(
                (gathered_out, A_perm, Bt))
            res_vals = res_vals_fn(A_perm, Bt, dplan)
        else:
            dense_out = dense_out_fn(A_panels, Bt, dplan)
            packed_out = packed_out_fn(A_panels, Bt, dplan)
            gathered_out = gathered_out_fn(A_panels, Bt, dplan)
            res_vals = res_vals_fn(A_perm, Bt, dplan)
        if emit == "rphm":
            # four tiers, four arrays — NEVER concatenated (gluing the
            # packed tier onto the dense output would copy the whole
            # dense tier through HBM: measured +0.3 ms on an 88 MB
            # output, more than the packed tier's own compute)
            return dense_out, packed_out, gathered_out, res_vals
        if emit == "csr":
            # one gather along the precomputed inverse map — no scatter
            big = jnp.concatenate([dense_out.reshape(-1),
                                   packed_out.reshape(-1),
                                   gathered_out.reshape(-1), res_vals])
            return jnp.take(big, dplan.rphm_to_csr)
        # "csr_scatter": scatter every (padded) slot; slow, but each
        # non-owned slot lands in the trash element, which is what the
        # shard_map path needs (per-shard partials psum to the total)
        P = jnp.zeros(nnz + 1, dtype=out_dt)
        P = P.at[dplan.tile_scatter.reshape(-1)].set(
            dense_out.reshape(-1), mode="drop", unique_indices=False)
        if Tp:
            P = P.at[dplan.sp_scatter.reshape(-1)].set(
                packed_out.reshape(-1), mode="drop", unique_indices=False)
        P = P.at[dplan.g_scatter.reshape(-1)].set(
            gathered_out.reshape(-1), mode="drop", unique_indices=False)
        P = P.at[dplan.res_out].set(res_vals, mode="drop",
                                    unique_indices=False)
        return P

    return fn


def make_sddmm_fn(plan: TilePlan, config: SddmmConfig,
                  backend: Optional[str] = None,
                  emit: str = "csr") -> Callable:
    """Jitted single-device hybrid SDDMM. With ``emit="csr"`` (default):
    ``fn(A, Bt, dplan) -> P`` with P (nnz,) in original CSR value order
    (reference semantics: sddmm_gpu writes matrixP in CSR value order,
    sddmmKernel.cu:332-350). With ``emit="rphm"``: the tile-layout pair —
    see make_sddmm_body."""
    body = make_sddmm_body(plan, config, backend, emit=emit)
    nnz = plan.nnz

    if emit in ("rphm", "csr"):
        return jax.jit(body)

    def fn(A, Bt, dplan):
        return body(A, Bt, dplan)[:nnz]

    return jax.jit(fn)


def make_batched_sddmm_fn(plan: TilePlan, config: SddmmConfig,
                          backend: Optional[str] = None,
                          emit: str = "csr") -> Callable:
    """Batched hybrid SDDMM over a leading Z dimension of both operands
    (reference sddmm_gpu_batch, src/sddmmKernel.cu:2764-2850, which runs
    the batch over grid.z): ``fn(A (Z, M, K), Bt (Z, N, K), dplan)``.

    The TilePlan (mask structure) is shared across the batch — the
    reference's batch semantics. The default (``backend=None``/"auto")
    vmaps the XLA body: XLA turns the per-tile matmuls into batched MXU
    contractions and the gathered/residual row gathers stay single big
    takes with a batch dim. Explicit ``backend="pallas"`` instead runs a
    ``lax.map`` (scan) over the leading axis (vmap would insert a batch
    dimension into the kernels' BlockSpecs, which Mosaic rejects) — but
    a scan over the body puts its ROW GATHERS inside a scan too, the
    measured v5e pathology (~40-85 M rows/s vs ~345 single-shot,
    PERF.md), so the pallas batch arm is opt-in for measurement, not
    the default."""
    explicit = backend is not None and \
        resolve_backend(backend) == "pallas"
    nnz = plan.nnz
    if explicit:
        body = make_sddmm_body(plan, config, backend, emit=emit)

        def mapped(A, Bt, dplan):
            return jax.lax.map(lambda ab: body(ab[0], ab[1], dplan),
                               (A, Bt))
    else:
        body = make_sddmm_body(plan, config, "xla", emit=emit)
        mapped = jax.vmap(body, in_axes=(0, 0, None))
    if emit in ("rphm", "csr"):
        return jax.jit(mapped)

    def fn(A, Bt, dplan):
        return mapped(A, Bt, dplan)[:, :nnz]

    return jax.jit(fn)


# ---------------------------------------------------------------------------
# Reference oracle + simple baselines
# ---------------------------------------------------------------------------

def sddmm_ref(A: np.ndarray, B: np.ndarray, csr: CSR,
              chunk: int = 1 << 18) -> np.ndarray:
    """CPU oracle: P = (A @ B) sampled at the mask's nonzeros, in CSR value
    order (reference sddmm_cpu, src/host.cpp:44-91). fp64 accumulate so the
    oracle is strictly more accurate than any device path."""
    rows = csr.coo_rows()
    cols = csr.col_indices
    out = np.empty(csr.nnz, dtype=np.float64)
    Bt = np.ascontiguousarray(B.T)
    for s in range(0, csr.nnz, chunk):
        e = min(s + chunk, csr.nnz)
        out[s:e] = np.einsum(
            "ij,ij->i",
            A[rows[s:e]].astype(np.float64),
            Bt[cols[s:e]].astype(np.float64))
    return out.astype(np.float32)
