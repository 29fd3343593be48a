"""Pallas dense-tile SDDMM kernel.

The MXU analogue of the reference's WMMA dense-block kernel
(sddmm_gpu_dense_block_m16n16k8_matrixA_rowMaj_matrixB_colMaj,
src/sddmmKernel.cu:213-351). Differences are deliberate TPU-first choices:

* One grid step = one (panel, column-block) tile of shape
  (panel_height, block_width); the matmul runs on the MXU at full lane
  width (128) instead of 16x16 WMMA fragments.
* The A panel is *not* gathered per tile: the scalar-prefetched
  ``tile_panel`` ids drive the BlockSpec index_map, so Pallas's automatic
  pipeline DMAs exactly the panel each tile needs (the reference stages the
  A tile through shared memory by hand, sddmmKernel.cu:277-290).
* The gathered B tile arrives pre-packed as (chunk, block_width, K); the
  gather itself is an XLA take (see ops/sddmm.py). Fusing that gather into
  the kernel via per-row DMA is a later optimization once profiling shows
  the gather dominating.
* No in-kernel scatter epilogue: results leave as dense tiles and a
  separate scatter pass places them in CSR order (the CUDA fragment
  scatter at sddmmKernel.cu:332-350 has no efficient MXU analogue).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PRECISION = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}


def _f32_to_f16_bits(x):
    """f32 -> IEEE binary16 bit pattern as int16 (round-to-nearest-even,
    subnormals, inf/NaN), in pure int32 arithmetic. Bit-exact against
    numpy over 450k values incl. specials (tests/test_sddmm.py).

    Kept as the tested reference for the in-kernel fp16-store idea,
    which hardware REFUTED (see _mosaic_out): Mosaic takes int16 stores
    and f32<->i32 bitcasts, but the i16 output relayout costs more than
    the halved store bytes save."""
    bits = jax.lax.bitcast_convert_type(x, jnp.int32)
    sign16 = jax.lax.shift_right_logical(bits, 16) & jnp.int32(0x8000)
    absb = bits & jnp.int32(0x7FFFFFFF)
    is_nan = absb > jnp.int32(0x7F800000)
    # normal/overflow path (f32 exp >= 113): rebias to f16, RNE on the
    # 13 dropped bits; the round carry walks into the exponent naturally
    # and overflow saturates to +inf via the clamp below
    rebias = absb - jnp.int32(0x38000000)
    rnd = (rebias + jnp.int32(0xFFF)
           + (jax.lax.shift_right_logical(rebias, 13) & 1))
    norm16 = jnp.minimum(jax.lax.shift_right_logical(rnd, 13),
                         jnp.int32(0x7C00))
    # subnormal path (f32 exp < 113): implicit-one mantissa shifted by
    # (126 - exp) with RNE; a round-up into 0x400 is the smallest normal
    # and the bit pattern stays correct
    exp = jax.lax.shift_right_logical(absb, 23)
    man = (absb & jnp.int32(0x7FFFFF)) | jnp.int32(0x800000)
    sh = jnp.clip(jnp.int32(126) - exp, 1, 31)
    half = jax.lax.shift_left(jnp.int32(1), sh - 1)
    q = jax.lax.shift_right_logical(man, sh)
    sub16 = jax.lax.shift_right_logical(
        man + half - 1 + (q & 1), sh)
    h = jnp.where(absb < jnp.int32(0x38800000), sub16, norm16)
    h = jnp.where(is_nan, jnp.int32(0x7E00), h)
    return (sign16 | h).astype(jnp.int16)


def _mosaic_out(out_dtype):
    """Mosaic has no f16 type, so fp16-emission kernels write fp32 and
    the wrapper casts outside the pallas_call. The in-kernel alternative
    — store IEEE f16 BIT PATTERNS as int16 (_f32_to_f16_bits) — was
    REFUTED on hardware round 4: 1.8-2.1x slower than fp32 even with
    the cheap FTZ variant, because Mosaic's i16 output relayout
    (2-per-register repacking of the (ph, bw) f32 result) overwhelms
    the halved store bytes. Returns (kernel_dtype, needs_cast)."""
    if jnp.dtype(out_dtype) == jnp.float16:
        return jnp.float32, True
    return out_dtype, False


def _f32_to_f16_bits_ftz(x):
    """Cheap in-kernel f32->f16 bits: RNE normals + overflow clamp, and
    FLUSH-TO-ZERO for |x| < 2^-14 (~10 VPU ops, no per-lane variable
    shifts). FTZ is exact for the SDDMM domain: reference-semantics
    fills are uniform [0,2), so every emitted value is a sum of K
    non-negative products — provably never in the f16 subnormal range.
    The full-IEEE _f32_to_f16_bits stays as the tested reference."""
    bits = jax.lax.bitcast_convert_type(x, jnp.int32)
    sign16 = jax.lax.shift_right_logical(bits, 16) & jnp.int32(0x8000)
    absb = bits & jnp.int32(0x7FFFFFFF)
    rnd = (absb + jnp.int32(0xFFF)
           + (jax.lax.shift_right_logical(absb, 13) & 1)
           - jnp.int32(0x38000000))
    h = jnp.minimum(jax.lax.shift_right_logical(rnd, 13),
                    jnp.int32(0x7C00))
    h = jnp.where(absb < jnp.int32(0x38800000), jnp.int32(0), h)
    return (sign16 | h).astype(jnp.int16)


def _emit(result_f32, kdt):
    """Kernel-side output emission (see _mosaic_out)."""
    return result_f32.astype(kdt)


def _from_mosaic(out, out_dtype, cast_out):
    return out.astype(out_dtype) if cast_out else out


def _tile_matmul(a, b, precision: str):
    """(ph, K) x (bw, K) -> (ph, bw), contracting K.

    "bf16x3": split each fp32 operand into hi+lo bfloat16 and take three
    bf16 MXU passes, ah@bh + ah@bl + al@bh — the TPU equivalent of the
    reference's TF32 tensor-core multiply (sddmmKernel.cu:310-326): ~11
    effective mantissa bits per operand, fp32 accumulate, and it passes the
    reference's rel-1e-3 tolerance with margin (the dropped al@bl term is
    O(2^-16) relative). Mosaic has no Precision.HIGH lowering, hence the
    manual split.
    """
    dn = (((1,), (1,)), ((), ()))
    if precision in ("bf16x3", "high"):
        ah = a.astype(jnp.bfloat16)
        al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
        bh = b.astype(jnp.bfloat16)
        bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)

        def mm(x, y):
            return jax.lax.dot_general(
                x, y, dimension_numbers=dn,
                preferred_element_type=jnp.float32)

        return mm(ah, bh) + mm(ah, bl) + mm(al, bh)
    return jax.lax.dot_general(
        a, b, dimension_numbers=dn,
        precision=_PRECISION[precision],
        preferred_element_type=jnp.float32)


def make_bsr_dense_kernel(num_panels: int, ph: int, bw: int, k: int,
                          n_cols: int, precision: str = "highest",
                          interpret: bool = False,
                          out_dtype=jnp.float32):
    """BSR-mode dense SDDMM kernel: zero gather traffic.

    Build ``fn(A_panels, Bt, tile_panel, tile_cblock) -> (T, ph, bw)``.
    Tiles are *natural* column blocks, so the B operand of tile t is the
    contiguous slice ``Bt[cblock*bw:(cblock+1)*bw]`` — both operands are
    fed by scalar-prefetch-driven BlockSpec index_maps and Pallas
    double-buffers the whole pipeline (A panel 4*ph*K bytes, B block
    4*bw*K bytes per step; at ph=32, K=128 that's 16 KB + 64 KB DMAs,
    full-bandwidth sizes). This is the design the reference *cannot* use:
    its 16x16 WMMA tiles need gathered columns to reach density, whereas
    MXU-wide natural blocks plus row clustering get density for free.
    """
    n_cblocks = -(-n_cols // bw)
    kdt, cast_out = _mosaic_out(out_dtype)

    def kernel(panel_ref, cblock_ref, a_ref, b_ref, out_ref):
        # a_ref: (1, ph, K); b_ref: (bw, K); out_ref: (1, ph, bw)
        out_ref[0] = _emit(_tile_matmul(a_ref[0], b_ref[:], precision),
                           kdt)

    def fn(A_panels: jax.Array, Bt: jax.Array, tile_panel: jax.Array,
           tile_cblock: jax.Array) -> jax.Array:
        T = tile_panel.shape[0]
        npad = n_cblocks * bw - Bt.shape[0]
        if npad:
            Bt = jnp.pad(Bt, ((0, npad), (0, 0)))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((1, ph, k),
                             lambda t, panel_ref, cblock_ref:
                             (panel_ref[t], 0, 0)),
                pl.BlockSpec((bw, k),
                             lambda t, panel_ref, cblock_ref:
                             (cblock_ref[t], 0)),
            ],
            out_specs=pl.BlockSpec((1, ph, bw),
                                   lambda t, panel_ref, cblock_ref:
                                   (t, 0, 0)),
        )
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((T, ph, bw), kdt),
            cost_estimate=pl.CostEstimate(
                flops=2 * T * ph * bw * k,
                bytes_accessed=4 * T * (ph * k + bw * k + ph * bw),
                transcendentals=0),
            interpret=interpret,
        )(tile_panel, tile_cblock, A_panels, Bt)
        return _from_mosaic(out, out_dtype, cast_out)

    return fn


def make_dense_tile_kernel(num_panels: int, ph: int, bw: int, k: int,
                           chunk: int, precision: str = "highest",
                           interpret: bool = False,
                           out_dtype=jnp.float32):
    """Build ``fn(A_panels, b_tiles, tile_panel) -> (chunk, ph, bw)``.

    A_panels: (num_panels, ph, K) fp32 — the row-permuted A, panel-major.
    b_tiles:  (chunk, bw, K) fp32 — gathered B columns, row-major in K.
    tile_panel: (chunk,) int32 — panel id per tile (scalar-prefetched).
    """
    kdt, cast_out = _mosaic_out(out_dtype)

    def kernel(panel_ref, a_ref, b_ref, out_ref):
        # a_ref: (1, ph, K) — the tile's panel, selected by index_map
        # b_ref: (1, bw, K); out_ref: (1, ph, bw)
        out_ref[0] = _emit(_tile_matmul(a_ref[0], b_ref[0], precision),
                           kdt)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(chunk,),
        in_specs=[
            pl.BlockSpec(
                (1, ph, k),
                lambda t, panel_ref: (panel_ref[t], 0, 0),
            ),
            pl.BlockSpec((1, bw, k), lambda t, panel_ref: (t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, ph, bw), lambda t, panel_ref: (t, 0, 0)),
    )

    flops = 2 * chunk * ph * bw * k
    bytes_accessed = 4 * chunk * (ph * k + bw * k + ph * bw)

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((chunk, ph, bw), kdt),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0),
        interpret=interpret,
    )

    def fn(A_panels: jax.Array, b_tiles: jax.Array,
           tile_panel: jax.Array) -> jax.Array:
        out = call(tile_panel, A_panels, b_tiles)
        return _from_mosaic(out, out_dtype, cast_out)

    return fn


# The gathered-residual tier consumes pre-gathered B tiles exactly like the
# reorder-mode dense path: same kernel, and crucially the fp32->bf16 hi/lo
# precision split happens in VMEM instead of round-tripping through HBM.
make_gathered_tile_kernel = make_dense_tile_kernel


def make_subpack_kernel(num_panels: int, ph: int, bw: int, k: int,
                        n_cols: int, sw: int,
                        precision: str = "bf16x3",
                        interpret: bool = False,
                        out_dtype=jnp.float32):
    """Sub-block packed SDDMM kernel: S = bw/sw qualifying sw-wide aligned
    column sub-blocks of one panel per 128-lane tile.

    ``fn(A_panels, Bt, sp_panel (Tp,), sp_sub (Tp, S)) -> (Tp, ph, bw)``.
    Each grid step DMAs the tile's A panel (scalar-prefetch index map)
    plus S contiguous (sw, K) B block slices — 16 KB block DMAs at
    sw=32/K=128, near-stream bandwidth, where the gathered tier pays
    512-byte row-gather descriptors — and issues one (ph, bw) MXU matmul.
    This is the tile-fill design of SURVEY.md section 7 hard-part 1: the
    reference's 16-wide gathered dense columns
    (colReordering.cu:244-271, sddmmKernel.cu:294-307) re-cast so fill
    rises ~S-fold at near-constant per-tile bytes."""
    n_sb = -(-n_cols // sw)
    S = bw // sw
    kdt, cast_out = _mosaic_out(out_dtype)

    def kernel(panel_ref, sub_ref, *refs):
        a_ref = refs[0]
        b_refs = refs[1:1 + S]
        out_ref = refs[1 + S]
        b = jnp.concatenate([br[:] for br in b_refs], axis=0)  # (bw, K)
        out_ref[0] = _emit(_tile_matmul(a_ref[0], b, precision), kdt)

    def fn(A_panels: jax.Array, Bt: jax.Array, sp_panel: jax.Array,
           sp_sub: jax.Array) -> jax.Array:
        Tp = sp_panel.shape[0]
        npad = n_sb * sw - Bt.shape[0]
        if npad:
            Bt = jnp.pad(Bt, ((0, npad), (0, 0)))
        # flatten (Tp, S) -> (Tp*S,): 2-D SMEM scalar operands are
        # lane-padded to 128 wide (32x memory waste — a 2048-tile plan
        # OOMs the 1 MB SMEM); 1-D arrays pack tight
        sp_sub_flat = sp_sub.reshape(-1)

        def b_index(s):
            return lambda t, panel_ref, sub_ref: (sub_ref[t * S + s], 0)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(Tp,),
            in_specs=(
                [pl.BlockSpec((1, ph, k),
                              lambda t, panel_ref, sub_ref:
                              (panel_ref[t], 0, 0))]
                + [pl.BlockSpec((sw, k), b_index(s)) for s in range(S)]),
            out_specs=pl.BlockSpec((1, ph, bw),
                                   lambda t, panel_ref, sub_ref:
                                   (t, 0, 0)),
        )
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((Tp, ph, bw), kdt),
            cost_estimate=pl.CostEstimate(
                flops=3 * 2 * Tp * ph * bw * k,
                bytes_accessed=4 * Tp * (ph * k + bw * k + ph * bw),
                transcendentals=0),
            interpret=interpret,
        )(sp_panel, sp_sub_flat, A_panels, *([Bt] * S))
        return _from_mosaic(out, out_dtype, cast_out)

    return fn


def make_fused_gathered_kernel(num_panels: int, ph: int, bw: int, k: int,
                               precision: str = "bf16x3",
                               interpret: bool = False):
    """Fused gathered-tile SDDMM: the per-tile 128-row B gather happens
    INSIDE the kernel via manual per-row DMAs, double-buffered against
    the previous tile's MXU matmul (VERDICT r2 next-step #3: overlap the
    gathered tier's B-gather with compute; reference analogue is the
    dual-stream overlap, sddmmKernel.cu:2555-2648).

    ``fn(A_panels, Bt, g_panel (Tg,), g_cols (Tg*bw,)) -> (Tg, ph, bw)``.
    Bt stays in HBM (memory_space=ANY); each grid step waits for its
    row set (issued one step ahead), issues the next tile's rows, and
    runs the matmul — so DMA latency hides under the MXU.

    Expected failure mode (measure before adopting): the XLA gather is
    descriptor-rate-bound (~345 M rows/s) on the DMA engine itself;
    issuing 128 copies from the scalar core per step may cost more than
    the engine's own descriptor throughput, and the matmul (~60 ns) is
    small cover. Committed either way per the measured-refutation rule.
    """
    def kernel(panel_ref, cols_ref, a_ref, b_hbm, out_ref, b_buf, sems):
        t = pl.program_id(0)
        nsteps = pl.num_programs(0)

        def issue(step, slot):
            def body(i, _):
                row = cols_ref[step * bw + i]
                pltpu.make_async_copy(
                    b_hbm.at[pl.ds(row, 1)],
                    b_buf.at[slot, pl.ds(i, 1)],
                    sems.at[slot]).start()
                return 0
            # Mosaic's for-loop lowering supports only unroll=1 or full
            jax.lax.fori_loop(0, bw, body, 0, unroll=1)

        def wait(slot):
            def body(i, _):
                pltpu.make_async_copy(
                    b_hbm.at[pl.ds(0, 1)],
                    b_buf.at[slot, pl.ds(i, 1)],
                    sems.at[slot]).wait()
                return 0
            jax.lax.fori_loop(0, bw, body, 0, unroll=1)

        @pl.when(t == 0)
        def _():
            issue(0, 0)

        @pl.when(t + 1 < nsteps)
        def _():
            issue(t + 1, (t + 1) % 2)

        wait(t % 2)
        out_ref[0] = _tile_matmul(a_ref[0], b_buf[t % 2], precision)

    def fn(A_panels: jax.Array, Bt: jax.Array, g_panel: jax.Array,
           g_cols_flat: jax.Array) -> jax.Array:
        Tg = g_panel.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(Tg,),
            in_specs=[
                pl.BlockSpec((1, ph, k),
                             lambda t, panel_ref, cols_ref:
                             (panel_ref[t], 0, 0)),
                pl.BlockSpec(memory_space=pltpu.ANY),   # Bt stays in HBM
            ],
            out_specs=pl.BlockSpec((1, ph, bw),
                                   lambda t, panel_ref, cols_ref:
                                   (t, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, bw, k), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((Tg, ph, bw), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=3 * 2 * Tg * ph * bw * k,
                bytes_accessed=4 * Tg * (ph * k + bw * k + ph * bw),
                transcendentals=0),
            interpret=interpret,
        )(g_panel, g_cols_flat, A_panels, Bt)

    return fn


def make_bsr_fat_kernel(num_panels: int, ph: int, bw: int, k: int,
                        n_cols: int, fat_group: int,
                        precision: str = "bf16x3",
                        interpret: bool = False,
                        out_dtype=jnp.float32):
    """Fat-step BSR dense kernel: G same-cblock tiles per grid step.

    ``fn(A_panels, Bt, tile_panel (T,), step_cblock (T/G,)) ->
    (T, ph, bw)``. Each step DMAs G A-panels (16 KB each, G index-mapped
    specs) plus one contiguous B block (64 KB, reused across steps that
    repeat the cblock) and issues ONE (G*ph, bw) MXU matmul — amortizing
    the ~100 ns/step pipeline overhead that dominates thin 1-tile steps
    (measured ~130 ns/tile -> ~25-70 ns/tile at G=8)."""
    n_cblocks = -(-n_cols // bw)
    G = fat_group
    kdt, cast_out = _mosaic_out(out_dtype)

    def kernel(panel_ref, cblock_ref, *refs):
        a_refs = refs[:G]
        b_ref, out_ref = refs[G], refs[G + 1]
        a = jnp.concatenate([ar[0] for ar in a_refs], axis=0)  # (G*ph, K)
        out_ref[0] = _emit(_tile_matmul(a, b_ref[:], precision), kdt)

    def fn(A_panels: jax.Array, Bt: jax.Array, tile_panel: jax.Array,
           step_cblock: jax.Array) -> jax.Array:
        T = tile_panel.shape[0]
        n_steps = T // G
        npad = n_cblocks * bw - Bt.shape[0]
        if npad:
            Bt = jnp.pad(Bt, ((0, npad), (0, 0)))

        def a_index(g):
            return lambda t, panel_ref, cblock_ref: \
                (panel_ref[t * G + g], 0, 0)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_steps,),
            in_specs=(
                [pl.BlockSpec((1, ph, k), a_index(g)) for g in range(G)]
                + [pl.BlockSpec((bw, k),
                                lambda t, panel_ref, cblock_ref:
                                (cblock_ref[t], 0))]),
            out_specs=pl.BlockSpec((1, G * ph, bw),
                                   lambda t, panel_ref, cblock_ref:
                                   (t, 0, 0)),
        )
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_steps, G * ph, bw), kdt),
            cost_estimate=pl.CostEstimate(
                flops=3 * 2 * T * ph * bw * k,
                bytes_accessed=4 * T * (ph * k + ph * bw)
                + 4 * n_steps * bw * k,
                transcendentals=0),
            interpret=interpret,
        )(tile_panel, step_cblock, *([A_panels] * G), Bt)
        out = out.reshape(T, ph, bw)
        return _from_mosaic(out, out_dtype, cast_out)

    return fn
