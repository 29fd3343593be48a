"""Configuration for the BSMR-SDDMM TPU pipeline.

The reference exposes its knobs as CLI flags (-f/-k/-a/-d/-t/-l, reference
include/Options.hpp:38-43) plus compile-time tile macros
(ROW_PANEL_SIZE/BLOCK_COL_SIZE = 16, include/BSMR.hpp:8-10,
COL_BLOCK_SIZE = 32, src/rowReordering.cu:13). Here every knob is a runtime
dataclass field; tile geometry is a kernel *parameter*, re-chosen for the
MXU (lane width 128) instead of WMMA's 16x16.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class SddmmConfig:
    """All knobs for one BSMR-SDDMM run.

    Defaults mirror the reference defaults (K=32, alpha=0.3, delta=0.3,
    include/Options.hpp:38-43) except for tile geometry, which is TPU-native.
    """

    # --- problem shape ---------------------------------------------------
    k: int = 32                  # contraction dim (reference -k)
    alpha: float = 0.3           # row-similarity threshold (reference -a)
    delta: float = 0.3           # block-density threshold (reference -d)

    # --- tile geometry (TPU-native) --------------------------------------
    # Row-panel height. The reference hardwires 16 (WMMA_M); on TPU the
    # tradeoff is: larger panels raise the arithmetic intensity of the
    # per-tile B-column gather (useful flops/byte ~ density * panel_height/2)
    # but dilute tile density. Keep it a parameter.
    panel_height: int = 32
    # Column-block width. Lane width of the VPU/MXU; always 128 on TPU.
    block_width: int = 128
    # Column-block granularity of the row-pattern *encoding* used for
    # clustering (reference COL_BLOCK_SIZE=32, src/rowReordering.cu:13).
    encoding_block: int = 32

    # --- numerics ---------------------------------------------------------
    # The reference computes TF32 x TF32 -> fp32 on tensor cores
    # (src/sddmmKernel.cu:310-326). TPU equivalent: "bf16x3" splits each
    # fp32 operand into hi+lo bfloat16 and runs three bf16 MXU passes
    # (ah@bh + ah@bl + al@bh) — TF32-class-or-better precision at 3x the
    # bf16 rate; passes the reference tolerance (abs 1e-5 OR rel 1e-3,
    # include/checkData.hpp:14-30) with margin. "highest" is full fp32
    # (6-pass), "default" is raw bf16 (1 pass, fails the rel-1e-3 check).
    matmul_precision: str = "bf16x3"  # "default" | "bf16x3" | "highest"
    dtype: str = "float32"
    # Output value dtype. "float16" halves the output bytes of every tier
    # (accumulation stays fp32 in the MXU; only the store narrows) and
    # still passes the reference tolerance (fp16 round-off is rel ~5e-4
    # < the 1e-3 rel gate, include/checkData.hpp:14-30) — on v5e the
    # dense tier is DMA-bound with the 16 KB fp32 output tile its single
    # largest term, so this is the one remaining dense-tier byte lever.
    # The reference stores fp32 (matrixP is float); results measured with
    # fp16 emission are always reported alongside fp32 ones.
    out_dtype: str = "float32"   # "float32" | "float16"

    # --- column split mode --------------------------------------------------
    # "bsr"     : TPU-first. No column permutation: dense tiles are the
    #             *natural* 128-wide column blocks whose in-panel nnz meets
    #             the delta threshold. B blocks are then contiguous slices
    #             of B^T — zero gather traffic, perfect DMA pipelining —
    #             and row clustering alone concentrates density. On TPU the
    #             per-tile column gather of the reference design costs more
    #             than the density it buys (HBM gathers at 512 B granularity
    #             run ~5x below peak).
    # "reorder" : reference parity (colReordering_cpu semantics,
    #             src/colReordering.cu:274-404): per-panel columns sorted by
    #             count, gathered per tile.
    col_mode: str = "bsr"

    # --- reordering strategy ----------------------------------------------
    # "exact"  : faithful greedy accumulate-encoding clustering
    #            (src/rowReordering.cu:325-432 semantics), sequential host.
    # "fast"   : greedy with one representative per round but the
    #            similarity scan vectorized over all remaining rows (and
    #            candidate-pruned) — same alpha semantics, near-identical
    #            clusters, orders of magnitude faster.
    # "none"   : identity ordering (reference noReorderRow,
    #            src/rowReordering.cu:15-46).
    row_strategy: str = "fast"
    # Use the C++/OpenMP clustering (bsmr_sddmm_tpu.native) when it can be
    # built; same semantics as the NumPy strategies, ~100x faster.
    use_native: bool = True
    # Cache row-reordering results on disk keyed by (mask pattern, alpha,
    # strategy): a re-run or resumed sweep skips the dominant
    # preprocessing cost (SURVEY.md section 5 checkpoint/resume).
    reorder_cache: bool = False

    # --- residual packing ---------------------------------------------------
    # What happens to nonzeros outside dense tiles. "gathered": pack each
    # panel's residual columns (count-descending) into 128-wide *gathered*
    # tiles executed as MXU matmuls against a take()-gathered B block, while
    # chunks too sparse to amortize a tile fall back to per-nonzero
    # gather-dot; "pernnz": everything per-nonzero (the v0 design). On TPU
    # a gathered tile moves ~bw*K*4 B-bytes + ph*bw*4 out-bytes at full
    # gather bandwidth, vs 2*K*4 bytes per nonzero at the ~4x-slower
    # 512-byte-granule rate — the crossover is ~residual_tile_min_nnz
    # nonzeros per tile (measured on TPU v5e).
    residual_mode: str = "gathered"   # "gathered" | "pernnz"
    # Gathered-tile execution arm. "xla": one take() row gather + batched
    # matmul (serialized gather -> matmul at the descriptor wall,
    # PERF.md). "fused": the pallas in-kernel-DMA kernel
    # (ops/pallas_dense.make_fused_gathered_kernel) — per-tile row DMAs
    # double-buffered under the previous tile's MXU matmul. Opt-in until
    # the hardware probe (scripts/probe_fused_gathered.py) proves it out;
    # unwindowed plans only (windowed plans keep the xla arm).
    gathered_backend: str = "xla"     # "xla" | "fused"
    # Serialize the four tiers with lax.optimization_barrier inside the
    # fused program. Round-4 hardware finding
    # (results/v5e_r4/tier_serialize.json): XLA's free interleaving of
    # the tiers is PATHOLOGICAL on windowed plans with a dominant
    # residual tier — banded_mesh_64k K=256 d=0.002 runs 1.98x faster
    # serialized (15.9 -> 8.1 ms) — while plans where fusion overlaps
    # well (TSOPF 1.9-8x, windowed d=0.006 1.5x) must stay fused.
    # "auto" serializes exactly windowed plans whose residual tier is
    # the predicted-dominant cost (the measured discriminator); "on" /
    # "off" force either arm. Bools are accepted as on/off.
    tier_serialize: object = "auto"   # "auto" | "on" | "off" | bool
    # Minimum nonzeros a gathered 128-col chunk must cover to become a
    # tile. Measured v5e rates: a gathered tile costs ~530 ns (128-row
    # B-gather at the ~584M-descriptors/s rate + 16 KB output + MXU) vs
    # ~5.3 ns per per-nnz entry -> crossover ~96.
    residual_tile_min_nnz: int = 96

    # --- sub-block packed tier ------------------------------------------
    # The tile-fill lever (SURVEY.md section 7 hard part 1): qualifying
    # subblock_width-wide *aligned* column sub-blocks of the same row
    # panel are packed S = block_width/subblock_width side-by-side into
    # one 128-lane tile. The B operand of a packed tile is S contiguous
    # (subblock_width x K) slices of B^T — block DMAs (16 KB at sw=32,
    # K=128; ~1 TB/s on v5e) instead of 512-byte row-gather descriptors —
    # so fill rises ~S-fold at near-constant per-tile bytes. Entries land
    # here when their (panel, sub-block) count reaches subpack_min_nnz
    # and the enclosing 128-wide block did NOT meet delta (the dense BSR
    # tier keeps truly dense natural blocks, whose contiguous-B reuse is
    # cheaper still). 0 disables the tier.
    subblock_width: int = 32
    subpack_min_nnz: int = 12
    # B-gather windowing. Measured on v5e: row gathers from an operand
    # >64 MB collapse ~4.5x (394 -> 87 M rows/s at 128 MB — address-range
    # locality, index order does not matter). When B exceeds
    # gather_window_mb, gathered tiles and residual entries are grouped by
    # column window at pack time and each group gathers from a static
    # gather_window_mb-sized slice of B. 0 disables.
    gather_window_mb: int = 16
    gather_window_threshold_mb: int = 64
    # Cap on window groups per side per tier. Each (window, chunk) pair
    # unrolls into its own slice+gather+matmul in the XLA program, so an
    # unbounded window count on huge-N matrices would explode compile
    # time; when N implies more windows than this, the window grows to
    # N/max_gather_groups instead (a gradual gather-rate penalty beats an
    # op-count explosion).
    max_gather_groups: int = 48

    # Max dense tiles fused per grid step in bsr mode ("fat steps"): G
    # same-column-block tiles share one B DMA and one (G*ph, bw) MXU
    # matmul, amortizing the ~210 ns/step pipeline overhead (measured
    # 78/67/58 ns/tile at G=8/16/32 on v5e). The packer picks the G
    # minimizing padded-tiles x per-tile-cost over the plan's actual
    # same-cblock run lengths. 1 disables.
    dense_fat_group: int = 32

    # --- execution --------------------------------------------------------
    # "auto"   : pallas on TPU, xla elsewhere.
    # "xla"    : gather + batched-matmul + scatter, pure XLA.
    # "pallas" : Pallas dense-tile kernel (MXU) + XLA residual.
    backend: str = "auto"
    # Tiles processed per chunk in the dense path (bounds live memory for
    # the gathered B tiles: chunk * block_width * K floats).
    dense_chunk: int = 512
    # Residual nonzeros per chunk (bounds gathered A/B rows: chunk * K).
    residual_chunk: int = 1 << 16
    # Live-intermediate budget per tier (MB). Under the budget a tier runs
    # as ONE gather + ONE batched matmul (no chunking at all — measured
    # fastest on v5e); above it, an UNROLLED chunk loop bounds live
    # memory (never lax.scan: scanned row gathers collapse to ~85 M
    # rows/s vs ~345 single-shot).
    tier_memory_mb: int = 384
    # Pad tile/residual counts up to buckets (powers of two between
    # min_bucket and exact) to bound recompilation across sweep configs.
    bucket_shapes: bool = True

    # --- benchmark --------------------------------------------------------
    num_iterations: int = 10     # timing iterations (reference Options.hpp:39)
    # Measured autotune refinement: with alpha="auto"/delta="auto", time
    # the N best-priced plans in-program on the device and pick the
    # measured argmin (autotune.choose_config refine_top). The affine
    # cost model cannot see fused-schedule overlap (0.4-8x swing,
    # PERF.md); N=3 recovers the reference's sweep-on-hardware pick
    # quality at ~3 candidate timings. 0 = pure host-side estimate.
    autotune_refine_top: int = 0

    def __post_init__(self) -> None:
        if self.k % 8 != 0:
            raise ValueError(f"k must be a multiple of 8, got {self.k}")
        if self.panel_height % 8 != 0:
            raise ValueError(
                f"panel_height must be a multiple of 8 (fp32 sublane), got "
                f"{self.panel_height}"
            )
        if self.block_width % 128 != 0:
            raise ValueError(
                f"block_width must be a multiple of 128 (lane), got "
                f"{self.block_width}"
            )
        if self.row_strategy not in ("exact", "fast", "none"):
            raise ValueError(f"unknown row_strategy {self.row_strategy!r}")
        if self.subpack_min_nnz and (
                self.subblock_width <= 0
                or self.block_width % self.subblock_width):
            raise ValueError(
                f"subblock_width ({self.subblock_width}) must divide "
                f"block_width ({self.block_width})")
        if self.col_mode not in ("bsr", "reorder"):
            raise ValueError(f"unknown col_mode {self.col_mode!r}")
        if self.residual_mode not in ("gathered", "pernnz"):
            raise ValueError(
                f"unknown residual_mode {self.residual_mode!r}")
        if self.gathered_backend not in ("xla", "fused"):
            raise ValueError(
                f"unknown gathered_backend {self.gathered_backend!r}")
        if self.tier_serialize not in ("auto", "on", "off", True, False):
            raise ValueError(
                f"unknown tier_serialize {self.tier_serialize!r}")
        if self.backend not in ("auto", "xla", "pallas"):
            raise ValueError(f"unknown backend {self.backend!r}")
        if self.matmul_precision not in ("default", "bf16x3", "high",
                                         "highest"):
            raise ValueError(
                f"unknown matmul_precision {self.matmul_precision!r}"
            )
        if self.out_dtype not in ("float32", "float16"):
            raise ValueError(f"unknown out_dtype {self.out_dtype!r}")

    @property
    def block_size(self) -> int:
        """Elements per dense tile (reference BLOCK_SIZE=256, BSMR.hpp:10)."""
        return self.panel_height * self.block_width

    def replace(self, **kw) -> "SddmmConfig":
        return dataclasses.replace(self, **kw)


# Sweep grids for test mode. Alphas and Ks mirror the reference
# (src/sddmm.cu:64-66). The delta grid prepends the TPU regime
# (0.006/0.02/0.05): on v5e the zero-gather BSR tile breaks even around
# 24 nnz/tile = delta ~0.006, and measured sweeps show 0.02 beating the
# GPU-optimal 0.3 by 2-3x on every structured regime (PERF.md) — a sweep
# that only visits the reference grid never lands in the TPU optimum.
SWEEP_ALPHAS = (0.1, 0.3, 0.5, 0.7, 0.9)
SWEEP_DELTAS = (0.006, 0.02, 0.05, 0.0, 0.1, 0.3, 0.5, 0.7, 0.9, 1.1)
SWEEP_KS = (32, 64, 128, 256)
