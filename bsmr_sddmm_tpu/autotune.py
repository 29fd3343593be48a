"""Cost-model delta selection.

The reference finds each matrix's best (alpha, delta) by running the full
sweep on hardware (scripts/run_BSMR.sh: 140 configurations per matrix).
On TPU the tier costs are stable enough to *predict*: a plan's runtime is
approximately

    T_dense * tile_ns / fat_factor  +  Tg * gathered_tile_ns
      + E * pernnz_ns  +  fixed dispatch

with the constants measured in PERF.md. ``choose_delta`` packs a handful
of candidate deltas (vectorized NumPy, no device work) and returns the
argmin — one compiled executable instead of a hardware sweep. The
constants are v5e measurements; re-measure for other generations.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

from bsmr_sddmm_tpu.config import SddmmConfig
from bsmr_sddmm_tpu.formats import CSR
from bsmr_sddmm_tpu.pack import TilePlan, pack_tiles
from bsmr_sddmm_tpu.reorder import BsmrReordering, split_columns

#: Measured v5e tier costs (PERF.md): ns per unit.
V5E_COSTS = dict(
    dense_tile_ns=130.0,      # 1-tile/step pipeline cost
    fat_discount=0.45,        # fat steps amortize per-step overhead
    gathered_tile_ns=530.0,   # 128-row gather + batched MXU matmul
    gathered_tile_big_ns=1100.0,  # past the >64MB gather cliff (windowed)
    pernnz_ns=5.3,            # two row gathers + VPU reduce
    pernnz_big_ns=9.0,        # big-operand windowed tail
    fixed_us=150.0,           # dispatch / A-permute / padding floor
)

DELTA_CANDIDATES = (0.006, 0.02, 0.05, 0.15, 0.3)


def estimate_plan_ms(plan: TilePlan,
                     costs: dict = V5E_COSTS) -> float:
    """Predicted kernel time (rphm emit) for one packed plan."""
    big = plan.window_rows is not None
    dense_ns = costs["dense_tile_ns"] * (
        costs["fat_discount"] if plan.fat_group > 1 else 1.0)
    g_ns = costs["gathered_tile_big_ns" if big else "gathered_tile_ns"]
    e_ns = costs["pernnz_big_ns" if big else "pernnz_ns"]
    total_ns = (plan.tile_panel.shape[0] * dense_ns
                + plan.num_gathered * g_ns
                + plan.num_residual * e_ns
                + costs["fixed_us"] * 1e3)
    return total_ns / 1e6


@dataclasses.dataclass
class DeltaChoice:
    delta: float
    estimated_ms: float
    plan: TilePlan
    candidates: dict  # delta -> estimated ms


def choose_delta(csr: CSR, reord: BsmrReordering, config: SddmmConfig,
                 candidates: Sequence[float] = DELTA_CANDIDATES,
                 k: Optional[int] = None) -> DeltaChoice:
    """Pack each candidate delta (host-side only) and return the one with
    the lowest predicted kernel time, along with its plan."""
    import dataclasses as _dc
    best: Optional[Tuple[float, float, TilePlan]] = None
    table = {}
    for d in candidates:
        r = split_columns(csr, _dc.replace(reord), config, delta=d)
        plan = pack_tiles(csr, r, config, k=k)
        ms = estimate_plan_ms(plan)
        table[d] = ms
        if best is None or ms < best[1]:
            best = (d, ms, plan)
    return DeltaChoice(delta=best[0], estimated_ms=best[1], plan=best[2],
                       candidates=table)
