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
    # dense fat step: per-tile cost = floor + step_overhead / G
    # (measured 78/67/58 ns/tile at G=8/16/32)
    dense_tile_floor_ns=52.0,
    dense_step_overhead_ns=208.0,
    # sub-block packed tile: A panel + out tile + S contiguous (sw, K)
    # B block DMAs (~96 KB total at ph=32/K=128/sw=32) — initial DMA
    # estimate, refined by calibrate()
    packed_tile_ns=300.0,
    gathered_tile_ns=470.0,   # 128-row gather + batched MXU matmul
    gathered_tile_big_ns=1100.0,  # past the >64MB gather cliff (windowed)
    pernnz_ns=5.8,            # two row gathers + VPU reduce
    pernnz_big_ns=9.0,        # big-operand windowed tail
    fixed_us=150.0,           # dispatch / A-permute / padding floor
    mxu_tflops=55.0,          # bf16x3 effective fp32-class matmul rate
    stream_gbps=645.0,        # contiguous HBM read+write
    elem_gather_meps=140.0,   # 4-byte element gather (M elem/s)
    # effective rate of the dense-fallback tier (XLA sampled dense dot,
    # bcoo_dot_general_sampled): the full M*N*K product with fused
    # extraction. Measured 13-32 TFLOP/s on v5e depending on mask
    # structure; the conservative end keeps the arm from firing unless
    # it clearly wins.
    sampled_dot_tflops=13.0,
)

DELTA_CANDIDATES = (0.002, 0.006, 0.02, 0.05, 0.15, 0.3)


def estimate_dense_ms(rows: int, cols: int, nnz: int, k: int,
                      costs: dict = V5E_COSTS) -> float:
    """Predicted time for the dense-fallback tier: XLA's sampled dense
    dot computes the full M*N*K product with the mask extraction fused
    (the product is never materialized in HBM), so the cost is one
    flops term at the measured effective rate."""
    flops_ms = 2.0 * rows * cols * k / (costs["sampled_dot_tflops"] * 1e9)
    return flops_ms + costs["fixed_us"] / 1e3


def estimate_plan_ms(plan: TilePlan,
                     costs: dict = V5E_COSTS) -> float:
    """Predicted kernel time (rphm emit) for one packed plan."""
    big = plan.window_rows is not None
    dense_ns = (costs["dense_tile_floor_ns"]
                + costs["dense_step_overhead_ns"] / max(plan.fat_group, 1))
    g_ns = costs["gathered_tile_big_ns" if big else "gathered_tile_ns"]
    e_ns = costs["pernnz_big_ns" if big else "pernnz_ns"]
    total_ns = (plan.tile_panel.shape[0] * dense_ns
                + plan.num_packed * costs["packed_tile_ns"]
                + plan.num_gathered * g_ns
                + plan.num_residual * e_ns
                + costs["fixed_us"] * 1e3)
    return total_ns / 1e6


@dataclasses.dataclass
class DeltaChoice:
    delta: float
    estimated_ms: float
    plan: TilePlan
    candidates: dict  # delta -> estimated ms; key "dense" = fallback arm
    use_dense: bool = False   # dense-fallback tier beats every tiled plan


def choose_delta(csr: CSR, reord: BsmrReordering, config: SddmmConfig,
                 candidates: Sequence[float] = DELTA_CANDIDATES,
                 k: Optional[int] = None,
                 allow_dense: bool = True) -> DeltaChoice:
    """Pack each candidate delta (host-side only) and return the one with
    the lowest predicted kernel time, along with its plan.

    A fourth arm competes with every tiled plan: the dense-fallback tier
    (masked full matmul). On near-uniform masks dense enough that the MXU
    roofline beats descriptor-bound gathers, it wins — the reference's
    hybrid-ablation insight (its TC-only column sometimes beats hybrid,
    scripts/results_suiteSparse_dataset/k32/results_hybrid_32.csv) taken
    to the matrix level. The (M, N) product streams in row blocks, so the
    arm is only offered when a tile_m-row block of the product fits
    comfortably (cols <= ~8M)."""
    import dataclasses as _dc
    k_eff = config.k if k is None else k
    costs = current_costs()   # disk-cached per-device calibration if any
    best: Optional[Tuple[float, float, TilePlan]] = None
    table = {}
    for d in candidates:
        r = split_columns(csr, _dc.replace(reord), config, delta=d)
        plan = pack_tiles(csr, r, config, k=k)
        ms = estimate_plan_ms(plan, costs)
        table[d] = ms
        if best is None or ms < best[1]:
            best = (d, ms, plan)
    use_dense = False
    if allow_dense and csr.cols <= (1 << 23):
        dense_ms = estimate_dense_ms(csr.rows, csr.cols, csr.nnz, k_eff,
                                     costs)
        table["dense"] = dense_ms
        if dense_ms < best[1]:
            use_dense = True
            return DeltaChoice(delta=best[0], estimated_ms=dense_ms,
                               plan=best[2], candidates=table,
                               use_dense=True)
    return DeltaChoice(delta=best[0], estimated_ms=best[1], plan=best[2],
                       candidates=table, use_dense=use_dense)


# ---------------------------------------------------------------------------
# Runtime calibration (VERDICT r1 item 6): V5E_COSTS are one machine's
# measurements; refit the three tier constants on the actual device once
# and cache to disk keyed by device kind.
# ---------------------------------------------------------------------------

_CALIBRATED: Optional[dict] = None


def _cache_path(device_kind: str) -> str:
    import os
    base = os.environ.get("BSMR_CACHE_DIR",
                          os.path.expanduser("~/.cache/bsmr_sddmm_tpu"))
    os.makedirs(base, exist_ok=True)
    safe = "".join(c if c.isalnum() else "_" for c in device_kind)
    return os.path.join(base, f"tier_costs_{safe}.json")


def current_costs() -> dict:
    """The cost table in effect: calibrated values when available
    (memory, then disk), else the checked-in v5e measurements."""
    import json
    import os
    global _CALIBRATED
    if _CALIBRATED is not None:
        return _CALIBRATED
    import jax
    if jax.default_backend() == "cpu":
        return V5E_COSTS
    path = _cache_path(jax.devices()[0].device_kind)
    if os.path.exists(path):
        with open(path) as f:
            _CALIBRATED = {**V5E_COSTS, **json.load(f)}
        return _CALIBRATED
    return V5E_COSTS


def calibrate(store: bool = True) -> dict:
    """Measure the three tier constants on the current device with small
    synthetic plans (one compile each, ~10-20 s once per machine) and
    cache them to disk. Returns the refit cost table."""
    import json

    import jax
    import jax.numpy as jnp

    from bsmr_sddmm_tpu.formats import make_dense, random_mask
    from bsmr_sddmm_tpu.ops.sddmm import device_plan, make_sddmm_body
    from bsmr_sddmm_tpu.reorder import bsmr
    from bsmr_sddmm_tpu.utils.timing import time_jitted

    global _CALIBRATED
    costs = dict(V5E_COSTS)
    cfg = SddmmConfig(k=128, panel_height=32)

    def tier_ms(csr, config, tier, delta):
        reord = bsmr(csr, config.replace(delta=delta))
        plan = pack_tiles(csr, reord, config)
        body = jax.jit(make_sddmm_body(plan, config, only_tier=tier))
        A = jnp.asarray(make_dense(csr.rows, config.k, seed=1))
        Bt = jnp.asarray(make_dense(csr.cols, config.k, seed=2))
        ms, _ = time_jitted(body, A, Bt, device_plan(plan), iterations=8)
        return ms, plan

    # 1. dense BSR tiles: blocky mask, everything tiled
    csr = random_mask(8192, 8192, 1_000_000, seed=3, block_rows=32,
                      block_cols=256, block_fill=0.8)
    ms, plan = tier_ms(csr, cfg, "dense", 0.02)
    if plan.tile_panel.shape[0]:
        per = ms * 1e6 / plan.tile_panel.shape[0]
        # refit the floor, keeping the measured step-overhead slope
        costs["dense_tile_floor_ns"] = max(
            per - costs["dense_step_overhead_ns"] / max(plan.fat_group, 1),
            1.0)
    # 2. gathered tiles: uniform-ish mask, low tile cutoff
    cfg_g = cfg.replace(residual_tile_min_nnz=16)
    csr = random_mask(8192, 8192, 600_000, seed=4)
    ms, plan = tier_ms(csr, cfg_g, "gathered", 0.02)
    if plan.g_panel.shape[0]:
        costs["gathered_tile_ns"] = ms * 1e6 / plan.g_panel.shape[0]
    # 3. per-nnz residual
    cfg_r = cfg.replace(residual_mode="pernnz")
    ms, plan = tier_ms(csr, cfg_r, "residual", 1.1)
    if plan.res_arow.shape[0]:
        costs["pernnz_ns"] = ms * 1e6 / plan.res_arow.shape[0]

    _CALIBRATED = costs
    if store and jax.default_backend() != "cpu":
        with open(_cache_path(jax.devices()[0].device_kind), "w") as f:
            json.dump({k: costs[k] for k in
                       ("dense_tile_floor_ns", "gathered_tile_ns",
                        "pernnz_ns")}, f)
    return costs
