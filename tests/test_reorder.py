"""Reordering invariants — ports of the reference's executable format
specifications: check_rowReordering (src/BSMR.cpp:444-486) and
check_colReordering (src/BSMR.cpp:488-637)."""

import numpy as np
import pytest

from bsmr_sddmm_tpu.config import SddmmConfig
from bsmr_sddmm_tpu.formats import CSR, random_mask
from bsmr_sddmm_tpu.reorder import (bsmr, col_reordering, dispersion_scores,
                                    row_encodings, row_reordering)


def _check_row_reordering(csr, reord):
    """Permutation validity: no duplicates, no empty rows stored, every
    nonzero row present (BSMR.cpp:444-486)."""
    perm = reord.row_perm
    assert np.unique(perm).shape[0] == perm.shape[0], "duplicate rows"
    row_nnz = csr.row_nnz()
    assert np.all(row_nnz[perm] > 0), "empty row stored"
    nonzero_rows = np.nonzero(row_nnz > 0)[0]
    assert perm.shape[0] == nonzero_rows.shape[0], "nonzero row missing"
    # cluster ids nondecreasing along the permutation
    assert np.all(np.diff(reord.cluster_ids) >= 0)


def _check_col_reordering(csr, reord, cfg, delta):
    """Per-panel partition is exact and disjoint between dense and sparse;
    dense counts are multiples of block_width; dense groups meet the
    density threshold (BSMR.cpp:488-637)."""
    ph, bw = cfg.panel_height, cfg.block_width
    perm = reord.row_perm
    num_panels = reord.num_row_panels
    threshold = int(np.ceil(delta * ph * bw))
    N = csr.cols
    for p in range(num_panels):
        rows = perm[p * ph:(p + 1) * ph]
        cols_in_panel = np.concatenate([
            csr.col_indices[csr.row_offsets[r]:csr.row_offsets[r + 1]]
            for r in rows]) if rows.size else np.zeros(0, np.int64)
        col_ids, col_counts = np.unique(cols_in_panel, return_counts=True)
        dc = reord.dense_cols[
            reord.dense_col_offsets[p]:reord.dense_col_offsets[p + 1]]
        sc = reord.sparse_cols[
            reord.sparse_col_offsets[p]:reord.sparse_col_offsets[p + 1]]
        assert dc.shape[0] % bw == 0
        dc_real = dc[dc < N]
        # disjoint + exact partition of the panel's nonzero columns
        assert np.intersect1d(dc_real, sc).size == 0
        np.testing.assert_array_equal(
            np.sort(np.concatenate([dc_real, sc])), col_ids)
        # residual nnz bookkeeping
        count_of = dict(zip(col_ids.tolist(), col_counts.tolist()))
        sparse_nnz = sum(count_of[c] for c in sc.tolist())
        assert sparse_nnz == (reord.sparse_value_offsets[p + 1]
                              - reord.sparse_value_offsets[p])
        # every dense group meets the threshold
        for g in range(dc.shape[0] // bw):
            grp = dc[g * bw:(g + 1) * bw]
            s = sum(count_of.get(c, 0) for c in grp.tolist())
            assert s >= threshold, f"panel {p} group {g}: {s} < {threshold}"


@pytest.mark.parametrize("strategy", ["exact", "fast", "none"])
def test_row_reordering_valid(small_mask, strategy):
    cfg = SddmmConfig(row_strategy=strategy, panel_height=16)
    reord = row_reordering(small_mask, alpha=0.3, config=cfg)
    _check_row_reordering(small_mask, reord)


def test_row_reordering_drops_empty_rows():
    csr = random_mask(64, 64, 100, seed=9)
    # force some empty rows
    assert np.any(csr.row_nnz() == 0) or csr.rows > csr.nnz
    cfg = SddmmConfig(row_strategy="exact")
    reord = row_reordering(csr, alpha=0.3, config=cfg)
    _check_row_reordering(csr, reord)


def test_exact_clusters_identical_rows():
    """Rows with identical patterns must land in the same cluster at any
    alpha < 1 (sim == 1)."""
    rows, cols = 32, 256
    pattern = np.array([3, 40, 41, 99, 200])
    ri = np.repeat(np.arange(rows), pattern.size)
    ci = np.tile(pattern, rows)
    from bsmr_sddmm_tpu.formats import COO
    csr = COO(rows, cols, ri.astype(np.int32), ci.astype(np.int32),
              np.ones(ri.size, np.float32)).to_csr()
    cfg = SddmmConfig(row_strategy="exact")
    reord = row_reordering(csr, alpha=0.9, config=cfg)
    assert reord.num_clusters == 1
    cfg = SddmmConfig(row_strategy="fast")
    reord = row_reordering(csr, alpha=0.9, config=cfg)
    assert reord.num_clusters == 1


def test_dispersion_formula():
    """score = encoding_block*nb - nnz + nnz*nb (rowReordering.cu:81-92)."""
    from bsmr_sddmm_tpu.formats import COO
    # row 0: cols {0,1} in block 0 -> nb=1, nnz=2: 32-2+2 = 32
    # row 1: cols {0, 64} -> nb=2, nnz=2: 64-2+4 = 66
    csr = COO(2, 128, np.array([0, 0, 1, 1], np.int32),
              np.array([0, 1, 0, 64], np.int32),
              np.ones(4, np.float32)).to_csr()
    enc = row_encodings(csr, 32)
    d = dispersion_scores(csr, enc, 32)
    np.testing.assert_array_equal(d, [32, 66])


@pytest.mark.parametrize("delta", [0.0, 0.3, 1.1])
def test_col_reordering_partition(small_mask, delta):
    cfg = SddmmConfig(row_strategy="fast", panel_height=16)
    reord = row_reordering(small_mask, alpha=0.3, config=cfg)
    reord = col_reordering(small_mask, reord, cfg, delta=delta)
    _check_col_reordering(small_mask, reord, cfg, delta)
    if delta == 0.0:
        # threshold 0: everything dense (tensor-core-only ablation)
        assert reord.sparse_cols.size == 0
        assert reord.sparse_value_offsets[-1] == 0
    if delta == 1.1:
        # threshold > block size: nothing dense (vector-only ablation)
        assert reord.dense_cols.size == 0
        assert reord.sparse_value_offsets[-1] == small_mask.nnz


def test_bsmr_end_to_end(small_mask):
    cfg = SddmmConfig(row_strategy="fast", panel_height=32,
                      col_mode="reorder")
    reord = bsmr(small_mask, cfg)
    _check_row_reordering(small_mask, reord)
    _check_col_reordering(small_mask, reord, cfg, cfg.delta)


@pytest.mark.parametrize("delta", [0.0, 0.1, 0.5, 1.1])
def test_col_split_bsr_invariants(small_mask, delta):
    """BSR column split: dense tiles are block-aligned natural column
    blocks meeting the threshold; dense blocks + sparse cols exactly cover
    the panel's nonzero columns."""
    cfg = SddmmConfig(row_strategy="fast", panel_height=16, col_mode="bsr")
    reord = row_reordering(small_mask, alpha=0.3, config=cfg)
    from bsmr_sddmm_tpu.reorder import col_split_bsr
    reord = col_split_bsr(small_mask, reord, cfg, delta=delta)
    ph, bw = cfg.panel_height, cfg.block_width
    N = small_mask.cols
    threshold = max(int(np.ceil(delta * ph * bw)), 1)
    perm = reord.row_perm
    for p in range(reord.num_row_panels):
        rows = perm[p * ph:(p + 1) * ph]
        cols_in_panel = np.concatenate([
            small_mask.col_indices[
                small_mask.row_offsets[r]:small_mask.row_offsets[r + 1]]
            for r in rows])
        col_ids, col_counts = np.unique(cols_in_panel, return_counts=True)
        count_of = dict(zip(col_ids.tolist(), col_counts.tolist()))
        dc = reord.dense_cols[
            reord.dense_col_offsets[p]:reord.dense_col_offsets[p + 1]]
        sc = reord.sparse_cols[
            reord.sparse_col_offsets[p]:reord.sparse_col_offsets[p + 1]]
        assert dc.shape[0] % bw == 0
        for g in range(dc.shape[0] // bw):
            grp = dc[g * bw:(g + 1) * bw]
            real = grp[grp < N]
            assert real[0] % bw == 0           # block aligned
            assert np.all(np.diff(real) == 1)  # the block's own columns
            s = sum(count_of.get(c, 0) for c in real.tolist())
            assert s >= threshold
        dc_nonzero = np.intersect1d(dc[dc < N], col_ids)
        assert np.intersect1d(dc_nonzero, sc).size == 0
        np.testing.assert_array_equal(
            np.sort(np.concatenate([dc_nonzero, sc])), col_ids)
        sparse_nnz = sum(count_of[c] for c in sc.tolist())
        assert sparse_nnz == (reord.sparse_value_offsets[p + 1]
                              - reord.sparse_value_offsets[p])


def test_reordering_improves_density(small_mask):
    """On a block-structured mask, clustering should not reduce the nnz
    captured in dense tiles vs no reordering (the reference's
    evaluationReordering comparison, BSMR.cpp:826-930)."""
    cfg = SddmmConfig(row_strategy="fast", panel_height=16, delta=0.3)
    reord = bsmr(small_mask, cfg)
    cfg_none = cfg.replace(row_strategy="none")
    base = bsmr(small_mask, cfg_none)
    dense_nnz_reord = int(reord.sparse_value_offsets[-1])
    dense_nnz_base = int(base.sparse_value_offsets[-1])
    # fewer residual nnz == more dense coverage
    assert dense_nnz_reord <= dense_nnz_base
