"""Data-layer tests: parsers, validation, containers.

Mirrors the reference's input-validation semantics (src/Matrix.cpp:355-366,
442-465, 917-952): duplicates, bounds, wrong counts are rejected.
"""

import numpy as np
import pytest

from bsmr_sddmm_tpu.formats import (COO, CSR, MatrixFormatError, load_matrix,
                                    load_mtx, load_smtx, load_snap_txt,
                                    make_dense, random_mask, save_mtx)


def test_mtx_roundtrip(tmp_path):
    csr = random_mask(40, 60, 300, seed=1)
    path = str(tmp_path / "m.mtx")
    save_mtx(path, csr)
    back = load_mtx(path)
    assert back.rows == csr.rows and back.cols == csr.cols
    assert back.nnz == csr.nnz
    np.testing.assert_array_equal(back.col_indices, csr.col_indices)
    np.testing.assert_array_equal(back.row_offsets, csr.row_offsets)
    np.testing.assert_allclose(back.values, csr.values, rtol=1e-6)


def test_mtx_pattern_and_symmetric(tmp_path):
    path = tmp_path / "p.mtx"
    path.write_text(
        "%%MatrixMarket matrix coordinate pattern symmetric\n"
        "3 3 3\n"
        "1 1\n"
        "2 1\n"
        "3 2\n")
    csr = load_mtx(str(path))
    # symmetric: (2,1) mirrors to (1,2); (3,2) to (2,3); (1,1) stays
    assert csr.nnz == 5
    assert np.all(csr.values == 1.0)


def test_mtx_rejects_duplicates(tmp_path):
    path = tmp_path / "dup.mtx"
    path.write_text(
        "%%MatrixMarket matrix coordinate real general\n"
        "2 2 2\n1 1 1.0\n1 1 2.0\n")
    with pytest.raises(MatrixFormatError, match="duplicate"):
        load_mtx(str(path))


def test_mtx_rejects_out_of_range(tmp_path):
    path = tmp_path / "oob.mtx"
    path.write_text(
        "%%MatrixMarket matrix coordinate real general\n"
        "2 2 2\n1 1 1.0\n3 1 2.0\n")
    with pytest.raises(MatrixFormatError, match="too big"):
        load_mtx(str(path))


def test_mtx_rejects_wrong_count(tmp_path):
    path = tmp_path / "cnt.mtx"
    path.write_text(
        "%%MatrixMarket matrix coordinate real general\n"
        "2 2 3\n1 1 1.0\n2 2 2.0\n")
    with pytest.raises(MatrixFormatError):
        load_mtx(str(path))


def test_smtx(tmp_path):
    path = tmp_path / "m.smtx"
    path.write_text("3, 4, 5\n0 2 4 5\n0 3 1 2 0\n")
    csr = load_smtx(str(path))
    assert (csr.rows, csr.cols, csr.nnz) == (3, 4, 5)
    np.testing.assert_array_equal(csr.row_offsets, [0, 2, 4, 5])
    np.testing.assert_array_equal(csr.col_indices, [0, 3, 1, 2, 0])


def test_snap_txt(tmp_path):
    path = tmp_path / "g.txt"
    path.write_text("# comment\n0 1\n1 2\n2 0\n0 1\n")  # dup edge dropped
    csr = load_snap_txt(str(path))
    assert csr.rows == csr.cols == 3
    assert csr.nnz == 3


def test_dispatch_by_suffix(tmp_path):
    csr = random_mask(20, 20, 50, seed=2)
    p = str(tmp_path / "d.mtx")
    save_mtx(p, csr)
    assert load_matrix(p).nnz == csr.nnz
    with pytest.raises(MatrixFormatError, match="suffix"):
        load_matrix("nope.bin")


def test_make_dense_deterministic():
    a = make_dense(8, 8, seed=5)
    b = make_dense(8, 8, seed=5)
    np.testing.assert_array_equal(a, b)
    assert a.min() >= 0.0 and a.max() < 2.0  # uniform [0,2) convention


def test_csr_coo_roundtrip():
    csr = random_mask(30, 50, 200, seed=4)
    back = csr.to_coo().to_csr()
    np.testing.assert_array_equal(back.row_offsets, csr.row_offsets)
    np.testing.assert_array_equal(back.col_indices, csr.col_indices)


def test_validate_catches_bad_offsets():
    csr = random_mask(10, 10, 30, seed=6)
    csr.row_offsets = csr.row_offsets.copy()
    csr.row_offsets[3] = csr.row_offsets[5] + 1  # break monotonicity
    with pytest.raises(MatrixFormatError):
        csr.validate()
