"""Dataset acquisition pipeline (scripts/download_datasets.py) with a
local fetcher standing in for sparse.tamu.edu (zero egress here); plus
the DLMC .smtx round trip on a format-faithful sample (comma header,
convert_smtx_to_mtx.py:9)."""
import os
import sys
import tarfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "scripts"))

import download_datasets as dd  # noqa: E402

from bsmr_sddmm_tpu.formats import load_matrix  # noqa: E402


def _local_fetcher(tmp_path):
    """Build name.tar.gz containing name/name.mtx on demand, like the
    SuiteSparse collection serves."""
    def fetch(url, dest_path):
        name = os.path.basename(url)[: -len(".tar.gz")]
        d = tmp_path / name
        d.mkdir(exist_ok=True)
        mtx = d / f"{name}.mtx"
        mtx.write_text("%%MatrixMarket matrix coordinate real general\n"
                       "4 4 3\n1 1 1\n2 3 1\n4 4 1\n")
        with tarfile.open(dest_path, "w:gz") as tf:
            tf.add(mtx, arcname=f"{name}/{name}.mtx")
    return fetch


def test_download_suitesparse_mocked(tmp_path):
    dest = tmp_path / "dataset"
    msgs = []
    n = dd.download_suitesparse(str(dest), limit=3,
                                fetch=_local_fetcher(tmp_path),
                                echo=msgs.append)
    assert n == 3
    files = sorted(os.listdir(dest))
    assert len(files) == 3 and all(f.endswith(".mtx") for f in files)
    csr = load_matrix(str(dest / files[0]))
    assert (csr.rows, csr.cols, csr.nnz) == (4, 4, 3)
    # idempotent: a second run skips existing files without fetching
    def boom(url, dest_path):
        raise AssertionError("refetched an existing matrix")
    assert dd.download_suitesparse(str(dest), limit=3, fetch=boom) == 3


def test_download_suitesparse_offline(tmp_path):
    # zero egress: the real fetcher must fail cleanly, not stack-trace
    msgs = []
    import urllib.error

    def offline(url, dest_path):
        raise urllib.error.URLError("no route to host")
    n = dd.download_suitesparse(str(tmp_path / "d"), limit=2,
                                fetch=offline, echo=msgs.append)
    assert n == 0
    assert all("FAILED" in m for m in msgs) and len(msgs) == 2


def test_dlmc_smtx_format_roundtrip(tmp_path):
    # DLMC header is COMMA separated ("nrows, ncols, nnz"); offsets and
    # indices are space separated single lines
    smtx = tmp_path / "body.smtx"
    smtx.write_text("5, 6, 7\n0 2 3 3 6 7\n0 5 1 2 3 4 0\n")
    from bsmr_sddmm_tpu.datatools import convert_smtx_to_mtx
    out = convert_smtx_to_mtx(str(smtx))
    csr = load_matrix(out)
    assert (csr.rows, csr.cols, csr.nnz) == (5, 6, 7)
    np.testing.assert_array_equal(csr.row_offsets,
                                  [0, 2, 3, 3, 6, 7])
    np.testing.assert_array_equal(csr.col_indices,
                                  [0, 5, 1, 2, 3, 4, 0])
