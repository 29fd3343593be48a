"""Native (C++/OpenMP) clustering must match the NumPy reference
implementation bit-for-bit — the NumPy strategies in reorder.py are the
executable spec (reference semantics: bsa_clustering,
src/rowReordering.cu:325-432)."""

import numpy as np
import pytest

from bsmr_sddmm_tpu import native
from bsmr_sddmm_tpu.config import SddmmConfig
from bsmr_sddmm_tpu.formats import random_mask
from bsmr_sddmm_tpu.reorder import row_reordering

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain")


@pytest.mark.parametrize("strategy", ["fast", "exact"])
# Alphas chosen off simple rationals: at e.g. alpha=0.3 a synthetic mask
# can produce sim == alpha EXACTLY (integer-count encodings), and NumPy vs
# C++ summation order then lands on opposite sides of the strict `>` —
# both clusterings are valid, but bit-equality only holds off the knife
# edge.
@pytest.mark.parametrize("alpha", [0.11, 0.305, 0.71])
def test_native_matches_numpy(strategy, alpha):
    csr = random_mask(rows=768, cols=1024, nnz=30000, seed=21,
                      block_rows=24, block_cols=96)
    cfg_py = SddmmConfig(row_strategy=strategy, use_native=False)
    cfg_nat = SddmmConfig(row_strategy=strategy, use_native=True)
    r_py = row_reordering(csr, alpha, cfg_py)
    r_nat = row_reordering(csr, alpha, cfg_nat)
    np.testing.assert_array_equal(r_py.row_perm, r_nat.row_perm)
    np.testing.assert_array_equal(r_py.cluster_ids, r_nat.cluster_ids)
    assert r_py.num_clusters == r_nat.num_clusters


@pytest.mark.parametrize("strategy", ["fast", "exact"])
def test_native_uniform_noise(strategy):
    """Pure-noise mask: mostly singleton clusters; both paths agree."""
    csr = random_mask(rows=512, cols=512, nnz=5000, seed=22)
    r_py = row_reordering(
        csr, 0.3, SddmmConfig(row_strategy=strategy, use_native=False))
    r_nat = row_reordering(
        csr, 0.3, SddmmConfig(row_strategy=strategy, use_native=True))
    np.testing.assert_array_equal(r_py.row_perm, r_nat.row_perm)


def test_native_tie_quality():
    """At a tie-prone alpha the partitions may differ on knife-edge rows,
    but cluster count and total structure must stay equivalent."""
    csr = random_mask(rows=768, cols=1024, nnz=30000, seed=21,
                      block_rows=24, block_cols=96)
    r_py = row_reordering(
        csr, 0.3, SddmmConfig(row_strategy="fast", use_native=False))
    r_nat = row_reordering(
        csr, 0.3, SddmmConfig(row_strategy="fast", use_native=True))
    assert abs(r_py.num_clusters - r_nat.num_clusters) <= 2
    assert set(r_py.row_perm) == set(r_nat.row_perm)
