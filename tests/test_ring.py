"""ppermute B-panel ring vs the fp64 oracle on the virtual 8-mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bsmr_sddmm_tpu.config import SddmmConfig
from bsmr_sddmm_tpu.datasets import banded
from bsmr_sddmm_tpu.formats import make_dense, random_mask
from bsmr_sddmm_tpu.ops.sddmm import sddmm_ref
from bsmr_sddmm_tpu.parallel.ring import (make_ring_sddmm, pack_ring_plans,
                                          ring_operands)
from bsmr_sddmm_tpu.parallel.sharding import make_mesh
from bsmr_sddmm_tpu.reorder import bsmr
from bsmr_sddmm_tpu.utils.checkdata import check_data


@pytest.mark.parametrize("n", [2, 8])
@pytest.mark.parametrize("gen", ["banded", "blocks"])
def test_ring_matches_oracle(n, gen):
    if gen == "banded":
        csr = banded(1024, 30000, 96, seed=3)
    else:
        csr = random_mask(rows=768, cols=1500, nnz=25000, seed=9,
                          block_rows=24, block_cols=96)
    cfg = SddmmConfig(k=32, panel_height=16, delta=0.02)
    mesh = make_mesh(n)
    reord = bsmr(csr, cfg)
    fn, plan = make_ring_sddmm(csr, reord, cfg, mesh, emit="csr")
    A = make_dense(csr.rows, cfg.k, seed=1)
    Bt = make_dense(csr.cols, cfg.k, seed=2)
    A_dev, Bt_dev = ring_operands(A, Bt, plan, mesh)
    out = np.asarray(jax.block_until_ready(fn(A_dev, Bt_dev)))
    expected = sddmm_ref(A, Bt.T, csr)
    res = check_data(expected, out)
    assert res.passed, f"error rate {res.error_rate}"


def test_ring_packing_partition():
    """Every nonzero lands in exactly one (shard, panel) group slot."""
    csr = random_mask(rows=512, cols=1024, nnz=20000, seed=5,
                      block_rows=16, block_cols=64)
    cfg = SddmmConfig(k=32, panel_height=16, delta=0.05)
    reord = bsmr(csr, cfg)
    plan = pack_ring_plans(csr, reord, cfg, 4)
    nnz = csr.nnz
    d = plan.tile_scatter[plan.tile_scatter < nnz]
    r = plan.res_out[plan.res_out < nnz]
    allv = np.concatenate([d.ravel(), r.ravel()])
    assert allv.shape[0] == nnz
    np.testing.assert_array_equal(np.sort(allv), np.arange(nnz))
    # tile cblocks are panel-local
    assert plan.tile_cb.max() < plan.w // plan.block_width
    assert plan.res_col.max() < plan.w


def test_ring_uses_ppermute_not_all_gather():
    """The ring's jaxpr must rotate with ppermute (n-1 hops) and never
    all-gather B — the whole point of the layout."""
    csr = banded(512, 12000, 64, seed=7)
    cfg = SddmmConfig(k=32, panel_height=16, delta=0.02)
    n = 4
    mesh = make_mesh(n)
    reord = bsmr(csr, cfg)
    fn, plan = make_ring_sddmm(csr, reord, cfg, mesh, emit="rphm")
    A = make_dense(csr.rows, cfg.k, seed=1)
    Bt = make_dense(csr.cols, cfg.k, seed=2)
    A_dev, Bt_dev = ring_operands(A, Bt, plan, mesh)
    jaxpr = str(jax.make_jaxpr(fn)(A_dev, Bt_dev))
    assert jaxpr.count("ppermute") == n - 1
    assert "all_gather" not in jaxpr
