"""Test env: run everything on CPU with 8 virtual devices so multi-chip
sharding logic is exercised without TPU hardware (SURVEY.md section 4 item 7).
Must run before jax initializes a backend."""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# env vars don't reliably beat an externally-selected platform plugin;
# the config API does (must run before the backend initializes)
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

from bsmr_sddmm_tpu.config import SddmmConfig
from bsmr_sddmm_tpu.formats import CSR, make_dense, random_mask


def pytest_collection_modifyitems(config, items):
    """Skip @pytest.mark.slow tests (multi-minute subprocess jax imports
    on this 1-core box) unless BSMR_RUN_SLOW=1 — keeps the default
    one-shot suite under ~5 minutes. The slow tests' logic is covered by
    fast in-process variants; the slow ones add subprocess isolation."""
    if os.environ.get("BSMR_RUN_SLOW") == "1":
        return
    skip = pytest.mark.skip(reason="slow; set BSMR_RUN_SLOW=1 to run")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def small_mask() -> CSR:
    """Structured mask with planted dense blocks + uniform noise."""
    return random_mask(rows=512, cols=768, nnz=20000, seed=7,
                       block_rows=24, block_cols=96)


@pytest.fixture(scope="session")
def tiny_mask() -> CSR:
    return random_mask(rows=96, cols=160, nnz=900, seed=3,
                       block_rows=12, block_cols=40)


@pytest.fixture(scope="session")
def cfg() -> SddmmConfig:
    return SddmmConfig(k=32, panel_height=16, block_width=128,
                       dense_chunk=64, residual_chunk=4096)


def make_ab(csr: CSR, k: int, seed: int = 1337):
    A = make_dense(csr.rows, k, seed=seed)
    B = make_dense(k, csr.cols, seed=seed + 1)
    return A, B
