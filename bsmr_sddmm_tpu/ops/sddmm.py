"""Hybrid SDDMM execution: dense MXU tiles + sparse residual.

TPU-native replacement of the reference's dual-stream kernel pair
(src/sddmmKernel.cu): the dense path maps reordered tiles onto MXU matmuls
(reference: WMMA m16n16k8 pipeline, sddmmKernel.cu:213-351), the residual
path is a fused gather/multiply/reduce over COO entries (reference: CUDA-core
shuffle kernel, sddmmKernel.cu:1994-2104). Where the reference scatters from
tensor-core fragments inside the kernel epilogue (sddmmKernel.cu:332-350),
we scatter outside the matmul into a ``nnz+1`` vector whose trailing slot
absorbs masked/padded lanes — XLA fuses this into cheap dynamic-update ops
and the MXU loop stays pure.

Both paths live inside one jitted function, chunked with ``lax.scan`` so
live memory stays bounded regardless of tile count. The two "streams" of
the reference (sddmmKernel.cu:2555-2648) become one XLA program; overlap is
the compiler's job, and the hybrid split itself is what saves the flops.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from bsmr_sddmm_tpu.config import SddmmConfig
from bsmr_sddmm_tpu.formats import CSR
from bsmr_sddmm_tpu.pack import TilePlan

_PRECISION = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}


class DevicePlan(NamedTuple):
    """Device-resident TilePlan arrays (reference: the h2d block at
    BSMR.cpp:252-264)."""

    row_perm_padded: jax.Array   # (num_panels*ph,) int32
    tile_panel: jax.Array        # (T,) int32
    tile_cols: jax.Array         # (T, bw) int32
    tile_scatter: jax.Array      # (T, ph, bw) int32
    res_arow: jax.Array          # (E,) int32
    res_col: jax.Array           # (E,) int32
    res_out: jax.Array           # (E,) int32


def device_plan(plan: TilePlan) -> DevicePlan:
    return DevicePlan(
        row_perm_padded=jnp.asarray(plan.row_perm_padded),
        tile_panel=jnp.asarray(plan.tile_panel),
        tile_cols=jnp.asarray(plan.tile_cols),
        tile_scatter=jnp.asarray(plan.tile_scatter),
        res_arow=jnp.asarray(plan.res_arow),
        res_col=jnp.asarray(plan.res_col),
        res_out=jnp.asarray(plan.res_out),
    )


def _pad_to_multiple(x: jax.Array, mult: int, axis: int = 0,
                     fill=0) -> jax.Array:
    n = x.shape[axis]
    target = -(-n // mult) * mult
    if target == n:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, target - n)
    return jnp.pad(x, pad, constant_values=fill)


def make_sddmm_fn(plan: TilePlan, config: SddmmConfig,
                  backend: Optional[str] = None) -> Callable:
    """Build the jitted hybrid SDDMM for one TilePlan shape bucket.

    Returns ``fn(A, Bt, dplan) -> P`` where A is (M, K) row-major, Bt is
    (N, K) — i.e. B^T, so both operand gathers are row gathers — and P is
    the (nnz,) result vector in original CSR order (reference semantics:
    sddmm_gpu writes matrixP in CSR value order, sddmmKernel.cu:332-350).
    """
    backend = config.backend if backend is None else backend
    ph, bw, k = plan.panel_height, plan.block_width, plan.k
    num_panels = max(plan.num_panels, 1)
    T = plan.tile_panel.shape[0]
    E = plan.res_arow.shape[0]
    nnz = plan.nnz
    precision = _PRECISION[config.matmul_precision]
    dense_chunk = max(8, min(config.dense_chunk, T))
    res_chunk = max(8, min(config.residual_chunk, E))

    if backend == "pallas":
        from bsmr_sddmm_tpu.ops.pallas_dense import make_dense_tile_kernel
        dense_kernel = make_dense_tile_kernel(
            num_panels=num_panels, ph=ph, bw=bw, k=k,
            chunk=dense_chunk, precision=config.matmul_precision,
            # no Mosaic on CPU: fall back to the Pallas interpreter
            interpret=jax.default_backend() == "cpu")
    else:
        dense_kernel = None

    def fn(A: jax.Array, Bt: jax.Array, dplan: DevicePlan) -> jax.Array:
        A = A.astype(jnp.float32)
        Bt = Bt.astype(jnp.float32)
        A_perm = jnp.take(A, dplan.row_perm_padded, axis=0)  # (P*ph, K)
        A_panels = A_perm.reshape(num_panels, ph, k)
        P = jnp.zeros(nnz + 1, dtype=jnp.float32)

        # ---- dense path ---------------------------------------------------
        tile_panel = _pad_to_multiple(dplan.tile_panel, dense_chunk)
        tile_cols = _pad_to_multiple(dplan.tile_cols, dense_chunk)
        tile_scatter = _pad_to_multiple(dplan.tile_scatter, dense_chunk,
                                        fill=nnz)
        S = tile_panel.shape[0] // dense_chunk

        if backend == "pallas":
            def dense_body(P, chunk):
                panel_c, cols_c, scatter_c = chunk
                b = jnp.take(Bt, cols_c.reshape(-1), axis=0)
                b = b.reshape(dense_chunk, bw, k)
                out = dense_kernel(A_panels, b, panel_c)
                return P.at[scatter_c.reshape(-1)].set(
                    out.reshape(-1), mode="drop",
                    unique_indices=False), None
        else:
            def dense_body(P, chunk):
                panel_c, cols_c, scatter_c = chunk
                a = jnp.take(A_panels, panel_c, axis=0)        # (C, ph, K)
                b = jnp.take(Bt, cols_c.reshape(-1), axis=0)   # (C*bw, K)
                b = b.reshape(dense_chunk, bw, k)
                out = jax.lax.dot_general(
                    a, b,
                    dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    precision=precision,
                    preferred_element_type=jnp.float32)        # (C, ph, bw)
                return P.at[scatter_c.reshape(-1)].set(
                    out.reshape(-1), mode="drop",
                    unique_indices=False), None

        chunks = (tile_panel.reshape(S, dense_chunk),
                  tile_cols.reshape(S, dense_chunk, bw),
                  tile_scatter.reshape(S, dense_chunk, ph, bw))
        if S == 1:
            P, _ = dense_body(P, jax.tree.map(lambda x: x[0], chunks))
        else:
            P, _ = jax.lax.scan(dense_body, P, chunks)

        # ---- residual path ------------------------------------------------
        res_arow = _pad_to_multiple(dplan.res_arow, res_chunk)
        res_col = _pad_to_multiple(dplan.res_col, res_chunk)
        res_out = _pad_to_multiple(dplan.res_out, res_chunk, fill=nnz)
        SR = res_arow.shape[0] // res_chunk

        def res_body(P, chunk):
            arow_c, col_c, out_c = chunk
            a = jnp.take(A_perm, arow_c, axis=0)   # (C, K)
            b = jnp.take(Bt, col_c, axis=0)        # (C, K)
            vals = jnp.sum(a * b, axis=-1)         # fp32 on the VPU
            return P.at[out_c].set(vals, mode="drop",
                                   unique_indices=False), None

        res_chunks = (res_arow.reshape(SR, res_chunk),
                      res_col.reshape(SR, res_chunk),
                      res_out.reshape(SR, res_chunk))
        if SR == 1:
            P, _ = res_body(P, jax.tree.map(lambda x: x[0], res_chunks))
        else:
            P, _ = jax.lax.scan(res_body, P, res_chunks)

        return P[:nnz]

    return jax.jit(fn)


# ---------------------------------------------------------------------------
# Reference oracle + simple baselines
# ---------------------------------------------------------------------------

def sddmm_ref(A: np.ndarray, B: np.ndarray, csr: CSR,
              chunk: int = 1 << 18) -> np.ndarray:
    """CPU oracle: P = (A @ B) sampled at the mask's nonzeros, in CSR value
    order (reference sddmm_cpu, src/host.cpp:44-91). fp64 accumulate so the
    oracle is strictly more accurate than any device path."""
    rows = csr.coo_rows()
    cols = csr.col_indices
    out = np.empty(csr.nnz, dtype=np.float64)
    Bt = np.ascontiguousarray(B.T)
    for s in range(0, csr.nnz, chunk):
        e = min(s + chunk, csr.nnz)
        out[s:e] = np.einsum(
            "ij,ij->i",
            A[rows[s:e]].astype(np.float64),
            Bt[cols[s:e]].astype(np.float64))
    return out.astype(np.float32)
