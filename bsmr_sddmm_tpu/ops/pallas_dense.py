"""Pallas dense-tile SDDMM kernel.

The MXU analogue of the reference's WMMA dense-block kernel
(sddmm_gpu_dense_block_m16n16k8_matrixA_rowMaj_matrixB_colMaj,
src/sddmmKernel.cu:213-351). Differences are deliberate TPU-first choices:

* One grid step = one (panel, column-block) tile of shape
  (panel_height, block_width); the matmul runs on the MXU at full lane
  width (128) instead of 16x16 WMMA fragments.
* The A panel is *not* gathered per tile: the scalar-prefetched
  ``tile_panel`` ids drive the BlockSpec index_map, so Pallas's automatic
  pipeline DMAs exactly the panel each tile needs (the reference stages the
  A tile through shared memory by hand, sddmmKernel.cu:277-290).
* The gathered B tile arrives pre-packed as (chunk, block_width, K); the
  gather itself is an XLA take (see ops/sddmm.py). Fusing that gather into
  the kernel via per-row DMA is a later optimization once profiling shows
  the gather dominating.
* No in-kernel scatter epilogue: results leave as dense tiles and a
  separate scatter pass places them in CSR order (the CUDA fragment
  scatter at sddmmKernel.cu:332-350 has no efficient MXU analogue).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PRECISION = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}


def make_dense_tile_kernel(num_panels: int, ph: int, bw: int, k: int,
                           chunk: int, precision: str = "highest",
                           interpret: bool = False):
    """Build ``fn(A_panels, b_tiles, tile_panel) -> (chunk, ph, bw)``.

    A_panels: (num_panels, ph, K) fp32 — the row-permuted A, panel-major.
    b_tiles:  (chunk, bw, K) fp32 — gathered B columns, row-major in K.
    tile_panel: (chunk,) int32 — panel id per tile (scalar-prefetched).
    """
    prec = _PRECISION[precision]

    def kernel(panel_ref, a_ref, b_ref, out_ref):
        # a_ref: (1, ph, K) — the tile's panel, selected by index_map
        # b_ref: (1, bw, K); out_ref: (1, ph, bw)
        out_ref[0] = jax.lax.dot_general(
            a_ref[0], b_ref[0],
            dimension_numbers=(((1,), (1,)), ((), ())),
            precision=prec,
            preferred_element_type=jnp.float32,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(chunk,),
        in_specs=[
            pl.BlockSpec(
                (1, ph, k),
                lambda t, panel_ref: (panel_ref[t], 0, 0),
            ),
            pl.BlockSpec((1, bw, k), lambda t, panel_ref: (t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, ph, bw), lambda t, panel_ref: (t, 0, 0)),
    )

    flops = 2 * chunk * ph * bw * k
    bytes_accessed = 4 * chunk * (ph * k + bw * k + ph * bw)

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((chunk, ph, bw), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0),
        interpret=interpret,
    )

    def fn(A_panels: jax.Array, b_tiles: jax.Array,
           tile_panel: jax.Array) -> jax.Array:
        return call(tile_panel, A_panels, b_tiles)

    return fn
