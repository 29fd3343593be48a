"""Graph companion ops for sparse attention built on the SDDMM output.

The reference stops at P = (A.B) sampled on the mask; a user of SDDMM in a
GNN/graph-transformer additionally needs the row-wise softmax over edge
scores and the weighted aggregation (SpMM). These are jit-friendly,
segment-based implementations over the CSR layout — `segment_ids` is the
static per-edge row vector, so everything stays statically shaped.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from bsmr_sddmm_tpu.formats import CSR


def csr_segment_ids(csr: CSR) -> np.ndarray:
    """Per-edge row id, aligned with CSR value order."""
    return csr.coo_rows().astype(np.int32)


def edge_softmax(scores: jax.Array, segment_ids: jax.Array,
                 num_rows: int) -> jax.Array:
    """Numerically-stable softmax over each CSR row's edge scores."""
    row_max = jax.ops.segment_max(scores, segment_ids,
                                  num_segments=num_rows,
                                  indices_are_sorted=True)
    row_max = jnp.where(jnp.isfinite(row_max), row_max, 0.0)
    ex = jnp.exp(scores - row_max[segment_ids])
    denom = jax.ops.segment_sum(ex, segment_ids, num_segments=num_rows,
                                indices_are_sorted=True)
    return ex / jnp.maximum(denom[segment_ids], 1e-20)


def spmm(edge_vals: jax.Array, col_indices: jax.Array,
         segment_ids: jax.Array, V: jax.Array,
         num_rows: int) -> jax.Array:
    """out[r] = sum_{edges e of row r} edge_vals[e] * V[col[e]]."""
    gathered = jnp.take(V, col_indices, axis=0)         # (nnz, F)
    weighted = gathered * edge_vals[:, None]
    return jax.ops.segment_sum(weighted, segment_ids,
                               num_segments=num_rows,
                               indices_are_sorted=True)
