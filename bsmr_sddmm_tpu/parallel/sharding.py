"""Multi-device SDDMM: row-panel sharding over a JAX mesh.

This layer is *new work* relative to the reference, which is strictly
single-GPU (SURVEY.md section 2d: no NCCL/MPI anywhere). The scaling design
follows the BASELINE.json north star: the reordered mask's tiles and
residual entries — both grouped by row panel — are sharded across devices;
operands are replicated (B-panel all-gather overlap is the planned
refinement once B no longer fits per-device); each device scatters its
partial result vector and a single ``psum`` combines them (every CSR index
is owned by exactly one shard, so the reduction is exact).

Everything compiles under ``jax.sharding.Mesh`` + ``shard_map``, so the
same code runs on N real TPU chips over ICI or on a virtual CPU mesh
(tests / the driver's dryrun)."""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bsmr_sddmm_tpu.config import SddmmConfig
from bsmr_sddmm_tpu.ops.sddmm import DevicePlan, make_sddmm_body
from bsmr_sddmm_tpu.pack import TilePlan

AXIS = "panels"


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[list] = None) -> Mesh:
    """1-D mesh over the row-panel axis. On a pod slice this should be the
    ICI-contiguous device order (jax.devices() already is for 1-D)."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (AXIS,))


def _pad_leading(arr: np.ndarray, mult: int, fill) -> np.ndarray:
    n = arr.shape[0]
    target = -(-n // mult) * mult
    if target == n:
        return arr
    pad = np.full((target - n,) + arr.shape[1:], fill, dtype=arr.dtype)
    return np.concatenate([arr, pad], axis=0)


def shard_device_plan(plan: TilePlan, mesh: Mesh) -> DevicePlan:
    """Pad tile/residual counts to the mesh size and place each array with
    its leading dim sharded over the mesh. Padded tiles scatter into the
    trash slot, so any shard imbalance is pure padding, never wrong data."""
    n = mesh.devices.size
    sharded = NamedSharding(mesh, P(AXIS))
    repl = NamedSharding(mesh, P())

    def put(arr, spec):
        return jax.device_put(jnp.asarray(arr), spec)

    tile_src = plan.tile_cblock if plan.mode == "bsr" else plan.tile_cols
    return DevicePlan(
        row_perm_padded=put(plan.row_perm_padded, repl),
        tile_panel=put(_pad_leading(plan.tile_panel, n, 0), sharded),
        tile_src=put(_pad_leading(tile_src, n, 0), sharded),
        tile_scatter=put(_pad_leading(plan.tile_scatter, n, plan.nnz),
                         sharded),
        g_panel=put(_pad_leading(plan.g_panel, n, 0), sharded),
        g_cols=put(_pad_leading(plan.g_cols, n,
                                max(plan.cols - 1, 0)), sharded),
        g_scatter=put(_pad_leading(plan.g_scatter, n, plan.nnz), sharded),
        res_arow=put(_pad_leading(plan.res_arow, n, 0), sharded),
        res_col=put(_pad_leading(plan.res_col, n, 0), sharded),
        res_out=put(_pad_leading(plan.res_out, n, plan.nnz), sharded),
        # replicated: consumed by single-device emit="csr" users of this
        # dplan (e.g. a model forward); the shard_map body ignores it
        rphm_to_csr=put(plan.rphm_to_csr, repl),
    )


def shard_operands(A, Bt, mesh: Mesh, b_sharded: bool = False):
    """Place the dense operands for :func:`make_sharded_sddmm_fn`: A is
    replicated (every shard owns whole row panels of the mask and needs
    its own A rows; replication is the row-shard-natural layout —
    SURVEY.md section 2d); Bt is either replicated or row-sharded
    (= column panels of B) for the all-gather path."""
    import jax
    repl = NamedSharding(mesh, P())
    if b_sharded and Bt.shape[0] % mesh.devices.size:
        raise ValueError(
            f"b_sharded needs N ({Bt.shape[0]}) divisible by the mesh "
            f"size ({mesh.devices.size}); pad B's columns first")
    b_spec = NamedSharding(mesh, P(AXIS)) if b_sharded else repl
    return (jax.device_put(jnp.asarray(A), repl),
            jax.device_put(jnp.asarray(Bt), b_spec))


def make_sharded_sddmm_fn(plan: TilePlan, config: SddmmConfig,
                          mesh: Mesh,
                          backend: Optional[str] = None,
                          b_sharded: bool = False) -> Callable:
    """Build ``fn(A, Bt, dplan) -> P`` running the hybrid SDDMM with tiles
    and residual sharded over ``mesh`` and one psum to combine partials.

    With ``b_sharded=True``, Bt arrives sharded over the mesh (each device
    stores ``N/n`` column panels of B) and is all-gathered over ICI inside
    the mapped body before compute — the memory-scalable layout for large
    B (BASELINE.json north star: shard row panels, all-gather B column
    panels). XLA overlaps the gather with the leading compute where
    possible; a Pallas ``make_async_remote_copy`` ring that interleaves
    per-panel compute with the transfer is the planned refinement."""
    n = mesh.devices.size
    # each device executes the body on a 1/n shard: build the body for the
    # shard-local shapes
    def shard0(arr, fill):
        return _pad_leading(arr, n, fill)[: -(-arr.shape[0] // n)]

    local = TilePlan(**{
        **plan.__dict__,
        "tile_panel": shard0(plan.tile_panel, 0),
        "tile_cols": shard0(plan.tile_cols, 0),
        "tile_cblock": (shard0(plan.tile_cblock, 0)
                        if plan.tile_cblock is not None else None),
        "tile_scatter": shard0(plan.tile_scatter, plan.nnz),
        "g_panel": shard0(plan.g_panel, 0),
        "g_cols": shard0(plan.g_cols, max(plan.cols - 1, 0)),
        "g_scatter": shard0(plan.g_scatter, plan.nnz),
        "res_arow": shard0(plan.res_arow, 0),
        "res_col": shard0(plan.res_col, 0),
        "res_out": shard0(plan.res_out, plan.nnz),
        # window-group metadata indexes *global* tile positions — invalid
        # on a shard; shard-local execution runs unwindowed
        "window_rows": None, "a_window_rows": None,
        "g_groups": None, "res_groups": None,
        # shard slicing does not respect fat-group boundaries; shards run
        # the 1-tile/step layout off the per-tile tile_cblock
        "fat_group": 1, "step_cblock": None,
    })
    body = make_sddmm_body(local, config, backend,
                           emit="csr_scatter")
    nnz = plan.nnz

    def shard_body(A, Bt, dplan):
        if b_sharded:
            # (N/n, K) shard -> full (N, K): one all-gather over ICI
            Bt = jax.lax.all_gather(Bt, AXIS, axis=0, tiled=True)
        partial = body(A, Bt, dplan)           # (nnz+1,) zeros off-shard
        total = jax.lax.psum(partial, AXIS)
        return total[:nnz]

    mapped = jax.shard_map(
        shard_body, mesh=mesh,
        in_specs=(P(), P(AXIS) if b_sharded else P(),
                  DevicePlan(row_perm_padded=P(),
                             tile_panel=P(AXIS), tile_src=P(AXIS),
                             tile_scatter=P(AXIS),
                             g_panel=P(AXIS), g_cols=P(AXIS),
                             g_scatter=P(AXIS),
                             res_arow=P(AXIS), res_col=P(AXIS),
                             res_out=P(AXIS), rphm_to_csr=P())),
        out_specs=P(),
    )
    return jax.jit(mapped)
