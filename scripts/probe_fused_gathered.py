"""Measure the fused (in-kernel DMA-gather) gathered tile kernel vs the
XLA take()+matmul formulation (VERDICT r2 next-step #3).

Prints ns/tile for both at K in {32, 128}; the result (win or measured
refutation) goes to PERF.md.
"""
import sys
import time

import numpy as np


def main() -> int:
    from bsmr_sddmm_tpu.utils.hostmem import tune_malloc
    tune_malloc()   # packing is allocation-bound here (PERF.md)
    import jax
    import jax.numpy as jnp

    from bsmr_sddmm_tpu.config import SddmmConfig
    from bsmr_sddmm_tpu.formats import make_dense, random_mask
    from bsmr_sddmm_tpu.ops.pallas_dense import make_fused_gathered_kernel
    from bsmr_sddmm_tpu.ops.sddmm import device_plan, make_sddmm_body
    from bsmr_sddmm_tpu.pack import pack_tiles
    from bsmr_sddmm_tpu.reorder import bsmr
    from bsmr_sddmm_tpu.utils.timing import time_tier_inprogram

    csr = random_mask(8192, 8192, 600_000, seed=4)
    for k in (32, 128):
        cfg = SddmmConfig(k=k, panel_height=32, delta=1.1,
                          residual_tile_min_nnz=16, subpack_min_nnz=0)
        reord = bsmr(csr, cfg)
        plan = pack_tiles(csr, reord, cfg)
        Tg = plan.g_panel.shape[0]
        if not Tg:
            print(f"K={k}: no gathered tiles")
            continue
        A = jnp.asarray(make_dense(csr.rows, k, seed=1))
        Bt = jnp.asarray(make_dense(csr.cols, k, seed=2))
        dplan = device_plan(plan, emit="rphm")

        # XLA baseline: only_tier="gathered"
        body = make_sddmm_body(plan, cfg, only_tier="gathered")
        ms_xla = time_tier_inprogram(body, A, Bt, dplan, opaque=False)

        # fused kernel
        kern = make_fused_gathered_kernel(
            num_panels=max(plan.num_panels, 1), ph=plan.panel_height,
            bw=plan.block_width, k=k)
        cols_flat = jnp.asarray(plan.g_cols.reshape(-1))

        def fused_body(A_op, Bt_op, dp):
            A_perm = jnp.take(A_op.astype(jnp.float32),
                              dp.row_perm_padded, axis=0)
            A_panels = A_perm.reshape(max(plan.num_panels, 1),
                                      plan.panel_height, k)
            return kern(A_panels, Bt_op, dp.g_panel, cols_flat)

        # correctness first
        out_f = np.asarray(jax.jit(fused_body)(A, Bt, dplan))
        out_x = np.asarray(jax.jit(body)(A, Bt, dplan))
        err = np.abs(out_f - out_x).max()
        ms_fused = time_tier_inprogram(fused_body, A, Bt, dplan,
                                       opaque=True)
        print(f"K={k}: Tg={Tg}  xla {ms_xla*1e6/Tg:.0f} ns/tile  "
              f"fused {ms_fused*1e6/Tg:.0f} ns/tile  "
              f"(max abs diff {err:.2e})", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
