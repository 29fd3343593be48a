"""Microbench: gathered-tier formulations on the real TPU.

Variants on one suite matrix's gathered tier shapes:
  take_only   : the row gather alone
  xla_high    : take + batched dot_general HIGH (current tier)
  xla_bf16pre : pre-split Bt to bf16 hi/lo once, gather both, 3 bf16 dots
  pallas_tile : take outside + make_dense_tile_kernel (VMEM hi/lo)
  pallas_fat  : take outside + fat (G tiles -> one (G*ph,bw) matmul)? n/a
"""
import sys, time
import numpy as np, jax, jax.numpy as jnp
from bsmr_sddmm_tpu.config import SddmmConfig
from bsmr_sddmm_tpu.datasets import SUITE, EXTRA
SUITE = SUITE + EXTRA
from bsmr_sddmm_tpu.reorder import bsmr
from bsmr_sddmm_tpu.pack import pack_tiles
from bsmr_sddmm_tpu.formats import make_dense
from bsmr_sddmm_tpu.utils.timing import time_jitted

name = sys.argv[1] if len(sys.argv) > 1 else "community_16k"
K = 128
csr = dict(SUITE)[name]()
cfg = SddmmConfig(k=K, panel_height=32, delta=0.02)
plan = pack_tiles(csr, bsmr(csr, cfg), cfg)
Tg, ph, bw = plan.g_panel.shape[0], plan.panel_height, plan.block_width
print(f"{name}: Tg={Tg} (real {plan.num_gathered}) windows={plan.window_rows} groups={None if plan.g_groups is None else len(plan.g_groups)}")
A = jnp.asarray(make_dense(csr.rows, K, seed=1))
Bt = jnp.asarray(make_dense(K, csr.cols, seed=2).T.copy())
P = max(plan.num_panels, 1)
A_panels = jnp.asarray(np.zeros((P, ph, K), np.float32))
g_cols = jnp.asarray(plan.g_cols)
g_panel = jnp.asarray(plan.g_panel)

def t(fn, *args, iters=8):
    f = jax.jit(fn)
    ms, _ = time_jitted(f, *args, iterations=iters)
    return ms

# 1. take only
ms = t(lambda Bt, gc: jnp.take(Bt, gc.reshape(-1), axis=0), Bt, g_cols)
print(f"take_only      : {ms:.3f} ms = {ms*1e6/Tg:.0f} ns/tile")

# 2. current: chunked scan take+dot HIGH
def xla_high(Ap, Bt, gc, gp):
    C = 512
    S = Tg // C if Tg % C == 0 else -(-Tg//C)
    import jax.numpy as jnp2
    gcp = jnp.pad(gc, ((0, S*C-Tg), (0,0))); gpp = jnp.pad(gp, (0, S*C-Tg))
    def step(_, ch):
        pc, cc = ch
        b = jnp.take(Bt, cc.reshape(-1), axis=0).reshape(C, bw, K)
        a = jnp.take(Ap, pc, axis=0)
        return None, jax.lax.dot_general(a, b, (((2,),(2,)),((0,),(0,))),
                                         precision=jax.lax.Precision.HIGH,
                                         preferred_element_type=jnp.float32)
    _, out = jax.lax.scan(step, None, (gpp.reshape(S,C), gcp.reshape(S,C,bw)))
    return out
ms = t(xla_high, A_panels, Bt, g_cols, g_panel)
print(f"xla_high scan  : {ms:.3f} ms = {ms*1e6/Tg:.0f} ns/tile")

# 2b. same but unrolled python loop (no scan)
def xla_high_unroll(Ap, Bt, gc, gp):
    C = 512
    S = -(-Tg//C)
    gcp = jnp.pad(gc, ((0, S*C-Tg), (0,0))); gpp = jnp.pad(gp, (0, S*C-Tg))
    outs = []
    for s in range(S):
        cc = jax.lax.slice_in_dim(gcp, s*C, (s+1)*C)
        pc = jax.lax.slice_in_dim(gpp, s*C, (s+1)*C)
        b = jnp.take(Bt, cc.reshape(-1), axis=0).reshape(C, bw, K)
        a = jnp.take(Ap, pc, axis=0)
        outs.append(jax.lax.dot_general(a, b, (((2,),(2,)),((0,),(0,))),
                                        precision=jax.lax.Precision.HIGH,
                                        preferred_element_type=jnp.float32))
    return jnp.concatenate(outs, 0)
ms = t(xla_high_unroll, A_panels, Bt, g_cols, g_panel)
print(f"xla_high unroll: {ms:.3f} ms = {ms*1e6/Tg:.0f} ns/tile")

# 3. one big take + one big batched dot (no chunking; memory ok at these sizes)
def xla_big(Ap, Bt, gc, gp):
    b = jnp.take(Bt, gc.reshape(-1), axis=0).reshape(Tg, bw, K)
    a = jnp.take(Ap, gp, axis=0)
    return jax.lax.dot_general(a, b, (((2,),(2,)),((0,),(0,))),
                               precision=jax.lax.Precision.HIGH,
                               preferred_element_type=jnp.float32)
ms = t(xla_big, A_panels, Bt, g_cols, g_panel)
print(f"xla_big        : {ms:.3f} ms = {ms*1e6/Tg:.0f} ns/tile")

# 4. bf16 pre-split: split Bt once, gather hi/lo, 3 bf16 batched dots
def xla_bf16pre(Ap, Bt, gc, gp):
    bh = Bt.astype(jnp.bfloat16)
    bl = (Bt - bh.astype(jnp.float32)).astype(jnp.bfloat16)
    ah = Ap.astype(jnp.bfloat16)
    al = (Ap - ah.astype(jnp.float32)).astype(jnp.bfloat16)
    gbh = jnp.take(bh, gc.reshape(-1), axis=0).reshape(Tg, bw, K)
    gbl = jnp.take(bl, gc.reshape(-1), axis=0).reshape(Tg, bw, K)
    gah = jnp.take(ah, gp, axis=0)
    gal = jnp.take(al, gp, axis=0)
    dn = (((2,),(2,)),((0,),(0,)))
    mm = lambda x, y: jax.lax.dot_general(x, y, dn, preferred_element_type=jnp.float32)
    return mm(gah, gbh) + mm(gah, gbl) + mm(gal, gbh)
ms = t(xla_bf16pre, A_panels, Bt, g_cols, g_panel)
print(f"xla_bf16pre    : {ms:.3f} ms = {ms*1e6/Tg:.0f} ns/tile")

# 5. pallas tile kernel on pre-gathered tiles
from bsmr_sddmm_tpu.ops.pallas_dense import make_dense_tile_kernel
kern = make_dense_tile_kernel(P, ph, bw, K, chunk=Tg, precision="bf16x3")
def pallas_tile(Ap, Bt, gc, gp):
    b = jnp.take(Bt, gc.reshape(-1), axis=0).reshape(Tg, bw, K)
    return kern(Ap, b, gp)
ms = t(pallas_tile, A_panels, Bt, g_cols, g_panel)
print(f"pallas_tile    : {ms:.3f} ms = {ms*1e6/Tg:.0f} ns/tile")
