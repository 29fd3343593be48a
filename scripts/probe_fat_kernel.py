"""Fat dense-kernel variants on an ideal synthetic plan (v5e)."""
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from bsmr_sddmm_tpu.utils.timing import force
import time

ph, bw, K = 32, 128, 128
NP_ = 1024          # panels
NCB = 32            # cblocks
T = 16384           # tiles: runs of 16 per cblock...
A_panels = jnp.asarray(np.random.default_rng(0).normal(size=(NP_, ph, K)).astype(np.float32))
Bt = jnp.asarray(np.random.default_rng(1).normal(size=(NCB*bw, K)).astype(np.float32))
# tiles sorted by cblock: each cblock has T/NCB consecutive tiles with ascending panels
tile_panel = np.tile(np.arange(T // NCB) % NP_, NCB).astype(np.int32)
tile_cblock = np.repeat(np.arange(NCB), T // NCB).astype(np.int32)

def mm3(a, b):
    ah = a.astype(jnp.bfloat16); al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
    bh = b.astype(jnp.bfloat16); bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)
    dn = (((1,), (1,)), ((), ()))
    f = lambda x, y: jax.lax.dot_general(x, y, dn, preferred_element_type=jnp.float32)
    return f(ah, bh) + f(ah, bl) + f(al, bh)

def variant_concat(G):
    n_steps = T // G
    def kernel(pref, cref, *refs):
        a_refs = refs[:G]; b_ref, out_ref = refs[G], refs[G+1]
        a = jnp.concatenate([ar[0] for ar in a_refs], axis=0)
        out_ref[0] = mm3(a, b_ref[:])
    def a_index(g):
        return lambda t, pref, cref: (pref[t*G+g], 0, 0)
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(n_steps,),
        in_specs=([pl.BlockSpec((1, ph, K), a_index(g)) for g in range(G)]
                  + [pl.BlockSpec((bw, K), lambda t, pref, cref: (cref[t], 0))]),
        out_specs=pl.BlockSpec((1, G*ph, bw), lambda t, pref, cref: (t, 0, 0)))
    call = pl.pallas_call(kernel, grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((n_steps, G*ph, bw), jnp.float32))
    step_cb = jnp.asarray(tile_cblock.reshape(n_steps if G==1 else T//G, -1)[:, 0].copy())
    tp = jnp.asarray(tile_panel)
    return jax.jit(lambda: call(tp, step_cb, *([A_panels]*G), Bt))

def variant_per_g(G):
    n_steps = T // G
    def kernel(pref, cref, *refs):
        a_refs = refs[:G]; b_ref, out_ref = refs[G], refs[G+1]
        for g in range(G):
            out_ref[0, g*ph:(g+1)*ph, :] = mm3(a_refs[g][0], b_ref[:])
    def a_index(g):
        return lambda t, pref, cref: (pref[t*G+g], 0, 0)
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(n_steps,),
        in_specs=([pl.BlockSpec((1, ph, K), a_index(g)) for g in range(G)]
                  + [pl.BlockSpec((bw, K), lambda t, pref, cref: (cref[t], 0))]),
        out_specs=pl.BlockSpec((1, G*ph, bw), lambda t, pref, cref: (t, 0, 0)))
    call = pl.pallas_call(kernel, grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((n_steps, G*ph, bw), jnp.float32))
    step_cb = jnp.asarray(tile_cblock.reshape(T//G, -1)[:, 0].copy())
    tp = jnp.asarray(tile_panel)
    return jax.jit(lambda: call(tp, step_cb, *([A_panels]*G), Bt))

def bench(name, f):
    r = f(); force(r)
    # in-program style: no — measure by wall batch (big enough output)
    N = 40
    t0 = time.perf_counter()
    for _ in range(N):
        r = f()
    force(r)
    dt = (time.perf_counter() - t0 - 0.026) / N
    print(f"{name}: {dt*1e6:.0f} us/call = {dt*1e9/T:.0f} ns/tile", flush=True)

for G in (8, 16):
    bench(f"concat G={G}", variant_concat(G))
    bench(f"per-g  G={G}", variant_per_g(G))

bench("concat G=32", variant_concat(32))
