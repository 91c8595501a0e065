"""Micro-probe: z-face slab extraction formulations (the trace shows the
current index-pick+lerp runs in a 1-lane-degenerate layout costing ~21 us
per lerp + ~13 us relayout copies — ~200 us/coarse total).

Each formulation extracts two z-planes (static indices) from a parent-sized
(27, X, Y, Z) bf16 array, lerps them, and feeds a dummy einsum matching the
interface pipeline's consumption layout.

Usage: python tools/probe_zslab.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from open_ludwig_tpu.jax_setup import setup_jax_cache

setup_jax_cache()


def timeit(name, fn, *args, n=300):
    fn(*args)  # compile
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1e6
    print(f"  {name:28s} {dt:8.1f} us")
    return dt


def main():
    # L2 parent shape from the bench, z-group slab want: (27, 33, 48) from
    # x-slice 33, y-slice 48, z-picks at i0, i1
    X, Y, Z = 46, 48, 128
    wa, wb = 33, 48
    i0, i1 = 3, 4
    wf = 0.37
    rng = np.random.default_rng(0)
    f = jnp.asarray(rng.standard_normal((27, X, Y, Z)), jnp.bfloat16)
    UA = jnp.asarray(rng.standard_normal((3, 60, wa)), jnp.float32)
    UB = jnp.asarray(rng.standard_normal((3, 64, wb)), jnp.float32)

    def consume(sl):
        # (27, wa, wb) f32 -> the pipeline's f einsum (ax=2 group)
        sl = sl.astype(jnp.float32).reshape(3, 3, 3, wa, wb)[None, None]
        return jnp.einsum("xAa,yBb,fnzyxab->fnAzyxB", UA, UB, sl)

    @jax.jit
    def f0(f):
        sl = jax.lax.dynamic_slice(f, (0, 2, 0, 0), (27, wa, wb, Z))
        lo = jax.lax.index_in_dim(sl, i0, 3, keepdims=False)
        hi = jax.lax.index_in_dim(sl, i1, 3, keepdims=False)
        return consume((1.0 - wf) * lo + wf * hi)

    @jax.jit
    def f1(f):
        sl = jax.lax.dynamic_slice(f, (0, 2, 0, 0), (27, wa, wb, Z))
        two = jax.lax.slice_in_dim(sl, i0, i0 + 2, axis=3)
        two = jnp.moveaxis(two, 3, 0).astype(jnp.float32)  # (2, 27, wa, wb)
        return consume((1.0 - wf) * two[0] + wf * two[1])

    @jax.jit
    def f2(f):
        # slice 2 lanes straight from the parent (no wide slab), upcast,
        # lerp on the 2-dim moved to front
        two = jax.lax.slice(f, (0, 2, 0, i0), (27, 2 + wa, wb, i0 + 2))
        two = jnp.moveaxis(two, 3, 0).astype(jnp.float32)
        return consume((1.0 - wf) * two[0] + wf * two[1])

    @jax.jit
    def f3(f):
        # fold the lerp into the big einsum as an N=2 contraction
        two = jax.lax.slice(f, (0, 2, 0, i0), (27, 2 + wa, wb, i0 + 2))
        un = jnp.asarray([1.0 - wf, wf], jnp.float32)
        sl = two.astype(jnp.float32).reshape(3, 3, 3, wa, wb, 2)[None, None]
        return jnp.einsum("xAa,yBb,N,fnzyxabN->fnAzyxB", UA, UB, un, sl)

    @jax.jit
    def f4(f):
        # lerp in-place over the full-z slab (no pick), THEN one 1-lane pick
        # whose output feeds the upcast: shifted = roll over z
        sl = jax.lax.dynamic_slice(f, (0, 2, 0, 0), (27, wa, wb, Z))
        ler = (1.0 - wf) * sl + wf * jnp.roll(sl, -1, axis=3)
        lo = jax.lax.index_in_dim(ler, i0, 3, keepdims=False)
        return consume(lo)

    print("z-slab formulations (L2->L3 z-group, one face one state):")
    for name, fn in [("f0 pick+lerp (current)", f0),
                     ("f1 slice2+moveaxis+lerp", f1),
                     ("f2 lane-slice2+moveaxis", f2),
                     ("f3 einsum N-contract", f3),
                     ("f4 full-z lerp+pick", f4)]:
        try:
            timeit(name, fn, f)
        except Exception as e:
            print(f"  {name:28s} FAILED: {str(e)[:80]}")


if __name__ == "__main__":
    main()
