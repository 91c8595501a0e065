"""Interleaved A/B of the storage z-pad tile (core.patch.Z_PAD_TILE) on the
production coarse step: tile 128 (round-2 layout, ZS always a 128-lane
multiple) vs tile 8 (natural z extents; Mosaic tile-pads sub-128 lane dims in
VMEM while every HBM byte the rotating DMA window moves shrinks to the useful
fraction — the Re1M bench L1 is (64, 56, 56), i.e. 2.3x pad at tile 128).

Both variants are BUILT AND COMPILED in one process and the timed windows are
interleaved (the tunnel TPU is shared; see NOTES_ROUND3_PERF.md).

Usage: python tools/probe_ztile.py [--res 25] [--levels 3] [--n 200] [--reps 5]
"""

import argparse
import sys
import tempfile
import time
from functools import partial

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", type=int, default=3)
    ap.add_argument("--res", type=int, default=25)
    ap.add_argument("--n", type=int, default=200)
    ap.add_argument("--precision", type=str, default="bfloat16")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--tiles", type=str, default="128,8")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from open_ludwig_tpu.jax_setup import setup_jax_cache

    setup_jax_cache()

    from open_ludwig_tpu.cases import make_case_sphere
    from open_ludwig_tpu.config import load_case_config
    from open_ludwig_tpu.core import patch as patch_mod
    from open_ludwig_tpu.geometry import load_mesh
    from open_ludwig_tpu.scaling import compute_domain_params
    from open_ludwig_tpu.solver_dense import (
        build_patch_statics,
        init_patch_state,
        make_coarse_step_dense,
        statics_arg_arrays,
    )

    print(f"device: {jax.devices()[0]}", flush=True)
    tmp = tempfile.mkdtemp()
    make_case_sphere(
        tmp, "1M", surface_resolution=args.res, num_levels=args.levels,
        steps=400, ramp_steps=200, output_freq=100000, diag_freq=100000,
        wake_enabled=True, precision=args.precision,
    )
    cfg = load_case_config(tmp)
    mesh = load_mesh(cfg.stl_path, scale=cfg.stl_scale)
    params = compute_domain_params(cfg, mesh.min_bounds, mesh.max_bounds)

    runners = {}
    upds = {}
    for tile in (int(t) for t in args.tiles.split(",")):
        patch_mod.Z_PAD_TILE = tile
        levels = patch_mod.build_patches(cfg, mesh, params)
        statics = build_patch_statics(cfg, levels)
        upd = sum(p.n_cells * 2 ** (p.level_id - 1) for p in levels)
        upds[tile] = upd
        print(
            f"tile {tile}: updates/coarse {upd/1e6:.2f}M  "
            f"padded={[p.padded for p in levels]}", flush=True,
        )
        coarse = make_coarse_step_dense(cfg, params, levels, statics)
        arrs = statics_arg_arrays(statics)

        @partial(jax.jit, static_argnums=(3,), donate_argnums=(0,))
        def run(states, arrs_, t0, n, _co=coarse):
            def body(c, t):
                return _co(list(c), t, arrs_), None

            out, _ = jax.lax.scan(
                body, states, t0 + jnp.arange(n, dtype=jnp.int32)
            )
            return out

        states = [init_patch_state(p, cfg.precision) for p in levels]
        states = coarse.seed_slabs(states)
        t0 = time.perf_counter()
        states = run(states, arrs, np.int32(1), args.n)
        jax.block_until_ready(states[0]["rho"])
        compile_s = time.perf_counter() - t0
        runners[tile] = (run, states, compile_s, arrs)

    dts = {m: [] for m in runners}
    for rep in range(args.reps):
        for tile, (run, states, _c, arrs) in runners.items():
            t0 = time.perf_counter()
            states = run(states, arrs, np.int32(args.n + 1), args.n)
            jax.block_until_ready(states[0]["rho"])
            dts[tile].append((time.perf_counter() - t0) / args.n)
            runners[tile] = (run, states, _c, arrs)
    for tile, (run, states, compile_s, _a) in runners.items():
        dt = min(dts[tile])
        print(
            f"ztile[{tile:4d}] {dt*1e6:9.1f} us "
            f"| {upds[tile]/dt/1e6:7.0f} MLUPS (compile {compile_s:.1f}s; reps "
            + ",".join(f"{d*1e6:.0f}" for d in dts[tile]) + ")",
            flush=True,
        )


if __name__ == "__main__":
    main()
