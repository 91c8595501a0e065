"""Per-component timing probe for the bench configuration.

Times, in isolation on the real device:
  - each level's fused stream-collide step (Pallas and XLA variants)
  - interface endpoint extraction + ghost-plane interpolation
  - the dense Bouzidi correction
  - the full coarse step and the scanned batch

Usage: python tools/perf_probe.py [--levels 3] [--res 25] [--steps 30]
"""

import argparse
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, ".")


def timeit(fn, *args, n=30, warmup=2, **kw):
    import jax

    out = None
    for _ in range(warmup):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", type=int, default=3)
    ap.add_argument("--res", type=int, default=25)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--no-pallas", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from open_ludwig_tpu.jax_setup import setup_jax_cache

    setup_jax_cache()

    from open_ludwig_tpu.cases import make_case_sphere
    from open_ludwig_tpu.config import load_case_config
    from open_ludwig_tpu.core.patch import build_patches
    from open_ludwig_tpu.geometry import load_mesh
    from open_ludwig_tpu.ops.dense_step import (
        apply_bouzidi_dense,
        dense_stream_collide,
        interface_endpoints,
        interface_from_endpoints,
    )
    from open_ludwig_tpu.ops.pallas_step import make_pallas_step
    from open_ludwig_tpu.scaling import compute_domain_params
    from open_ludwig_tpu.solver_dense import (
        build_patch_statics,
        init_patch_state,
        make_batch_runner_dense,
    )

    print(f"device: {jax.devices()[0]}", flush=True)
    tmp = tempfile.mkdtemp()
    make_case_sphere(
        tmp, "1M", surface_resolution=args.res, num_levels=args.levels,
        steps=400, ramp_steps=200, output_freq=100000, diag_freq=100000,
        wake_enabled=True,
    )
    cfg = load_case_config(tmp)
    mesh = load_mesh(cfg.stl_path, scale=cfg.stl_scale)
    params = compute_domain_params(cfg, mesh.min_bounds, mesh.max_bounds)
    levels = build_patches(cfg, mesh, params)
    statics = build_patch_statics(cfg, levels)
    states = [init_patch_state(p) for p in levels]

    for p in levels:
        print(f"level {p.level_id}: padded={p.padded} interior={p.interior} "
              f"cells={p.n_cells/1e6:.3f}M plane={p.padded[1]}x{p.padded[2]}",
              flush=True)

    u = jnp.float32(cfg.u_lattice)
    seed = jnp.int32(7)

    # --- per-level fused step, isolated ---
    for li, p in enumerate(levels):
        st = states[li]
        iface = None
        if li > 0:
            ep = interface_endpoints(p, levels[li - 1], states[li - 1])
            iface_fn = jax.jit(
                lambda e: interface_from_endpoints(
                    e, e, p, levels[li - 1], 0.5, True
                )
            )
            dt_if, iface = timeit(iface_fn, ep, n=args.steps)
            ep_fn = jax.jit(lambda s: interface_endpoints(p, levels[li - 1], s))
            dt_ep, _ = timeit(ep_fn, states[li - 1], n=args.steps)
            print(f"L{li} endpoints: {dt_ep*1e6:8.1f} us | iface lerp: "
                  f"{dt_if*1e6:8.1f} us", flush=True)

        if not args.no_pallas:
            pstep = make_pallas_step(
                p, c_wale=cfg.c_wale, nu_sgs_background=cfg.nu_sgs_background,
                inlet_turbulence=cfg.inlet_turbulence_intensity,
                wall_model=cfg.wall_model_enabled,
                sponge_blend=cfg.sponge_blend_distributions,
            )
            fn = jax.jit(lambda f, v, ifc: pstep(f, v, u, seed, statics[li], ifc))
            dt, _ = timeit(fn, st["f"], st["vel"], iface, n=args.steps)
            per_kcell = dt / p.n_cells * 1e9
            bw = (p.n_padded * 4 * (27 * 2 + 3 * 2 + 1 + 1 + 1 + 1)) / dt / 1e9
            print(f"L{li} pallas step: {dt*1e6:8.1f} us | {per_kcell:6.2f} us/kcell "
                  f"| {p.n_cells/dt/1e6:7.0f} MLUPS | ~{bw:5.0f} GB/s eff",
                  flush=True)

        xfn = jax.jit(
            lambda f, v, ifc: dense_stream_collide(
                f, v, u, seed, statics[li], p,
                c_wale=cfg.c_wale, nu_sgs_background=cfg.nu_sgs_background,
                inlet_turbulence=cfg.inlet_turbulence_intensity,
                wall_model=cfg.wall_model_enabled,
                sponge_blend=cfg.sponge_blend_distributions, iface=iface,
            )
        )
        dt, _ = timeit(xfn, st["f"], st["vel"], iface, n=max(args.steps // 3, 3))
        print(f"L{li} XLA    step: {dt*1e6:8.1f} us | {dt/p.n_cells*1e9:6.2f} us/kcell "
              f"| {p.n_cells/dt/1e6:7.0f} MLUPS", flush=True)

        if statics[li]["bouzidi"] is not None:
            bfn = jax.jit(lambda f: apply_bouzidi_dense(f, statics[li]["bouzidi"]))
            dt, _ = timeit(bfn, st["f"], n=args.steps)
            print(f"L{li} bouzidi: {dt*1e6:8.1f} us", flush=True)

    # --- full coarse step + scanned batch ---
    run = make_batch_runner_dense(cfg, params, levels, statics)
    updates = sum(p.n_cells * 2 ** (p.level_id - 1) for p in levels)

    def batch20(s):
        return run(s, np.int32(1), 20)

    dt, _ = timeit(batch20, states, n=3, warmup=1)
    per_coarse = dt / 20
    print(f"scanned coarse step: {per_coarse*1e6:8.1f} us | "
          f"{updates/per_coarse/1e6:7.0f} MLUPS aggregate", flush=True)


if __name__ == "__main__":
    main()
