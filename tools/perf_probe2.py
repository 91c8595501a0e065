"""Scan-based per-component timing: each component loops N times INSIDE one
jit (lax.scan), so per-dispatch/tunnel overhead vanishes and the number is
the true on-device cost per iteration.

Usage: python tools/perf_probe2.py [--levels 3] [--res 25] [--n 100]
"""

import argparse
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, ".")


def scan_time(make_body, init_carry, n, label, work_cells=None):
    """jit a lax.scan of `make_body` over n iterations; return s/iter."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(carry):
        def body(c, t):
            return make_body(c, t), None

        out, _ = jax.lax.scan(body, carry, jnp.arange(n, dtype=jnp.int32))
        return out

    t0 = time.perf_counter()
    out = run(init_carry)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    out = run(init_carry)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    msg = f"{label:42s} {dt*1e6:9.1f} us/iter (compile {compile_s:5.1f}s)"
    if work_cells:
        msg += f" | {dt/work_cells*1e9:6.2f} us/kcell | {work_cells/dt/1e6:6.0f} MLUPS"
    print(msg, flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", type=int, default=3)
    ap.add_argument("--res", type=int, default=25)
    ap.add_argument("--n", type=int, default=100)
    ap.add_argument("--px", type=int, default=0, help="probe pallas PX variants")
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
        interface_endpoints,
        interface_from_endpoints,
    )
    from open_ludwig_tpu.ops.pallas_step import make_pallas_step
    from open_ludwig_tpu.scaling import compute_domain_params
    from open_ludwig_tpu.solver_dense import (
        build_patch_statics,
        init_patch_state,
        make_coarse_step_dense,
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
        print(f"level {p.level_id}: padded={p.padded} cells={p.n_cells/1e6:.3f}M",
              flush=True)

    u = jnp.float32(cfg.u_lattice)
    n = args.n

    # --- roofline: HBM-bound roll (uncollapsible copy) of one f array ---
    for li, p in enumerate(levels):
        f = states[li]["f"]
        b = f.size * 4 * 2  # read + write

        def roll_body(c, t):
            return jnp.roll(c, 1, axis=1) + 1e-12

        dt = scan_time(roll_body, f, n,
                       f"L{li} f-array x-roll ({b/1e6:.0f} MB rw)")
        print(f"    -> {b/dt/1e9:7.0f} GB/s effective HBM", flush=True)

    # --- per-level pallas step scanned (state-fed-back) ---
    px_list = [0] if not args.px else [0, 2, 4, 8, 16]
    for li, p in enumerate(levels):
        iface0 = None
        if li > 0:
            ep = jax.jit(lambda s: interface_endpoints(
                levels[li], levels[li - 1], s))(states[li - 1])
            iface0 = jax.jit(lambda e: interface_from_endpoints(
                e, e, levels[li], levels[li - 1], 0.5, True))(ep)
        for px in px_list:
            if px and (p.padded[0] % px or
                       4 * 30 * px * p.padded[1] * p.padded[2] * 4 > 90 * 2**20):
                continue
            try:
                pstep = make_pallas_step(
                    p, c_wale=cfg.c_wale,
                    nu_sgs_background=cfg.nu_sgs_background,
                    inlet_turbulence=cfg.inlet_turbulence_intensity,
                    wall_model=cfg.wall_model_enabled,
                    sponge_blend=cfg.sponge_blend_distributions,
                    planes_per_step=px,
                )

                def body(c, t, _ps=pstep, _li=li, _if=iface0):
                    f, v = c
                    fo, _, vo = _ps(f, v, u, t, statics[_li], _if)
                    return (fo, vo)

                scan_time(body, (states[li]["f"], states[li]["vel"]), n,
                          f"L{li} pallas step px={px or 'auto'}",
                          work_cells=p.n_cells)
            except Exception as e:
                print(f"L{li} px={px}: FAILED {type(e).__name__}: {str(e)[:120]}",
                      flush=True)

    # --- interface endpoints + lerp, scanned ---
    for li in range(1, len(levels)):
        p, par = levels[li], levels[li - 1]

        def ep_body(c, t, _p=p, _par=par, _li=li):
            ep = interface_endpoints(_p, _par, states[_li - 1])
            ifc = interface_from_endpoints(ep, ep, _p, _par, 0.5, True)
            # fold a value back into the carry so nothing is DCE'd
            s = sum(jnp.sum(v) for v in ifc.values())
            return c + s * 1e-20

        scan_time(ep_body, jnp.float32(0), n, f"L{li} endpoints+lerp")

    # --- bouzidi scanned ---
    for li, p in enumerate(levels):
        if statics[li]["bouzidi"] is None:
            continue

        def bz_body(c, t, _li=li):
            return apply_bouzidi_dense(c, statics[_li]["bouzidi"])

        scan_time(bz_body, states[li]["f"], n, f"L{li} bouzidi dense")

    # --- full coarse step (the production composition) ---
    coarse = make_coarse_step_dense(cfg, params, levels, statics)
    upd = sum(p.n_cells * 2 ** (p.level_id - 1) for p in levels)

    def cs_body(c, t):
        return tuple(coarse(list(c), t))

    dt = scan_time(cs_body, tuple(states), max(n // 2, 10), "full coarse step",
                   work_cells=upd)


if __name__ == "__main__":
    main()
