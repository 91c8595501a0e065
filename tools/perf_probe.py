"""Kernel dissection: split the Pallas step into DMA / +streaming / +collide
stages and compare f32 vs bf16 g-storage, per level of the Re1M bench case.

Each stage loops inside one lax.scan (per-dispatch overhead vanishes):
  copy      = DMA windows in, outputs out (memory speed-of-light proxy)
  nocollide = + 27-direction pull shifts and BC masked selects
  full      = + moments/WALE/wall-model/regularized collide

Usage: python tools/perf_probe.py [--levels 3] [--res 25] [--n 100]
"""

import argparse
import sys
import tempfile
import time

sys.path.insert(0, ".")


def scan_time(make_body, init_carry, n, label, work_cells=None):
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
    msg = f"{label:46s} {dt*1e6:9.1f} us/iter (compile {compile_s:5.1f}s)"
    if work_cells:
        msg += f" | {dt/work_cells*1e9:6.2f} us/kcell | {work_cells/dt/1e6:6.0f} MLUPS"
    print(msg, flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", type=int, default=3)
    ap.add_argument("--res", type=int, default=25)
    ap.add_argument("--n", type=int, default=100)
    ap.add_argument("--stages", type=str, default="copy,nocollide,full")
    ap.add_argument("--coarse", type=int, default=1)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from open_ludwig_tpu.jax_setup import setup_jax_cache

    setup_jax_cache()

    from open_ludwig_tpu.cases import make_case_sphere
    from open_ludwig_tpu.config import load_case_config
    from open_ludwig_tpu.core.patch import build_patches
    from open_ludwig_tpu.geometry import load_mesh
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

    for p in levels:
        pad = p.padded[0] * p.padded[1] * p.padded[2]
        print(f"level {p.level_id}: padded={p.padded} interior={p.interior} "
              f"cells={p.n_cells/1e6:.3f}M pad-waste={pad/p.n_cells:.2f}x",
              flush=True)

    u = jnp.float32(cfg.u_lattice)
    n = args.n
    kw = dict(
        c_wale=cfg.c_wale,
        nu_sgs_background=cfg.nu_sgs_background,
        inlet_turbulence=cfg.inlet_turbulence_intensity,
        wall_model=cfg.wall_model_enabled,
        sponge_blend=cfg.sponge_blend_distributions,
    )

    from open_ludwig_tpu.ops.dense_step import (
        interface_endpoints,
        interface_from_endpoints,
    )
    from open_ludwig_tpu.ops.pallas_step import prep_iface_pallas

    for li, p in enumerate(levels):
        for prec, bf in (("f32", False), ("bf16", True)):
            st = init_patch_state(p, "bfloat16" if bf else "float32")
            for stage in args.stages.split(","):
                try:
                    pstep = make_pallas_step(p, store_bf16=bf, _stage=stage, **kw)
                    # rest-state ghost planes in the kernel's pre-shifted
                    # layout and storage space (interface levels only)
                    iface0 = None
                    if li > 0:
                        st_par = init_patch_state(levels[li - 1])
                        ep = jax.jit(
                            lambda s: interface_endpoints(p, levels[li - 1], s)
                        )(st_par)
                        fr = jax.jit(
                            lambda e: interface_from_endpoints(
                                e, e, p, levels[li - 1], 0.5, True
                            )
                        )(ep)
                        g_nat = getattr(pstep, "g_native", False)
                        iface0 = prep_iface_pallas(fr, p, g_shifted=g_nat)
                        if g_nat:
                            iface0 = {
                                k: v.astype(jnp.bfloat16)
                                for k, v in iface0.items()
                            }

                    def body(c, t, _ps=pstep, _li=li, _if=iface0):
                        f, v = c
                        fo, _, vo = _ps(f, v, u, t, statics[_li], _if)
                        return (fo, vo)

                    scan_time(body, (st["f"], st["vel"]), n,
                              f"L{li} {prec} {stage}", work_cells=p.n_cells)
                except Exception as e:
                    print(f"L{li} {prec} {stage}: FAILED {type(e).__name__}: "
                          f"{str(e)[:140]}", flush=True)

    # full production coarse step, f32 vs bf16
    for prec in (("float32", "bfloat16") if args.coarse else ()):
        c = cfg.with_overrides(precision=prec)
        from open_ludwig_tpu.solver_dense import make_coarse_step_dense

        coarse = make_coarse_step_dense(c, params, levels, statics)
        states = tuple(init_patch_state(p, prec) for p in levels)
        upd = sum(p.n_cells * 2 ** (p.level_id - 1) for p in levels)

        def cs_body(cr, t, _co=coarse):
            return tuple(_co(list(cr), t))

        scan_time(cs_body, states, max(n // 2, 10),
                  f"full coarse step [{prec}]", work_cells=upd)


if __name__ == "__main__":
    main()
