"""2-D (x,y)-chunked Pallas kernel: TPU equivalence + interleaved A/B timing
against the 1-D whole-x-plane kernel, plus large-domain solo timing.

Modes:
  --check      : mid-size box where BOTH kernels fit; assert interior
                 bit-equality on real TPU (the Mosaic-lowering proof).
  --bench      : interleaved A/B (1-D vs 2-D) on the same box.
  --big RES    : solo 2-D kernel timing on a large box (1-D kernel cannot
                 run it) — the reference's 64M/216M-row coverage probe.
"""

import argparse
import sys
import time
from functools import partial

sys.path.insert(0, ".")


def build_patch(res, precision):
    import numpy as np

    from open_ludwig_tpu.cases import make_case_sphere
    from open_ludwig_tpu.config import load_case_config
    from open_ludwig_tpu.core.patch import build_patches
    from open_ludwig_tpu.geometry import load_mesh
    from open_ludwig_tpu.scaling import compute_domain_params
    import tempfile

    tmp = tempfile.mkdtemp()
    make_case_sphere(
        tmp, "1M", surface_resolution=res, num_levels=1,
        steps=100, ramp_steps=50, output_freq=100000, diag_freq=100000,
        precision=precision,
    )
    cfg = load_case_config(tmp)
    mesh = load_mesh(cfg.stl_path, scale=cfg.stl_scale)
    params = compute_domain_params(cfg, mesh.min_bounds, mesh.max_bounds)
    levels = build_patches(cfg, mesh, params)
    return cfg, levels[0]


def build_box(dims, precision):
    """Synthetic dense box with the bench tunnel's BC set and a small
    obstacle: decouples chunk-shape sweeps from the sphere cases' awkward
    padded extents (their YS is often 8 mod 16, which only admits PY=8)."""
    import numpy as np

    from open_ludwig_tpu.core.patch import (
        BC_INLET, BC_MIRROR_Y, BC_MIRROR_Z, BC_OUTLET, PatchLevel,
    )

    X, Y, Z = dims
    XS, YS, ZS = X, -(-Y // 8) * 8, -(-Z // 128) * 128
    p = PatchLevel(
        1, 0.1, 0.52, (0, 0, 0), (X, Y, Z), (XS, YS, ZS),
        (BC_INLET, BC_OUTLET, BC_MIRROR_Y, BC_MIRROR_Y,
         BC_MIRROR_Z, BC_MIRROR_Z),
        np.zeros((XS, YS, ZS), bool),
        np.zeros((XS, YS, ZS), np.float32),
        np.full((XS, YS, ZS), 100.0, np.float32),
    )
    cx, cy, cz = X // 3, Y // 2, Z // 2
    r = max(2, Y // 16)
    p.obstacle[cx - r:cx + r, cy - r:cy + r, cz - r:cz + r] = True

    class Knobs:
        c_wale = 0.5
        nu_sgs_background = 5e-4
        inlet_turbulence_intensity = 0.01
        wall_model_enabled = True
        sponge_blend_distributions = True
        pass

    k = Knobs()
    k.precision = precision
    return k, p


def make_steps(cfg, p, which, interpret, chunk_dims=None):
    from open_ludwig_tpu.ops.pallas_step import (
        make_pallas_step, make_pallas_step_2d,
    )

    kw = dict(
        c_wale=cfg.c_wale,
        nu_sgs_background=cfg.nu_sgs_background,
        inlet_turbulence=cfg.inlet_turbulence_intensity,
        wall_model=cfg.wall_model_enabled,
        sponge_blend=cfg.sponge_blend_distributions,
        store_bf16=cfg.precision == "bfloat16",
        interpret=interpret,
    )
    if which == "1d":
        return make_pallas_step(p, **kw)
    # "2da" = in-place variant (alias_f: x-lo halo from the parity save
    # buffer instead of the HBM re-read; no transient second f copy)
    return make_pallas_step_2d(p, chunk_dims=chunk_dims,
                               alias_f=which == "2da", **kw)



def _sync(st):
    """Materialize one element: on the axon tunnel backend
    block_until_ready has been observed returning before the dispatched
    program finishes (timing collapse at large shapes); a scalar fetch
    is the reliable fence."""
    import numpy as np

    return float(np.asarray(st["rho"][0, 0, 0]))

def run_scan(step, statics3d, states, n, donate=True):
    import jax
    import jax.numpy as jnp

    # statics threaded as jit ARGUMENTS, not closure captures: captured
    # device arrays serialize as literal constants into the (remote)
    # compile request, which the axon tunnel rejects past ~100 MB
    # (HTTP 413) — the same statics-as-args treatment the production
    # runner uses (solver_dense.make_batch_runner_dense)
    @partial(jax.jit, static_argnums=(3,), donate_argnums=(0,) if donate else ())
    def run(st, st3d, t0, n):
        def body(c, t):
            f, rho, vel = step(c["f"], c["vel"], 0.03, t, st3d)
            return {"f": f, "rho": rho, "vel": vel}, None

        out, _ = jax.lax.scan(body, st, t0 + jnp.arange(n, dtype=jnp.int32))
        return out

    return lambda st, t0, n: run(st, statics3d, t0, n)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from open_ludwig_tpu.jax_setup import setup_jax_cache

    setup_jax_cache()

    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--bench", action="store_true")
    ap.add_argument("--big", type=int, default=0)
    ap.add_argument("--res", type=int, default=20)
    ap.add_argument("--n", type=int, default=50)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--px", type=int, default=0)
    ap.add_argument("--py", type=int, default=0)
    ap.add_argument("--chunks", type=str, default="",
                    help="--big multi-config interleaved sweep: '16x8,16x16'")
    ap.add_argument("--box", type=str, default="",
                    help="synthetic box 'X,Y,Z' instead of a sphere case")
    ap.add_argument("--precision", type=str, default="bfloat16")
    ap.add_argument("--interpret", action="store_true", default=None)
    args = ap.parse_args()
    if args.interpret is None:
        args.interpret = jax.default_backend() == "cpu"
    print(f"device: {jax.devices()[0]}", flush=True)

    from open_ludwig_tpu.ops.pallas_step import choose_2d_chunks
    from open_ludwig_tpu.solver_dense import init_patch_state
    from open_ludwig_tpu.ops.pallas_step import prepare_pallas_statics

    if args.big or args.box:
        if args.box:
            cfg, p = build_box(
                tuple(int(v) for v in args.box.split(",")), args.precision)
        else:
            cfg, p = build_patch(args.big, args.precision)
        if args.chunks:
            # 'PXxPY' or 'PXxPYa' (trailing a = in-place alias_f variant)
            cds = [tuple(int(v) for v in c.rstrip("a").split("x"))
                   + (("a",) if c.endswith("a") else ())
                   for c in args.chunks.split(",")]
        elif args.px and args.py:
            cds = [(args.px, args.py)]
        else:
            cds = [choose_2d_chunks(p, cfg.precision == "bfloat16")]
        print(f"box {p.padded} = {p.n_cells/1e6:.1f}M cells, chunks {cds}",
              flush=True)
        st3d = prepare_pallas_statics(p)
        # interleaved multi-config: every config donates its state (the
        # returned state chains into its next window) — at 64M cells two
        # non-donated states OOM the chip
        runners = {}
        for cd in cds:
            step = make_steps(cfg, p, "2da" if "a" in cd else "2d",
                              args.interpret, chunk_dims=cd[:2])
            st = init_patch_state(p, cfg.precision)
            run = run_scan(step, st3d, st, args.n)
            t0 = time.perf_counter()
            st = run(st, np.int32(1), args.n)
            _sync(st)
            print(f"  {cd}: compile+first {time.perf_counter()-t0:.1f}s",
                  flush=True)
            runners[cd] = [run, st]
        dts = {cd: [] for cd in cds}
        for r in range(args.reps):
            for cd, rr in runners.items():
                run, st = rr
                t0 = time.perf_counter()
                st = run(st, np.int32(1 + (r + 1) * args.n), args.n)
                _sync(st)
                dt = (time.perf_counter() - t0) / args.n
                dts[cd].append(dt)
                print(f"  rep {r} {cd}: {dt*1e6:9.1f} us/step "
                      f"({p.n_cells/dt/1e6:7.0f} MLUPS)", flush=True)
                rr[1] = st
        for cd in cds:
            best = min(dts[cd])
            print(f"best {cd}: {p.n_cells/best/1e6:.0f} MLUPS", flush=True)
        return

    cfg, p = build_patch(args.res, args.precision)
    cd = choose_2d_chunks(p, cfg.precision == "bfloat16")
    if args.px and args.py:
        cd = (args.px, args.py)
    print(f"box {p.padded} = {p.n_cells/1e6:.1f}M cells, 2d chunks {cd}",
          flush=True)
    st3d = prepare_pallas_statics(p)

    if args.check:
        outs = {}
        for which in ("1d", "2d", "2da"):
            step = make_steps(cfg, p, which, args.interpret, chunk_dims=cd)
            st = init_patch_state(p, cfg.precision)
            run = run_scan(step, st3d, st, 8, donate=False)
            st = run(st, np.int32(1), 8)
            _sync(st)
            outs[which] = st
        X, Y, Z = p.interior
        worst = 0.0
        for other in ("2d", "2da"):
            for key in ("f", "rho", "vel"):
                a = np.asarray(outs["1d"][key], np.float32)[..., :X, :Y, :Z]
                b = np.asarray(outs[other][key], np.float32)[..., :X, :Y, :Z]
                d = float(np.abs(a - b).max())
                worst = max(worst, d)
                print(f"  1d vs {other} {key}: max|diff| = {d:.3e}",
                      flush=True)
        print(f"worst: {worst:.3e} -> {'PASS' if worst == 0.0 else 'CHECK'}")
        return

    # --bench: interleaved A/B
    runners = {}
    for which in ("1d", "2d"):
        step = make_steps(cfg, p, which, args.interpret, chunk_dims=cd)
        st = init_patch_state(p, cfg.precision)
        run = run_scan(step, st3d, st, args.n)
        t0 = time.perf_counter()
        st = run(st, np.int32(1), args.n)
        _sync(st)
        runners[which] = [run, st, time.perf_counter() - t0]
    dts = {m: [] for m in runners}
    for rep in range(args.reps):
        for which, r in runners.items():
            run, st, _c = r
            t0 = time.perf_counter()
            st = run(st, np.int32(args.n + 1), args.n)
            _sync(st)
            dts[which].append((time.perf_counter() - t0) / args.n)
            r[1] = st
    for which, r in runners.items():
        dt = min(dts[which])
        print(
            f"{which} {dt*1e6:9.1f} us | {p.n_cells/dt/1e6:7.0f} MLUPS "
            f"(compile {r[2]:.1f}s; reps "
            + ",".join(f"{d*1e6:.0f}" for d in dts[which]) + ")",
            flush=True,
        )


if __name__ == "__main__":
    main()
