"""Flat-(y,z) coarse-level layout: CPU equivalence check + TPU interleaved
A/B on the production coarse step.

Modes:
  --check : build a small 2-level case twice (flat_coarse on / off), step a
            few coarse steps with the Pallas kernel (interpret on CPU), and
            compare interior fields.
  --bench : interleaved A/B of flat on/off on the Re1M bench shape (TPU).
"""

import argparse
import sys
import tempfile
import time
from functools import partial

sys.path.insert(0, ".")


def build(tmp, flat, args):
    import jax.numpy as jnp
    import numpy as np

    from open_ludwig_tpu.cases import make_case_sphere
    from open_ludwig_tpu.config import load_case_config
    from open_ludwig_tpu.core.patch import build_patches
    from open_ludwig_tpu.geometry import load_mesh
    from open_ludwig_tpu.scaling import compute_domain_params
    from open_ludwig_tpu.solver_dense import (
        build_patch_statics,
        init_patch_state,
        make_coarse_step_dense,
        statics_arg_arrays,
    )

    cfg = load_case_config(tmp).with_overrides(
        flat_coarse="on" if flat else "off"
    )
    mesh = load_mesh(cfg.stl_path, scale=cfg.stl_scale)
    params = compute_domain_params(cfg, mesh.min_bounds, mesh.max_bounds)
    levels = build_patches(cfg, mesh, params)
    statics = build_patch_statics(cfg, levels)
    coarse = make_coarse_step_dense(
        cfg, params, levels, statics,
        use_pallas=True, interpret=args.interpret,
    )
    states = coarse.seed_slabs(
        [init_patch_state(p, cfg.precision) for p in levels]
    )
    arrs = statics_arg_arrays(statics)
    return cfg, levels, statics, coarse, states, arrs


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from open_ludwig_tpu.jax_setup import setup_jax_cache

    setup_jax_cache()
    from open_ludwig_tpu.cases import make_case_sphere

    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--bench", action="store_true")
    ap.add_argument("--levels", type=int, default=2)
    ap.add_argument("--res", type=int, default=8)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--n", type=int, default=200)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--precision", type=str, default="bfloat16")
    ap.add_argument("--interpret", action="store_true", default=None)
    args = ap.parse_args()
    if args.interpret is None:
        args.interpret = jax.default_backend() == "cpu"

    print(f"device: {jax.devices()[0]}", flush=True)
    tmp = tempfile.mkdtemp()
    make_case_sphere(
        tmp, "1M", surface_resolution=args.res, num_levels=args.levels,
        steps=400, ramp_steps=200, output_freq=100000, diag_freq=100000,
        wake_enabled=True, wall_model=True, inlet_turbulence=0.02,
        precision=args.precision,
    )

    if args.check:
        results = {}
        for flat in (False, True):
            cfg, levels, statics, coarse, states, arrs = build(tmp, flat, args)
            print(
                f"flat={flat}: flags={[p.flat_yz for p in levels]} "
                f"shapes={[s['f'].shape for s in states]}", flush=True,
            )
            for t in range(1, args.steps + 1):
                states = coarse(states, jnp.int32(t), arrs)
            results[flat] = (levels, states)
        la, sa = results[False]
        lb, sb = results[True]
        worst = 0.0
        for lvl in range(len(la)):
            X, Y, Z = la[lvl].interior
            for key in ("f", "rho", "vel"):
                a = np.asarray(sa[lvl][key], np.float32)[..., :X, :Y, :Z]
                b = lb[lvl].unflatten_host(
                    np.asarray(sb[lvl][key], np.float32)
                )[..., :X, :, :][..., :Y, :Z]
                d = float(np.abs(a - b).max())
                worst = max(worst, d)
                print(f"  lvl{lvl} {key}: max|diff| = {d:.3e}", flush=True)
        print(f"worst: {worst:.3e} -> {'PASS' if worst == 0.0 else 'CHECK'}")
        return

    # --bench: interleaved A/B
    runners = {}
    upds = {}
    for flat in (False, True):
        cfg, levels, statics, coarse, states, arrs = build(tmp, flat, args)
        upd = sum(p.n_cells * 2 ** (p.level_id - 1) for p in levels)
        upds[flat] = upd
        print(
            f"flat={flat}: updates/coarse {upd/1e6:.2f}M "
            f"flags={[p.flat_yz for p in levels]}", flush=True,
        )

        @partial(jax.jit, static_argnums=(3,), donate_argnums=(0,))
        def run(states, arrs_, t0, n, _co=coarse):
            def body(c, t):
                return _co(list(c), t, arrs_), None

            out, _ = jax.lax.scan(
                body, states, t0 + jnp.arange(n, dtype=jnp.int32)
            )
            return out

        t0 = time.perf_counter()
        states = run(states, arrs, np.int32(1), args.n)
        jax.block_until_ready(states[0]["rho"])
        compile_s = time.perf_counter() - t0
        runners[flat] = [run, states, compile_s, arrs]

    dts = {m: [] for m in runners}
    for rep in range(args.reps):
        for flat, r in runners.items():
            run, states, _c, arrs = r
            t0 = time.perf_counter()
            states = run(states, arrs, np.int32(args.n + 1), args.n)
            jax.block_until_ready(states[0]["rho"])
            dts[flat].append((time.perf_counter() - t0) / args.n)
            r[1] = states
    for flat, r in runners.items():
        dt = min(dts[flat])
        print(
            f"flat[{int(flat)}] {dt*1e6:9.1f} us | "
            f"{upds[flat]/dt/1e6:7.0f} MLUPS (compile {r[2]:.1f}s; reps "
            + ",".join(f"{d*1e6:.0f}" for d in dts[flat]) + ")",
            flush=True,
        )


if __name__ == "__main__":
    main()
