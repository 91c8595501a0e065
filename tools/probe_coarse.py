"""Production-path coarse-step timing: the real batch runner (statics as
donated jit args) vs the same runner with frozen interface planes, isolating
the interface-pipeline cost on the bench configuration.

Usage: python tools/probe_coarse.py [--res 25] [--levels 3] [--n 200] [--iface real,frozen]
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
    ap.add_argument("--iface", type=str, default="real,frozen")
    ap.add_argument("--bz", type=str, default="fold",
                    help="comma list of fold|plain: Bouzidi folded into the "
                    "step kernel vs the standalone correction kernel")
    ap.add_argument("--xmult", type=int, default=1,
                    help="pad every level's XS to this multiple")
    ap.add_argument("--reps", type=int, default=5,
                    help="timed windows; min is reported (tunnel is shared)")
    ap.add_argument("--flat", type=str, default="auto",
                    help="flat_coarse override: auto|on|off")
    ap.add_argument("--px", type=str, default="",
                    help="PX_OVERRIDE variants, ';'-separated, each "
                    "lvl:px,... (e.g. '1:8;1:16;1:32') — every variant "
                    "becomes an interleaved A/B mode")
    ap.add_argument("--scoped", type=str, default="",
                    help="xla_tpu_scoped_vmem_limit_kib variants, "
                    "';'-separated KiB values ('0' = compiler default); "
                    "steers how much VMEM the MSA pass may pin carries "
                    "into (e.g. '0;98304')")
    ap.add_argument("--fuse2", type=str, default="off",
                    help="comma list of on|off: temporal blocking (fused "
                    "two-sub-step kernel on the childless finest level / "
                    "fused coarse-step pairs on single-level cases)")
    ap.add_argument("--check", action="store_true",
                    help="compare final states across ALL modes after the "
                    "compile window instead of timing")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from open_ludwig_tpu.jax_setup import setup_jax_cache

    setup_jax_cache()

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

    print(f"device: {jax.devices()[0]}", flush=True)
    tmp = tempfile.mkdtemp()
    make_case_sphere(
        tmp, "1M", surface_resolution=args.res, num_levels=args.levels,
        steps=400, ramp_steps=200, output_freq=100000, diag_freq=100000,
        wake_enabled=True, precision=args.precision,
    )
    cfg = load_case_config(tmp).with_overrides(flat_coarse=args.flat)
    px_variants = [None]
    if args.px:
        px_variants = []
        for var in args.px.split(";"):
            d = {}
            for kv in var.split(","):
                k, v = kv.split(":")
                d[int(k)] = int(v)
            px_variants.append(d)
    mesh = load_mesh(cfg.stl_path, scale=cfg.stl_scale)
    params = compute_domain_params(cfg, mesh.min_bounds, mesh.max_bounds)
    levels = build_patches(cfg, mesh, params, x_multiple=args.xmult)
    statics = build_patch_statics(cfg, levels)
    upd = sum(p.n_cells * 2 ** (p.level_id - 1) for p in levels)
    print(f"updates/coarse: {upd/1e6:.2f}M  "
          f"XS={[p.padded[0] for p in levels]}", flush=True)

    # Compile every mode first, then INTERLEAVE the timed windows A,B,A,B…
    # The tunnel TPU shows multi-minute windows of ~2-2.5x contention from
    # other tenants; interleaving puts all modes through the same windows
    # and the per-mode min is the uncontended time.
    from open_ludwig_tpu.ops.pallas_step import PX_OVERRIDE

    scoped_variants = [None]
    if args.scoped:
        scoped_variants = [
            None if v.strip() == "0" else int(v)
            for v in args.scoped.split(";")
        ]

    runners = {}
    for pxv in px_variants:
        if pxv is not None:
            PX_OVERRIDE.clear()
            PX_OVERRIDE.update(pxv)
        for scoped in scoped_variants:
          copts = (
              {"xla_tpu_scoped_vmem_limit_kib": scoped}
              if scoped is not None else None
          )
          for mode in args.iface.split(","):
           for bzm in args.bz.split(","):
            for fz in args.fuse2.split(","):
                coarse = make_coarse_step_dense(
                    cfg, params, levels, statics, _iface_mode=mode,
                    _bz_fold=bzm == "fold", fuse2=fz == "on",
                )
                # AFTER make_coarse_step_dense: it may add bz_S_pad (fold)
                arrs = statics_arg_arrays(statics)
                pair = coarse.pair_step if fz == "on" else None
                if fz == "on" and not coarse.fused2:
                    print(f"  [fz=on {mode}/{bzm}] fused kernel did not "
                          "qualify — running unfused", flush=True)

                if pair is not None:
                    assert args.n % 2 == 0, "--n must be even for fz=on"

                    @partial(jax.jit, static_argnums=(3,),
                             donate_argnums=(0,), compiler_options=copts)
                    def run(states, arrs_, t0, n, _co=coarse):
                        def body(c, i):
                            return _co.pair_step(c, t0 + 2 * i, arrs_), None

                        out, _ = jax.lax.scan(
                            body, states,
                            jnp.arange(n // 2, dtype=jnp.int32),
                        )
                        return out
                else:
                    @partial(jax.jit, static_argnums=(3,),
                             donate_argnums=(0,), compiler_options=copts)
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
                key = mode if args.bz == "fold" else f"{mode}/{bzm}"
                if args.fuse2 != "off":
                    key += f" fz={fz}"
                if pxv is not None:
                    key += " px=" + ",".join(
                        f"{k}:{v}" for k, v in pxv.items())
                if scoped is not None:
                    key += f" scoped={scoped}k"
                runners[key] = (run, states, compile_s, arrs)

    if args.check:
        def interior(p, a):
            a = np.asarray(a, np.float32)
            if p.flat_yz:
                return a
            X, Y, Z = p.interior
            return a[..., :X, :Y, :Z]

        keys = list(runners)
        base = runners[keys[0]][1]
        for other in keys[1:]:
            st2 = runners[other][1]
            for li, p in enumerate(levels):
                for q in ("f", "rho", "vel"):
                    df = float(np.abs(
                        interior(p, base[li][q]) - interior(p, st2[li][q])
                    ).max())
                    print(f"  {keys[0]} vs {other} L{li} {q}: {df:.3e}",
                          flush=True)
        return

    dts = {m: [] for m in runners}
    for rep in range(args.reps):
        for mode, (run, states, _c, arrs) in runners.items():
            t0 = time.perf_counter()
            states = run(states, arrs, np.int32(args.n + 1), args.n)
            jax.block_until_ready(states[0]["rho"])
            dts[mode].append((time.perf_counter() - t0) / args.n)
            runners[mode] = (run, states, _c, arrs)
    for mode, (run, states, compile_s, _a) in runners.items():
        dt = min(dts[mode])
        print(
            f"coarse[{args.precision:9s} iface={mode:6s}] {dt*1e6:9.1f} us "
            f"| {upd/dt/1e6:7.0f} MLUPS (compile {compile_s:.1f}s; reps "
            + ",".join(f"{d*1e6:.0f}" for d in dts[mode]) + ")",
            flush=True,
        )


if __name__ == "__main__":
    main()
