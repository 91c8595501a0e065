"""Interface-pipeline decomposition on the bench case: times, in one scan
each, (a) endpoint slab+upsample chains, (b) endpoints + fused pair-planes,
(c) endpoints + old-style per-sub-step from_endpoints+prep, mirroring the
per-coarse-step schedule (1x L0->L1 pair + 2x L1->L2 pairs).

Usage: python tools/probe_iface.py [--res 25] [--n 200]
"""

import argparse
import sys
import tempfile
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=25)
    ap.add_argument("--n", type=int, default=200)
    ap.add_argument("--precision", type=str, default="bfloat16")
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
    from open_ludwig_tpu.ops.dense_step import (
        interface_endpoints_pair,
        interface_from_endpoints,
        interface_planes_pair,
    )
    from open_ludwig_tpu.ops.pallas_step import prep_iface_pallas
    from open_ludwig_tpu.scaling import compute_domain_params
    from open_ludwig_tpu.solver_dense import init_patch_state

    print(f"device: {jax.devices()[0]}", flush=True)
    tmp = tempfile.mkdtemp()
    make_case_sphere(
        tmp, "1M", surface_resolution=args.res, num_levels=3,
        steps=400, ramp_steps=200, output_freq=100000, diag_freq=100000,
        wake_enabled=True, precision=args.precision,
    )
    cfg = load_case_config(tmp)
    mesh = load_mesh(cfg.stl_path, scale=cfg.stl_scale)
    params = compute_domain_params(cfg, mesh.min_bounds, mesh.max_bounds)
    levels = build_patches(cfg, mesh, params)
    states = [init_patch_state(p, args.precision) for p in levels]

    def leaves_sum(tree):
        return sum(jnp.sum(v.astype(jnp.float32)) for v in jax.tree_util.tree_leaves(tree))

    # per coarse step: 1 pair L0->L1, 2 pairs L1->L2
    PAIRS = [(0, 1), (1, 2), (1, 2)]

    def perturb(sts, t):
        """Make every state leaf loop-variant so XLA cannot hoist any part
        of the measured chain out of the scan; the perturbation itself is
        timed by the 'baseline' body and subtracted."""
        eps = (t.astype(jnp.float32) * jnp.float32(1e-37))
        return [
            {k: (v + eps.astype(v.dtype)) for k, v in s.items()} for s in sts
        ]

    def body_base(sts):
        return 0.0

    def body_ep(sts):
        acc = 0.0
        for pi, ci in PAIRS:
            eo, en = interface_endpoints_pair(
                levels[ci], levels[pi], sts[pi], sts[pi]
            )
            acc = acc + leaves_sum(eo) + leaves_sum(en)
        return acc

    def body_pair(sts):
        acc = 0.0
        for pi, ci in PAIRS:
            eo, en = interface_endpoints_pair(
                levels[ci], levels[pi], sts[pi], sts[pi]
            )
            planes = interface_planes_pair(
                en, eo, levels[ci], levels[pi], True, g_shifted=True
            )
            acc = acc + leaves_sum(planes)
        return acc

    def body_old(sts):
        acc = 0.0
        for pi, ci in PAIRS:
            eo, en = interface_endpoints_pair(
                levels[ci], levels[pi], sts[pi], sts[pi]
            )
            for w in (0.0, 0.5):
                ifc = interface_from_endpoints(
                    en, eo, levels[ci], levels[pi], w, True
                )
                acc = acc + leaves_sum(prep_iface_pallas(ifc, levels[ci]))
        return acc

    base = None
    for label, fn in (("baseline", body_base), ("endpoints", body_ep),
                      ("ep+pair-planes", body_pair),
                      ("ep+old-style", body_old)):
        @jax.jit
        def run(sts, _fn=fn):
            def body(c, t):
                c = perturb(c, t)
                c2 = [
                    {**s, "rho": s["rho"] + 1e-37 * _fn(c)} if i == 0 else s
                    for i, s in enumerate(c)
                ]
                return c2, None

            out, _ = jax.lax.scan(body, sts, jnp.arange(args.n))
            return out

        t0 = time.perf_counter()
        out = run(states)
        jax.block_until_ready(out[0]["rho"])
        comp = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = run(states)
        jax.block_until_ready(out[0]["rho"])
        dt = (time.perf_counter() - t0) / args.n
        if base is None:
            base = dt
        print(f"iface[{label:14s}] {dt*1e6:9.1f} us/coarse "
              f"(net {1e6*(dt-base):8.1f}) (compile {comp:.1f}s)",
              flush=True)


if __name__ == "__main__":
    main()
