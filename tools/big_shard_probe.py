"""~216M-cell sharded executes-proof: the reference's largest perf-table row.

The reference's size table ends at 216M cells / 300 MLUPS (reference:
README.md:509).  A 216M-cell bf16 state needs ~12 GB for f alone and the
2-D chunked kernel is not in-place (input/output f are separate buffers),
so a single 16 GB chip cannot hold it — the production answer is x-slab
sharding over a device mesh (parallel/patch_shard.py).  Multi-chip hardware
is not available in this environment, so this probe demonstrates the row
the strongest way the environment admits: it builds the 216M-cell case,
shards state + statics over an 8-device mesh, and executes full production
coarse steps through `make_batch_runner_sharded` (the same GSPMD/shard_map
path `runner.py` uses), asserting the result is finite.

Run with:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/big_shard_probe.py [--res 68] [--steps 2]

On the virtual CPU mesh the per-level Pallas kernels are skipped
(interpret mode at this scale is infeasible); the levels run the
GSPMD-partitioned XLA dense path — the same fallback the sharded runner
uses for any level whose kernel cannot build, so the sharding, halo
collectives, BCs, and physics exercised here are the production ones.
Prints one JSON row suitable for merging into BENCH_SWEEP.json.
"""

import argparse
import json
import sys
import tempfile
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=68,
                    help="sphere surface resolution (68 -> ~216M cells)")
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--devices", type=int, default=8)
    args = ap.parse_args()

    import jax

    # the image's sitecustomize pre-imports jax with the TPU plugin, which
    # swallows JAX_PLATFORMS/XLA_FLAGS — force the virtual CPU mesh through
    # the config API (same treatment as __graft_entry__.dryrun_multichip)
    try:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", max(args.devices, 1))
    except Exception:
        pass

    import numpy as np

    from open_ludwig_tpu.cases import make_case_sphere
    from open_ludwig_tpu.config import load_case_config
    from open_ludwig_tpu.core.patch import build_patches
    from open_ludwig_tpu.geometry import load_mesh
    from open_ludwig_tpu.parallel.patch_shard import (
        make_batch_runner_sharded, make_x_mesh, shard_states, shard_statics,
    )
    from open_ludwig_tpu.scaling import compute_domain_params
    from open_ludwig_tpu.solver_dense import (
        build_patch_statics, init_patch_state,
    )

    print(f"devices: {jax.devices()}", flush=True)
    tmp = tempfile.mkdtemp()
    make_case_sphere(
        tmp, "1M", surface_resolution=args.res, num_levels=1,
        steps=100, ramp_steps=50, output_freq=100000, diag_freq=100000,
        precision="bfloat16", domain_tile_snap=True,
    )
    cfg = load_case_config(tmp)
    mesh_tri = load_mesh(cfg.stl_path, scale=cfg.stl_scale)
    params = compute_domain_params(cfg, mesh_tri.min_bounds, mesh_tri.max_bounds)
    t0 = time.time()
    levels = build_patches(cfg, mesh_tri, params)
    cells = sum(p.n_cells for p in levels)
    print(f"built {cells/1e6:.1f}M cells in {time.time()-t0:.0f}s "
          f"(padded {levels[0].padded})", flush=True)

    statics = build_patch_statics(cfg, levels)
    states = [init_patch_state(p, cfg.precision) for p in levels]
    mesh = make_x_mesh(args.devices)
    states = shard_states(states, mesh)
    statics = shard_statics(statics, levels, mesh)
    run = make_batch_runner_sharded(cfg, params, levels, statics, mesh)
    print(f"sharded over {args.devices} devices; pallas levels "
          f"{run.pallas_levels}", flush=True)

    t0 = time.time()
    states = run(states, np.int32(1), args.steps)
    # scalar fetch: the reliable completion fence (NOTES_ROUND4_PERF.md)
    rho0 = float(np.asarray(states[0]["rho"][0, 0, 0]))
    dt = time.time() - t0
    rho = np.asarray(states[0]["rho"][:: max(1, levels[0].padded[0] // 16)])
    assert np.isfinite(rho).all(), "non-finite density after sharded steps"
    assert np.isfinite(rho0)
    row = {
        "cells": int(cells),
        "label": f"{cells/1e6:.0f}M",
        "mlups": None,
        "runs_sharded_devices": int(args.devices),
        "note": (
            f"executes-proof: {args.steps} full production coarse steps, "
            f"x-slab GSPMD over {args.devices} virtual devices "
            f"(single chip cannot hold the ~{cells*2*27/2**30:.0f} GiB x2 "
            "bf16 f buffers); finite state verified"
        ),
    }
    print(f"steps ran in {dt:.0f}s; state finite", flush=True)
    print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
