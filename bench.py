"""Headline benchmark: MLUPS/chip on the sphere Re~1M virtual wind tunnel.

Mirrors the reference's validated sphere setup (reference:
RESULTS_SPHERE_RE1M.txt:34-44 — N=25 cells/diameter, u_lat=0.03, 3 levels,
~1.6M cells) and measures sustained million-lattice-updates/second over a
timed window after warmup.  vs_baseline is against the reference's best
claimed single-GPU number (800 MLUPS at 1M cells on an RTX 4090,
reference: README.md:506).

Prints ONE JSON line.
"""

import json
import os
import sys
import tempfile
import threading
import time

import numpy as np

_RESULT_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench_last_result.json")
_WATCHDOG_S = float(os.environ.get("OPEN_LUDWIG_BENCH_TIMEOUT", 2400))


def _watchdog():
    """If the TPU tunnel is wedged (observed: requests hang indefinitely),
    emit the last persisted measurement with explicit provenance instead of
    hanging the caller forever."""
    time.sleep(_WATCHDOG_S)
    try:
        res = json.load(open(_RESULT_CACHE))
        res["metric"] += " [cached result from a previous run: bench timed out, TPU tunnel unavailable]"
    except Exception:
        res = {
            "metric": "MLUPS/chip (bench FAILED: TPU unavailable/timeout)",
            "value": 0.0,
            "unit": "MLUPS",
            "vs_baseline": 0.0,
        }
    print(json.dumps(res), flush=True)
    os._exit(0)


def main():
    import jax

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
        make_batch_runner_dense,
    )

    tmp = tempfile.mkdtemp()
    make_case_sphere(
        tmp,
        "1M",
        surface_resolution=25,
        num_levels=3,
        steps=400,
        ramp_steps=200,
        output_freq=100000,
        diag_freq=100000,
        wake_enabled=True,
    )
    cfg = load_case_config(tmp)
    mesh = load_mesh(cfg.stl_path, scale=cfg.stl_scale)
    params = compute_domain_params(cfg, mesh.min_bounds, mesh.max_bounds)
    levels = build_patches(cfg, mesh, params)
    statics = build_patch_statics(cfg, levels)
    states = [init_patch_state(p) for p in levels]
    total_cells = sum(p.n_cells for p in levels)
    # work per coarse step: level l runs 2^(l-1) sub-steps
    updates_per_coarse = sum(
        p.n_cells * 2 ** (p.level_id - 1) for p in levels
    )
    run = make_batch_runner_dense(cfg, params, levels, statics)

    # warmup + compile (same static batch length as the timed calls)
    batch = 50
    states = run(states, np.int32(1), batch)
    jax.block_until_ready(states[0]["rho"])

    n_timed = 200
    t0 = time.time()
    for i in range(n_timed // batch):
        states = run(states, np.int32(batch + 1 + i * batch), batch)
    jax.block_until_ready(states[0]["rho"])
    dt = time.time() - t0

    mlups = updates_per_coarse * n_timed / dt / 1e6
    result = {
        "metric": "MLUPS/chip (D3Q27 sphere Re1M, 3 levels, "
        f"{total_cells/1e6:.2f}M cells)",
        "value": round(mlups, 1),
        "unit": "MLUPS",
        "vs_baseline": round(mlups / 800.0, 3),
    }
    try:
        json.dump(result, open(_RESULT_CACHE, "w"))
    except Exception:
        pass
    print(json.dumps(result))


if __name__ == "__main__":
    threading.Thread(target=_watchdog, daemon=True).start()
    main()
