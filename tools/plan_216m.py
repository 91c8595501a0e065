"""216M-cell capacity plan + sharded dryrun artifact (PLAN_216M.json).

The reference's largest perf-table row is 216M cells (reference:
README.md:508-509, "300 MLUPS at 216M cells").  A single chip tops out at
~154M bf16 cells by the shared HBM formula (solver_dense.hbm_bytes_per_cell,
in-place Pallas f updates), so 216M is a 2-shard case.  This tool produces
the committed evidence that the engine handles it:

  1. builds the REAL 216M-cell domain (res-68 single-level sphere tunnel,
     the sweep's configuration scaled up) and prints the per-shard HBM
     breakdown from the same formula the planner and runner share;
  2. traces + lowers the PRODUCTION sharded step — the 2-D (x,y)-chunked
     Pallas kernel under shard_map with lax.ppermute halo exchange — at the
     full 216M shape over a virtual 2-device mesh (GSPMD partitioning at
     the real shape, the part no small-shape test exercises);
  3. EXECUTES two coarse steps at the full 216M shape on the virtual mesh
     via the sharded XLA engine (CPU-executable) and checks finiteness.

Run on CPU (no TPU needed):  python tools/plan_216m.py [n_shards] [hbm_gb]
"""
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import jax

N_SHARDS = int(sys.argv[1]) if len(sys.argv) > 1 else 2
HBM_GB = float(sys.argv[2]) if len(sys.argv) > 2 else 16.0  # per real chip

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", N_SHARDS)

import jax.numpy as jnp
import numpy as np

from open_ludwig_tpu.cases import make_case_sphere
from open_ludwig_tpu.config import load_case_config
from open_ludwig_tpu.core.patch import build_patches
from open_ludwig_tpu.geometry import load_mesh
from open_ludwig_tpu.jax_setup import setup_jax_cache
from open_ludwig_tpu.parallel.patch_shard import (
    make_batch_runner_sharded,
    make_x_mesh,
    shard_states,
    shard_statics,
)
from open_ludwig_tpu.scaling import compute_domain_params
from open_ludwig_tpu.solver_dense import (
    build_patch_statics,
    estimate_capacity,
    hbm_bytes_per_cell,
    hbm_report_patches,
    init_patch_state,
    make_coarse_step_dense,
    statics_arg_arrays,
)

setup_jax_cache()
out = {"target_cells": 216e6, "n_shards": N_SHARDS, "hbm_gb_per_chip": HBM_GB,
       "reference": "README.md:508-509 (300 MLUPS at 216M cells)"}

# ---- 1. build the real 216M domain (sweep config scaled to res 68) --------
tmp = tempfile.mkdtemp()
make_case_sphere(
    tmp, "1M", surface_resolution=68, num_levels=1,
    steps=100, ramp_steps=50, output_freq=10**9, diag_freq=10**9,
    precision="bfloat16", domain_tile_snap=True,
)
cfg = load_case_config(tmp)
tri = load_mesh(cfg.stl_path, scale=cfg.stl_scale)
params = compute_domain_params(cfg, tri.min_bounds, tri.max_bounds)
t0 = time.time()
patches = build_patches(cfg, tri, params)
statics = build_patch_statics(cfg, patches)
build_s = time.time() - t0
p = patches[0]
cells = sum(q.n_cells for q in patches)
print(f"domain: {p.padded} padded / {p.interior} interior "
      f"= {cells/1e6:.1f}M cells (built in {build_s:.0f}s)")
out["cells"] = int(cells)
out["padded_shape"] = list(map(int, p.padded))
out["build_s"] = round(build_s, 1)

# ---- per-shard HBM accounting (the planner's shared formula) --------------
bpc = hbm_bytes_per_cell(cfg.precision, transient=True)
total_b = p.n_padded * bpc
per_shard_b = total_b / N_SHARDS
cap_1chip = estimate_capacity(hbm_gb=HBM_GB, precision=cfg.precision)
report = hbm_report_patches(patches, statics, cfg.precision)
print(report)
print(f"bytes/cell (transient incl.) = {bpc} -> total {total_b/1e9:.2f} GB; "
      f"1-chip capacity @ {HBM_GB:.0f} GB = {cap_1chip/1e6:.0f}M cells "
      f"({'does NOT fit' if p.n_padded > cap_1chip else 'fits'} one chip)")
print(f"x-slab over {N_SHARDS} shards: {per_shard_b/1e9:.2f} GB/shard "
      f"({100*per_shard_b/(HBM_GB*1e9):.0f}% of {HBM_GB:.0f} GB HBM)"
      f" -> {'FITS' if per_shard_b < HBM_GB*1e9 else 'does not fit'}")
out.update(
    bytes_per_cell=bpc, total_gb=round(total_b / 1e9, 2),
    per_shard_gb=round(per_shard_b / 1e9, 2),
    fits_one_chip=bool(p.n_padded <= cap_1chip),
    fits_per_shard=bool(per_shard_b < HBM_GB * 1e9),
    one_chip_capacity_mcells=round(cap_1chip / 1e6, 1),
    hbm_report=report,
)

# ---- 2. lower the PRODUCTION sharded Pallas step at full shape ------------
mesh = make_x_mesh(N_SHARDS)
states = [init_patch_state(q, cfg.precision) for q in patches]
states = shard_states(states, mesh)
statics_sh = shard_statics(statics, patches, mesh)
arrs = statics_arg_arrays(statics_sh)

step_pl = make_coarse_step_dense(
    cfg, params, patches, statics_sh, use_pallas=True, mesh=mesh
)
assert step_pl.pallas_levels == (True,), (
    "production kernel must be live under shard_map at this shape: "
    f"{step_pl.pallas_levels}"
)


@jax.jit
def one_step_pallas(sts, arrs_, t):
    return step_pl(sts, t, arrs_)


t0 = time.time()
lowered = one_step_pallas.lower(states, arrs, jnp.int32(1))
lower_s = time.time() - t0
hlo_head = lowered.as_text()[:4000]
n_ppermute = hlo_head.count("ppermute") + lowered.as_text().count(
    "collective-permute"
)
print(f"sharded Pallas step LOWERED at full 216M shape in {lower_s:.1f}s "
      f"(2-D chunked kernel under shard_map; collective-permutes in "
      f"HLO: {n_ppermute})")
out.update(pallas_lowered=True, lower_s=round(lower_s, 1),
           hlo_collective_permutes=int(n_ppermute))

# ---- 3. execute two coarse steps at full shape (sharded XLA engine) -------
run = make_batch_runner_sharded(
    cfg, params, patches, statics_sh, mesh, use_pallas=False
)
t0 = time.time()
states = run(states, np.int32(1), 2)
jax.block_until_ready(states[0]["rho"])
exec_s = time.time() - t0
rho = np.asarray(states[0]["rho"][:64])  # spot slab
vel = np.asarray(states[0]["vel"][:, :64])
ok = bool(np.isfinite(rho).all() and np.isfinite(vel).all())
print(f"2 coarse steps EXECUTED at full shape on the {N_SHARDS}-device "
      f"virtual mesh in {exec_s:.0f}s (compile incl.); finite={ok}")
out.update(executed_steps=2, exec_s=round(exec_s, 1), finite=ok)

with open("/root/repo/PLAN_216M.json", "w") as f:
    json.dump(out, f, indent=1)
print("wrote PLAN_216M.json")
