"""Device state and static bundles per refinement level.

State per level is a plain dict pytree {f, rho, vel}:
  f:   (27, nb, 512) float32 distributions
  rho: (nb, 512) float32
  vel: (3, nb, 512) float32

There is deliberately no f_temp / f_post_collision / persistent f_old — the
reference needs those buffers for in-place GPU mutation (reference:
src/blocks.jl:118-145); in functional JAX the A-B swap is just rebinding, the
Bouzidi correction reads the uncorrected snapshot, and the temporal-
interpolation "old" state only lives within one coarse step.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from .. import lattice as lat
from ..config import CaseConfig
from ..domain.builder import LevelGeometry
from ..scaling import DomainParams
from .plan import BouzidiPlan, StreamPlan, build_bouzidi_plan, build_stream_plan


def init_level_state(geo: LevelGeometry) -> Dict:
    nb = geo.n_blocks
    f = jnp.broadcast_to(
        jnp.asarray(lat.W)[:, None, None], (27, nb, lat.BLOCK_CELLS)
    ).astype(jnp.float32)
    return {
        "f": f,
        "rho": jnp.ones((nb, lat.BLOCK_CELLS), jnp.float32),
        "vel": jnp.zeros((3, nb, lat.BLOCK_CELLS), jnp.float32),
    }


def _plan_to_device(plan: StreamPlan) -> Dict:
    return {
        "scatter_dst": jnp.asarray(plan.scatter_dst),
        "scatter_perm": jnp.asarray(plan.scatter_perm),
        "gather_src": jnp.asarray(plan.gather_src),
        "inlet_k": jnp.asarray(plan.inlet_k),
        "inlet_gy": jnp.asarray(plan.inlet_gy),
        "inlet_gz": jnp.asarray(plan.inlet_gz),
        "outlet_k": jnp.asarray(plan.outlet_k),
        "const_val": jnp.asarray(plan.const_val),
        "parent_k": jnp.asarray(plan.parent_k),
        "parent_idx": jnp.asarray(plan.parent_idx),
        "parent_valid": jnp.asarray(plan.parent_valid),
        "parent_w": jnp.asarray(plan.parent_w),
        "fneq_rescale": plan.fneq_rescale,  # python float (static)
    }


def build_level_static(
    geo: LevelGeometry,
    parent_geo: Optional[LevelGeometry],
    cfg: CaseConfig,
    params: DomainParams,
) -> Dict:
    lvl = geo.level_id
    scale = 2 ** (lvl - 1)
    nx_g = params.nx_coarse * scale
    ny_g = params.ny_coarse * scale
    nz_g = params.nz_coarse * scale
    tau_parent = params.tau_levels[lvl - 2] if lvl > 1 else 0.5
    plan = build_stream_plan(geo, parent_geo, tau_parent, nx_g, ny_g, nz_g)

    static = {
        "plan": _plan_to_device(plan),
        "obstacle": jnp.asarray(geo.obstacle),
        "sponge": jnp.asarray(geo.sponge),
        "wall_dist": jnp.asarray(geo.wall_dist),
        "vel_dst": tuple(jnp.asarray(d) for d in plan.vel_dst),
        "vel_src": tuple(jnp.asarray(s) for s in plan.vel_src),
    }
    bz_plan = build_bouzidi_plan(geo, cfg.q_min_threshold)
    if bz_plan is not None:
        static["bouzidi"] = {
            "dst": jnp.asarray(bz_plan.dst),
            "src_k": jnp.asarray(bz_plan.src_k),
            "src_other": jnp.asarray(bz_plan.src_other),
            "coef_a": jnp.asarray(bz_plan.coef_a),
            "coef_b": jnp.asarray(bz_plan.coef_b),
        }
    else:
        static["bouzidi"] = None
    return static


def build_all(cfg: CaseConfig, params: DomainParams, levels: List[LevelGeometry]):
    """Returns (states, statics) lists, coarse->fine."""
    statics = []
    states = []
    for i, geo in enumerate(levels):
        parent_geo = levels[i - 1] if i > 0 else None
        statics.append(build_level_static(geo, parent_geo, cfg, params))
        states.append(init_level_state(geo))
    return states, statics


def hbm_report(levels: List[LevelGeometry], statics: List[Dict]) -> str:
    """Per-level HBM accounting, the reference's VRAM breakdown analogue
    (reference: src/diagnostics_vram.jl:17-133)."""
    lines = ["HBM breakdown (state + static plans):"]
    total = 0
    for geo, st in zip(levels, statics):
        n = geo.n_cells
        state_b = n * 4 * (27 + 1 + 3)
        plan_b = sum(
            int(np.prod(v.shape)) * v.dtype.itemsize
            for v in st["plan"].values()
            if hasattr(v, "shape")
        )
        field_b = n * (1 + 4 + 4)
        bz = st["bouzidi"]
        bz_b = (
            sum(int(np.prod(v.shape)) * v.dtype.itemsize for v in bz.values())
            if bz
            else 0
        )
        lvl_total = state_b + plan_b + field_b + bz_b
        total += lvl_total
        lines.append(
            f"  level {geo.level_id}: {n/1e6:7.2f}M cells | state "
            f"{state_b/1e6:8.1f} MB | fields {field_b/1e6:6.1f} MB | plan "
            f"{plan_b/1e6:6.1f} MB | bouzidi {bz_b/1e6:5.1f} MB"
        )
    lines.append(f"  total: {total/1e9:.3f} GB")
    return "\n".join(lines)
