"""Pallas TPU fused stream-collide kernel for the dense-patch layout.

The XLA formulation (ops.dense_step) materializes many (27, N) intermediates
and re-reads per-cell state once per direction; this kernel makes the data
flow explicit and reads f exactly once per step:

  - grid = x-planes, executed sequentially on the TensorCore;
  - a rotating 4-slot VMEM window holds x-planes of f (27, YS, ZS) and vel;
    each grid step issues one async DMA for plane x+2 (double-buffered ahead
    of use) and consumes planes x-1, x, x+1;
  - pull streaming = 2-D rolls of window planes (in-register shifts);
  - boundary handling identical to ops.dense_step: masked selects for
    inlet (hash-noise equilibrium) / outlet / y-z mirror, and interface ghost
    planes interpolated from the parent patch, passed in as small inputs;
  - collision = ops.collide_math.collide_unrolled — per-direction unrolled
    moments/WALE/wall-model/regularized-BGK with no (27, N) stacking.

Outputs (f_out, rho, vel) stream back plane-by-plane through pipelined
output BlockSpecs.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import lattice as lat
from ..core.patch import (
    BC_INLET,
    BC_INTERFACE,
    BC_MIRROR_Y,
    BC_MIRROR_Z,
    BC_OUTLET,
    PatchLevel,
)
from . import collide_math as cm

_SLOTS = 4


def _shift2d(a, sy: int, sz: int):
    """out[y, z] = a[y - sy, z - sz] (wrapped; wrapped rows/cols are
    overwritten by the boundary masks)."""
    if sy:
        a = jnp.roll(a, sy, axis=0)
    if sz:
        a = jnp.roll(a, sz, axis=1)
    return a


def prepare_pallas_statics(patch: PatchLevel) -> Dict:
    """3-D device arrays consumed by the kernel's plane BlockSpecs."""
    return {
        "obstacle_u8": jnp.asarray(patch.obstacle.astype(np.uint8)),
        "sponge3d": jnp.asarray(patch.sponge),
        "wall3d": jnp.asarray(patch.wall_dist),
    }


def shift_iface_planes(iface: Dict[int, jnp.ndarray], patch: PatchLevel) -> Dict:
    """Pre-apply the per-direction (1-c) shifts to interface ghost planes so
    the kernel only does aligned static reads:
      face 0/1 (x): (27, YS, ZS) value for dest (., y, z)
      face 2/3 (y): (27, XS, ZS) value rows indexed by the grid step
      face 4/5 (z): (27, XS, YS)
    """
    XS, YS, ZS = patch.padded
    out = {}
    for face, pl_arr in iface.items():
        ax = face // 2
        rows = []
        for k in range(27):
            cx, cy, cz = int(lat.C_X[k]), int(lat.C_Y[k]), int(lat.C_Z[k])
            if ax == 0:
                rows.append(pl_arr[k, 1 - cy : 1 - cy + YS, 1 - cz : 1 - cz + ZS])
            elif ax == 1:
                rows.append(pl_arr[k, 1 - cx : 1 - cx + XS, 1 - cz : 1 - cz + ZS])
            else:
                rows.append(pl_arr[k, 1 - cx : 1 - cx + XS, 1 - cy : 1 - cy + YS])
        out[face] = jnp.stack(rows)
    return out


def make_pallas_step(
    patch: PatchLevel,
    *,
    c_wale: float,
    nu_sgs_background: float,
    inlet_turbulence: float,
    wall_model: bool,
    sponge_blend: bool,
    interpret: bool = False,
):
    XS, YS, ZS = patch.padded
    X, Y, Z = patch.interior
    fb = patch.face_bc

    need_iface = tuple(fc for fc in range(6) if fb[fc] == BC_INTERFACE)

    def kernel(
        u_ref, seed_ref,  # scalar prefetch (SMEM)
        f_hbm, vel_hbm,  # ANY (manual DMA)
        obstacle_ref, sponge_ref, wall_ref,  # (1, YS, ZS) VMEM blocks
        *rest,  # iface refs (one per interface face), outputs, scratch
    ):
        n_if = len(need_iface)
        iface_refs = dict(zip(need_iface, rest[:n_if]))
        fout_ref, rho_ref, velout_ref = rest[n_if : n_if + 3]
        fwin, vwin, sems = rest[n_if + 3 :]
        xi = pl.program_id(0)
        iy2 = jax.lax.broadcasted_iota(jnp.int32, (YS, ZS), 0)
        iz2 = jax.lax.broadcasted_iota(jnp.int32, (YS, ZS), 1)

        def start_dma(plane):
            slot = plane % _SLOTS
            cf = pltpu.make_async_copy(
                f_hbm.at[:, plane], fwin.at[slot], sems.at[0, slot]
            )
            cv = pltpu.make_async_copy(
                vel_hbm.at[:, plane], vwin.at[slot], sems.at[1, slot]
            )
            cf.start()
            cv.start()

        def wait_dma(plane):
            slot = plane % _SLOTS
            pltpu.make_async_copy(
                f_hbm.at[:, plane], fwin.at[slot], sems.at[0, slot]
            ).wait()
            pltpu.make_async_copy(
                vel_hbm.at[:, plane], vwin.at[slot], sems.at[1, slot]
            ).wait()

        @pl.when(xi == 0)
        def _warmup():
            start_dma(jnp.int32(0))
            if XS > 1:
                start_dma(jnp.int32(1))
            wait_dma(jnp.int32(0))
            if XS > 1:
                wait_dma(jnp.int32(1))

        # prefetch plane x+2 (its slot is free: this step uses x-1, x, x+1)
        @pl.when(xi + 2 <= XS - 1)
        def _prefetch():
            start_dma(xi + 2)

        # plane x+1 was prefetched two steps ago (or in warmup); await it
        @pl.when((xi >= 1) & (xi + 1 <= XS - 1))
        def _await_next():
            wait_dma(xi + 1)

        u_inlet = u_ref[0]
        t_seed = seed_ref[0]

        p_prev = jnp.maximum(xi - 1, 0)
        p_next = jnp.minimum(xi + 1, XS - 1)
        # Ref slices (no copies); individual k-planes are loaded on demand
        f_prev = fwin.at[p_prev % _SLOTS]
        f_cur = fwin.at[xi % _SLOTS]
        f_next = fwin.at[p_next % _SLOTS]
        v_prev = vwin.at[p_prev % _SLOTS]
        v_cur = vwin.at[xi % _SLOTS]
        v_next = vwin.at[p_next % _SLOTS]

        if fb[0] == BC_INLET:
            gy1 = iy2 + (patch.lo[1] + 1)
            gz1 = iz2 + (patch.lo[2] + 1)
            if inlet_turbulence > 0.0:
                noise = cm.hash_noise(gy1, gz1, t_seed)
                u_inst = u_inlet + noise * jnp.float32(inlet_turbulence) * u_inlet
            else:
                u_inst = jnp.broadcast_to(u_inlet, (YS, ZS)).astype(jnp.float32)
            inlet_factor = 1.0 + 3.0 * u_inst + 3.0 * u_inst * u_inst
        else:
            inlet_factor = None

        def face_value(k, face):
            cx, cy, cz = int(lat.C_X[k]), int(lat.C_Y[k]), int(lat.C_Z[k])
            bc = fb[face]
            if bc == BC_INTERFACE:
                pr = iface_refs[face]  # pre-shifted by shift_iface_planes
                if face // 2 == 0:
                    return pr[k]  # (YS, ZS)
                row = pr[k, pl.ds(xi, 1), :]  # dynamic sublane, full lanes
                if face // 2 == 1:
                    return jnp.broadcast_to(row.reshape(1, ZS), (YS, ZS))
                return jnp.broadcast_to(row.reshape(YS, 1), (YS, ZS))
            if bc == BC_INLET:
                return float(lat.W[k]) * inlet_factor
            if bc == BC_OUTLET:
                cu = float(lat.C_X[k]) * u_inlet
                return float(lat.W[k]) * (
                    1.0 + 3.0 * cu + 4.5 * cu * cu - 1.5 * u_inlet * u_inlet
                )
            if bc == BC_MIRROR_Y:
                return f_cur[int(lat.MIRROR_Y[k])]
            if bc == BC_MIRROR_Z:
                return f_cur[int(lat.MIRROR_Z[k])]
            raise AssertionError(bc)

        streamed = []
        for k in range(27):
            cx, cy, cz = int(lat.C_X[k]), int(lat.C_Y[k]), int(lat.C_Z[k])
            src = f_prev if cx == 1 else (f_next if cx == -1 else f_cur)
            val = _shift2d(src[k], cy, cz)
            if cz > 0:
                val = jnp.where(iz2 == 0, face_value(k, 4), val)
            elif cz < 0:
                val = jnp.where(iz2 == Z - 1, face_value(k, 5), val)
            if cy > 0:
                val = jnp.where(iy2 == 0, face_value(k, 2), val)
            elif cy < 0:
                val = jnp.where(iy2 == Y - 1, face_value(k, 3), val)
            if cx < 0:
                val = jnp.where(xi == X - 1, face_value(k, 1), val)
            elif cx > 0:
                val = jnp.where(xi == 0, face_value(k, 0), val)
            streamed.append(val)

        def vel_nbr(dx, dy, dz):
            src = v_prev if dx == -1 else (v_next if dx == 1 else v_cur)
            r = jnp.stack([_shift2d(src[c], -dy, -dz) for c in range(3)])
            own = v_cur[:]
            if dx > 0:
                r = jnp.where(xi == X - 1, own, r)
            elif dx < 0:
                r = jnp.where(xi == 0, own, r)
            if dy > 0:
                r = jnp.where(iy2 == Y - 1, own, r)
            elif dy < 0:
                r = jnp.where(iy2 == 0, own, r)
            if dz > 0:
                r = jnp.where(iz2 == Z - 1, own, r)
            elif dz < 0:
                r = jnp.where(iz2 == 0, own, r)
            return r

        nbrs = (
            vel_nbr(1, 0, 0), vel_nbr(-1, 0, 0),
            vel_nbr(0, 1, 0), vel_nbr(0, -1, 0),
            vel_nbr(0, 0, 1), vel_nbr(0, 0, -1),
        )

        f_out, rho_out, vel_out = cm.collide_unrolled(
            streamed,
            nbrs,
            obstacle_ref[0] != 0,
            sponge_ref[0],
            wall_ref[0],
            u_inlet,
            tau=patch.tau,
            c_wale=c_wale,
            nu_sgs_background=nu_sgs_background,
            wall_model=wall_model,
            sponge_blend=sponge_blend,
        )
        for k in range(27):
            fout_ref[k, 0] = f_out[k]
        rho_ref[0] = rho_out
        velout_ref[:, 0] = vel_out

    def step(f, vel, u_inlet, t_seed, statics3d, iface: Optional[Dict] = None):
        iface = shift_iface_planes(iface or {}, patch)
        iface_specs = []
        iface_vals = []
        for fc in need_iface:
            iface_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
            iface_vals.append(iface[fc])

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(XS,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # f
                pl.BlockSpec(memory_space=pl.ANY),  # vel
                pl.BlockSpec((1, YS, ZS), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((1, YS, ZS), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((1, YS, ZS), lambda i, *_: (i, 0, 0)),
            ]
            + iface_specs,
            out_specs=[
                pl.BlockSpec((27, 1, YS, ZS), lambda i, *_: (0, i, 0, 0)),
                pl.BlockSpec((1, YS, ZS), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((3, 1, YS, ZS), lambda i, *_: (0, i, 0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((_SLOTS, 27, YS, ZS), jnp.float32),
                pltpu.VMEM((_SLOTS, 3, YS, ZS), jnp.float32),
                pltpu.SemaphoreType.DMA((2, _SLOTS)),
            ],
        )
        fo, rho, vo = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((27, XS, YS, ZS), jnp.float32),
                jax.ShapeDtypeStruct((XS, YS, ZS), jnp.float32),
                jax.ShapeDtypeStruct((3, XS, YS, ZS), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2**20,
            ),
            interpret=interpret,
        )(
            jnp.asarray(u_inlet, jnp.float32).reshape(1),
            jnp.asarray(t_seed, jnp.int32).reshape(1),
            f,
            vel,
            statics3d["obstacle_u8"],
            statics3d["sponge3d"],
            statics3d["wall3d"],
            *iface_vals,
        )
        return fo, rho, vo

    return step
