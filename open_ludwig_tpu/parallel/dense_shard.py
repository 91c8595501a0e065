"""Multi-chip spatial decomposition for the dense-patch layout.

1-D slab decomposition along the streamwise (x, major) axis over a device
mesh: each device owns a contiguous slab (27, XL, YS, ZS) of a level; per
step the two boundary x-planes are exchanged with jax.lax.ppermute (one
bidirectional ICI hop — the D3Q27 stencil only reaches x +- 1), and the local
step runs on the halo-extended slab with boundary masks keyed on GLOBAL x.

This is the TPU-native scaling story the single-GPU reference lacks
(SURVEY.md section 2.6): domain decomposition = the LBM analogue of DP/SP,
with halo exchange riding ICI instead of NCCL.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import lattice as lat
from ..core.patch import BC_INLET, BC_MIRROR_Y, BC_MIRROR_Z, BC_OUTLET, PatchLevel
from ..ops.collide_math import collide, hash_noise, inlet_equilibrium

_AXIS = "x"


def make_sharded_dense_step(
    patch: PatchLevel,
    mesh: Mesh,
    *,
    c_wale: float,
    nu_sgs_background: float,
    inlet_turbulence: float,
    wall_model: bool,
    sponge_blend: bool,
):
    """Returns (step, shard) where step(f, vel, u_inlet, t_seed, statics) is a
    jitted sharded single-level update and shard(arr) places arrays with the
    x-slab sharding.  Requires XS % n_devices == 0 (pad the patch to fit)."""
    XS, YS, ZS = patch.padded
    X, Y, Z = patch.interior
    fb = patch.face_bc
    n_dev = mesh.devices.size
    assert XS % n_dev == 0, f"XS={XS} not divisible by {n_dev} devices"
    XL = XS // n_dev

    def local_step(f, vel, obstacle, sponge, wall_dist, u_inlet, t_seed):
        # f: (27, XL, YS, ZS) local slab
        me = jax.lax.axis_index(_AXIS)
        x_off = me * XL
        ring_fwd = [(i, (i + 1) % n_dev) for i in range(n_dev)]
        ring_bwd = [((i + 1) % n_dev, i) for i in range(n_dev)]

        # halo exchange: my last plane -> right neighbor's prev-halo, etc.
        # wrapped deliveries at the ring edges are masked by the domain BCs.
        f_prev_h = jax.lax.ppermute(f[:, -1], _AXIS, ring_fwd)  # from left
        f_next_h = jax.lax.ppermute(f[:, 0], _AXIS, ring_bwd)  # from right
        v_prev_h = jax.lax.ppermute(vel[:, -1], _AXIS, ring_fwd)
        v_next_h = jax.lax.ppermute(vel[:, 0], _AXIS, ring_bwd)

        f_ext = jnp.concatenate([f_prev_h[:, None], f, f_next_h[:, None]], axis=1)
        v_ext = jnp.concatenate([v_prev_h[:, None], vel, v_next_h[:, None]], axis=1)

        ix = x_off + jax.lax.broadcasted_iota(jnp.int32, (XL, 1, 1), 0)
        iy = jax.lax.broadcasted_iota(jnp.int32, (1, YS, 1), 1)
        iz = jax.lax.broadcasted_iota(jnp.int32, (1, 1, ZS), 2)

        gy1 = jax.lax.broadcasted_iota(jnp.int32, (YS, ZS), 0) + (patch.lo[1] + 1)
        gz1 = jax.lax.broadcasted_iota(jnp.int32, (YS, ZS), 1) + (patch.lo[2] + 1)
        if inlet_turbulence > 0.0:
            noise = hash_noise(gy1, gz1, t_seed)
            u_inst = u_inlet + noise * jnp.float32(inlet_turbulence) * u_inlet
        else:
            u_inst = jnp.broadcast_to(u_inlet, (YS, ZS)).astype(jnp.float32)
        inlet_plane = 1.0 + 3.0 * u_inst + 3.0 * u_inst * u_inst

        streamed = []
        for k in range(27):
            cx, cy, cz = int(lat.C_X[k]), int(lat.C_Y[k]), int(lat.C_Z[k])
            # pull: source x = local + 1 - cx in ext coords
            val = jax.lax.slice_in_dim(f_ext[k], 1 - cx, 1 - cx + XL, axis=0)
            if cy or cz:
                val = jnp.roll(val, (cy, cz), axis=(1, 2))
            if cz > 0 and fb[4] == BC_MIRROR_Z:
                val = jnp.where(iz == 0, f[int(lat.MIRROR_Z[k])], val)
            elif cz < 0 and fb[5] == BC_MIRROR_Z:
                val = jnp.where(iz == Z - 1, f[int(lat.MIRROR_Z[k])], val)
            if cy > 0 and fb[2] == BC_MIRROR_Y:
                val = jnp.where(iy == 0, f[int(lat.MIRROR_Y[k])], val)
            elif cy < 0 and fb[3] == BC_MIRROR_Y:
                val = jnp.where(iy == Y - 1, f[int(lat.MIRROR_Y[k])], val)
            if cx < 0 and fb[1] == BC_OUTLET:
                cu = float(cx) * u_inlet
                out_v = float(lat.W[k]) * (
                    1.0 + 3.0 * cu + 4.5 * cu * cu - 1.5 * u_inlet * u_inlet
                )
                val = jnp.where(ix == X - 1, out_v, val)
            elif cx > 0 and fb[0] == BC_INLET:
                val = jnp.where(ix == 0, float(lat.W[k]) * inlet_plane[None], val)
            streamed.append(val)
        N = XL * YS * ZS
        f_str = jnp.stack(streamed).reshape(27, N)

        def vel_nbr(dx, dy, dz):
            r = jax.lax.slice_in_dim(v_ext, 1 + dx, 1 + dx + XL, axis=1)
            if dy or dz:
                r = jnp.roll(r, (-dy, -dz), axis=(2, 3))
            if dx > 0:
                r = jnp.where(ix == X - 1, vel, r)
            elif dx < 0:
                r = jnp.where(ix == 0, vel, r)
            if dy > 0:
                r = jnp.where(iy == Y - 1, vel, r)
            elif dy < 0:
                r = jnp.where(iy == 0, vel, r)
            if dz > 0:
                r = jnp.where(iz == Z - 1, vel, r)
            elif dz < 0:
                r = jnp.where(iz == 0, vel, r)
            return r.reshape(3, N)

        nbrs = (
            vel_nbr(1, 0, 0), vel_nbr(-1, 0, 0),
            vel_nbr(0, 1, 0), vel_nbr(0, -1, 0),
            vel_nbr(0, 0, 1), vel_nbr(0, 0, -1),
        )
        f_out, rho_out, vel_out = collide(
            f_str, nbrs,
            obstacle.reshape(N), sponge.reshape(N), wall_dist.reshape(N),
            u_inlet,
            tau=patch.tau, c_wale=c_wale, nu_sgs_background=nu_sgs_background,
            wall_model=wall_model, sponge_blend=sponge_blend,
        )
        return (
            f_out.reshape(27, XL, YS, ZS),
            rho_out.reshape(XL, YS, ZS),
            vel_out.reshape(3, XL, YS, ZS),
        )

    sm = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(
            P(None, _AXIS), P(None, _AXIS),
            P(_AXIS), P(_AXIS), P(_AXIS),
            P(), P(),
        ),
        out_specs=(P(None, _AXIS), P(_AXIS), P(None, _AXIS)),
    )

    @jax.jit
    def step(f, vel, u_inlet, t_seed, statics):
        return sm(
            f, vel,
            statics["obstacle3d"], statics["sponge3d"], statics["wall3d"],
            jnp.asarray(u_inlet, jnp.float32), jnp.asarray(t_seed, jnp.int32),
        )

    def shard(arr, axis):
        spec = [None] * arr.ndim
        spec[axis] = _AXIS
        return jax.device_put(arr, NamedSharding(mesh, P(*spec)))

    return step, shard
