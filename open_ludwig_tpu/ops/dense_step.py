"""Dense-patch fused stream + BC + collide step.

Streaming is a 3-axis roll per direction; every boundary condition is a
masked select on the destination face row (masks are iota comparisons, fused
by XLA into the streaming consumers), so the hot path contains no gathers:

  - inlet: axis-aligned equilibrium with hash-noise turbulence; the
    (1 + 3cu + 4.5cu^2 - 1.5u^2) factor is shared by all nine cx=+1
    directions, so one (YS, ZS) plane serves them all
    (reference: src/physics_kernels.jl:99-104),
  - outlet: equilibrium at u_inlet (reference: :106-113),
  - y/z mirror: f_in[mirror_k] of the destination cell itself — an
    UNSHIFTED read, exactly the reference's free-slip treatment
    (reference: :115-120),
  - refinement interface: per-direction ghost planes trilinearly+temporally
    interpolated from the parent patch with f_neq rescaling, precomputed as
    dense slab upsampling (reference: src/physics_interpolation.jl:16-138 and
    the parity-biased corner rule of its 1-based floor arithmetic).

Collision is the shared ops.collide_math core on the flat (27, N) view
(layout-preserving since YS, ZS are tile-padded).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import lattice as lat
from ..core.patch import (
    BC_INLET,
    BC_INTERFACE,
    BC_MIRROR_Y,
    BC_MIRROR_Z,
    BC_OUTLET,
    PatchLevel,
)
from .collide_math import collide, hash_noise, inlet_equilibrium

_C = jnp.asarray(lat.C)
_W = jnp.asarray(lat.W)


def _upsample_axis(slab: jnp.ndarray, axis: int, g_start: int, length: int):
    """2x refinement along `axis` with the reference's parity-biased corner
    rule: fine cell g interpolates parent cells (g//2 - 1, g//2) with weight
    0.25 (g even) / 0.75 (g odd) on the upper corner.  `slab` covers parent
    cells starting at j0 = g_start//2 - 1; returns `length` fine samples
    starting at global fine coordinate g_start."""
    a = jax.lax.slice_in_dim(slab, 0, slab.shape[axis] - 1, axis=axis)
    b = jax.lax.slice_in_dim(slab, 1, slab.shape[axis], axis=axis)
    even = 0.75 * a + 0.25 * b
    odd = 0.25 * a + 0.75 * b
    inter = jnp.stack([even, odd], axis=axis + 1)
    shape = list(even.shape)
    shape[axis] = 2 * even.shape[axis]
    inter = inter.reshape(shape)
    # first fine sample of `inter` is g = 2*(j0+1) = 2*(g_start//2)
    off = g_start - 2 * (g_start // 2)
    return jax.lax.slice_in_dim(inter, off, off + length, axis=axis)


def interface_plane(
    face: int,
    patch: PatchLevel,
    parent: PatchLevel,
    p_new: Dict,
    p_old: Optional[Dict],
    temporal_weight: float,
    use_temporal: bool,
) -> jnp.ndarray:
    """Ghost source plane for one interface face: (27, A+2, B+2) where (A, B)
    are the padded transverse dims.  Entry [k, a+1, b+1] is the interpolated
    distribution at the fine ghost cell just outside the face at transverse
    local coords (a, b)."""
    axis = face // 2
    side = face % 2
    t_axes = [ax for ax in range(3) if ax != axis]
    A = patch.padded[t_axes[0]]
    B = patch.padded[t_axes[1]]

    # fine global coordinate of the source (ghost) layer
    g_face = patch.lo[axis] - 1 if side == 0 else patch.lo[axis] + patch.interior[axis]
    # parent corner pair along the face axis
    p0 = g_face // 2 - 1
    w_face = 0.25 + 0.5 * (g_face % 2)

    # transverse fine ranges: [lo-1, lo+padded] (padded tail values are junk
    # but never consumed by interior cells)
    gA0 = patch.lo[t_axes[0]] - 1
    gB0 = patch.lo[t_axes[1]] - 1

    def slab(arr, lead):  # arr: (*lead, pXS, pYS, pZS) -> (*lead, 2, LA, LB)
        idx = [slice(None)] * lead
        rng = {}
        pads = {}
        for ax in range(3):
            if ax == axis:
                lo_l = p0 - parent.lo[ax]
                want = (lo_l, lo_l + 2)
            else:
                g0 = gA0 if ax == t_axes[0] else gB0
                ln = A + 2 if ax == t_axes[0] else B + 2
                j0 = g0 // 2 - 1
                j1 = (g0 + ln - 1) // 2
                want = (j0 - parent.lo[ax], j1 - parent.lo[ax] + 1)
            # clamp into the parent array (the transverse PADDED tail can
            # overrun the parent box; those fine samples are junk-region
            # values anyway) and edge-pad back to the expected width
            hi_cap = arr.shape[lead + ax]
            got = (max(want[0], 0), min(want[1], hi_cap))
            assert got[1] > got[0], (
                f"interface slab empty: face {face} axis {ax} wants {want}, "
                f"parent extent {hi_cap} — patch not contained in parent"
            )
            rng[ax] = got
            pads[ax] = (got[0] - want[0], want[1] - got[1])
        sl = arr[
            tuple(idx)
            + (slice(*rng[0]), slice(*rng[1]), slice(*rng[2]))
        ]
        pad_spec = [(0, 0)] * lead + [pads[0], pads[1], pads[2]]
        if any(p != (0, 0) for p in pad_spec):
            sl = jnp.pad(sl, pad_spec, mode="edge")
        # move the face axis to position `lead`, keep transverse order
        perm = list(range(lead)) + [lead + axis] + [lead + ax for ax in t_axes]
        return jnp.transpose(sl, perm)

    def interp(arr, lead):
        s = slab(arr, lead)
        # lerp along the face axis (2 entries at dim `lead`)
        s0 = jax.lax.index_in_dim(s, 0, lead, keepdims=False)
        s1 = jax.lax.index_in_dim(s, 1, lead, keepdims=False)
        v = (1.0 - w_face) * s0 + w_face * s1  # (*lead, LA, LB)
        v = _upsample_axis(v, lead, gA0, A + 2)
        v = _upsample_axis(v, lead + 1, gB0, B + 2)
        return v

    def blend(key):
        new = p_new[key]
        if use_temporal and p_old is not None and temporal_weight < 0.99:
            tw = jnp.float32(temporal_weight)
            return p_old[key] * (1.0 - tw) + new * tw
        return new

    f_int = interp(blend("f"), 1)  # (27, A+2, B+2)
    rho_int = interp(blend("rho"), 0)
    u_int = interp(blend("vel"), 1)  # (3, A+2, B+2)

    cu = jnp.einsum("ak,a...->k...", _C, u_int)  # (27, A+2, B+2)
    usq = jnp.sum(u_int * u_int, axis=0)
    feq = rho_int[None] * _W[:, None, None] * (
        1.0 + 3.0 * cu + 4.5 * cu * cu - 1.5 * usq
    )
    tau_c = parent.tau - 0.5
    tau_f = patch.tau - 0.5
    scale = float(np.clip(tau_f / tau_c, 0.01, 100.0)) if tau_c > 1e-6 else 1.0
    return feq + (f_int - feq) * jnp.float32(scale)


def dense_stream_collide(
    f: jnp.ndarray,  # (27, XS, YS, ZS)
    vel: jnp.ndarray,  # (3, XS, YS, ZS)
    u_inlet,
    t_seed,
    static: Dict,  # obstacle/sponge/wall_dist flat (N,) device arrays
    patch: PatchLevel,
    *,
    c_wale: float,
    nu_sgs_background: float,
    inlet_turbulence: float,
    wall_model: bool,
    sponge_blend: bool,
    iface: Optional[Dict[int, jnp.ndarray]] = None,  # face -> (27, A+2, B+2)
):
    XS, YS, ZS = patch.padded
    X, Y, Z = patch.interior
    N = XS * YS * ZS
    fb = patch.face_bc

    ix = jax.lax.broadcasted_iota(jnp.int32, (XS, 1, 1), 0)
    iy = jax.lax.broadcasted_iota(jnp.int32, (1, YS, 1), 1)
    iz = jax.lax.broadcasted_iota(jnp.int32, (1, 1, ZS), 2)

    # shared inlet factor plane over (YS, ZS): cu = +u_inst for all cx=+1
    if fb[0] == BC_INLET:
        gy1 = jax.lax.broadcasted_iota(jnp.int32, (YS, ZS), 0) + (patch.lo[1] + 1)
        gz1 = jax.lax.broadcasted_iota(jnp.int32, (YS, ZS), 1) + (patch.lo[2] + 1)
        if inlet_turbulence > 0.0:
            noise = hash_noise(gy1, gz1, t_seed)
            u_inst = u_inlet + noise * jnp.float32(inlet_turbulence) * u_inlet
        else:
            u_inst = jnp.broadcast_to(u_inlet, (YS, ZS)).astype(jnp.float32)
        inlet_factor = (
            1.0 + 3.0 * u_inst + 4.5 * u_inst * u_inst - 1.5 * u_inst * u_inst
        )
    else:
        inlet_factor = None
    outlet_vals = inlet_equilibrium(
        jnp.asarray(lat.C_X.astype(np.float32)), _W, u_inlet
    )  # (27,)

    def face_value(k, face):
        """Value array (broadcastable to (XS, YS, ZS)) for direction k pulled
        across `face`, or None if this k doesn't cross it."""
        cx, cy, cz = int(lat.C_X[k]), int(lat.C_Y[k]), int(lat.C_Z[k])
        bc = fb[face]
        if bc == BC_INTERFACE:
            pl = iface[face]  # (27, A+2, B+2)
            ax = face // 2
            t_axes = [a for a in range(3) if a != ax]
            c = (cx, cy, cz)
            sh = [c[t_axes[0]], c[t_axes[1]]]
            dims = (patch.padded[t_axes[0]], patch.padded[t_axes[1]])
            v = jax.lax.slice(
                pl[k],
                (1 - sh[0], 1 - sh[1]),
                (1 - sh[0] + dims[0], 1 - sh[1] + dims[1]),
            )
            # broadcast over the face axis
            if ax == 0:
                return v[None, :, :]
            if ax == 1:
                return v[:, None, :]
            return v[:, :, None]
        if bc == BC_INLET:
            return (_W[k] * inlet_factor)[None, :, :]
        if bc == BC_OUTLET:
            return outlet_vals[k]
        if bc == BC_MIRROR_Y:
            return f[int(lat.MIRROR_Y[k])]
        if bc == BC_MIRROR_Z:
            return f[int(lat.MIRROR_Z[k])]
        raise AssertionError(bc)

    streamed = []
    for k in range(27):
        cx, cy, cz = int(lat.C_X[k]), int(lat.C_Y[k]), int(lat.C_Z[k])
        val = f[k]
        if (cx, cy, cz) != (0, 0, 0):
            val = jnp.roll(val, (cx, cy, cz), axis=(0, 1, 2))
        # masked overrides in reverse precedence (inlet strongest, applied last;
        # reference precedence: inlet > outlet > y-mirror > z-mirror)
        if cz > 0:
            val = jnp.where(iz == 0, face_value(k, 4), val)
        elif cz < 0:
            val = jnp.where(iz == Z - 1, face_value(k, 5), val)
        if cy > 0:
            val = jnp.where(iy == 0, face_value(k, 2), val)
        elif cy < 0:
            val = jnp.where(iy == Y - 1, face_value(k, 3), val)
        if cx < 0:
            val = jnp.where(ix == X - 1, face_value(k, 1), val)
        elif cx > 0:
            val = jnp.where(ix == 0, face_value(k, 0), val)
        streamed.append(val)
    f_str = jnp.stack(streamed).reshape(27, N)

    # velocity face neighbors with self-fallback at every patch face
    # (reference: src/physics_utils.jl:45-70 falls back to the own cell when
    # the neighbor block is missing — true at domain AND interface faces)
    def vel_nbr(dx, dy, dz):
        r = jnp.roll(vel, (-dx, -dy, -dz), axis=(1, 2, 3))
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
        vel_nbr(1, 0, 0),
        vel_nbr(-1, 0, 0),
        vel_nbr(0, 1, 0),
        vel_nbr(0, -1, 0),
        vel_nbr(0, 0, 1),
        vel_nbr(0, 0, -1),
    )

    f_out, rho_out, vel_out = collide(
        f_str,
        nbrs,
        static["obstacle"],
        static["sponge"],
        static["wall_dist"],
        u_inlet,
        tau=patch.tau,
        c_wale=c_wale,
        nu_sgs_background=nu_sgs_background,
        wall_model=wall_model,
        sponge_blend=sponge_blend,
    )
    return (
        f_out.reshape(27, XS, YS, ZS),
        rho_out.reshape(XS, YS, ZS),
        vel_out.reshape(3, XS, YS, ZS),
    )


def build_bouzidi_patch_plan(patch: PatchLevel, q_min: float) -> Optional[Dict]:
    """Bouzidi link lists in dense flat index space (f-space idx =
    k*N + (x*YS + y)*ZS + z); see core.plan.build_bouzidi_plan for the
    block-sparse equivalent (reference: src/bouzidi_kernel.jl:13-92)."""
    bz = patch.bouzidi
    if bz is None or bz.n_boundary_cells == 0:
        return None
    XS, YS, ZS = patch.padded
    X, Y, Z = patch.interior
    N = XS * YS * ZS
    x = bz.cell_gx.astype(np.int64)
    y = bz.cell_gy.astype(np.int64)
    z = bz.cell_gz.astype(np.int64)
    cell = (x * YS + y) * ZS + z
    q = bz.q_map.astype(np.float32)

    dst, src_k_l, src_o, ca, cb = [], [], [], [], []
    for k in range(27):
        if k == 13:
            continue
        qv = q[:, k]
        act = (qv > q_min) & (qv <= 1.0)
        if not act.any():
            continue
        sel = np.nonzero(act)[0]
        qs = qv[sel]
        c = cell[sel]
        opp_k = int(lat.OPP[k])
        dst.append(opp_k * N + c)
        src_k_l.append(k * N + c)
        lo = qs < 0.5
        other_hi = opp_k * N + c
        nx = x[sel] + lat.C_X[opp_k]
        ny = y[sel] + lat.C_Y[opp_k]
        nz = z[sel] + lat.C_Z[opp_k]
        inside = (nx >= 0) & (nx < X) & (ny >= 0) & (ny < Y) & (nz >= 0) & (nz < Z)
        ff = (nx * YS + ny) * ZS + nz
        other_lo = np.where(inside, k * N + ff, k * N + c)
        src_o.append(np.where(lo, other_lo, other_hi))
        a = np.where(lo, 2.0 * qs, 1.0 / (2.0 * qs))
        b = np.where(lo, 1.0 - 2.0 * qs, (2.0 * qs - 1.0) / (2.0 * qs))
        ca.append(a.astype(np.float32))
        cb.append(b.astype(np.float32))
    if not dst:
        return None
    return {
        "dst": jnp.asarray(np.concatenate(dst).astype(np.int32)),
        "src_k": jnp.asarray(np.concatenate(src_k_l).astype(np.int32)),
        "src_other": jnp.asarray(np.concatenate(src_o).astype(np.int32)),
        "coef_a": jnp.asarray(np.concatenate(ca)),
        "coef_b": jnp.asarray(np.concatenate(cb)),
    }
