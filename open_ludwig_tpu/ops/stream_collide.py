"""Fused D3Q27 stream + BC + WALE + wall model + regularized-BGK collide.

Functional JAX re-expression of the reference's single fused GPU kernel
(reference: src/physics_kernels.jl:9-358).  One call advances one level by one
sub-step:

  1. pull streaming  = per-direction roll on the flat 512-cell block axis,
     then one static-index scatter patching every cell whose source crossed a
     block boundary (neighbor gather / inlet / outlet / mirror / coarse-parent
     interpolation / w_k fallback — precompiled in core.plan.StreamPlan);
  2. moments, sponge blending, wall-model body force, WALE eddy viscosity from
     central-difference velocity gradients (previous step's velocity field);
  3. regularized-BGK collision with Guo-style forcing, phrased as small
     matmul contractions over the 27-direction axis (MXU-friendly) instead of
     scalar loops.

Obstacle cells take the full bounce-back path (f_out_k = f_streamed_opp(k),
rho = 1, u = 0).  The returned f_out is the post-collision field that the
Bouzidi correction consumes (no separate f_post buffer needed: the correction
is a functional scatter that reads the uncorrected snapshot).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import lattice as lat

KAPPA = 0.41

# device-side lattice constants (created once per process)
_C = jnp.asarray(lat.C)  # (3, 27) f32
_W = jnp.asarray(lat.W)  # (27,) f32
_CX = jnp.asarray(lat.C_X.astype(np.float32))
_PI_MAT = jnp.asarray(lat.PI_MAT)  # (6, 27)
_REG_MAT = jnp.asarray(lat.REG_MAT)  # (27, 6)
_OPP = lat.OPP  # numpy, used as a static permutation


def _hash_noise(gy, gz, t_seed, salt=1234):
    """Murmur-style integer hash -> [-1, 1) noise, bit-exact with the
    reference (reference: src/physics_utils.jl:17-28)."""
    combined = (
        gy * np.int32(374761393)
        + gz * np.int32(668265263)
        + t_seed * np.int32(1274126177)
        + np.int32(salt)
    )
    h = combined.astype(jnp.uint32)
    h = (h ^ (h >> 16)) * np.uint32(0x85EBCA6B)
    h = (h ^ (h >> 13)) * np.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return (h & np.uint32(0xFFFF)).astype(jnp.float32) / 32768.0 - 1.0


def _inlet_eq_1d(k_f32_cx, w_k, u):
    """Equilibrium for axis-aligned inlet/outlet flow: only the x velocity
    component enters cu (reference: src/physics_kernels.jl:99-113)."""
    cu = k_f32_cx * u
    return w_k * (1.0 + 3.0 * cu + 4.5 * cu * cu - 1.5 * u * u)


def _parent_interp(plan: Dict, parent: Dict, u_fill, temporal_weight: float,
                   use_temporal: bool):
    """Trilinear + temporal coarse->fine interpolation with f_neq rescaling
    (reference: src/physics_interpolation.jl:16-138).  Vectorized over the
    static list of interface (cell, direction) pairs."""
    pk = plan["parent_k"]  # (np,)
    idx8 = plan["parent_idx"]  # (np, 8)
    val8 = plan["parent_valid"]  # (np, 8) bool
    w3 = plan["parent_w"]  # (np, 3)
    npair = pk.shape[0]
    if npair == 0:
        return jnp.zeros((0,), jnp.float32)

    Np = parent["rho"].shape[0]
    f_flat = parent["f"].reshape(27 * Np)
    fidx = pk[:, None] * Np + idx8
    f8 = f_flat[fidx]
    rho8 = parent["rho"][idx8]
    u8 = parent["vel"][:, idx8]  # (3, np, 8)

    if use_temporal and temporal_weight < 0.99:
        tw = jnp.float32(temporal_weight)
        f8 = parent["f_old"].reshape(27 * Np)[fidx] * (1.0 - tw) + f8 * tw
        rho8 = parent["rho_old"][idx8] * (1.0 - tw) + rho8 * tw
        u8 = parent["vel_old"][:, idx8] * (1.0 - tw) + u8 * tw

    w_k = _W[pk]
    # fallback chain: invalid corner 0 -> (w_k, 1, 0); other invalid -> corner 0
    v0 = val8[:, 0]
    f0 = jnp.where(v0, f8[:, 0], w_k)
    r0 = jnp.where(v0, rho8[:, 0], 1.0)
    u0 = jnp.where(v0[None, :], u8[:, :, 0], 0.0)
    f8 = jnp.where(val8, f8, f0[:, None])
    rho8 = jnp.where(val8, rho8, r0[:, None])
    u8 = jnp.where(val8[None], u8, u0[:, :, None])

    wx, wy, wz = w3[:, 0], w3[:, 1], w3[:, 2]

    def trilin(v):  # v: (..., np, 8), corner order x-fastest
        c00 = v[..., 0] * (1 - wx) + v[..., 1] * wx
        c10 = v[..., 2] * (1 - wx) + v[..., 3] * wx
        c01 = v[..., 4] * (1 - wx) + v[..., 5] * wx
        c11 = v[..., 6] * (1 - wx) + v[..., 7] * wx
        c0 = c00 * (1 - wy) + c10 * wy
        c1 = c01 * (1 - wy) + c11 * wy
        return c0 * (1 - wz) + c1 * wz

    f_int = trilin(f8)
    rho_int = trilin(rho8)
    u_int = trilin(u8)  # (3, np)

    cvec = _C[:, pk]  # (3, np)
    cu = jnp.sum(cvec * u_int, axis=0)
    usq = jnp.sum(u_int * u_int, axis=0)
    feq = rho_int * w_k * (1.0 + 3.0 * cu + 4.5 * cu * cu - 1.5 * usq)
    return feq + (f_int - feq) * jnp.float32(plan["fneq_rescale"])


def stream_collide(
    f_in: jnp.ndarray,  # (27, nb, 512)
    vel_in: jnp.ndarray,  # (3, nb, 512)
    u_inlet: jnp.ndarray,  # scalar f32
    t_seed: jnp.ndarray,  # scalar i32 (timestep % 1e6)
    static: Dict,  # device arrays: plan + obstacle/sponge/wall_dist
    *,
    tau: float,
    c_wale: float,
    nu_sgs_background: float,
    inlet_turbulence: float,
    wall_model: bool,
    sponge_blend: bool,
    use_temporal: bool,
    temporal_weight: float = 0.0,
    parent: Optional[Dict] = None,
):
    """Returns (f_out, rho_out, vel_out)."""
    nb = f_in.shape[1]
    N = nb * lat.BLOCK_CELLS
    plan = static["plan"]

    # ---- 1. streaming: roll within blocks ----------------------------------
    f_str = jnp.stack(
        [jnp.roll(f_in[k], int(lat.OFF[k]), axis=-1) for k in range(27)]
    )

    # ---- fixups for block-crossing / boundary sources ----------------------
    f_flat = f_in.reshape(-1)
    vals_gather = f_flat[plan["gather_src"]]

    ik = plan["inlet_k"]
    if ik.shape[0]:
        if inlet_turbulence > 0.0:
            noise = _hash_noise(plan["inlet_gy"], plan["inlet_gz"], t_seed)
            u_inst = u_inlet + noise * jnp.float32(inlet_turbulence) * u_inlet
        else:
            u_inst = jnp.broadcast_to(u_inlet, ik.shape).astype(jnp.float32)
        vals_inlet = _inlet_eq_1d(_CX[ik], _W[ik], u_inst)
    else:
        vals_inlet = jnp.zeros((0,), jnp.float32)

    ok = plan["outlet_k"]
    if ok.shape[0]:
        vals_outlet = _inlet_eq_1d(_CX[ok], _W[ok], u_inlet)
    else:
        vals_outlet = jnp.zeros((0,), jnp.float32)

    vals_const = plan["const_val"]
    vals_parent = _parent_interp(plan, parent, u_inlet, temporal_weight, use_temporal) \
        if parent is not None else jnp.zeros((0,), jnp.float32)

    vals = jnp.concatenate(
        [vals_gather, vals_inlet, vals_outlet, vals_const, vals_parent]
    )[plan["scatter_perm"]]
    f_str = (
        f_str.reshape(-1)
        .at[plan["scatter_dst"]]
        .set(vals, unique_indices=True, indices_are_sorted=True)
        .reshape(27, N)
    )

    # obstacle bounce-back reads the raw streamed values (the reference's
    # obstacle branch precedes sponge blending)
    f_bb = f_str[_OPP]

    # ---- 2. moments ---------------------------------------------------------
    rho_raw = jnp.maximum(jnp.sum(f_str, axis=0), 0.01)
    jmom = jnp.dot(_C, f_str, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)  # (3, N)
    inv_rho_raw = 1.0 / rho_raw
    u = jmom * inv_rho_raw

    # ---- sponge blending ----------------------------------------------------
    sp = static["sponge"].reshape(N)
    one_m = 1.0 - sp
    rho = rho_raw * one_m + sp  # target rho = 1
    ux = u[0] * one_m + u_inlet * sp
    uy = u[1] * one_m
    uz = u[2] * one_m
    u = jnp.stack([ux, uy, uz])
    if sponge_blend:
        feq_target = _inlet_eq_1d(_CX, _W, u_inlet)  # (27,)
        f_str = f_str * one_m[None, :] + feq_target[:, None] * sp[None, :]

    # ---- wall model body force ----------------------------------------------
    if wall_model:
        wd = static["wall_dist"].reshape(N)
        u_mag = jnp.sqrt(jnp.sum(u * u, axis=0))
        nu_visc = (tau - 0.5) / 3.0
        u_tau = (
            u_mag
            * (nu_visc / (wd * u_mag + 1e-10)) ** (1.0 / 7.0)
            * (2.0 * 8.3) ** (-1.0 / 7.0)
        )
        u_tau = jnp.maximum(u_tau, 1e-6)
        y_p = u_tau * wd / nu_visc
        u_plus_law = (1.0 / KAPPA) * jnp.log(jnp.maximum(y_p, 1e-10)) + 5.2
        corr = jnp.where(
            (y_p > 11.81) & (u_plus_law > 0.1),
            (u_mag / u_tau) / jnp.maximum(u_plus_law, 0.1),
            1.0,
        )
        u_tau = jnp.maximum(u_tau * corr, 1e-6)
        tau_wall = rho * u_tau * u_tau
        tau_res = rho * nu_visc * u_mag / jnp.maximum(wd, 1e-10)
        active = (
            (wd > 0.0)
            & (wd < 10.0)
            & (u_mag > 1e-6)
            & (tau_wall > tau_res)
            & (nu_visc > 1e-10)
        )
        force_mag = jnp.where(active, (tau_wall - tau_res) / jnp.maximum(wd, 1e-10), 0.0)
        F = -force_mag[None, :] * u / jnp.maximum(u_mag, 1e-20)[None, :]
    else:
        F = None

    if F is not None:
        u_eq = u + 0.5 * F * inv_rho_raw[None, :]
    else:
        u_eq = u
    usq_eq = jnp.sum(u_eq * u_eq, axis=0)

    # ---- WALE eddy viscosity -------------------------------------------------
    # velocity gradients from the previous step's velocity field via
    # central differences across block faces (reference: physics_utils.jl:72-83)
    vel_flat = vel_in.reshape(3, N)
    nbrs = []
    from ..core.plan import FACE_ROLL  # static roll shifts E,W,N,S,T,B

    for i in range(6):
        r = jnp.roll(vel_in, FACE_ROLL[i], axis=-1).reshape(3, N)
        r = r.at[:, static["vel_dst"][i]].set(
            vel_flat[:, static["vel_src"][i]], unique_indices=True
        )
        nbrs.append(r)
    vE, vW, vN, vS, vT, vB = nbrs
    g = jnp.stack(
        [
            0.5 * (vE - vW),  # d/dx of (ux, uy, uz)
            0.5 * (vN - vS),  # d/dy
            0.5 * (vT - vB),  # d/dz
        ],
        axis=0,
    )  # g[a, i] = d u_i / d x_a  -> reference g_ij = du_i/dx_j = g[j, i]

    g11, g12, g13 = g[0, 0], g[1, 0], g[2, 0]
    g21, g22, g23 = g[0, 1], g[1, 1], g[2, 1]
    g31, g32, g33 = g[0, 2], g[1, 2], g[2, 2]

    gsq11 = g11 * g11 + g12 * g21 + g13 * g31
    gsq12 = g11 * g12 + g12 * g22 + g13 * g32
    gsq13 = g11 * g13 + g12 * g23 + g13 * g33
    gsq21 = g21 * g11 + g22 * g21 + g23 * g31
    gsq22 = g21 * g12 + g22 * g22 + g23 * g32
    gsq23 = g21 * g13 + g22 * g23 + g23 * g33
    gsq31 = g31 * g11 + g32 * g21 + g33 * g31
    gsq32 = g31 * g12 + g32 * g22 + g33 * g32
    gsq33 = g31 * g13 + g32 * g23 + g33 * g33

    tr_term = (gsq11 + gsq22 + gsq33) / 3.0
    Sd11, Sd22, Sd33 = gsq11 - tr_term, gsq22 - tr_term, gsq33 - tr_term
    Sd12 = 0.5 * (gsq12 + gsq21)
    Sd13 = 0.5 * (gsq13 + gsq31)
    Sd23 = 0.5 * (gsq23 + gsq32)
    S12 = 0.5 * (g12 + g21)
    S13 = 0.5 * (g13 + g31)
    S23 = 0.5 * (g23 + g32)

    OP1 = Sd11**2 + Sd22**2 + Sd33**2 + 2.0 * (Sd12**2 + Sd13**2 + Sd23**2)
    OP2 = g11**2 + g22**2 + g33**2 + 2.0 * (S12**2 + S13**2 + S23**2)

    OP1_32 = OP1 * jnp.sqrt(OP1)
    OP2_52 = OP2 * OP2 * jnp.sqrt(jnp.maximum(OP2, 1e-12))
    denom = OP2_52 + OP1 * jnp.sqrt(jnp.sqrt(jnp.maximum(OP1, 1e-12)))
    nu_eddy = jnp.where(
        (OP1 > 1e-12) & (denom > 1e-12),
        (c_wale * c_wale) * OP1_32 / jnp.maximum(denom, 1e-12),
        0.0,
    )
    nu_eddy = jnp.maximum(nu_eddy, nu_sgs_background)
    omega = 1.0 / jnp.maximum(tau + nu_eddy * 3.0, 0.500001)

    # ---- regularized-BGK collision (matmul contractions) ---------------------
    cu = jnp.dot(_C.T, u_eq, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)  # (27, N)
    feq = rho[None, :] * _W[:, None] * (1.0 + 3.0 * cu + 4.5 * cu * cu - 1.5 * usq_eq)
    f_neq = f_str - feq
    pi6 = jnp.dot(_PI_MAT, f_neq, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)  # (6, N)
    f_neq_reg = jnp.dot(_REG_MAT, pi6, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)  # (27, N)

    f_coll = feq + (1.0 - omega)[None, :] * f_neq_reg
    if F is not None:
        cF = jnp.dot(_C.T, F, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)  # (27, N)
        uF = jnp.sum(u * F, axis=0)  # raw (post-sponge) u, like the reference
        ft = 3.0 * _W[:, None] * (cF * (1.0 + 3.0 * cu) - uF[None, :])
        f_coll = f_coll + (1.0 - 0.5 * omega)[None, :] * ft

    # ---- obstacle full bounce-back -------------------------------------------
    obs = static["obstacle"].reshape(N)
    f_out = jnp.where(obs[None, :], f_bb, f_coll)
    rho_out = jnp.where(obs, 1.0, rho)
    vel_out = jnp.where(obs[None, :], 0.0, u)

    return (
        f_out.reshape(27, nb, lat.BLOCK_CELLS),
        rho_out.reshape(nb, lat.BLOCK_CELLS),
        vel_out.reshape(3, nb, lat.BLOCK_CELLS),
    )


def apply_bouzidi(f_out: jnp.ndarray, bz: Dict) -> jnp.ndarray:
    """Second-order interpolated bounce-back overwrite of f_out[cell, opp_k]
    (reference: src/bouzidi_kernel.jl:13-92), as one gather + static scatter
    on the uncorrected post-collision snapshot."""
    shape = f_out.shape
    flat = f_out.reshape(-1)
    vals = bz["coef_a"] * flat[bz["src_k"]] + bz["coef_b"] * flat[bz["src_other"]]
    return flat.at[bz["dst"]].set(vals, unique_indices=True).reshape(shape)
