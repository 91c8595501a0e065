"""Dense-patch path validation: single level vs the naive oracle, equilibrium
fixed point, and two-level interface behavior."""

import numpy as np
import pytest

import jax.numpy as jnp

from open_ludwig_tpu import lattice as lat
from open_ludwig_tpu.core.patch import (
    BC_INLET, BC_INTERFACE, BC_MIRROR_Y, BC_MIRROR_Z, BC_OUTLET, PatchLevel,
)
from open_ludwig_tpu.ops.dense_step import dense_stream_collide, interface_plane

from reference_impl import naive_step


def _patch(interior, tau=0.52, lo=(0, 0, 0), face_bc=None, obstacle=None,
           sponge=None, wall=None, dx=1.0, level_id=1):
    X, Y, Z = interior
    XS, YS, ZS = X, -(-Y // 8) * 8, -(-Z // 128) * 128
    def pad(a, fill, dtype):
        out = np.full((XS, YS, ZS), fill, dtype)
        if a is not None:
            out[:X, :Y, :Z] = a
        return out
    return PatchLevel(
        level_id=level_id,
        dx=dx,
        tau=tau,
        lo=lo,
        interior=interior,
        padded=(XS, YS, ZS),
        face_bc=tuple(face_bc or (BC_INLET, BC_OUTLET, BC_MIRROR_Y, BC_MIRROR_Y,
                                  BC_MIRROR_Z, BC_MIRROR_Z)),
        obstacle=pad(obstacle, True, bool) if obstacle is not None else pad(np.zeros(interior, bool), True, bool),
        sponge=pad(sponge if sponge is not None else np.zeros(interior, np.float32), 0.0, np.float32),
        wall_dist=pad(wall if wall is not None else np.full(interior, 100.0, np.float32), 100.0, np.float32),
    )


def _statics(p):
    return {
        "obstacle": jnp.asarray(p.obstacle.reshape(-1)),
        "sponge": jnp.asarray(p.sponge.reshape(-1)),
        "wall_dist": jnp.asarray(p.wall_dist.reshape(-1)),
        "bouzidi": None,
    }


def _to_padded(a, p):
    lead = a.shape[: a.ndim - 3]
    out = np.zeros(lead + p.padded, a.dtype)
    X, Y, Z = p.interior
    out[..., :X, :Y, :Z] = a
    return jnp.asarray(out)


def _interior(a, p):
    X, Y, Z = p.interior
    return np.asarray(a)[..., :X, :Y, :Z]


@pytest.mark.parametrize(
    "wall_model,sponge_blend,inlet_turb",
    [(False, False, 0.0), (True, True, 0.05)],
)
def test_dense_matches_oracle(rng, wall_model, sponge_blend, inlet_turb):
    X, Y, Z = 12, 10, 9
    tau = 0.52
    f0 = np.asarray(lat.W64[:, None, None, None]) * (
        1.0 + 0.05 * rng.standard_normal((27, X, Y, Z))
    )
    vel0 = 0.02 * rng.standard_normal((3, X, Y, Z))
    obstacle = np.zeros((X, Y, Z), bool)
    obstacle[5:8, 4:6, 4:6] = True
    sponge = np.zeros((X, Y, Z), np.float32)
    sponge[9:, :, :] = np.linspace(0.1, 0.8, 3)[:, None, None]
    wall = np.full((X, Y, Z), 100.0, np.float32)
    wall[4, 5, 5] = 1.2

    kw = dict(u_inlet=0.05, t_seed=7, tau=tau, c_wale=0.5, nu_sgs=5e-4,
              inlet_turb=inlet_turb, wall_model=wall_model,
              sponge_blend=sponge_blend)
    f_ref = f0.astype(np.float32).astype(np.float64)
    v_ref = vel0.astype(np.float32).astype(np.float64)
    f_ref, rho_ref, v_ref = naive_step(f_ref, v_ref, obstacle, sponge, wall, **kw)
    f_ref2, rho_ref2, v_ref2 = naive_step(f_ref, v_ref, obstacle, sponge, wall, **kw)

    p = _patch((X, Y, Z), tau=tau, obstacle=obstacle, sponge=sponge, wall=wall)
    st = _statics(p)
    fj = _to_padded(f0.astype(np.float32), p)
    vj = _to_padded(vel0.astype(np.float32), p)
    op = dict(c_wale=0.5, nu_sgs_background=5e-4, inlet_turbulence=inlet_turb,
              wall_model=wall_model, sponge_blend=sponge_blend)
    f1, r1, v1 = dense_stream_collide(fj, vj, jnp.float32(0.05), jnp.int32(7), st, p, **op)
    f2, r2, v2 = dense_stream_collide(f1, v1, jnp.float32(0.05), jnp.int32(7), st, p, **op)

    assert np.allclose(_interior(f2, p), f_ref2, atol=2e-5), \
        np.abs(_interior(f2, p) - f_ref2).max()
    assert np.allclose(_interior(r2, p), rho_ref2, atol=2e-5)
    assert np.allclose(_interior(v2, p), v_ref2, atol=2e-5)


def test_dense_equilibrium_fixed_point():
    p = _patch((8, 8, 8), tau=0.6)
    st = _statics(p)
    f = jnp.broadcast_to(jnp.asarray(lat.W)[:, None, None, None],
                         (27,) + p.padded).astype(jnp.float32)
    v = jnp.zeros((3,) + p.padded, jnp.float32)
    f1, r1, v1 = dense_stream_collide(
        f, v, jnp.float32(0.0), jnp.int32(0), st, p,
        c_wale=0.5, nu_sgs_background=0.0, inlet_turbulence=0.0,
        wall_model=False, sponge_blend=True)
    assert np.allclose(_interior(f1, p), np.asarray(lat.W)[:, None, None, None],
                       atol=1e-7)
    assert np.allclose(_interior(r1, p), 1.0, atol=1e-6)


def test_interface_plane_uniform_parent():
    """A uniform-equilibrium parent must produce exactly W_k ghost planes on
    every interface face (trilinear interp of constants + zero f_neq)."""
    parent = _patch((16, 16, 16), tau=0.58, level_id=1)
    child = _patch((12, 12, 12), tau=0.54, lo=(10, 10, 10),
                   face_bc=[BC_INTERFACE] * 6, level_id=2, dx=0.5)
    pstate = {
        "f": jnp.broadcast_to(jnp.asarray(lat.W)[:, None, None, None],
                              (27,) + parent.padded).astype(jnp.float32),
        "rho": jnp.ones(parent.padded, jnp.float32),
        "vel": jnp.zeros((3,) + parent.padded, jnp.float32),
    }
    for face in range(6):
        pl = interface_plane(face, child, parent, pstate, pstate, 0.5, True)
        pl = np.asarray(pl)
        # interior transverse region must be exactly W_k
        want = np.asarray(lat.W)[:, None, None]
        # padded transverse tails may hold junk; check the guaranteed region
        A = child.interior[[a for a in range(3) if a != face // 2][0]]
        B = child.interior[[a for a in range(3) if a != face // 2][1]]
        assert np.allclose(pl[:, : A + 2, : B + 2], want, atol=1e-6), face


def test_interface_plane_linear_field():
    """Parent rho varying linearly in x: the parity-biased trilinear rule must
    reproduce the reference's corner/weight choice (g//2-1, g//2 with weight
    0.25/0.75 by parity)."""
    parent = _patch((16, 16, 16), tau=0.58)
    child = _patch((8, 8, 8), tau=0.54, lo=(12, 12, 12),
                   face_bc=[BC_INTERFACE] * 6, level_id=2, dx=0.5)
    rho_np = np.ones(parent.padded, np.float32)
    for i in range(16):
        rho_np[i, :, :] = 1.0 + 0.01 * i
    pstate = {
        "f": jnp.broadcast_to(jnp.asarray(lat.W)[:, None, None, None],
                              (27,) + parent.padded).astype(jnp.float32)
        * jnp.asarray(rho_np)[None],
        "rho": jnp.asarray(rho_np),
        "vel": jnp.zeros((3,) + parent.padded, jnp.float32),
    }
    # x-min face: fine ghost layer at fine g = 11 -> parent corners (4, 5),
    # weight 0.75 (odd)
    pl = np.asarray(interface_plane(0, child, parent, pstate, pstate, 1.0, False))
    rho_expect = (1.0 + 0.01 * 4) * 0.25 + (1.0 + 0.01 * 5) * 0.75
    # rest-direction k=13: value = W13 * rho (f = W*rho is equilibrium at u=0)
    assert pl[13, 1, 1] == pytest.approx(lat.W64[13] * rho_expect, rel=1e-5)


@pytest.mark.slow  # compile-heavy on CPU; full suite still runs it
@pytest.mark.parametrize("use_temporal", [True, False])
@pytest.mark.parametrize("g_shifted", [True, False])
@pytest.mark.parametrize("parent_lo", [(0, 0, 0), (6, 4, 2)])
def test_interface_planes_pair_mm_parity(rng, use_temporal, g_shifted,
                                         parent_lo):
    """The einsum-operator interface pipeline (interface_planes_pair_mm) must
    match the slice/upsample/shift pipeline bit-closely on random states.

    parent_lo != 0 covers deep levels (level 3+), whose parent array is
    itself offset in global coordinates — a round-3 regression (global vs
    parent-local slab coordinates) that doubled the validated sphere Cd."""
    from open_ludwig_tpu.ops.dense_step import (
        build_iface_mm_plan,
        interface_endpoints,
        interface_endpoints_pair,
        interface_planes_pair,
        interface_planes_pair_mm,
    )

    parent = _patch((20, 16, 16), tau=0.58, level_id=1, lo=parent_lo)
    child = _patch((14, 12, 12), tau=0.54,
                   lo=(2 * parent_lo[0] + 10, 2 * parent_lo[1] + 8,
                       2 * parent_lo[2] + 8),
                   face_bc=[BC_INTERFACE] * 6, level_id=2, dx=0.5)

    def rand_state():
        return {
            "f": jnp.asarray(
                lat.W[:, None, None, None]
                * (1.0 + 0.05 * rng.standard_normal((27,) + parent.padded))
            ).astype(jnp.float32),
            "rho": jnp.asarray(
                1.0 + 0.02 * rng.standard_normal(parent.padded)
            ).astype(jnp.float32),
            "vel": jnp.asarray(
                0.03 * rng.standard_normal((3,) + parent.padded)
            ).astype(jnp.float32),
        }

    st_old, st_new = rand_state(), rand_state()
    if use_temporal:
        ep_old, ep_new = interface_endpoints_pair(child, parent, st_old, st_new)
    else:
        ep_old, ep_new = None, interface_endpoints(child, parent, st_new)
    want = interface_planes_pair(
        ep_new, ep_old, child, parent, use_temporal, g_shifted=g_shifted
    )

    plan = build_iface_mm_plan(child, parent)
    got = interface_planes_pair_mm(
        plan, child, parent, st_old if use_temporal else None, st_new,
        use_temporal, g_shifted=g_shifted,
    )
    assert set(got) == set(want)
    for face in want:
        a, b = np.asarray(want[face]), np.asarray(got[face])
        assert a.shape == b.shape, (face, a.shape, b.shape)
        assert np.allclose(a, b, atol=2e-6), (
            face, np.abs(a - b).max()
        )


def test_hbm_accounting_shared_formula():
    """estimate_capacity and hbm_report_patches must share one
    bytes-per-cell formula (they disagreed by ~15% once: the report counted
    the doubled static fields, the planner did not count the transient f
    copy).  The planner's capacity, re-expanded through the report's
    per-cell split, must land within rounding of the budget it planned."""
    from open_ludwig_tpu.solver_dense import estimate_capacity, hbm_bytes_per_cell

    for precision in ("float32", "bfloat16"):
        per = hbm_bytes_per_cell(precision, transient=True)
        resident = hbm_bytes_per_cell(precision, transient=False)
        f_bytes = 2 if precision == "bfloat16" else 4
        # production engine: f updates in place, the per-step transient is
        # the rho/vel scan-carry ping-pong; the XLA fallback adds an f copy
        assert per - resident == 16
        per_xla = hbm_bytes_per_cell(precision, transient=True, engine="xla")
        assert per_xla - per == 27 * f_bytes
        cap = estimate_capacity(hbm_gb=16.0, precision=precision)
        assert abs(cap * per - 16.0e9) < per  # exact inverse of the formula


def test_flat_coarse_on_downgrades_gracefully_on_cpu(tmp_path):
    """advanced.engine.flat_coarse: on, on a backend where the Pallas flat
    step cannot run (CPU here): the level must be REBUILT in 3-D layout
    with a logged downgrade instead of raising in make_coarse_step_dense
    (the flat layout has no XLA fallback)."""
    import dataclasses

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

    d = str(tmp_path)
    make_case_sphere(d, "1M", surface_resolution=8, num_levels=2, steps=4,
                     ramp_steps=2, output_freq=100, diag_freq=100)
    cfg = dataclasses.replace(load_case_config(d), flat_coarse="on")
    tri = load_mesh(cfg.stl_path, scale=cfg.stl_scale)
    params = compute_domain_params(cfg, tri.min_bounds, tri.max_bounds)
    levels = build_patches(cfg, tri, params)
    assert not any(p.flat_yz for p in levels)  # downgraded, not honored
    statics = build_patch_statics(cfg, levels)
    states = [init_patch_state(p, cfg.precision) for p in levels]
    run = make_batch_runner_dense(cfg, params, levels, statics)  # no raise
    states = run(states, np.int32(1), 2)
    import jax

    jax.block_until_ready(states[0]["rho"])
