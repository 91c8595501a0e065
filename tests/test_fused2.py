"""Temporal blocking: the fused two-sub-step Pallas kernel
(make_pallas_step_fused2) against the unfused schedule it replaces.

The fused kernel must reproduce the unfused sequence EXACTLY (same op
sequence, same storage round-trips): step A -> Bouzidi correction ->
step B [-> standalone correction applied by the caller in both paths].
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from open_ludwig_tpu import lattice as lat
from open_ludwig_tpu.core.patch import (
    BC_INLET,
    BC_INTERFACE,
    BC_MIRROR_Y,
    BC_MIRROR_Z,
    BC_OUTLET,
    PatchLevel,
    build_patches,
)
from open_ludwig_tpu.domain.bouzidi import BouzidiData
from open_ludwig_tpu.ops.dense_step import build_bouzidi_dense_plan
from open_ludwig_tpu.ops.pallas_step import (
    make_bouzidi_pallas,
    make_pallas_step,
    make_pallas_step_fused2,
    prepare_pallas_statics,
)


def _patch(interior, tau=0.52, lo=(0, 0, 0), face_bc=None, level_id=1):
    X, Y, Z = interior
    XS, YS, ZS = X, -(-Y // 8) * 8, -(-Z // 128) * 128
    return PatchLevel(
        level_id, 0.1, tau, lo, interior, (XS, YS, ZS),
        tuple(face_bc or (BC_INLET, BC_OUTLET, BC_MIRROR_Y, BC_MIRROR_Y,
                          BC_MIRROR_Z, BC_MIRROR_Z)),
        np.zeros((XS, YS, ZS), bool),
        np.zeros((XS, YS, ZS), np.float32),
        np.full((XS, YS, ZS), 100.0, np.float32),
    )


def _bz_patch(rng, interior):
    """Patch with a synthetic Bouzidi link set in an interior sub-box."""
    p = _patch(interior)
    nc = 50
    cells = np.unique(
        np.stack([
            rng.integers(9, 15, nc), rng.integers(3, 6, nc),
            rng.integers(40, 80, nc),
        ], 1), axis=0,
    ).astype(np.int32)
    q = np.zeros((len(cells), 27), np.float16)
    mask = rng.random((len(cells), 27)) < 0.3
    q[mask] = rng.uniform(0.05, 1.0, mask.sum()).astype(np.float16)
    q[:, 13] = 0
    p.bouzidi = BouzidiData(cells[:, 0], cells[:, 1], cells[:, 2], q,
                            np.full((len(cells), 27), -1, np.int32))
    p.obstacle[10:14, 3:5, 50:70] = True
    p.sponge[28:, :, :] = 0.3
    p.wall_dist[9, 3, 49] = 1.0
    return p


@pytest.mark.parametrize("store_bf16", [False, True])
def test_fused2_matches_sequential(rng, store_bf16):
    """Fused(A, B) == step; correct; step — on a patch with inlet/outlet/
    mirror faces, an interior Bouzidi box, wall model, sponge and inlet
    noise.  PX=4 over X=32 gives NCH=8 with the box in chunks [2, 3], so
    the in-kernel correction crosses chunk boundaries both ways and the
    pipeline drains through both trailing iterations."""
    from open_ludwig_tpu.ops.storage import encode_f

    p = _bz_patch(rng, (32, 8, 120))
    plan = build_bouzidi_dense_plan(p, 0.001)
    kw = dict(c_wale=0.5, nu_sgs_background=5e-4, inlet_turbulence=0.02,
              wall_model=True, sponge_blend=True, interpret=True,
              store_bf16=store_bf16)
    f_dtype = jnp.bfloat16 if store_bf16 else jnp.float32
    st3d = prepare_pallas_statics(p)
    f0 = (lat.W[:, None, None, None] * (1 + 0.05 * rng.standard_normal(
        (27,) + p.padded))).astype(np.float32)
    v0 = (0.02 * rng.standard_normal((3,) + p.padded)).astype(np.float32)
    fj = encode_f(jnp.asarray(f0), "bfloat16") if store_bf16 else jnp.asarray(f0)
    vj = jnp.asarray(v0)
    uA, uB = jnp.float32(0.03), jnp.float32(0.032)
    sA, sB = jnp.int32(9), jnp.int32(10)

    # unfused reference: step A, standalone correction, step B
    pstep = make_pallas_step(p, planes_per_step=4, **kw)
    bz = make_bouzidi_pallas(plan, (27,) + p.padded, f_dtype, interpret=True)
    fA, rA, vA = pstep(fj, vj, uA, sA, st3d)
    fAc = bz(fA)
    f_ref, r_ref, v_ref = pstep(fAc, vA, uB, sB, st3d)

    fstep = make_pallas_step_fused2(p, planes_per_step=4, bz_plan=plan, **kw)
    assert fstep is not None and fstep.bz_folded
    f_fu, r_fu, v_fu = fstep(
        fj, vj, jnp.stack([uA, uB]), jnp.stack([sA, sB]), st3d
    )

    X, Y, Z = p.interior
    df = np.abs(np.asarray(f_fu, np.float32)[:, :X, :Y, :Z]
                - np.asarray(f_ref, np.float32)[:, :X, :Y, :Z]).max()
    dr = np.abs(np.asarray(r_fu)[:X, :Y, :Z]
                - np.asarray(r_ref)[:X, :Y, :Z]).max()
    dv = np.abs(np.asarray(v_fu)[:, :X, :Y, :Z]
                - np.asarray(v_ref)[:, :X, :Y, :Z]).max()
    # same op sequence, but two separately compiled programs: XLA may
    # re-associate/fuse differently, so equality holds to f32 reassociation
    # noise, not bitwise.  bf16 storage rounds f at every step boundary in
    # BOTH paths, so the 1e-7-level f32 drift rarely survives — allow one
    # bf16 ulp on a tiny fraction of cells.
    if store_bf16:
        assert df < 2e-3 and dr < 1e-4 and dv < 1e-4, (df, dr, dv)
        frac = (np.asarray(f_fu, np.float32)[:, :X, :Y, :Z]
                != np.asarray(f_ref, np.float32)[:, :X, :Y, :Z]).mean()
        assert frac < 0.01, frac
    else:
        assert df < 1e-6 and dr < 1e-6 and dv < 1e-6, (df, dr, dv)


def test_fused2_interface_pair(rng):
    """Fused kernel on an all-interface patch (the headline bench's finest-
    level configuration): pair-layout ghost planes with per-sub-step windows
    must match two unfused iface_pair steps reading nsub=0 then nsub=1."""
    from open_ludwig_tpu.ops.pallas_step import prep_iface_pallas

    X, Y, Z = 16, 8, 120
    p = _patch((X, Y, Z), tau=0.53, lo=(10, 12, 14),
               face_bc=[BC_INTERFACE] * 6, level_id=2)
    p.obstacle[3:5, 3:5, 50:54] = True
    st3d = prepare_pallas_statics(p)
    f0 = (lat.W[:, None, None, None] * (1 + 0.05 * rng.standard_normal(
        (27,) + p.padded))).astype(np.float32)
    v0 = (0.02 * rng.standard_normal((3,) + p.padded)).astype(np.float32)
    # two sub-step plane sets (temporal weights 0.0 / 0.5 in production),
    # pre-shifted via prep_iface_pallas then stacked into (nf=1, nw=2, ...)
    # pair arrays — each face its own group, face index 0
    iface_pair = {}
    for fc in range(6):
        ax = fc // 2
        t = [a for a in range(3) if a != ax]
        A, B = p.padded[t[0]], p.padded[t[1]]
        planes_w = []
        for w in range(2):
            raw = {fc: jnp.asarray(
                (lat.W[:, None, None] * (1 + 0.03 * rng.standard_normal(
                    (27, A + 2, B + 2)))).astype(np.float32))}
            planes_w.append(prep_iface_pallas(raw, p)[fc])
        iface_pair[fc] = (jnp.stack(planes_w)[None], 0)  # (1, 2, ...)

    kw = dict(c_wale=0.5, nu_sgs_background=5e-4, inlet_turbulence=0.0,
              wall_model=False, sponge_blend=False, interpret=True)
    u = jnp.float32(0.04)
    sA, sB = jnp.int32(3), jnp.int32(4)

    pstep = make_pallas_step(p, planes_per_step=4, iface_pair=True, **kw)
    fA, rA, vA = pstep(jnp.asarray(f0), jnp.asarray(v0), u, sA, st3d,
                       iface_pair, nsub=0)
    f_ref, r_ref, v_ref = pstep(fA, vA, u, sB, st3d, iface_pair, nsub=1)

    fstep = make_pallas_step_fused2(p, planes_per_step=4, iface_pair=True,
                                    **kw)
    assert fstep is not None and not fstep.bz_folded
    f_fu, r_fu, v_fu = fstep(
        jnp.asarray(f0), jnp.asarray(v0), jnp.stack([u, u]),
        jnp.stack([sA, sB]), st3d, iface_pair, nsub_ab=(0, 1)
    )

    df = np.abs(np.asarray(f_fu)[:, :X, :Y, :Z]
                - np.asarray(f_ref)[:, :X, :Y, :Z]).max()
    dv = np.abs(np.asarray(v_fu)[:, :X, :Y, :Z]
                - np.asarray(v_ref)[:, :X, :Y, :Z]).max()
    assert df < 1e-6 and dv < 1e-6, (df, dv)


@pytest.mark.slow  # compile-heavy on CPU; full suite still runs it
def test_fused2_coarse_e2e(tmp_path):
    """Production multi-level coarse step with temporal blocking (fuse2) vs
    the same step without — the finest level's two sub-steps fused into one
    kernel must leave every level's state unchanged to fp tolerance."""
    from open_ludwig_tpu.cases import make_case_sphere
    from open_ludwig_tpu.config import load_case_config
    from open_ludwig_tpu.geometry import load_mesh
    from open_ludwig_tpu.scaling import compute_domain_params
    from open_ludwig_tpu import solver_dense as sd

    d = str(tmp_path)
    make_case_sphere(d, "1M", surface_resolution=12, num_levels=2, steps=4,
                     ramp_steps=2, output_freq=100, diag_freq=100,
                     wake_enabled=False, boundary_method="bouzidi")
    cfg = load_case_config(d)
    tri = load_mesh(cfg.stl_path, scale=cfg.stl_scale)
    params = compute_domain_params(cfg, tri.min_bounds, tri.max_bounds)
    patches = build_patches(cfg, tri, params)
    statics = sd.build_patch_statics(cfg, patches)
    s0 = [sd.init_patch_state(p) for p in patches]
    arrs = sd.statics_arg_arrays(statics)
    csF = sd.make_coarse_step_dense(cfg, params, patches, statics,
                                    use_pallas=True, fuse2=True)
    assert csF.fused2, "fused kernel should qualify on this case"
    # the fused path may add bz_S_pad to statics; rebuild arrs to carry it
    arrsF = sd.statics_arg_arrays(statics)
    csU = sd.make_coarse_step_dense(cfg, params, patches, statics,
                                    use_pallas=True, fuse2=False)
    sF = csF.seed_slabs([dict(x) for x in s0])
    sU = csU.seed_slabs([dict(x) for x in s0])
    jF = jax.jit(lambda s, t, a: csF(list(s), t, a))
    jU = jax.jit(lambda s, t, a: csU(list(s), t, a))
    for t in range(1, 3):
        sF = jF(sF, jnp.int32(t), arrsF)
        sU = jU(sU, jnp.int32(t), arrs)
    for li, p in enumerate(patches):
        X, Y, Z = p.interior
        df = np.abs(
            np.asarray(sF[li]["f"], np.float32)[:, :X, :Y, :Z]
            - np.asarray(sU[li]["f"], np.float32)[:, :X, :Y, :Z]
        ).max()
        assert df < 1e-5, (li, df)


def test_fused2_pair_runner(rng, tmp_path):
    """Single-level case: the batch runner's fused-pair scan (including the
    odd-batch fallback step) vs the plain per-step scan."""
    from open_ludwig_tpu.cases import make_case_sphere
    from open_ludwig_tpu.config import load_case_config
    from open_ludwig_tpu.geometry import load_mesh
    from open_ludwig_tpu.scaling import compute_domain_params
    from open_ludwig_tpu import solver_dense as sd

    d = str(tmp_path)
    make_case_sphere(d, "1M", surface_resolution=10, num_levels=1, steps=6,
                     ramp_steps=3, output_freq=100, diag_freq=100,
                     boundary_method="bouzidi")
    cfg = load_case_config(d)
    tri = load_mesh(cfg.stl_path, scale=cfg.stl_scale)
    params = compute_domain_params(cfg, tri.min_bounds, tri.max_bounds)
    patches = build_patches(cfg, tri, params)
    statics = sd.build_patch_statics(cfg, patches)
    runF = sd.make_batch_runner_dense(cfg, params, patches, statics,
                                      use_pallas=True, fuse2=True)
    runU = sd.make_batch_runner_dense(cfg, params, patches, statics,
                                      use_pallas=True, fuse2=False)
    assert runF.fused2, "fused kernel should qualify on this case"
    # fresh device states per runner: the batch runner DONATES its input
    sF = runF([sd.init_patch_state(p) for p in patches], np.int32(1), 5)
    sU = runU([sd.init_patch_state(p) for p in patches], np.int32(1), 5)
    X, Y, Z = patches[0].interior
    df = np.abs(
        np.asarray(sF[0]["f"], np.float32)[:, :X, :Y, :Z]
        - np.asarray(sU[0]["f"], np.float32)[:, :X, :Y, :Z]
    ).max()
    assert df < 1e-5, df
