"""Multi-level scheduler for the dense-patch layout.

Same statically-unrolled recursion as solver.make_coarse_step (reference:
src/solver_control.jl:21-143) operating on dense PatchLevel states
{f: (27, XS, YS, ZS), rho, vel}; the whole diagnostics interval runs as one
lax.scan with zero host syncs.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from . import lattice as lat
from .config import CaseConfig
from .core.patch import BC_INTERFACE, PatchLevel
from .ops.dense_step import (
    apply_bouzidi_dense,
    build_bouzidi_dense_plan,
    build_iface_mm_plan,
    dense_stream_collide,
    extract_endpoint_slabs,
    interface_endpoints,
    interface_endpoints_pair,
    interface_from_endpoints,
    interface_planes_pair_mm,
)
from .ops import storage
from .ops.pallas_step import (
    choose_2d_chunks,
    choose_flat_px,
    make_bouzidi_pallas,
    make_pallas_step,
    make_pallas_step_2d,
    make_pallas_step_flat,
    make_pallas_step_fused2,
    prep_iface_pallas,
    prepare_pallas_statics,
)
from .scaling import DomainParams
from .solver import ramp_velocity


def init_patch_state(
    patch: PatchLevel, precision: str = "float32", force_3d: bool = False
) -> Dict:
    sh = patch.state_shape  # (XS, YS, ZS), or (XS, M) flat-(y,z)
    if force_3d:
        sh = patch.padded  # rest state in 3-D layout regardless of flat_yz
    if storage.normalize_precision(precision) == storage.STORE_BF16:
        # g = f - w is exactly zero at the rest equilibrium
        f = jnp.zeros((27,) + sh, jnp.bfloat16)
    else:
        f = jnp.broadcast_to(
            jnp.asarray(lat.W).reshape((27,) + (1,) * len(sh)), (27,) + sh
        ).astype(jnp.float32)
    return {
        "f": f,
        "rho": jnp.ones(sh, jnp.float32),
        "vel": jnp.zeros((3,) + sh, jnp.float32),
    }


def build_patch_statics(cfg: CaseConfig, patches: List[PatchLevel]) -> List[Dict]:
    statics = []
    for p in patches:
        st = {"bouzidi": build_bouzidi_dense_plan(p, cfg.q_min_threshold)}
        st.update(prepare_pallas_statics(p))
        if p.flat_yz:
            # flat (N,) views for the runner's masked reductions; the XLA
            # dense path (which would also consume these) never runs on a
            # flat level
            st["obstacle"] = st["obstacle_u8"].reshape(-1).astype(bool)
            st["sponge"] = st["sponge3d"].reshape(-1)
            st["wall_dist"] = st["wall3d"].reshape(-1)
        else:
            st["obstacle"] = jnp.asarray(p.obstacle.reshape(-1))
            st["sponge"] = jnp.asarray(p.sponge.reshape(-1))
            st["wall_dist"] = jnp.asarray(p.wall_dist.reshape(-1))
        statics.append(st)
    return statics


# VMEM budget for one single-plane (PX=1) chunk of the Pallas kernel —
# rotating DMA windows + pipelined in/out blocks (the same footprint formula
# the kernel uses to pick PX and declare its vmem limit); levels whose
# single-plane footprint exceeds it fall back to the XLA dense path.  The
# PX>1 chunking inside the kernel uses a tighter 36 MiB bound; a lone PX=1
# kernel may claim up to this (declared ~1.5x + 12 MiB, still leaving the
# 128 MiB space room for XLA's own VMEM promotion).
_PALLAS_VMEM_BUDGET = 52 * 2**20


def _pallas_fits(p: PatchLevel, store_bf16: bool = False) -> bool:
    m = p.flat_m if p.flat_yz else p.padded[1] * p.padded[2]
    fb = 2 if store_bf16 else 4
    est1 = (4 * (27 * fb + 12) + 2 * 9 + 2 * (27 * fb + 16)) * m
    return est1 < _PALLAS_VMEM_BUDGET


def _shard_map_pstep(pstep, patch: PatchLevel, mesh):
    """Run a shard_nx-built Pallas step under shard_map on an ("x",) mesh.

    x-slab domain decomposition: each device owns a contiguous
    (27, XS/n, YS, ZS) slab; per step the two boundary x-planes of f and vel
    are exchanged with one bidirectional jax.lax.ppermute (the D3Q27 stencil
    only reaches x±1, so a 1-plane halo rides a single ICI hop), and the
    local Pallas kernel consumes them as edge-plane inputs with its BC masks
    keyed on the global x offset.  Wrapped ring deliveries at the domain ends
    are dead values: the inlet/outlet masks overwrite those rows.

    This is the multi-chip scaling extension the single-GPU reference lacks
    (reference: src/main.jl:75 picks one CUDABackend; SURVEY.md §2.6) — halo
    exchange over ICI instead of NCCL, with the SAME kernel as single-chip."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    XS = patch.padded[0]
    flat = patch.flat_yz  # state rank 3 (27, XS, M) instead of 4
    n_dev = mesh.devices.size
    assert XS % n_dev == 0, (XS, n_dev)
    XL = XS // n_dev
    need_iface = tuple(
        fc for fc in range(6) if patch.face_bc[fc] == BC_INTERFACE
    )

    pair = getattr(pstep, "iface_pair", False)

    def local(f, vel, u_inlet, t_seed, nsub, st3d, arrs, _fis):
        me = jax.lax.axis_index("x")
        fwd = [(i, (i + 1) % n_dev) for i in range(n_dev)]
        bwd = [((i + 1) % n_dev, i) for i in range(n_dev)]
        # [0] = left neighbor's last plane, [1] = right neighbor's first
        f_edges = jnp.stack(
            [jax.lax.ppermute(f[:, -1], "x", fwd),
             jax.lax.ppermute(f[:, 0], "x", bwd)], axis=1
        )
        v_edges = jnp.stack(
            [jax.lax.ppermute(vel[:, -1], "x", fwd),
             jax.lax.ppermute(vel[:, 0], "x", bwd)], axis=1
        )
        iface_k = (
            {fc: (arrs[fc], _fis[fc]) for fc in arrs} if pair else arrs
        )
        kw = {"nsub": nsub} if pair else {}
        return pstep(
            f, vel, u_inlet, t_seed, st3d, iface_k,
            edges=(f_edges, v_edges), x_off=me * XL, **kw,
        )

    x4 = P(None, "x", None) if flat else P(None, "x", None, None)
    x3 = P("x", None) if flat else P("x", None, None)
    st3d_spec = {"obstacle_u8": x3, "sponge3d": x3, "wall3d": x3}
    # ghost planes: x-faces are whole (27, YS, ZS) planes consumed by the
    # first/last chunk only (replicate); y/z faces are x-row-major
    # (XS, 27, B) and slab-shard with the state.  Pair layout adds the
    # (nf, nw) leading axes (replicated).
    if pair:
        iface_spec = {
            fc: (P() if fc // 2 == 0 else P(None, None, "x", None, None))
            for fc in need_iface
        }
    else:
        iface_spec = {
            fc: (P(None, None, None) if fc // 2 == 0 else x3)
            for fc in need_iface
        }

    def step(f, vel, u_inlet, t_seed, statics3d, iface=None, nsub=None):
        st3d = {k: statics3d[k] for k in st3d_spec}
        iface = iface or {}
        fis = {fc: v[1] for fc, v in iface.items()} if pair else {}
        arrs = {fc: (v[0] if pair else v) for fc, v in iface.items()}
        sm = shard_map(
            partial(local, _fis=fis),
            mesh=mesh,
            in_specs=(x4, x4, P(), P(), P(), st3d_spec,
                      {fc: iface_spec[fc] for fc in arrs}),
            out_specs=(x4, x3, x4),
            check_vma=False,
        )
        return sm(
            f, vel,
            jnp.asarray(u_inlet, jnp.float32),
            jnp.asarray(t_seed, jnp.int32),
            jnp.asarray(0 if nsub is None else nsub, jnp.int32),
            st3d, arrs,
        )

    step.g_native = getattr(pstep, "g_native", False)
    step.iface_pair = pair
    return step


def make_coarse_step_dense(
    cfg: CaseConfig, params: DomainParams, patches: List[PatchLevel],
    statics: List[Dict], use_pallas: bool = None,
    mesh=None,  # jax.sharding.Mesh over ("x",): run every level's Pallas
    # step inside a shard_map x-slab decomposition with lax.ppermute halo
    # exchange over ICI (parallel.patch_shard wires this for production)
    interpret: bool = None,  # Pallas interpret mode (None = auto: CPU only)
    _bz_fold: bool = False,  # fold Bouzidi into the step kernel's delayed-
    # flush output ring when its box chunk range allows.  Measured SLOWER
    # than the standalone correction kernel on the Re1M bench (1279 vs 1233
    # us/coarse interleaved A/B — the standalone kernel's in-program cost is
    # mostly overlapped, while the in-kernel correction adds critical-path
    # VPU work per chunk; NOTES_ROUND3_PERF.md) — kept as a tested option:
    # the delayed-flush ring is the scaffolding temporal blocking needs
    _iface_mode: str = "real",  # perf dissection hook (tools/perf_probe):
    # "frozen" closes rest-state ghost planes over the step as constants,
    # removing the whole interface-construction path from the timeline
    fuse2: bool = True,  # temporal blocking: fuse the CHILDLESS finest
    # level's two sub-steps (or two consecutive coarse steps of a
    # single-level case, via coarse_step.pair_step) into ONE Pallas kernel
    # pass (make_pallas_step_fused2) — f is read/written once per TWO steps.
    # Auto-falls back to the unfused schedule when the fused kernel doesn't
    # qualify (VMEM, Bouzidi box at a domain edge, flat layout, sharding).
):
    n_levels = len(patches)
    use_temporal = cfg.temporal_interpolation
    precision = storage.normalize_precision(cfg.precision)
    store_bf16 = precision == storage.STORE_BF16
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)
    if interpret is None:
        interpret = jax.default_backend() in ("cpu",)
    shard_nx = mesh.devices.size if mesh is not None else 1
    psteps = []
    for li, p in enumerate(patches):
        if p.flat_yz and not (
            use_pallas and p.padded[0] % shard_nx == 0
            and choose_flat_px(p.padded[0] // shard_nx, p.flat_m,
                               2 if store_bf16 else 4) is not None
        ):
            raise RuntimeError(
                f"level {p.level_id} stores flat-(y,z) but the Pallas step "
                "is unavailable (the XLA dense path is 3-D only) — set "
                "advanced.engine.flat_coarse: off for this case"
            )
        if p.flat_yz:
            pstep = make_pallas_step_flat(
                p,
                c_wale=cfg.c_wale,
                nu_sgs_background=cfg.nu_sgs_background,
                inlet_turbulence=cfg.inlet_turbulence_intensity,
                wall_model=cfg.wall_model_enabled,
                sponge_blend=cfg.sponge_blend_distributions,
                store_bf16=store_bf16,
                interpret=interpret,
                shard_nx=shard_nx,
                alias_f=True,
            )
            if mesh is not None:
                pstep = _shard_map_pstep(pstep, p, mesh)
            psteps.append(pstep)
        elif use_pallas and _pallas_fits(p, store_bf16) \
                and p.padded[0] % shard_nx == 0:
            pstep = make_pallas_step(
                p,
                c_wale=cfg.c_wale,
                nu_sgs_background=cfg.nu_sgs_background,
                inlet_turbulence=cfg.inlet_turbulence_intensity,
                wall_model=cfg.wall_model_enabled,
                sponge_blend=cfg.sponge_blend_distributions,
                store_bf16=store_bf16,
                interpret=interpret,
                shard_nx=shard_nx,
                # ghost planes ride in the einsum-native pair layout (the
                # per-face/per-sub-step splits and their relayout copies
                # never exist); frozen-iface dissection keeps the legacy
                # per-face layout
                iface_pair=_iface_mode == "real",
                # in-place f update on every level: parents' pre-step
                # state is only consumed by the child-interface slab
                # slices, which XLA schedules before the clobbering
                # kernel (verified bit-exact on a 3-level TPU A/B);
                # kills the scan-carry loop-back copies
                alias_f=True,
                # fold the Bouzidi correction into the step kernel's chunk
                # pipeline (delayed-flush output ring) — saves the separate
                # per-sub-step dispatch and its full box f re-read/re-write;
                # the kernel falls back (bz_folded=False) when the box chunk
                # range is not interior.  Sharded runs keep the standalone
                # GSPMD correction (the kernel guards shard_nx > 1).
                bz_plan=(
                    statics[li]["bouzidi"]
                    if mesh is None and _bz_fold else None
                ),
            )
            if getattr(pstep, "bz_folded", False):
                statics[li]["bz_S_pad"] = pstep.bz_spad
            if mesh is not None:
                pstep = _shard_map_pstep(pstep, p, mesh)
            psteps.append(pstep)
        elif use_pallas and choose_2d_chunks(
            p, store_bf16, shard_nx, alias_f=True
        ) is not None:
            # plane too large for the 1-D whole-x-plane window: the (x, y)
            # chunked kernel covers the reference's 64M/216M-cell rows
            # (reference: README.md:508-509) without falling back to the XLA
            # path, whose (27, N) temporaries exceed HBM at these sizes
            pstep = make_pallas_step_2d(
                p,
                c_wale=cfg.c_wale,
                nu_sgs_background=cfg.nu_sgs_background,
                inlet_turbulence=cfg.inlet_turbulence_intensity,
                wall_model=cfg.wall_model_enabled,
                sponge_blend=cfg.sponge_blend_distributions,
                store_bf16=store_bf16,
                interpret=interpret,
                shard_nx=shard_nx,
                # in-place f update: kills the transient second f copy
                # (54 B/cell bf16, ~38% of the big-domain HBM budget —
                # single-chip ceiling ~112M -> ~145M cells)
                alias_f=True,
            )
            if mesh is not None:
                pstep = _shard_map_pstep(pstep, p, mesh)
            psteps.append(pstep)
            print(
                f"  [engine] level {p.level_id}: plane "
                f"{p.padded[1]}x{p.padded[2]} exceeds the 1-D window budget; "
                "using the 2-D (x,y)-chunked Pallas kernel"
            )
        else:
            psteps.append(None)
            if use_pallas:
                print(
                    f"  [engine] level {p.level_id}: plane "
                    f"{p.padded[1]}x{p.padded[2]} exceeds the Pallas VMEM "
                    "window budget; using the XLA dense path for this level"
                )
    # Bouzidi application per level: single-dispatch in-place Pallas kernel
    # on Pallas levels (the whole coefficient sub-box lives in VMEM), XLA
    # sub-box math otherwise or when the box exceeds the VMEM budget (XLA
    # reserves every kernel's declared VMEM while scheduling; a >24 MiB box
    # next to the step kernels OOMs the 128 MiB space — observed on Re10M)
    bz_apply = []
    for li, p in enumerate(patches):
        plan = statics[li]["bouzidi"]
        if plan is None or getattr(psteps[li], "bz_folded", False):
            bz_apply.append(None)
            continue
        f_dtype = jnp.bfloat16 if store_bf16 else jnp.float32
        # coefficients (S) + box scratch, all resident in VMEM at once
        box_bytes = 2 * 27 * int(np.prod(plan["dim"])) * (2 if store_bf16 else 4)
        if psteps[li] is not None and box_bytes < 32 * 2**20 \
                and mesh is None:
            bz_apply.append(
                make_bouzidi_pallas(
                    plan, (27,) + p.padded, f_dtype, interpret=interpret
                )
            )
        else:
            if psteps[li] is not None:
                print(
                    f"  [engine] level {p.level_id}: Bouzidi box "
                    f"{tuple(plan['dim'])} exceeds the VMEM budget; using "
                    "the XLA sub-box path for the correction"
                )
            bz_apply.append(
                lambda f, S=None, _plan=plan: apply_bouzidi_dense(
                    f, _plan if S is None else {**_plan, "S": S}
                )
            )

    # temporal blocking on the childless finest level (see the fuse2 param)
    fstep = None
    last = n_levels - 1
    if fuse2 and use_pallas and mesh is None and _iface_mode == "real" \
            and not _bz_fold and psteps[last] is not None \
            and not getattr(psteps[last], "flat", False) \
            and not getattr(psteps[last], "bz_folded", False):
        fstep = make_pallas_step_fused2(
            patches[last],
            c_wale=cfg.c_wale,
            nu_sgs_background=cfg.nu_sgs_background,
            inlet_turbulence=cfg.inlet_turbulence_intensity,
            wall_model=cfg.wall_model_enabled,
            sponge_blend=cfg.sponge_blend_distributions,
            store_bf16=store_bf16,
            interpret=interpret,
            alias_f=True,
            bz_plan=statics[last]["bouzidi"],
            iface_pair=getattr(psteps[last], "iface_pair", False),
        )
        if fstep is not None and fstep.bz_folded:
            # chunk-aligned padded coefficients for step A's in-kernel
            # correction (step B still uses the standalone bz_apply kernel)
            statics[last]["bz_S_pad"] = fstep.bz_spad

    # whether each level's Pallas step is g-native (pre-shifted ghost planes
    # must then arrive in g = f - w space)
    g_native = [ps is not None and getattr(ps, "g_native", False) for ps in psteps]

    # einsum interface plans (fused upsample+shift operators) for the Pallas
    # child levels — replaces the per-face slice/upsample/shift op chains
    # that dominated the coarse-step wall time (measured: ~1400 sub-us XLA
    # fusions + ~275 layout copies per coarse step)
    mm_plans = [None] + [
        build_iface_mm_plan(patches[li], patches[li - 1])
        if psteps[li] is not None else None
        for li in range(1, n_levels)
    ]

    frozen_iface = None
    if _iface_mode == "frozen":
        # rest states in 3-D layout: the legacy endpoint path used by the
        # frozen dissection mode doesn't consume flat-(y,z) parents
        sts0 = [init_patch_state(p, cfg.precision, force_3d=True)
                for p in patches]
        frozen_iface = [None]
        for li in range(1, n_levels):
            ep0 = interface_endpoints(patches[li], patches[li - 1], sts0[li - 1])
            fr = interface_from_endpoints(
                ep0, None, patches[li], patches[li - 1], 0.0, False
            )
            if psteps[li] is not None:
                fr = prep_iface_pallas(fr, patches[li], g_shifted=g_native[li])
            frozen_iface.append(fr)

    def coarse_step(states: List[Dict], t, _arrs: List[Dict] = None):
        """_arrs (statics_arg_arrays): per-level device arrays delivered as
        traced jit arguments; without it the closure statics are inlined as
        HLO literal constants (134 MB MLIR and half-hour compiles on large
        cases — always pass it in jitted production loops)."""
        states = list(states)
        u_curr = ramp_velocity(t, cfg.u_lattice, cfg.ramp_steps)

        def visit(lvl: int, t_sub, iface, nsub: int = 0):
            patch = patches[lvl]
            static = (
                statics[lvl] if _arrs is None
                else {**statics[lvl], **_arrs[lvl]}
            )
            st = states[lvl]
            seed = (t_sub % 1000000).astype(jnp.int32)
            if psteps[lvl] is not None:
                kw = {"nsub": nsub} if _iface_mode == "real" else {}
                if getattr(psteps[lvl], "bz_folded", False):
                    kw["bz_S"] = static.get("bz_S_pad")
                f_new, rho_new, vel_new = psteps[lvl](
                    st["f"], st["vel"], u_curr, seed, static, iface, **kw
                )
            else:
                f_new, rho_new, vel_new = dense_stream_collide(
                    storage.decode_f(st["f"]), st["vel"], u_curr, seed,
                    static, patch,
                    c_wale=cfg.c_wale,
                    nu_sgs_background=cfg.nu_sgs_background,
                    inlet_turbulence=cfg.inlet_turbulence_intensity,
                    wall_model=cfg.wall_model_enabled,
                    sponge_blend=cfg.sponge_blend_distributions,
                    iface=iface,
                )
                f_new = storage.encode_f(f_new, precision)
            if bz_apply[lvl] is not None:
                if _arrs is None:
                    f_new = bz_apply[lvl](f_new)
                else:
                    f_new = bz_apply[lvl](f_new, _arrs[lvl]["bz_S"])
            states[lvl] = {"f": f_new, "rho": rho_new, "vel": vel_new}
            if lvl + 1 < n_levels:
                # endpoint ghost planes from the pre/post-step parent state,
                # computed once and shared by both child sub-steps; the
                # Pallas levels get the blend + feq + rescale + shift chain
                # for BOTH sub-steps fused into one batched op sequence
                # (interface_planes_pair), the XLA fallback gets the raw
                # per-sub-step planes
                child = patches[lvl + 1]
                if frozen_iface is not None:
                    if_a = if_b = frozen_iface[lvl + 1]
                elif psteps[lvl + 1] is not None:
                    # slab-carry: the OLD endpoint slabs are the previous
                    # parent step's NEW slabs (stashed under "_ifsl"), so the
                    # pre-step f/rho/vel have no consumer besides the aliased
                    # kernel and XLA updates them in place across the scan
                    # (no whole-array protection copies).  Callers that scan
                    # over coarse_step must seed the key first
                    # (coarse_step.seed_slabs); un-seeded direct calls fall
                    # back to inline old-slab extraction.
                    old_sl = None
                    if use_temporal:
                        old_sl = st.get("_ifsl")
                        if old_sl is None:
                            old_sl = extract_endpoint_slabs(
                                mm_plans[lvl + 1], st
                            )
                    new_sl = extract_endpoint_slabs(
                        mm_plans[lvl + 1], states[lvl]
                    )
                    if use_temporal:
                        states[lvl]["_ifsl"] = new_sl
                    planes = interface_planes_pair_mm(
                        mm_plans[lvl + 1], child, patch,
                        None, states[lvl],
                        use_temporal, g_shifted=g_native[lvl + 1],
                        # ghost planes in the storage dtype: halves the feq
                        # tail's write traffic and the kernel's plane reads
                        # (g-space planes are O(u) so bf16 keeps ~3 digits;
                        # Cd validation re-checked under this, VALIDATION.md)
                        out_dtype=(
                            jnp.bfloat16 if g_native[lvl + 1] else jnp.float32
                        ),
                        pair_layout=True,
                        slabs_old=old_sl,
                        slabs_new=new_sl,
                    )
                    if fstep is not None and lvl + 1 == n_levels - 1:
                        # temporal blocking: both child sub-steps in ONE
                        # fused kernel pass (step A's Bouzidi correction is
                        # folded in; step B's runs standalone below)
                        stc = states[lvl + 1]
                        staticc = (
                            statics[lvl + 1] if _arrs is None
                            else {**statics[lvl + 1], **_arrs[lvl + 1]}
                        )
                        ts = 2 * t_sub
                        seeds = jnp.stack([
                            (ts % 1000000).astype(jnp.int32),
                            ((ts + 1) % 1000000).astype(jnp.int32),
                        ])
                        kwf = {}
                        if fstep.bz_folded:
                            kwf["bz_S"] = staticc.get("bz_S_pad")
                        f_new, rho_new, vel_new = fstep(
                            stc["f"], stc["vel"],
                            jnp.stack([u_curr, u_curr]), seeds,
                            staticc, planes,
                            nsub_ab=(0, 1 if use_temporal else 0), **kwf,
                        )
                        if bz_apply[lvl + 1] is not None:
                            if _arrs is None:
                                f_new = bz_apply[lvl + 1](f_new)
                            else:
                                f_new = bz_apply[lvl + 1](
                                    f_new, _arrs[lvl + 1]["bz_S"]
                                )
                        states[lvl + 1] = {
                            "f": f_new, "rho": rho_new, "vel": vel_new
                        }
                        return
                    # both sub-steps consume the SAME pair arrays; the
                    # sub-step plane is picked by the kernel's index_map
                    visit(lvl + 1, 2 * t_sub, planes, 0)
                    visit(lvl + 1, 2 * t_sub + 1, planes,
                          1 if use_temporal else 0)
                    return
                else:
                    if use_temporal:
                        ep_old, ep_new = interface_endpoints_pair(
                            child, patch, st, states[lvl]
                        )
                    else:
                        ep_old = None
                        ep_new = interface_endpoints(child, patch, states[lvl])
                    if_a = interface_from_endpoints(
                        ep_new, ep_old, child, patch, 0.0, use_temporal
                    )
                    if_b = interface_from_endpoints(
                        ep_new, ep_old, child, patch, 0.5, use_temporal
                    )
                visit(lvl + 1, 2 * t_sub, if_a)
                visit(lvl + 1, 2 * t_sub + 1, if_b)

        visit(0, t, None)
        return states

    def seed_slabs(states: List[Dict]) -> List[Dict]:
        """Stash "_ifsl" (carried endpoint slabs) on every pair-mode parent
        level so coarse_step's carry structure is scan-invariant.  Callers
        that lax.scan over coarse_step MUST run this once on the initial
        states (the batch runners do); idempotent."""
        states = list(states)
        if frozen_iface is not None:
            return states  # dissection mode: planes are constants, no carry
        for lvl in range(n_levels - 1):
            if psteps[lvl + 1] is not None and use_temporal \
                    and "_ifsl" not in states[lvl]:
                states[lvl] = dict(states[lvl])
                states[lvl]["_ifsl"] = extract_endpoint_slabs(
                    mm_plans[lvl + 1], states[lvl]
                )
        return states

    pair_step = None
    if n_levels == 1 and fstep is not None:
        def pair_step(states, t, _arrs: List[Dict] = None):
            """TWO consecutive coarse steps of a single-level case as one
            fused kernel pass + one standalone Bouzidi correction (temporal
            blocking; halves f HBM traffic on these HBM-bound domains)."""
            st = states[0]
            static = (
                statics[0] if _arrs is None else {**statics[0], **_arrs[0]}
            )
            u_a = ramp_velocity(t, cfg.u_lattice, cfg.ramp_steps)
            u_b = ramp_velocity(t + 1, cfg.u_lattice, cfg.ramp_steps)
            seeds = jnp.stack([
                (t % 1000000).astype(jnp.int32),
                ((t + 1) % 1000000).astype(jnp.int32),
            ])
            kwf = {}
            if fstep.bz_folded:
                kwf["bz_S"] = static.get("bz_S_pad")
            f_new, rho_new, vel_new = fstep(
                st["f"], st["vel"], jnp.stack([u_a, u_b]), seeds,
                static, None, **kwf,
            )
            if bz_apply[0] is not None:
                if _arrs is None:
                    f_new = bz_apply[0](f_new)
                else:
                    f_new = bz_apply[0](f_new, _arrs[0]["bz_S"])
            return [{"f": f_new, "rho": rho_new, "vel": vel_new}]

    coarse_step.seed_slabs = seed_slabs
    coarse_step.pair_step = pair_step
    # which levels run the fused Pallas kernel (vs the XLA dense fallback) —
    # introspection for tests/dryruns asserting the production kernel is live
    coarse_step.pallas_levels = tuple(ps is not None for ps in psteps)
    # temporal blocking live on the finest level (fused two-sub-step kernel)
    coarse_step.fused2 = fstep is not None
    coarse_step.bz_folded = tuple(
        getattr(ps, "bz_folded", False) for ps in psteps
    )
    return coarse_step


def statics_arg_arrays(statics: List[Dict]) -> List[Dict]:
    """The per-level device arrays of `statics`, shaped as a jit-argument
    pytree.  Passing them as arguments (instead of letting the jit capture
    them by closure) keeps them out of the HLO as parameters — closure
    capture inlines every array as a literal constant, which produced 134 MB
    compile payloads and tens-of-minutes compiles on multi-million-cell
    cases."""
    out = []
    for st in statics:
        d = {
            k: st[k]
            for k in (
                "obstacle", "sponge", "wall_dist",
                "obstacle_u8", "sponge3d", "wall3d", "mom_mat", "back_mat",
            )
            if k in st
        }
        if st.get("bouzidi") is not None:
            d["bz_S"] = st["bouzidi"]["S"]
        if st.get("bz_S_pad") is not None:
            # chunk-aligned padded coefficients of the folded-in correction
            # (set by make_coarse_step_dense when the kernel folds Bouzidi)
            d["bz_S_pad"] = st["bz_S_pad"]
        out.append(d)
    return out


def make_batch_runner_dense(
    cfg: CaseConfig, params: DomainParams, patches: List[PatchLevel],
    statics: List[Dict], use_pallas: bool = None, fuse2: bool = True,
):
    coarse_step = make_coarse_step_dense(
        cfg, params, patches, statics, use_pallas=use_pallas, fuse2=fuse2
    )
    arrs = statics_arg_arrays(statics)

    @partial(jax.jit, static_argnums=(3,), donate_argnums=(0,))
    def _run(states, arrs_, t0, n: int):
        def body(carry, t):
            return coarse_step(carry, t, arrs_), None

        out, _ = jax.lax.scan(body, states, t0 + jnp.arange(n, dtype=jnp.int32))
        return out

    pair = coarse_step.pair_step
    if pair is not None:
        # single-level temporal blocking: scan fused PAIRS of coarse steps
        @partial(jax.jit, static_argnums=(3,), donate_argnums=(0,))
        def _run_pair(states, arrs_, t0, nhalf: int):
            def body(carry, i):
                return pair(carry, t0 + 2 * i, arrs_), None

            out, _ = jax.lax.scan(
                body, states, jnp.arange(nhalf, dtype=jnp.int32)
            )
            return out

    def run(states, t0, n: int):
        # seed the carried endpoint slabs once (host-side structure check,
        # device-side extraction) so _run always sees one carry structure —
        # a single compile instead of one per seeding state
        states = coarse_step.seed_slabs(states)
        if pair is not None and n >= 2:
            if n % 2:  # odd batch: one plain step, then fused pairs
                states = _run(states, arrs, t0, 1)
                t0, n = np.int32(t0 + 1), n - 1
            return _run_pair(states, arrs, t0, n // 2)
        return _run(states, arrs, t0, n)

    run.pallas_levels = coarse_step.pallas_levels
    run.fused2 = coarse_step.fused2
    return run


def hbm_bytes_per_cell(
    precision: str, transient: bool = True, engine: str = "pallas"
) -> float:
    """THE bytes-per-padded-cell formula, shared by hbm_report_patches and
    estimate_capacity so the planner and the report cannot disagree
    (reference's analogue: src/diagnostics_vram.jl:17-133):
    27 f-entries + rho + vel, static fields twice (flat (N,) for the XLA
    path + 3-D copies for the Pallas BlockSpecs: obstacle u8 + sponge f32 +
    wall f32 = 9 B each), plus the step's transients.

    With engine="pallas" (production: every Pallas kernel — 1-D, flat, 2-D
    and fused — now writes f IN PLACE via input_output_aliases) the only
    per-step transient is the rho+vel scan-carry ping-pong (16 B/cell);
    engine="xla" adds the dense fallback's full second f copy.  Dropping
    the f transient (54 B/cell bf16) lifts the single-chip bf16 ceiling
    from ~112M to ~154M cells on a 16 GB part."""
    f_bytes = 2 if storage.normalize_precision(precision) == storage.STORE_BF16 else 4
    per = (27 * f_bytes + 4 * (1 + 3)) + 2 * (1 + 4 + 4)
    if transient:
        per += 4 * (1 + 3)  # rho + vel double buffer across the scan carry
        if engine == "xla":
            per += 27 * f_bytes
    return per


def hbm_report_patches(
    patches: List[PatchLevel], statics: List[Dict], precision: str = "float32"
) -> str:
    """Per-level HBM accounting for the dense layout — the reference's VRAM
    breakdown analogue (reference: src/diagnostics_vram.jl:17-133).  Estimates
    are dtype-aware (bf16 g-storage halves f) and cross-checked against the
    device's live memory counters when available, like the reference's
    CUDA.memory_info() comparison (reference: diagnostics_vram.jl:17)."""
    f_bytes = 2 if storage.normalize_precision(precision) == storage.STORE_BF16 else 4
    lines = [f"HBM breakdown (dense patches, {precision} f-storage):"]
    total = 0
    for p, st in zip(patches, statics):
        n = p.padded[0] * p.flat_m if p.flat_yz else p.n_padded
        # resident split of hbm_bytes_per_cell (shared with
        # estimate_capacity): state + doubled static fields; the transient
        # f copy is reported once in the total line below
        state_b = n * (27 * f_bytes + 4 * (1 + 3))  # f + rho + vel
        field_b = 2 * n * (1 + 4 + 4)
        assert state_b + field_b == n * hbm_bytes_per_cell(
            precision, transient=False
        )
        bz = st.get("bouzidi")
        bz_b = 0
        if bz:
            import numpy as _np

            bz_b = sum(
                int(_np.prod(v.shape)) * v.dtype.itemsize
                for v in bz.values()
                if hasattr(v, "shape")
            )
        lvl_total = state_b + field_b + bz_b
        total += lvl_total
        lines.append(
            f"  level {p.level_id}: {p.n_cells/1e6:7.2f}M cells "
            f"({n/1e6:.2f}M padded) | state {state_b/1e6:8.1f} MB | fields "
            f"{field_b/1e6:6.1f} MB | bouzidi {bz_b/1e6:5.1f} MB"
        )
    # the step's transient (largest level dominates; counted in
    # estimate_capacity's planning formula, so plan and report agree):
    # rho+vel scan-carry ping-pong only — every Pallas kernel writes f in
    # place (input_output_aliases), so there is no second f copy
    trans = max(
        (p.padded[0] * p.flat_m if p.flat_yz else p.n_padded) * 4 * (1 + 3)
        for p in patches
    )
    total += trans
    lines.append(
        f"  estimated total: {total/1e9:.3f} GB "
        f"(incl. {trans/1e6:.0f} MB transient rho/vel ping-pong during the "
        "step; f updates in place)"
    )
    try:
        ms = jax.local_devices()[0].memory_stats()
        if ms and "bytes_in_use" in ms:
            live = ms["bytes_in_use"]
            limit = ms.get("bytes_limit", 0)
            lines.append(
                f"  device live: {live/1e9:.3f} GB in use"
                + (f" of {limit/1e9:.1f} GB" if limit else "")
                + f" (estimate/live = {total/max(live,1):.2f})"
            )
    except Exception:
        pass  # CPU backend / tunnel without memory_stats
    return "\n".join(lines)


def estimate_capacity(hbm_gb: float = 0.0, precision: str = "float32") -> int:
    """Cells that fit in the given HBM (0 = read the actual device limit),
    the reference's mesh-capacity planner analogue (reference:
    src/diagnostics_vram.jl estimate_mesh_capacity).  State is 27 f-entries +
    rho + vel per cell + 18 B of static fields; the step's transient is the
    rho/vel ping-pong (f updates in place in every Pallas kernel)."""
    if hbm_gb <= 0.0:
        try:
            ms = jax.local_devices()[0].memory_stats()
            hbm_gb = ms["bytes_limit"] / 1e9
        except Exception:
            hbm_gb = 16.0
    return int(hbm_gb * 1e9 / hbm_bytes_per_cell(precision, transient=True))
