"""Pallas TPU fused stream-collide kernel for the dense-patch layout.

The XLA formulation (ops.dense_step) materializes many (27, N) intermediates
and re-reads per-cell state once per direction; this kernel makes the data
flow explicit and reads f exactly once per step:

  - grid = chunks of PX x-planes, executed sequentially on the TensorCore;
    a rotating 4-slot VMEM window holds chunks of f (27, PX, YS, ZS) and vel,
    with one async DMA per chunk double-buffered ahead of use;
  - the whole chunk is processed as ONE array (vector ops of PX*YS*ZS
    elements) — per-op overhead amortizes over the chunk, which matters for
    small fine-level patches;
  - pull streaming: the x-shift picks a PX-plane window from the halo-
    extended chunk (edge planes of the neighbor chunks concatenated on), the
    y/z shifts are in-register 2-D rolls;
  - boundary handling identical to ops.dense_step: masked selects for inlet
    (hash-noise equilibrium) / outlet / y-z mirror, and interface ghost planes
    interpolated from the parent patch (pre-shifted per direction so every
    kernel read is aligned and static);
  - collision = ops.collide_math.collide_unrolled — per-direction unrolled
    moments/WALE/wall-model/regularized-BGK with no (27, N) stacking.

The x-plane pulls that cross the global domain ends read junk (wrapped window
edges) but every x-face destination row is overwritten by its BC mask, so no
clamping is needed.
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

# declared-VMEM headroom for the step kernel: limit = est * SCALE + PAD.
# XLA reserves the declared limit while scheduling; declaring tighter frees
# alternate-memory space for MSA to pin more loop-carried state in VMEM.
# Trace-time constants (A/B hook).
VMEM_DECL_SCALE = 1.5
VMEM_DECL_PAD = 12 * 2**20

# per-level PX override (trace-time A/B hook): {level_id: PX}
PX_OVERRIDE = {}


def make_bouzidi_pallas(plan: Dict, shape, f_dtype, interpret: bool = False):
    """In-place Bouzidi correction as one tiny Pallas kernel.

    The XLA formulation (ops.dense_step.apply_bouzidi_dense) dispatches ~30
    separate fused ops (slice, 26 rolls, stack, update) on the coefficient
    box; on v5e the per-dispatch overhead dominates (~265 us for a 6 MB box).
    Here the box is DMA'd into VMEM once, the 27 corrected rows are computed
    in-register, and the box is DMA'd back into the SAME buffer
    (input_output_aliases) — one dispatch, no full-f copy.

    Same math as apply_bouzidi_dense (reference: src/bouzidi_kernel.jl:38-88),
    exactly form-invariant on bf16 g-storage (coefficients sum to 1 by the
    signed single-array encoding — see build_bouzidi_dense_plan).
    """
    lx, ly, lz = plan["lo"]
    bx, by, bz = plan["dim"]
    S_np = np.asarray(plan["S"], np.float32)

    def kernel(s_ref, f_ref, out_ref, box_ref, row_ref, sem, rsem):
        cp_in = pltpu.make_async_copy(
            f_ref.at[:, pl.ds(lx, bx), pl.ds(ly, by), pl.ds(lz, bz)],
            box_ref, sem,
        )
        cp_in.start()
        cp_in.wait()
        # corrected rows are functions of the ORIGINAL box only, so each row
        # DMAs out as soon as it is computed through a 2-slot rotating buffer
        # (a full second box of scratch would double the kernel's VMEM
        # footprint, which matters when XLA overlaps several kernels)
        slot = 0

        def row_dma(s, j):
            return pltpu.make_async_copy(
                row_ref.at[s],
                out_ref.at[j, pl.ds(lx, bx), pl.ds(ly, by), pl.ds(lz, bz)],
                rsem.at[s],
            )

        pending = {}
        for j in range(27):
            if j == 13:
                continue  # rest distribution: aliased output is already f
            k = int(lat.OPP[j])
            cxk, cyk, czk = int(lat.C_X[k]), int(lat.C_Y[k]), int(lat.C_Z[k])
            ff = box_ref[k]
            if cxk:
                ff = jnp.roll(ff, cxk, axis=0)
            ff = _shift2d(ff, cyk, czk)
            s = s_ref[k].astype(jnp.float32)
            a = jnp.abs(s)
            other = jnp.where(s < 0, box_ref[j].astype(jnp.float32),
                              ff.astype(jnp.float32))
            val = (a * box_ref[k].astype(jnp.float32) + (1.0 - a) * other
                   ).astype(f_dtype)
            if slot in pending:
                row_dma(slot, pending.pop(slot)).wait()
            row_ref[slot] = jnp.where(s != 0, val, box_ref[j])
            row_dma(slot, j).start()
            pending[slot] = j
            slot = 1 - slot
        for s, j in pending.items():
            row_dma(s, j).wait()

    bf16 = f_dtype == jnp.bfloat16
    box_elems = 27 * bx * by * bz
    # S coefficient VMEM input + the box scratch + the 2-row out buffer
    box_bytes = (
        box_elems * (2 if bf16 else 4)  # coefficients (coef_t)
        + box_elems * (2 if bf16 else 4)  # box scratch (f_dtype)
        + 2 * bx * by * bz * (2 if bf16 else 4)
    )
    call = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(shape, f_dtype),
        input_output_aliases={1: 0},
        scratch_shapes=[
            pltpu.VMEM((27, bx, by, bz), f_dtype),
            pltpu.VMEM((2, bx, by, bz), f_dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            # declare what we actually use — XLA reserves the declared limit
            # while scheduling, and over-declaring evicts other kernels'
            # VMEM (observed: program-level VMEM OOM on the Re10M case)
            vmem_limit_bytes=min(
                100 * 2**20, int(box_bytes * 1.2) + 8 * 2**20
            ),
        ),
        interpret=interpret,
    )
    # bf16 coefficients on bf16 g-storage (halves the per-sub-step DMA); the
    # signed encoding keeps a + (1-a) = 1 exact either way, but raw f32
    # storage keeps f32 coefficients so the wall position (q) is not
    # bf16-quantized on the higher-precision path
    coef_t = jnp.bfloat16 if f_dtype == jnp.bfloat16 else jnp.float32
    s_dev = jnp.asarray(S_np, coef_t)

    def apply(f, S=None):
        """S override lets the caller feed the coefficients as a traced jit
        argument instead of a closure constant (big closure arrays inline
        into the HLO as literals)."""
        if S is None:
            return call(s_dev, f)
        return call(S.astype(coef_t), f)

    return apply


def _shift2d(a, sy: int, sz: int):
    """out[..., y, z] = a[..., y - sy, z - sz] (wrapped; wrapped rows/cols are
    overwritten by the boundary masks)."""
    nd = a.ndim
    if sy:
        a = jnp.roll(a, sy, axis=nd - 2)
    if sz:
        a = jnp.roll(a, sz, axis=nd - 1)
    return a


def prepare_pallas_statics(patch: PatchLevel) -> Dict:
    """Device arrays consumed by the kernel's chunk BlockSpecs — 3-D, or
    (XS, M) flat when the level stores flat-(y,z) (PatchLevel.flat_yz)."""
    if patch.flat_yz:
        return {
            "obstacle_u8": jnp.asarray(
                patch.flatten_field(patch.obstacle, True).astype(np.uint8)
            ),
            "sponge3d": jnp.asarray(
                patch.flatten_field(patch.sponge, np.float32(0.0))
            ),
            "wall3d": jnp.asarray(
                patch.flatten_field(patch.wall_dist, np.float32(100.0))
            ),
            "mom_mat": jnp.asarray(lat.MOM_MAT),
            "back_mat": jnp.asarray(lat.BACK_MAT),
        }
    return {
        "obstacle_u8": jnp.asarray(patch.obstacle.astype(np.uint8)),
        "sponge3d": jnp.asarray(patch.sponge),
        "wall3d": jnp.asarray(patch.wall_dist),
        # moment-space collision matrices (Pallas kernels cannot capture
        # constant arrays, so they ride along as tiny VMEM inputs)
        "mom_mat": jnp.asarray(lat.MOM_MAT),
        "back_mat": jnp.asarray(lat.BACK_MAT),
    }


def prep_iface_pallas(
    iface: Dict[int, jnp.ndarray], patch: PatchLevel, g_shifted: bool = False
) -> Dict:
    """Convert raw per-face ghost planes (27, A+2, B+2) to the pre-shifted
    layout the kernel consumes (the production scheduler instead builds that
    layout directly in ops.dense_step.interface_planes_pair, fused with the
    blend/feq/rescale chain):
      face 0/1 (x): (27, YS, ZS) value for dest (., y, z) — whole plane,
        consumed only by the first/last chunk;
      face 2/3 (y): (XS, 27, ZS), face 4/5 (z): (XS, 27, YS) — x-rows LEAD
        so the kernel's chunk BlockSpec delivers each chunk's PX-row window
        and every in-kernel read is fully static (a dynamically-offset
        sublane load only lowers in Mosaic when the lane dim is one whole
        128 tile, which z-face planes with YS in lanes generally are not).
    Direction rows stay in plain k order; the per-direction (1 - c) spatial
    shifts are pre-applied in two grouped passes (dense_step._shift_planes)."""
    from .dense_step import _shift_planes

    out = {}
    for face, pl_arr in iface.items():
        if g_shifted:
            pl_arr = pl_arr - jnp.asarray(lat.W)[:, None, None]
        ax = face // 2
        t_axes = [a for a in range(3) if a != ax]
        A, B = patch.padded[t_axes[0]], patch.padded[t_axes[1]]
        plane = _shift_planes(pl_arr, ax, A, B)
        if ax:
            plane = jnp.transpose(plane, (1, 0, 2))
        out[face] = plane
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
    planes_per_step: int = 0,
    store_bf16: bool = False,
    alias_f: bool = False,  # write f in place (input_output_aliases).  Safe
    # because the rotating window DMAs chunk ci+2's input rows while chunk
    # ci's output commits — reads lead writes by two chunks on strictly
    # disjoint rows.  Only valid when the caller no longer needs the
    # pre-step f (i.e. childless levels: parents feed their old state to the
    # temporal interface blend).  Kills the scan-carry loop-back copy XLA
    # otherwise inserts (measured 41 us/coarse on the Re1M finest level).
    shard_nx: int = 1,  # build the kernel for one x-slab shard of a
    # shard_map over an ("x",)-mesh of this size: the kernel sees the LOCAL
    # (XS/shard_nx, YS, ZS) slab, takes the ppermute'd neighbor edge planes
    # as extra VMEM inputs (consumed where the rotating window would wrap at
    # the slab ends), and keys every boundary-condition mask on the GLOBAL
    # x coordinate via an x-offset scalar (multi-chip per SURVEY.md §2.6:
    # halo exchange over ICI instead of the reference's single-GPU design)
    bz_plan: Optional[Dict] = None,  # fold the Bouzidi correction into this
    # kernel's chunk pipeline (build_bouzidi_dense_plan box).  The correction
    # reads POST-collision neighbors across chunk boundaries, so f's output
    # leaves through a manual 2-slot VMEM ring with a ONE-CHUNK write delay:
    # chunk ci's stream+collide output parks in the ring, chunk ci-1 is
    # corrected in place (its +x neighbor plane = the fresh chunk's first
    # plane, its -x neighbor plane = a saved pre-correction edge) and only
    # then DMA'd to HBM.  Replaces the separate per-sub-step Bouzidi kernel
    # dispatch and its full box f re-read/re-write (the coefficients ride in
    # chunk-sized slabs, double-buffered like the stream window).  Only
    # engaged when the box's chunk range is interior ([1, NCH-2]); the
    # builder falls back to the standalone kernel otherwise
    # (step.bz_folded says which).
    use_mxu: bool = False,  # moment-space collision (two MXU matmuls) instead
    # of the per-direction unrolled loops; same physics (collide_math) but
    # measured SLOWER on v5e: the (27, M) reshapes around the matmuls force
    # full VMEM relayouts that outweigh the vector ops saved (641 vs 482
    # us/step on the Re1M finest level) — kept as a tested option
    iface_pair: bool = False,  # ghost planes arrive in the einsum-native
    # pair layout (interface_planes_pair_mm(pair_layout=True)): per face a
    # (group_array, face_index) tuple whose (nf, nw, ...) leading axes are
    # selected by the BlockSpec index_map (face statically, sub-step from a
    # scalar-prefetch register) — the per-face/per-sub-step split slices and
    # their relayout copies never exist in the XLA graph
    _stage: str = "full",  # perf dissection hook (tools/perf_probe):
    #   "full" = production, "nocollide" = stream+DMA only, "copy" = DMA only
    _skip_x_bc: bool = False,  # perf dissection only: drop the x-face BC
    # masked selects (physics-wrong; bounds what a ci-predicated edge/interior
    # kernel split could save)
):
    XS, YS, ZS = patch.padded
    X, Y, Z = patch.interior
    fb = patch.face_bc
    sharded = shard_nx > 1
    assert XS % shard_nx == 0, (XS, shard_nx)
    XL = XS // shard_nx  # local slab x-extent (== XS unsharded)
    # bf16 storage holds g = f - w (ops.storage).  The kernel works in
    # g-space NATIVELY (collide_unrolled_v2 g_shifted folds the weight shift
    # into five moment constants), so dec/enc are bare dtype casts — the 54
    # per-direction +w/-w ops of the decode-to-f formulation are gone.  The
    # MXU collision variant has no g-space form, so it decodes as before.
    f_dtype = jnp.bfloat16 if store_bf16 else jnp.float32
    f_bytes = 2 if store_bf16 else 4
    g_native = store_bf16 and not use_mxu and _stage == "full"

    def dec(x, k):
        if not store_bf16:
            return x
        x = x.astype(jnp.float32)
        return x if g_native else x + float(lat.W[k])

    def enc(x, k):
        if not store_bf16:
            return x
        return x.astype(jnp.bfloat16) if g_native \
            else (x - float(lat.W[k])).astype(jnp.bfloat16)

    # chunked grid: PX x-planes per step amortize per-op vector overheads;
    # bounded by the VMEM window budget
    if planes_per_step:
        PX = planes_per_step
    elif PX_OVERRIDE.get(patch.level_id):
        PX = PX_OVERRIDE[patch.level_id]  # trace-time A/B hook
    else:
        PX = 1
        for cand in (8, 4, 2):  # PX=10/6 on the 60-plane level measured
            # no better than 4 (1592 vs 1546 us/coarse); x-padding to force
            # PX=8 everywhere measured worse (1656) — pad cells cost more
            # than chunk amortization saves
            # full per-chunk VMEM footprint: rotating DMA windows +
            # pipelined static in-blocks + double-buffered out-blocks
            # (the declared vmem limit follows this estimate; keeping it
            # bounded leaves room for the Bouzidi kernel and XLA's own
            # VMEM use in the 128 MiB space)
            plane_c = cand * YS * ZS
            est_c = (
                _SLOTS * (27 * f_bytes + 3 * 4) * plane_c
                + 2 * 9 * plane_c
                + 2 * (27 * f_bytes + 4 + 3 * 4) * plane_c
            )
            if XL % cand == 0 and est_c < 36 * 2**20:
                PX = cand
                break
    assert XL % PX == 0, (XL, PX)
    NCH = XL // PX

    # ---- Bouzidi fold-in geometry (see the bz_plan parameter note) ----
    bzf = None
    if bz_plan is not None and _stage == "full" and not sharded \
            and not use_mxu:
        _blo, _bdim = bz_plan["lo"], bz_plan["dim"]
        c_lo, c_hi = _blo[0] // PX, (_blo[0] + _bdim[0] - 1) // PX
        # interior chunk range: correcting chunk c_lo needs chunk c_lo-1's
        # saved edge plane, correcting c_hi needs chunk c_hi+1's fresh
        # output — both must exist.  (Strictly only LINKED cells at the
        # extreme rows need the neighbor plane, but the box is already
        # bbox(links)+1 so this conservative guard costs at most one chunk.)
        if 1 <= c_lo and c_hi <= NCH - 2:
            coef_t = jnp.bfloat16 if store_bf16 else jnp.float32
            spx = (c_hi - c_lo + 1) * PX
            S_np = np.zeros((27, spx) + tuple(_bdim[1:]), np.float32)
            x0 = _blo[0] - c_lo * PX
            S_np[:, x0 : x0 + _bdim[0]] = np.asarray(bz_plan["S"], np.float32)
            bzf = {
                "c_lo": c_lo, "c_hi": c_hi,
                "oy": _blo[1], "by": _bdim[1],
                "oz": _blo[2], "bz": _bdim[2],
                "spad": jnp.asarray(S_np, coef_t),
                "coef_t": coef_t,
            }

    need_iface = tuple(fc for fc in range(6) if fb[fc] == BC_INTERFACE)

    def kernel(
        u_ref, seed_ref, *pre_rest,  # scalar prefetch (SMEM) + the rest
    ):
        if sharded:
            xoff_ref, *pre_rest = pre_rest
        if iface_pair:
            _nsub_ref, *pre_rest = pre_rest  # consumed by index_maps only
        f_hbm, vel_hbm = pre_rest[0], pre_rest[1]  # ANY (manual DMA)
        # (PX, YS, ZS) VMEM blocks
        obstacle_ref, sponge_ref, wall_ref = pre_rest[2:5]
        rest = pre_rest[5:]
        off = 0
        if use_mxu:
            mom_ref, back_ref = rest[0], rest[1]
            off = 2
        n_if = len(need_iface)
        iface_refs = dict(zip(need_iface, rest[off : off + n_if]))
        off += n_if
        if sharded:
            fe_ref, ve_ref = rest[off], rest[off + 1]  # (27|3, 2, YS, ZS)
            off += 2
        spad_ref = None
        if bzf is not None:
            spad_ref = rest[off]  # (27, spx, by, bz) in HBM (manual DMA)
            off += 1
        fout_ref, rho_ref, velout_ref = rest[off : off + 3]
        if bzf is None:
            fwin, vwin, sems = rest[off + 3 :]
        else:
            (fwin, vwin, sems,
             oring, plane_sc, sbuf, ssem, fsem) = rest[off + 3 :]

        ci = pl.program_id(0)
        lix3 = jax.lax.broadcasted_iota(jnp.int32, (PX, YS, ZS), 0) + ci * PX
        # global x for the BC masks (the shard offset is 0 unsharded)
        ix3 = lix3 + xoff_ref[0] if sharded else lix3
        iy3 = jax.lax.broadcasted_iota(jnp.int32, (PX, YS, ZS), 1)
        iz3 = jax.lax.broadcasted_iota(jnp.int32, (PX, YS, ZS), 2)

        def start_dma(chunk):
            slot = chunk % _SLOTS
            pltpu.make_async_copy(
                f_hbm.at[:, pl.ds(chunk * PX, PX)], fwin.at[slot], sems.at[0, slot]
            ).start()
            pltpu.make_async_copy(
                vel_hbm.at[:, pl.ds(chunk * PX, PX)], vwin.at[slot], sems.at[1, slot]
            ).start()

        def wait_dma(chunk):
            slot = chunk % _SLOTS
            pltpu.make_async_copy(
                f_hbm.at[:, pl.ds(chunk * PX, PX)], fwin.at[slot], sems.at[0, slot]
            ).wait()
            pltpu.make_async_copy(
                vel_hbm.at[:, pl.ds(chunk * PX, PX)], vwin.at[slot], sems.at[1, slot]
            ).wait()

        @pl.when(ci == 0)
        def _warmup():
            start_dma(jnp.int32(0))
            if NCH > 1:
                start_dma(jnp.int32(1))
            wait_dma(jnp.int32(0))
            if NCH > 1:
                wait_dma(jnp.int32(1))

        @pl.when(ci + 2 <= NCH - 1)
        def _prefetch():
            start_dma(ci + 2)

        @pl.when((ci >= 1) & (ci + 1 <= NCH - 1))
        def _await_next():
            wait_dma(ci + 1)

        if bzf is not None:
            def flush_dma(slot, P):
                return pltpu.make_async_copy(
                    oring.at[slot],
                    fout_ref.at[:, pl.ds(P * PX, PX)],
                    fsem.at[slot],
                )

            @pl.when(ci >= 2)
            def _ring_drain():
                # chunk ci-2's flush (started last invocation) reads ring
                # slot ci%2 — drain before this chunk's output lands there
                flush_dma(ci % 2, ci - 2).wait()

        u_inlet = u_ref[0]
        t_seed = seed_ref[0]

        c_prev = jnp.maximum(ci - 1, 0)
        c_next = jnp.minimum(ci + 1, NCH - 1)
        f_prev_ch = fwin.at[c_prev % _SLOTS]
        f_cur_ch = fwin.at[ci % _SLOTS]
        f_next_ch = fwin.at[c_next % _SLOTS]
        v_prev_ch = vwin.at[c_prev % _SLOTS]
        v_cur_ch = vwin.at[ci % _SLOTS]
        v_next_ch = vwin.at[c_next % _SLOTS]

        if fb[0] == BC_INLET:
            gy1 = jax.lax.broadcasted_iota(jnp.int32, (YS, ZS), 0) + (patch.lo[1] + 1)
            gz1 = jax.lax.broadcasted_iota(jnp.int32, (YS, ZS), 1) + (patch.lo[2] + 1)
            if inlet_turbulence > 0.0:
                noise = cm.hash_noise(gy1, gz1, t_seed)
                u_inst = u_inlet + noise * jnp.float32(inlet_turbulence) * u_inlet
            else:
                u_inst = jnp.broadcast_to(u_inlet, (YS, ZS)).astype(jnp.float32)
            # g-space drops the constant 1 (g = w*(expr - 1))
            base1 = 0.0 if g_native else 1.0
            inlet_factor = (base1 + 3.0 * u_inst + 3.0 * u_inst * u_inst)[None, :, :]
        else:
            inlet_factor = None

        def face_value(k, face):
            cx, cy, cz = int(lat.C_X[k]), int(lat.C_Y[k]), int(lat.C_Z[k])
            bc = fb[face]
            if bc == BC_INTERFACE:
                # planes arrive pre-shifted (dense_step._shift_planes),
                # direction rows in plain k order
                pr = iface_refs[face]
                if face // 2 == 0:
                    # upcast before the dim insert: planes may arrive bf16
                    # and Mosaic only supports minor-dim inserts on 32-bit
                    row = pr[0, 0, k] if iface_pair else pr[k]
                    return row.astype(jnp.float32)[None, :, :]
                # y/z faces arrive as this chunk's (PX, 27, B) BlockSpec
                # window — static reads only
                rows = pr[0, 0, :, k, :] if iface_pair else pr[:, k, :]
                rows = rows.astype(jnp.float32)  # (PX, B)
                if face // 2 == 1:
                    return rows[:, None, :]  # bcast over Y
                return rows[:, :, None]  # bcast over Z
            if bc == BC_INLET:
                return float(lat.W[k]) * inlet_factor
            if bc == BC_OUTLET:
                cu = float(lat.C_X[k]) * u_inlet
                return float(lat.W[k]) * (
                    (0.0 if g_native else 1.0)
                    + 3.0 * cu + 4.5 * cu * cu - 1.5 * u_inlet * u_inlet
                )
            if bc == BC_MIRROR_Y:
                # w[mirror_k] == w[k]: mirroring flips one component's sign
                return dec(f_cur_ch[int(lat.MIRROR_Y[k])], k)
            if bc == BC_MIRROR_Z:
                return dec(f_cur_ch[int(lat.MIRROR_Z[k])], k)
            raise AssertionError(bc)

        if _stage == "copy":
            for k in range(27):
                fout_ref[k] = f_cur_ch[k]
            rho_ref[:] = (sponge_ref[:] + wall_ref[:]
                          + obstacle_ref[:].astype(jnp.int32).astype(jnp.float32))
            velout_ref[:] = v_cur_ch[:]
            return

        streamed = []
        for k in range(27):
            cx, cy, cz = int(lat.C_X[k]), int(lat.C_Y[k]), int(lat.C_Z[k])
            # x-shifted PX-plane window from [prev edge | chunk | next edge]
            if cx == 0:
                src = f_cur_ch[k]
            elif cx == 1:
                if PX > 1:
                    src = jnp.concatenate(
                        [f_prev_ch[k, PX - 1 :], f_cur_ch[k, : PX - 1]], axis=0
                    )
                else:
                    src = f_prev_ch[k]
            else:
                if PX > 1:
                    src = jnp.concatenate(
                        [f_cur_ch[k, 1:], f_next_ch[k, :1]], axis=0
                    )
                else:
                    src = f_next_ch[k]
            val = dec(_shift2d(src, cy, cz), k)
            if sharded and cx == 1:
                # row pulled across the slab's left end comes from the left
                # neighbor's last plane (wrapped window junk otherwise);
                # the global-x BC masks below still override at the true
                # domain boundary
                ev = dec(_shift2d(fe_ref[k, 0], cy, cz), k)[None]
                val = jnp.where(lix3 == 0, ev, val)
            elif sharded and cx == -1:
                ev = dec(_shift2d(fe_ref[k, 1], cy, cz), k)[None]
                val = jnp.where(lix3 == XL - 1, ev, val)
            if cz > 0:
                val = jnp.where(iz3 == 0, face_value(k, 4), val)
            elif cz < 0:
                val = jnp.where(iz3 == Z - 1, face_value(k, 5), val)
            if cy > 0:
                val = jnp.where(iy3 == 0, face_value(k, 2), val)
            elif cy < 0:
                val = jnp.where(iy3 == Y - 1, face_value(k, 3), val)
            if cx < 0 and not _skip_x_bc:
                val = jnp.where(ix3 == X - 1, face_value(k, 1), val)
            elif cx > 0 and not _skip_x_bc:
                val = jnp.where(ix3 == 0, face_value(k, 0), val)
            streamed.append(val)

        def vel_nbr(dx, dy, dz):
            if dx == 0:
                src = v_cur_ch[:]
            elif dx == -1:
                if PX > 1:
                    src = jnp.concatenate(
                        [v_prev_ch[:, PX - 1 :], v_cur_ch[:, : PX - 1]], axis=1
                    )
                else:
                    src = v_prev_ch[:]
            else:
                if PX > 1:
                    src = jnp.concatenate(
                        [v_cur_ch[:, 1:], v_next_ch[:, :1]], axis=1
                    )
                else:
                    src = v_next_ch[:]
            r = _shift2d(src, -dy, -dz)
            if sharded and dx == -1:
                ev = _shift2d(ve_ref[:, 0], -dy, -dz)[:, None]
                r = jnp.where(lix3 == 0, ev, r)
            elif sharded and dx == 1:
                ev = _shift2d(ve_ref[:, 1], -dy, -dz)[:, None]
                r = jnp.where(lix3 == XL - 1, ev, r)
            own = v_cur_ch[:]
            if dx > 0 and not _skip_x_bc:
                r = jnp.where(ix3 == X - 1, own, r)
            elif dx < 0 and not _skip_x_bc:
                r = jnp.where(ix3 == 0, own, r)
            if dy > 0:
                r = jnp.where(iy3 == Y - 1, own, r)
            elif dy < 0:
                r = jnp.where(iy3 == 0, own, r)
            if dz > 0:
                r = jnp.where(iz3 == Z - 1, own, r)
            elif dz < 0:
                r = jnp.where(iz3 == 0, own, r)
            return r

        nbrs = (
            vel_nbr(1, 0, 0), vel_nbr(-1, 0, 0),
            vel_nbr(0, 1, 0), vel_nbr(0, -1, 0),
            vel_nbr(0, 0, 1), vel_nbr(0, 0, -1),
        )

        if _stage == "nocollide":
            for k in range(27):
                fout_ref[k] = enc(streamed[k], k)
            rho_ref[:] = (sponge_ref[:] + wall_ref[:]
                          + obstacle_ref[:].astype(jnp.int32).astype(jnp.float32))
            velout_ref[:] = (nbrs[0] + nbrs[1]) * 0.5
            return

        kw = dict(
            tau=patch.tau,
            c_wale=c_wale,
            nu_sgs_background=nu_sgs_background,
            wall_model=wall_model,
            sponge_blend=sponge_blend,
        )
        if g_native:
            kw["g_shifted"] = True
        if use_mxu:
            f_out, rho_out, vel_out = cm.collide_moments(
                jnp.stack(streamed), nbrs, obstacle_ref[:] != 0,
                sponge_ref[:], wall_ref[:], u_inlet,
                mom_mat=mom_ref[:], back_mat=back_ref[:], **kw,
            )
        else:
            f_out, rho_out, vel_out = cm.collide_unrolled_v2(
                streamed, nbrs, obstacle_ref[:] != 0,
                sponge_ref[:], wall_ref[:], u_inlet, **kw,
            )
        if bzf is None:
            for k in range(27):
                fout_ref[k] = enc(f_out[k], k)
            rho_ref[:] = rho_out
            velout_ref[:] = vel_out
            return
        rho_ref[:] = rho_out
        velout_ref[:] = vel_out

        # ---- Bouzidi fold-in epilogue (see the bz_plan parameter note) ----
        c_lo, c_hi = bzf["c_lo"], bzf["c_hi"]
        oy, by = bzf["oy"], bzf["by"]
        oz, bz_ = bzf["oz"], bzf["bz"]
        ring_w = oring.at[ci % 2]
        for k in range(27):
            ring_w[k] = enc(f_out[k], k)

        def in_box(P):
            return (P >= c_lo) & (P <= c_hi)

        def s_dma(slot, P):
            return pltpu.make_async_copy(
                spad_ref.at[:, pl.ds((P - c_lo) * PX, PX)],
                sbuf.at[slot], ssem.at[slot],
            )

        @pl.when(in_box(ci))
        def _s_prefetch():
            # coefficients for correcting THIS chunk next invocation, and
            # its predecessor's pre-correction edge plane for the +x pulls
            s_dma(ci % 2, ci).start()
            pp = oring.at[(ci - 1) % 2]
            plane_sc[(ci - 1) % 2] = pp[:, PX - 1, oy : oy + by, oz : oz + bz_]

        P = ci - 1

        @pl.when(P >= 0)
        def _correct_and_flush():
            @pl.when(in_box(P))
            def _correct():
                s_dma(P % 2, P).wait()
                rp = oring.at[P % 2]  # chunk being corrected (in place)
                rc = oring.at[ci % 2]  # fresh chunk: +x neighbor planes
                sb = sbuf.at[P % 2]
                prev = plane_sc.at[(P - 1) % 2]

                def slab(ref, k):
                    return ref[k, :, oy : oy + by, oz : oz + bz_]

                def shifted(ref, k):
                    """f*[k] at cell + c_opp (= roll by +c), x across chunks:
                    row 0 pulls the saved pre-correction edge of chunk P-1,
                    row PX-1 pulls the fresh (uncorrected) chunk P+1."""
                    cx = int(lat.C_X[k])
                    cy, cz = int(lat.C_Y[k]), int(lat.C_Z[k])
                    b = slab(ref, k)
                    if cx == 1:
                        pv = prev[k][None]  # plane_sc stores the sliced plane
                        b = pv if PX == 1 else jnp.concatenate(
                            [pv, b[: PX - 1]], axis=0
                        )
                    elif cx == -1:
                        nx = rc[k, 0, oy : oy + by, oz : oz + bz_][None]
                        b = nx if PX == 1 else jnp.concatenate(
                            [b[1:], nx], axis=0
                        )
                    return _shift2d(b, cy, cz)

                def corrected(j, k):
                    """Output row j: val = |S_k| f*[k] + (1-|S_k|)·other,
                    other = f*[opp] (S<0) | f*[k]@x_ff (S>0); identity at
                    S=0 (same math as make_bouzidi_pallas, reference:
                    src/bouzidi_kernel.jl:38-88)."""
                    s = sb[k].astype(jnp.float32)
                    a = jnp.abs(s)
                    other = jnp.where(
                        s < 0,
                        slab(rp, j).astype(jnp.float32),
                        shifted(rp, k).astype(jnp.float32),
                    )
                    val = (
                        a * slab(rp, k).astype(jnp.float32) + (1.0 - a) * other
                    ).astype(f_dtype)
                    return jnp.where(s != 0, val, slab(rp, j))

                # opposite pairs: row j reads only rows {j, opp j}, so both
                # of a pair are computed from the original slab, then both
                # written — in-place stays equivalent to the two-buffer form
                for j in range(27):
                    k = int(lat.OPP[j])
                    if j >= k:  # j == 13 (rest) self-pairs and is skipped
                        continue
                    new_j = corrected(j, k)
                    new_k = corrected(k, j)
                    rp[j, :, oy : oy + by, oz : oz + bz_] = new_j
                    rp[k, :, oy : oy + by, oz : oz + bz_] = new_k

            flush_dma(P % 2, P).start()

        @pl.when(ci == NCH - 1)
        def _drain():
            # last chunk is never in the box (c_hi <= NCH-2): flush raw,
            # then drain both in-flight flushes before the kernel exits
            flush_dma(ci % 2, ci).start()
            flush_dma((ci - 1) % 2, ci - 1).wait()
            flush_dma(ci % 2, ci).wait()

    n_scalar = 2 + (1 if sharded else 0) + (1 if iface_pair else 0)

    def step(f, vel, u_inlet, t_seed, statics3d, iface: Optional[Dict] = None,
             edges=None, x_off=None, nsub=None, bz_S=None):
        """`iface` planes must already be in the pre-shifted class-permuted
        layout (dense_step.interface_planes_pair / prep_iface_pallas), in the
        same space as the state (g = f - w when step.g_native).  With
        iface_pair, each face maps to (group_array, face_index) from
        interface_planes_pair_mm(pair_layout=True) and `nsub` is the
        sub-step plane index (clamped to n_w - 1 by the caller).

        With shard_nx > 1 (inside shard_map): f/vel/statics/y-z-face planes
        are the LOCAL x-slab, `edges` = (f_edges (27, 2, YS, ZS) in storage
        dtype, v_edges (3, 2, YS, ZS) f32) are the ppermute'd neighbor
        boundary planes ([0] = left neighbor's last, [1] = right neighbor's
        first), and `x_off` is this shard's global x offset."""
        iface = iface or {}
        iface_specs = []
        iface_vals = []
        for fc in need_iface:
            v = iface[fc]
            if iface_pair:
                v, fi = v
                # index_map args: (i, *scalar_refs); nsub is the LAST scalar
                if fc // 2 == 0:
                    iface_specs.append(pl.BlockSpec(
                        (1, 1) + v.shape[2:],
                        lambda i, *s, _fi=fi: (_fi, s[-1][0], 0, 0, 0),
                    ))
                else:
                    iface_specs.append(pl.BlockSpec(
                        (1, 1, PX, 27, v.shape[-1]),
                        lambda i, *s, _fi=fi: (_fi, s[-1][0], i, 0, 0),
                    ))
            elif fc // 2 == 0:
                iface_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
            else:
                # x-rows lead (XS, 27, B): deliver this chunk's PX-row window
                iface_specs.append(
                    pl.BlockSpec(
                        (PX, 27, v.shape[-1]), lambda i, *_: (i, 0, 0)
                    )
                )
            iface_vals.append(v)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=n_scalar,
            grid=(NCH,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # f
                pl.BlockSpec(memory_space=pl.ANY),  # vel
                pl.BlockSpec((PX, YS, ZS), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((PX, YS, ZS), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((PX, YS, ZS), lambda i, *_: (i, 0, 0)),
            ]
            + (
                [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2 if use_mxu else []
            )
            + iface_specs
            + (
                [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2 if sharded else []
            )
            + (
                [pl.BlockSpec(memory_space=pl.ANY)] if bzf is not None else []
            ),
            out_specs=[
                # with the Bouzidi fold-in, f leaves through the manual
                # delayed-flush ring instead of the pipelined out blocks
                (
                    pl.BlockSpec(memory_space=pl.ANY)
                    if bzf is not None
                    else pl.BlockSpec(
                        (27, PX, YS, ZS), lambda i, *_: (0, i, 0, 0)
                    )
                ),
                pl.BlockSpec((PX, YS, ZS), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((3, PX, YS, ZS), lambda i, *_: (0, i, 0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((_SLOTS, 27, PX, YS, ZS), f_dtype),
                pltpu.VMEM((_SLOTS, 3, PX, YS, ZS), jnp.float32),
                pltpu.SemaphoreType.DMA((2, _SLOTS)),
            ]
            + (
                [
                    pltpu.VMEM((2, 27, PX, YS, ZS), f_dtype),  # output ring
                    pltpu.VMEM((2, 27, bzf["by"], bzf["bz"]), f_dtype),
                    pltpu.VMEM(
                        (2, 27, PX, bzf["by"], bzf["bz"]), bzf["coef_t"]
                    ),
                    pltpu.SemaphoreType.DMA((2,)),  # S slabs
                    pltpu.SemaphoreType.DMA((2,)),  # flushes
                ]
                if bzf is not None
                else []
            ),
        )
        plane = PX * YS * ZS
        est = (
            _SLOTS * (27 * f_bytes + 3 * 4) * plane  # rotating DMA windows
            + 2 * (1 + 4 + 4) * plane  # pipelined static in-blocks
            + 2 * (27 * f_bytes + 4 + 3 * 4) * plane  # pipelined out-blocks
            # ghost planes: only the selected (face, sub-step) block is
            # VMEM-resident in pair layout
            + sum(
                int(np.prod(v.shape[2:] if iface_pair else v.shape))
                * v.dtype.itemsize
                for v in iface_vals
            )
        )
        if bzf is not None:
            # the f out-blocks above become the 2-slot ring (same bytes);
            # add the edge-plane save + double-buffered coefficient slabs
            bxy = bzf["by"] * bzf["bz"]
            est += 2 * 27 * bxy * f_bytes \
                + 2 * 27 * PX * bxy * (2 if bzf["coef_t"] == jnp.bfloat16
                                       else 4)
        fo, rho, vo = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((27, XL, YS, ZS), f_dtype),
                jax.ShapeDtypeStruct((XL, YS, ZS), jnp.float32),
                jax.ShapeDtypeStruct((3, XL, YS, ZS), jnp.float32),
            ],
            # f's flattened-input index (the scalar-prefetch args count)
            input_output_aliases={n_scalar: 0} if alias_f else {},
            compiler_params=pltpu.CompilerParams(
                # declare close to actual use: XLA reserves the declared
                # limit during scheduling, and over-declaring starves other
                # kernels of VMEM (observed program-level OOM on Re10M)
                vmem_limit_bytes=min(
                    100 * 2**20, int(est * VMEM_DECL_SCALE) + VMEM_DECL_PAD
                ),
            ),
            interpret=interpret,
        )(
            jnp.asarray(u_inlet, jnp.float32).reshape(1),
            jnp.asarray(t_seed, jnp.int32).reshape(1),
            *(
                (jnp.asarray(x_off, jnp.int32).reshape(1),) if sharded else ()
            ),
            *(
                (jnp.asarray(0 if nsub is None else nsub,
                             jnp.int32).reshape(1),)
                if iface_pair else ()
            ),
            f,
            vel,
            statics3d["obstacle_u8"],
            statics3d["sponge3d"],
            statics3d["wall3d"],
            *(
                (statics3d["mom_mat"], statics3d["back_mat"])
                if use_mxu else ()
            ),
            *iface_vals,
            *(edges if sharded else ()),
            *(
                ((bzf["spad"] if bz_S is None
                  else bz_S.astype(bzf["coef_t"])),)
                if bzf is not None else ()
            ),
        )
        return fo, rho, vo

    # callers must deliver interface ghost planes in the same space as the
    # state (g = f - w when g_native); interface_from_endpoints(g_shifted=...)
    step.g_native = g_native
    step.iface_pair = iface_pair
    # Bouzidi correction folded into this kernel (the scheduler must then
    # skip the standalone correction and pass the padded coefficients as
    # the bz_S jit argument — step.bz_spad — instead of bz_S of the plan)
    step.bz_folded = bzf is not None
    step.bz_spad = bzf["spad"] if bzf is not None else None
    return step


def _fused2_vmem_est(PX, YS, ZS, f_bytes, has_bz=False, bz_dim=None,
                     coef_bytes=2):
    """Per-chunk VMEM footprint of make_pallas_step_fused2: input windows +
    the intermediate ring (both _SLOTS deep) + two static windows + out
    blocks + the Bouzidi fold scratch."""
    plane = PX * YS * ZS
    est = (
        2 * _SLOTS * (27 * f_bytes + 3 * 4) * plane  # fwin/vwin + ringf/ringv
        + 2 * 2 * 9 * plane  # statics: two (A/B) pipelined windows
        + 2 * (27 * f_bytes + 4 + 3 * 4) * plane  # out: f + rho + vel
    )
    if has_bz:
        bxy = bz_dim[1] * bz_dim[2]
        est += 2 * 27 * bxy * f_bytes + 2 * 27 * PX * bxy * coef_bytes
    return est


def make_pallas_step_fused2(
    patch: PatchLevel,
    *,
    c_wale: float,
    nu_sgs_background: float,
    inlet_turbulence: float,
    wall_model: bool,
    sponge_blend: bool,
    interpret: bool = False,
    planes_per_step: int = 0,
    store_bf16: bool = False,
    alias_f: bool = False,
    bz_plan: Optional[Dict] = None,
    iface_pair: bool = False,
):
    """TWO consecutive sub-steps of a CHILDLESS level fused into ONE kernel
    pass (temporal blocking): f is read from and written to HBM once per TWO
    steps instead of once per step, and one kernel dispatch replaces two.
    This is the round-5 headline lever (the delayed-flush ring scaffolding of
    the Bouzidi fold-in, extended to re-stream in-VMEM before flushing) and
    roughly halves HBM traffic on HBM-bound single-level domains.

    Only childless levels qualify: a parent's INTERMEDIATE state feeds its
    children's interface ghost planes, so it must exist in HBM.  The fused
    pair is exactly the (temporal_weight 0.0, 0.5) child pair of the
    schedule, or two consecutive coarse steps of a single-level case (then
    u_inlet may differ between the two — both arrive as a (2,) scalar).

    Per grid iteration ci (grid = NCH + 2 so the trailing pipeline drains):

      - step A streams+collides chunk ci from the rotating input window into
        a 4-slot VMEM ring (f in storage dtype, vel f32 — the bf16
        round-trip through the ring is bit-identical to the unfused HBM
        round-trip);
      - the Bouzidi correction is applied in place to ring chunk ci-1
        (identical math/scratch to the make_pallas_step bz_plan fold-in:
        coefficient slabs double-buffered from HBM, the +x pulls read fresh
        chunk ci's first plane, the -x pulls a saved pre-correction edge).
        Without this, step B would stream UNcorrected values — in the
        unfused schedule the standalone correction runs between the steps;
      - step B streams+collides ring chunk ci-2 (its +x ring neighbor ci-1
        was corrected this very iteration) and writes the pipelined out
        blocks, whose index_map trails the grid by 2 (Pallas flushes an out
        block when its index CHANGES, so the i<2 garbage writes to block 0
        are overwritten before the first flush).  Step B's output is NOT
        corrected in-kernel — the standalone correction kernel runs after,
        exactly like the unfused schedule (2 dispatches/pair instead of 4).

    Interface ghost planes arrive in the pair layout with BOTH sub-step
    windows block-spec'd in (A at chunk ci / nsub[0], B at chunk ci-2 /
    nsub[1]); statics ride in two pipelined windows (ci and ci-2).  alias_f
    is safe for the same reason as make_pallas_step: the out index trails
    every read of the same region.

    Returns None when the configuration does not qualify (a Bouzidi box
    touching the first/last chunk, interface faces without pair layout, the
    VMEM footprint not fitting, flat or sharded layouts) — the caller falls
    back to the unfused kernel.
    """
    XS, YS, ZS = patch.padded
    X, Y, Z = patch.interior
    fb = patch.face_bc
    if patch.flat_yz:
        return None
    need_iface = tuple(fc for fc in range(6) if fb[fc] == BC_INTERFACE)
    if need_iface and not iface_pair:
        return None  # fused interface reads require the pair layout
    f_dtype = jnp.bfloat16 if store_bf16 else jnp.float32
    f_bytes = 2 if store_bf16 else 4
    g_native = store_bf16  # g = f - w storage (ops.storage); no MXU variant

    def dec(x, k):
        return x.astype(jnp.float32) if store_bf16 else x

    def enc(x, k):
        return x.astype(jnp.bfloat16) if store_bf16 else x

    coef_t = jnp.bfloat16 if store_bf16 else jnp.float32
    cbytes = 2 if store_bf16 else 4
    has_bz = bz_plan is not None
    bz_dim = tuple(bz_plan["dim"]) if has_bz else None
    if planes_per_step:
        PX = planes_per_step
        if XS % PX:
            return None
    else:
        PX = None
        for cand in (8, 4, 2, 1):
            if XS % cand:
                continue
            if _fused2_vmem_est(cand, YS, ZS, f_bytes, has_bz, bz_dim,
                                cbytes) < 48 * 2**20:
                PX = cand
                break
        if PX is None:
            return None
    NCH = XS // PX

    # Bouzidi fold geometry (identical constraints to make_pallas_step's
    # bz_plan fold-in: the box's chunk range must be interior so both the
    # predecessor's saved edge and the successor's fresh plane exist)
    bzf = None
    if has_bz:
        _blo, _bdim = bz_plan["lo"], bz_plan["dim"]
        c_lo, c_hi = _blo[0] // PX, (_blo[0] + _bdim[0] - 1) // PX
        if not (1 <= c_lo and c_hi <= NCH - 2):
            return None
        spx = (c_hi - c_lo + 1) * PX
        S_np = np.zeros((27, spx) + tuple(_bdim[1:]), np.float32)
        x0 = _blo[0] - c_lo * PX
        S_np[:, x0 : x0 + _bdim[0]] = np.asarray(bz_plan["S"], np.float32)
        bzf = {
            "c_lo": c_lo, "c_hi": c_hi,
            "oy": _blo[1], "by": _bdim[1],
            "oz": _blo[2], "bz": _bdim[2],
            "spad": jnp.asarray(S_np, coef_t),
        }

    n_scalar = 2 + (1 if iface_pair else 0)

    def kernel(u_ref, seed_ref, *pre_rest):
        # u_ref/seed_ref (and nsub) are (2,): [0] = step A, [1] = step B
        if iface_pair:
            _nsub_ref, *pre_rest = pre_rest  # consumed by index_maps only
        f_hbm, vel_hbm = pre_rest[0], pre_rest[1]  # ANY (manual DMA)
        statA = pre_rest[2:5]  # (PX, YS, ZS) windows at chunk ci
        statB = pre_rest[5:8]  # windows at chunk ci-2
        rest = pre_rest[8:]
        n_if = len(need_iface)
        ifA = dict(zip(need_iface, rest[:n_if]))
        ifB = dict(zip(need_iface, rest[n_if : 2 * n_if]))
        off = 2 * n_if
        spad_ref = None
        if bzf is not None:
            spad_ref = rest[off]  # (27, spx, by, bz) in HBM (manual DMA)
            off += 1
        fout_ref, rho_ref, velout_ref = rest[off : off + 3]
        scr = rest[off + 3 :]
        if bzf is not None:
            fwin, vwin, ringf, ringv, sems, plane_sc, sbuf, ssem = scr
        else:
            fwin, vwin, ringf, ringv, sems = scr

        ci = pl.program_id(0)  # 0 .. NCH+1 (two drain iterations)

        def start_dma(chunk):
            slot = chunk % _SLOTS
            pltpu.make_async_copy(
                f_hbm.at[:, pl.ds(chunk * PX, PX)], fwin.at[slot],
                sems.at[0, slot],
            ).start()
            pltpu.make_async_copy(
                vel_hbm.at[:, pl.ds(chunk * PX, PX)], vwin.at[slot],
                sems.at[1, slot],
            ).start()

        def wait_dma(chunk):
            slot = chunk % _SLOTS
            pltpu.make_async_copy(
                f_hbm.at[:, pl.ds(chunk * PX, PX)], fwin.at[slot],
                sems.at[0, slot],
            ).wait()
            pltpu.make_async_copy(
                vel_hbm.at[:, pl.ds(chunk * PX, PX)], vwin.at[slot],
                sems.at[1, slot],
            ).wait()

        @pl.when(ci == 0)
        def _warmup():
            start_dma(jnp.int32(0))
            if NCH > 1:
                start_dma(jnp.int32(1))
            wait_dma(jnp.int32(0))
            if NCH > 1:
                wait_dma(jnp.int32(1))

        @pl.when(ci + 2 <= NCH - 1)
        def _prefetch():
            start_dma(ci + 2)

        @pl.when((ci >= 1) & (ci + 1 <= NCH - 1))
        def _await_next():
            wait_dma(ci + 1)

        iota0 = jax.lax.broadcasted_iota(jnp.int32, (PX, YS, ZS), 0)
        iy3 = jax.lax.broadcasted_iota(jnp.int32, (PX, YS, ZS), 1)
        iz3 = jax.lax.broadcasted_iota(jnp.int32, (PX, YS, ZS), 2)

        def substep(cb, f_at, v_at, u_inlet, t_seed, iface_refs,
                    obst_ref, sponge_ref, wall_ref):
            """One stream+BC+collide on chunk `cb` (traced), pulling from
            f_at/v_at(chunk) -> slot refs (clamped to [0, NCH-1]; wrapped
            junk feeds only mask-overwritten rows).  Same math and BC forms
            as make_pallas_step's body."""
            ix3 = iota0 + cb * PX
            c_prev = jnp.maximum(cb - 1, 0)
            c_next = jnp.minimum(cb + 1, NCH - 1)
            f_prev_ch, f_cur_ch, f_next_ch = f_at(c_prev), f_at(cb), f_at(c_next)
            v_prev_ch, v_cur_ch, v_next_ch = v_at(c_prev), v_at(cb), v_at(c_next)

            if fb[0] == BC_INLET:
                gy1 = jax.lax.broadcasted_iota(
                    jnp.int32, (YS, ZS), 0) + (patch.lo[1] + 1)
                gz1 = jax.lax.broadcasted_iota(
                    jnp.int32, (YS, ZS), 1) + (patch.lo[2] + 1)
                if inlet_turbulence > 0.0:
                    noise = cm.hash_noise(gy1, gz1, t_seed)
                    u_inst = u_inlet + noise * jnp.float32(
                        inlet_turbulence) * u_inlet
                else:
                    u_inst = jnp.broadcast_to(
                        u_inlet, (YS, ZS)).astype(jnp.float32)
                base1 = 0.0 if g_native else 1.0
                inlet_factor = (
                    base1 + 3.0 * u_inst + 3.0 * u_inst * u_inst
                )[None, :, :]
            else:
                inlet_factor = None

            def face_value(k, face):
                bc = fb[face]
                if bc == BC_INTERFACE:
                    pr = iface_refs[face]
                    if face // 2 == 0:
                        return pr[0, 0, k].astype(jnp.float32)[None, :, :]
                    rows = pr[0, 0, :, k, :].astype(jnp.float32)  # (PX, B)
                    if face // 2 == 1:
                        return rows[:, None, :]
                    return rows[:, :, None]
                if bc == BC_INLET:
                    return float(lat.W[k]) * inlet_factor
                if bc == BC_OUTLET:
                    cu = float(lat.C_X[k]) * u_inlet
                    return float(lat.W[k]) * (
                        (0.0 if g_native else 1.0)
                        + 3.0 * cu + 4.5 * cu * cu - 1.5 * u_inlet * u_inlet
                    )
                if bc == BC_MIRROR_Y:
                    return dec(f_cur_ch[int(lat.MIRROR_Y[k])], k)
                if bc == BC_MIRROR_Z:
                    return dec(f_cur_ch[int(lat.MIRROR_Z[k])], k)
                raise AssertionError(bc)

            streamed = []
            for k in range(27):
                cx, cy, cz = int(lat.C_X[k]), int(lat.C_Y[k]), int(lat.C_Z[k])
                if cx == 0:
                    src = f_cur_ch[k]
                elif cx == 1:
                    if PX > 1:
                        src = jnp.concatenate(
                            [f_prev_ch[k, PX - 1 :], f_cur_ch[k, : PX - 1]],
                            axis=0,
                        )
                    else:
                        src = f_prev_ch[k]
                else:
                    if PX > 1:
                        src = jnp.concatenate(
                            [f_cur_ch[k, 1:], f_next_ch[k, :1]], axis=0
                        )
                    else:
                        src = f_next_ch[k]
                val = dec(_shift2d(src, cy, cz), k)
                if cz > 0:
                    val = jnp.where(iz3 == 0, face_value(k, 4), val)
                elif cz < 0:
                    val = jnp.where(iz3 == Z - 1, face_value(k, 5), val)
                if cy > 0:
                    val = jnp.where(iy3 == 0, face_value(k, 2), val)
                elif cy < 0:
                    val = jnp.where(iy3 == Y - 1, face_value(k, 3), val)
                if cx < 0:
                    val = jnp.where(ix3 == X - 1, face_value(k, 1), val)
                elif cx > 0:
                    val = jnp.where(ix3 == 0, face_value(k, 0), val)
                streamed.append(val)

            def vel_nbr(dx, dy, dz):
                if dx == 0:
                    src = v_cur_ch[:]
                elif dx == -1:
                    if PX > 1:
                        src = jnp.concatenate(
                            [v_prev_ch[:, PX - 1 :], v_cur_ch[:, : PX - 1]],
                            axis=1,
                        )
                    else:
                        src = v_prev_ch[:]
                else:
                    if PX > 1:
                        src = jnp.concatenate(
                            [v_cur_ch[:, 1:], v_next_ch[:, :1]], axis=1
                        )
                    else:
                        src = v_next_ch[:]
                r = _shift2d(src, -dy, -dz)
                own = v_cur_ch[:]
                if dx > 0:
                    r = jnp.where(ix3 == X - 1, own, r)
                elif dx < 0:
                    r = jnp.where(ix3 == 0, own, r)
                if dy > 0:
                    r = jnp.where(iy3 == Y - 1, own, r)
                elif dy < 0:
                    r = jnp.where(iy3 == 0, own, r)
                if dz > 0:
                    r = jnp.where(iz3 == Z - 1, own, r)
                elif dz < 0:
                    r = jnp.where(iz3 == 0, own, r)
                return r

            nbrs = (
                vel_nbr(1, 0, 0), vel_nbr(-1, 0, 0),
                vel_nbr(0, 1, 0), vel_nbr(0, -1, 0),
                vel_nbr(0, 0, 1), vel_nbr(0, 0, -1),
            )
            kw = dict(
                tau=patch.tau,
                c_wale=c_wale,
                nu_sgs_background=nu_sgs_background,
                wall_model=wall_model,
                sponge_blend=sponge_blend,
            )
            if g_native:
                kw["g_shifted"] = True
            return cm.collide_unrolled_v2(
                streamed, nbrs, obst_ref[:] != 0,
                sponge_ref[:], wall_ref[:], u_inlet, **kw,
            )

        # ---- step A on chunk ci -> ring slot ci % _SLOTS ----
        @pl.when(ci <= NCH - 1)
        def _step_a():
            fA, _rA, vA = substep(
                ci, lambda c: fwin.at[c % _SLOTS], lambda c: vwin.at[c % _SLOTS],
                u_ref[0], seed_ref[0], ifA, statA[0], statA[1], statA[2],
            )
            rw = ringf.at[ci % _SLOTS]
            for k in range(27):
                rw[k] = enc(fA[k], k)
            ringv[ci % _SLOTS] = vA

        # ---- Bouzidi correction of ring chunk ci-1 (in place) ----
        if bzf is not None:
            c_lo, c_hi = bzf["c_lo"], bzf["c_hi"]
            oy, by = bzf["oy"], bzf["by"]
            oz, bz_ = bzf["oz"], bzf["bz"]

            def in_box(P):
                return (P >= c_lo) & (P <= c_hi)

            def s_dma(slot, P):
                return pltpu.make_async_copy(
                    spad_ref.at[:, pl.ds((P - c_lo) * PX, PX)],
                    sbuf.at[slot], ssem.at[slot],
                )

            @pl.when(in_box(ci))
            def _s_prefetch():
                # coefficients for correcting THIS chunk next invocation,
                # and its predecessor's pre-correction edge for the +x pulls
                s_dma(ci % 2, ci).start()
                pp = ringf.at[(ci - 1) % _SLOTS]
                plane_sc[(ci - 1) % 2] = pp[
                    :, PX - 1, oy : oy + by, oz : oz + bz_
                ]

            P = ci - 1

            @pl.when(in_box(P))
            def _correct():
                s_dma(P % 2, P).wait()
                rp = ringf.at[P % _SLOTS]  # chunk being corrected in place
                rc = ringf.at[ci % _SLOTS]  # fresh chunk: +x neighbor planes
                sb = sbuf.at[P % 2]
                prev = plane_sc.at[(P - 1) % 2]

                def slab(ref, k):
                    return ref[k, :, oy : oy + by, oz : oz + bz_]

                def shifted(ref, k):
                    cx = int(lat.C_X[k])
                    cy, cz = int(lat.C_Y[k]), int(lat.C_Z[k])
                    b = slab(ref, k)
                    if cx == 1:
                        pv = prev[k][None]
                        b = pv if PX == 1 else jnp.concatenate(
                            [pv, b[: PX - 1]], axis=0
                        )
                    elif cx == -1:
                        nx = rc[k, 0, oy : oy + by, oz : oz + bz_][None]
                        b = nx if PX == 1 else jnp.concatenate(
                            [b[1:], nx], axis=0
                        )
                    return _shift2d(b, cy, cz)

                def corrected(j, k):
                    s = sb[k].astype(jnp.float32)
                    a = jnp.abs(s)
                    other = jnp.where(
                        s < 0,
                        slab(rp, j).astype(jnp.float32),
                        shifted(rp, k).astype(jnp.float32),
                    )
                    val = (
                        a * slab(rp, k).astype(jnp.float32) + (1.0 - a) * other
                    ).astype(f_dtype)
                    return jnp.where(s != 0, val, slab(rp, j))

                for j in range(27):
                    k = int(lat.OPP[j])
                    if j >= k:
                        continue
                    new_j = corrected(j, k)
                    new_k = corrected(k, j)
                    rp[j, :, oy : oy + by, oz : oz + bz_] = new_j
                    rp[k, :, oy : oy + by, oz : oz + bz_] = new_k

        # ---- step B on ring chunk ci-2 -> pipelined out blocks ----
        @pl.when(ci >= 2)
        def _step_b():
            cb = ci - 2
            fB, rB, vB = substep(
                cb,
                lambda c: ringf.at[c % _SLOTS],
                lambda c: ringv.at[c % _SLOTS],
                u_ref[1], seed_ref[1], ifB, statB[0], statB[1], statB[2],
            )
            for k in range(27):
                fout_ref[k] = enc(fB[k], k)
            rho_ref[:] = rB
            velout_ref[:] = vB

    def step(f, vel, u_ab, seed_ab, statics3d, iface: Optional[Dict] = None,
             nsub_ab=(0, 1), bz_S=None):
        """u_ab/seed_ab: (2,) step-A/step-B scalars.  `iface` as in
        make_pallas_step(iface_pair=True): {face: (group_array, face_index)}
        in the state's space (g = f - w when step.g_native); nsub_ab are the
        two sub-step plane indices."""
        iface = iface or {}
        iface_specs_a, iface_specs_b, iface_vals = [], [], []
        for fc in need_iface:
            v, fi = iface[fc]
            if fc // 2 == 0:
                iface_specs_a.append(pl.BlockSpec(
                    (1, 1) + v.shape[2:],
                    lambda i, *s, _fi=fi: (_fi, s[-1][0], 0, 0, 0),
                ))
                iface_specs_b.append(pl.BlockSpec(
                    (1, 1) + v.shape[2:],
                    lambda i, *s, _fi=fi: (_fi, s[-1][1], 0, 0, 0),
                ))
            else:
                iface_specs_a.append(pl.BlockSpec(
                    (1, 1, PX, 27, v.shape[-1]),
                    lambda i, *s, _fi=fi: (
                        _fi, s[-1][0], jnp.minimum(i, NCH - 1), 0, 0),
                ))
                iface_specs_b.append(pl.BlockSpec(
                    (1, 1, PX, 27, v.shape[-1]),
                    lambda i, *s, _fi=fi: (
                        _fi, s[-1][1], jnp.clip(i - 2, 0, NCH - 1), 0, 0),
                ))
            iface_vals.append(v)

        stat_spec_a = pl.BlockSpec(
            (PX, YS, ZS), lambda i, *_: (jnp.minimum(i, NCH - 1), 0, 0)
        )
        stat_spec_b = pl.BlockSpec(
            (PX, YS, ZS), lambda i, *_: (jnp.clip(i - 2, 0, NCH - 1), 0, 0)
        )
        out_idx = lambda i, *_: (jnp.clip(i - 2, 0, NCH - 1), 0, 0)  # noqa: E731
        out_idx4 = lambda i, *_: (0, jnp.clip(i - 2, 0, NCH - 1), 0, 0)  # noqa: E731
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=n_scalar,
            grid=(NCH + 2,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # f
                pl.BlockSpec(memory_space=pl.ANY),  # vel
                stat_spec_a, stat_spec_a, stat_spec_a,
                stat_spec_b, stat_spec_b, stat_spec_b,
            ]
            + iface_specs_a
            + iface_specs_b
            + (
                [pl.BlockSpec(memory_space=pl.ANY)] if bzf is not None else []
            ),
            out_specs=[
                pl.BlockSpec((27, PX, YS, ZS), out_idx4),
                pl.BlockSpec((PX, YS, ZS), out_idx),
                pl.BlockSpec((3, PX, YS, ZS), out_idx4),
            ],
            scratch_shapes=[
                pltpu.VMEM((_SLOTS, 27, PX, YS, ZS), f_dtype),
                pltpu.VMEM((_SLOTS, 3, PX, YS, ZS), jnp.float32),
                pltpu.VMEM((_SLOTS, 27, PX, YS, ZS), f_dtype),  # ring f
                pltpu.VMEM((_SLOTS, 3, PX, YS, ZS), jnp.float32),  # ring vel
                pltpu.SemaphoreType.DMA((2, _SLOTS)),
            ]
            + (
                [
                    pltpu.VMEM((2, 27, bzf["by"], bzf["bz"]), f_dtype),
                    pltpu.VMEM((2, 27, PX, bzf["by"], bzf["bz"]), coef_t),
                    pltpu.SemaphoreType.DMA((2,)),
                ]
                if bzf is not None
                else []
            ),
        )
        est = _fused2_vmem_est(PX, YS, ZS, f_bytes, has_bz, bz_dim, cbytes) \
            + sum(
                int(np.prod(v.shape[2:])) * v.dtype.itemsize * 2
                for v in iface_vals
            )
        fo, rho, vo = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((27, XS, YS, ZS), f_dtype),
                jax.ShapeDtypeStruct((XS, YS, ZS), jnp.float32),
                jax.ShapeDtypeStruct((3, XS, YS, ZS), jnp.float32),
            ],
            input_output_aliases={n_scalar: 0} if alias_f else {},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=min(
                    100 * 2**20, int(est * VMEM_DECL_SCALE) + VMEM_DECL_PAD
                ),
            ),
            interpret=interpret,
        )(
            jnp.asarray(u_ab, jnp.float32).reshape(2),
            jnp.asarray(seed_ab, jnp.int32).reshape(2),
            *(
                (jnp.asarray(nsub_ab, jnp.int32).reshape(2),)
                if iface_pair else ()
            ),
            f,
            vel,
            statics3d["obstacle_u8"],
            statics3d["sponge3d"],
            statics3d["wall3d"],
            statics3d["obstacle_u8"],
            statics3d["sponge3d"],
            statics3d["wall3d"],
            *iface_vals,
            *iface_vals,
            *(
                ((bzf["spad"] if bz_S is None else bz_S.astype(coef_t)),)
                if bzf is not None else ()
            ),
        )
        return fo, rho, vo

    step.g_native = g_native
    step.iface_pair = iface_pair
    step.fused2 = True
    # step A's correction is folded in; step B still needs the standalone
    # correction after the call (the scheduler applies it)
    step.bz_folded = bzf is not None
    step.bz_spad = bzf["spad"] if bzf is not None else None
    step.planes_per_step = PX
    return step


def _chunks_2d_vmem_est(PX, PY, ZS, f_bytes, YS=0, alias_f=False):
    """Per-chunk VMEM footprint of make_pallas_step_2d: rotating windows of
    (27|3, PX, PY, ZS) centers + y-halo row buffers (sublane dim PX pads to
    the 8 tile) + pipelined static in-blocks + double-buffered out-blocks.
    With alias_f, add the parity-double-buffered x-lo save planes
    (2, NCY, 27, PY+2, ZS) that replace the x-lo halo HBM re-read."""
    plane = PX * PY * ZS
    halo = PY * ZS  # x-halo plane buffers (x0-1, x0+PX; this strip's rows)
    est = (
        _SLOTS * (27 * f_bytes + 3 * 4) * (plane + 2 * halo)
        + 2 * 9 * plane  # statics: obstacle u8 + sponge f32 + wall f32
        + 2 * (27 * f_bytes + 4 + 3 * 4) * plane  # out: f + rho + vel
    )
    if alias_f:
        assert YS and YS % PY == 0
        est += 2 * (YS // PY) * 27 * (PY + 8) * ZS * f_bytes
    return est


def choose_2d_chunks(
    patch: PatchLevel, store_bf16: bool, shard_nx: int = 1,
    px_c=(16, 8, 4), py_c=(32, 16, 8), alias_f: bool = False,
):
    """(PX, PY) chunk dims for make_pallas_step_2d, or None if no choice
    fits the per-chunk VMEM budget.  Prefers large PX (amortizes per-chunk
    dispatch/vector-op overheads; the x-halo rides the already-resident
    neighbor chunks), then large PY (fewer chunks, fewer sublane-axis
    halo concats).  Budget 64 MiB of the ~128 MiB VMEM: measured A/B at a
    63.7M-cell padding-free box, (16, 16) = 2265 MLUPS vs (16, 8) = 2195
    (+3.2%), both Mosaic-lowerable; the old 36 MiB budget forced PY=8
    (NOTES_ROUND4_PERF.md)."""
    XS, YS, ZS = patch.padded
    if patch.flat_yz or BC_INTERFACE in patch.face_bc or XS % shard_nx:
        return None
    XL = XS // shard_nx
    fbytes = 2 if store_bf16 else 4
    for PX in px_c:
        if XL % PX:
            continue
        for PY in py_c:
            if YS % PY:
                continue
            if _chunks_2d_vmem_est(
                PX, PY, ZS, fbytes, YS=YS, alias_f=alias_f
            ) < 64 * 2**20:
                return PX, PY
    return None


def make_pallas_step_2d(
    patch: PatchLevel,
    *,
    c_wale: float,
    nu_sgs_background: float,
    inlet_turbulence: float,
    wall_model: bool,
    sponge_blend: bool,
    interpret: bool = False,
    chunk_dims=None,  # (PX, PY); None = choose_2d_chunks
    store_bf16: bool = False,
    shard_nx: int = 1,
    alias_f: bool = False,  # write f in place (see the docstring's in-place
    # paragraph: the x-lo halo HBM re-read becomes a parity-double-buffered
    # VMEM save; every other read provably precedes the in-place write)
):
    """make_pallas_step for domains whose whole-x-plane window exceeds VMEM:
    the grid chunks (PX x-planes x PY y-rows) so the window footprint scales
    with PX*PY*ZS instead of PX*YS*ZS — this is what covers the reference's
    large-domain perf rows (64M cells at 400 MLUPS, 216M at 300, reference:
    README.md:508-509) that the 1-D kernel cannot reach past ~28M cells.

    Same physics and BC forms as make_pallas_step; the index algebra changes:

      - grid = (NCX, NCY) with the y-strips FASTEST, so the y-halo rides the
        prev/next rotating slots (in-register sublane concats) — Mosaic
        forbids the alternative (single-y-row HBM slices are unaligned to
        the (8, 128) tiling; x is a major dim, so single-x-plane slices
        lower fine);
      - the x-halo planes (x0-1 and x0+PX, this strip's PY rows) arrive in
        separate per-slot plane buffers (two extra DMAs per chunk, a 2/PX
        read amplification); the x-streaming shift CONCATENATES the halo
        row onto the window along the untiled major x axis — the 1-D
        kernel's mechanism.  Measured NEUTRAL vs the roll + patching
        select it replaced (1682 vs 1685 MLUPS at 66M cells, within the
        window noise; NOTES_ROUND4_PERF.md) — kept for the simpler
        one-pass form.  Corner pulls (cx and cy both nonzero) take the
        y-concat of the prev/next slots' halo buffers, so every read
        stays static;
      - halo DMAs at the domain x ends clamp to valid planes; the junk they
        deliver only feeds destination rows the x-face BC masks overwrite;
      - in-place (alias_f=True, production): the only read that raced the
        in-place write was the x-lo halo DMA — chunk (ci, cj) re-read the
        plane chunk (ci-1, cj) produced output for a full column (NCY
        iterations) ago.  That DMA is replaced by a parity-double-buffered
        VMEM save: when chunk (ci, cj) is resident, its input window's LAST
        plane (with the y-halo rows attached from the prev/next rotating
        slots, which hold strips cj-1/cj+1 of the same column) is stored to
        xsave[ci % 2, cj]; chunk (ci+1, cj) reads xsave[(ci+1-1) % 2, cj]
        one column later.  The parity buffer is what keeps the NEIGHBOR
        strips' planes alive for the corner pulls: chunk (ci, cj-1) at
        iteration g-1 writes parity ci%2 while (ci, cj) still needs parity
        (ci-1)%2 of strip cj-1.  Every other read already preceded the
        write: the input window of chunk g lands by iteration g-1 (< the
        copy-out at g), the x-hi halo reads a plane whose in-place write
        happens a full column LATER (iteration g+NCY), the vel halos read
        vel, which is never aliased, and the y-halo rides VMEM slots.
        Kills the transient second f copy (54 B/cell bf16 — ~38% of the
        big-domain HBM budget) and the x-lo halo's 1/PX read amplification;
      - alias_f=False keeps the x-lo halo DMA (A/B and test reference);
      - interface faces are unsupported (choose_2d_chunks gates on them):
        fine levels small enough to carry ghost planes fit the 1-D kernel.

    Sharded (shard_nx > 1): the ppermute'd neighbor edge planes arrive
    striped per y-strip with their own halo rows ((27|3, 2, NCY, PY+2, ZS),
    built by the step wrapper from the (27|3, 2, YS, ZS) planes
    _shard_map_pstep exchanges), so the slab-edge reads are static too.
    """
    XS, YS, ZS = patch.padded
    X, Y, Z = patch.interior
    fb = patch.face_bc
    assert BC_INTERFACE not in fb, "2-D chunked kernel: no interface faces"
    sharded = shard_nx > 1
    assert XS % shard_nx == 0, (XS, shard_nx)
    XL = XS // shard_nx
    f_dtype = jnp.bfloat16 if store_bf16 else jnp.float32
    f_bytes = 2 if store_bf16 else 4
    g_native = store_bf16  # bf16 storage holds g = f - w (ops.storage)

    def dec(x, k):
        return x.astype(jnp.float32) if store_bf16 else x

    def enc(x, k):
        return x.astype(jnp.bfloat16) if store_bf16 else x

    if chunk_dims is None:
        chunk_dims = choose_2d_chunks(patch, store_bf16, shard_nx,
                                      alias_f=alias_f)
    assert chunk_dims is not None, "no (PX, PY) fits the VMEM budget"
    PX, PY = chunk_dims
    assert XL % PX == 0 and YS % PY == 0, (XL, YS, PX, PY)
    assert PY % 8 == 0, PY  # HBM sublane slices must be (8,)-tile aligned
    NCX, NCY = XL // PX, YS // PY
    NG = NCX * NCY

    def kernel(u_ref, seed_ref, *pre_rest):
        if sharded:
            xoff_ref, *pre_rest = pre_rest
        f_hbm, vel_hbm = pre_rest[0], pre_rest[1]  # ANY (manual DMA)
        obstacle_ref, sponge_ref, wall_ref = pre_rest[2:5]  # (PX,PY,ZS) VMEM
        rest = pre_rest[5:]
        off = 0
        if sharded:
            # striped edge planes: (27|3, 2, 1, PY+2, ZS) per-strip blocks
            fe_ref, ve_ref = rest[off], rest[off + 1]
            off += 2
        fout_ref, rho_ref, velout_ref = rest[off : off + 3]
        if alias_f:
            (fwin, vwin, fhi, vlo, vhi, sems, xsave, xedge) = rest[off + 3 :]
            flo = None
        else:
            fwin, vwin, flo, fhi, vlo, vhi, sems = rest[off + 3 :]
            xsave = xedge = None

        ci = pl.program_id(0)
        cj = pl.program_id(1)
        g = ci * NCY + cj
        lx3 = jax.lax.broadcasted_iota(jnp.int32, (PX, PY, ZS), 0)
        lix3 = lx3 + ci * PX  # slab-local x (== global unsharded)
        ix3 = lix3 + xoff_ref[0] if sharded else lix3
        iy3 = jax.lax.broadcasted_iota(jnp.int32, (PX, PY, ZS), 1) + cj * PY
        iz3 = jax.lax.broadcasted_iota(jnp.int32, (PX, PY, ZS), 2)

        def chunk_dmas(gq):
            slot = gq % _SLOTS
            ci2 = gq // NCY
            cj2 = gq - ci2 * NCY
            x0 = ci2 * PX
            y0 = cj2 * PY
            # clamped at the slab x ends: the junk planes only feed
            # destinations the x-face masks (or slab-edge selects) overwrite
            xl_ = jnp.maximum(x0 - 1, 0)
            xh_ = jnp.minimum(x0 + PX, XL - 1)
            dmas = [
                pltpu.make_async_copy(
                    f_hbm.at[:, pl.ds(x0, PX), pl.ds(y0, PY)],
                    fwin.at[slot], sems.at[0, slot],
                ),
                pltpu.make_async_copy(
                    f_hbm.at[:, xh_, pl.ds(y0, PY)], fhi.at[slot],
                    sems.at[2, slot],
                ),
                pltpu.make_async_copy(
                    vel_hbm.at[:, pl.ds(x0, PX), pl.ds(y0, PY)],
                    vwin.at[slot], sems.at[3, slot],
                ),
                pltpu.make_async_copy(
                    vel_hbm.at[:, xl_, pl.ds(y0, PY)], vlo.at[slot],
                    sems.at[4, slot],
                ),
                pltpu.make_async_copy(
                    vel_hbm.at[:, xh_, pl.ds(y0, PY)], vhi.at[slot],
                    sems.at[5, slot],
                ),
            ]
            if not alias_f:
                # x-lo f halo re-read from HBM: races an in-place write (the
                # plane was produced a full column ago), so the aliased
                # kernel takes it from the xsave VMEM buffer instead
                dmas.append(pltpu.make_async_copy(
                    f_hbm.at[:, xl_, pl.ds(y0, PY)], flo.at[slot],
                    sems.at[1, slot],
                ))
            return dmas

        def start_dma(gq):
            for cp in chunk_dmas(gq):
                cp.start()

        def wait_dma(gq):
            for cp in chunk_dmas(gq):
                cp.wait()

        @pl.when(g == 0)
        def _warmup():
            start_dma(jnp.int32(0))
            if NG > 1:
                start_dma(jnp.int32(1))
            wait_dma(jnp.int32(0))
            if NG > 1:
                wait_dma(jnp.int32(1))

        @pl.when(g + 2 <= NG - 1)
        def _prefetch():
            start_dma(g + 2)

        @pl.when((g >= 1) & (g + 1 <= NG - 1))
        def _await_next():
            wait_dma(g + 1)

        u_inlet = u_ref[0]
        t_seed = seed_ref[0]

        g_prev = jnp.maximum(g - 1, 0)
        g_next = jnp.minimum(g + 1, NG - 1)
        s_prev, s_cur, s_next = g_prev % _SLOTS, g % _SLOTS, g_next % _SLOTS

        def ycat(win, k, cy, ax):
            """y-halo from the rotating slots: [prev strip edge | chunk |
            next strip edge] along the y axis (axis `ax` of the k-slice).
            At strip ends the neighbor slot holds another x-column's data —
            junk that only feeds destination rows the y-face masks overwrite
            (the grid iterates y-strips fastest, so cj +- 1 of the same
            column ARE the prev/next grid steps)."""
            idx = (slice(None),) * ax
            if cy == 0:
                return win.at[s_cur][k]
            if cy == 1:
                return jnp.concatenate(
                    [win.at[s_prev][k][idx + (slice(PY - 1, None),)],
                     win.at[s_cur][k][idx + (slice(None, PY - 1),)]],
                    axis=ax,
                )
            return jnp.concatenate(
                [win.at[s_cur][k][idx + (slice(1, None),)],
                 win.at[s_next][k][idx + (slice(None, 1),)]],
                axis=ax,
            )

        if fb[0] == BC_INLET:
            gy1 = (jax.lax.broadcasted_iota(jnp.int32, (PY, ZS), 0)
                   + cj * PY + (patch.lo[1] + 1))
            gz1 = (jax.lax.broadcasted_iota(jnp.int32, (PY, ZS), 1)
                   + (patch.lo[2] + 1))
            if inlet_turbulence > 0.0:
                noise = cm.hash_noise(gy1, gz1, t_seed)
                u_inst = u_inlet + noise * jnp.float32(inlet_turbulence) * u_inlet
            else:
                u_inst = jnp.broadcast_to(u_inlet, (PY, ZS)).astype(jnp.float32)
            base1 = 0.0 if g_native else 1.0
            inlet_factor = (base1 + 3.0 * u_inst + 3.0 * u_inst * u_inst)[None]
        else:
            inlet_factor = None

        def face_value(k, face):
            bc = fb[face]
            if bc == BC_INLET:
                return float(lat.W[k]) * inlet_factor
            if bc == BC_OUTLET:
                cu = float(lat.C_X[k]) * u_inlet
                return float(lat.W[k]) * (
                    (0.0 if g_native else 1.0)
                    + 3.0 * cu + 4.5 * cu * cu - 1.5 * u_inlet * u_inlet
                )
            if bc == BC_MIRROR_Y:
                return dec(fwin.at[s_cur][int(lat.MIRROR_Y[k])], k)
            if bc == BC_MIRROR_Z:
                return dec(fwin.at[s_cur][int(lat.MIRROR_Z[k])], k)
            raise AssertionError(bc)

        def ysel(a, s):
            """out[y] = striped-edge row (y + s): rows lead by 1 halo row."""
            return a[..., 1 + s : 1 + s + PY, :]

        def zroll(a, cz):
            return jnp.roll(a, cz, axis=-1) if cz else a

        def xcat(src, row, cx, ax=0):
            """x-shift by concat along the (untiled) major x axis — the
            1-D kernel's mechanism; the halo plane buffer supplies the
            wrapped row directly.  Measured neutral vs roll + patching
            select (1682 vs 1685 MLUPS at 66M; NOTES_ROUND4_PERF.md) —
            kept for the simpler one-pass form."""
            row = jnp.expand_dims(row, ax)
            idx = (slice(None),) * ax
            if cx == 1:
                return jnp.concatenate(
                    [row, src[idx + (slice(None, PX - 1),)]], axis=ax
                )
            return jnp.concatenate(
                [src[idx + (slice(1, None),)], row], axis=ax
            )

        if alias_f:
            # save this chunk's LAST input plane — plus its two y-halo rows
            # from the prev/next rotating slots, which hold strips cj-1 /
            # cj+1 of the same x-column (junk at strip/column ends feeds
            # only mask-overwritten destinations) — for chunk (ci+1, cj)'s
            # x-lo halo one column from now.  Parity ci%2 keeps the PREVIOUS
            # column's planes alive for this column's readers.  The PY-row
            # mid plane and the 8-row edge buffer are separate scratch so
            # every dynamically-indexed slice stays (8,)-sublane aligned
            # (Mosaic rejects a dynamic memref_slice with a PY+2 rows dim).
            sidx = (ci % 2) * NCY + cj
            xsave[sidx] = fwin.at[s_cur][:, PX - 1]
            xedge[sidx] = jnp.tile(
                jnp.concatenate(
                    [fwin.at[s_prev][:, PX - 1, PY - 1 : PY],
                     fwin.at[s_next][:, PX - 1, 0:1]],
                    axis=1,
                ),
                (1, 4, 1),
            )
            ridx = ((ci - 1) % 2) * NCY + cj
            xsave_r, xedge_r = xsave.at[ridx], xedge.at[ridx]

        def xlo_halo(k, cy):
            """x-lo halo plane for direction k, y-shifted by cy: the saved
            previous-column plane (aliased) or the flo DMA buffer."""
            if not alias_f:
                return ycat(flo, k, cy, 0)
            if cy == 0:
                return xsave_r[k]
            if cy == 1:
                return jnp.concatenate(
                    [xedge_r[k, 0:1], xsave_r[k, : PY - 1]], axis=0
                )
            return jnp.concatenate(
                [xsave_r[k, 1:], xedge_r[k, 1:2]], axis=0
            )

        streamed = []
        for k in range(27):
            cx, cy, cz = int(lat.C_X[k]), int(lat.C_Y[k]), int(lat.C_Z[k])
            src = ycat(fwin, k, cy, 1)  # (PX, PY, ZS), y-shift applied
            # x-shift: halo plane buffers (y-concat'd across slots like the
            # window) concatenated on at the shifted-off end
            if cx == 1:
                val = dec(zroll(xcat(src, xlo_halo(k, cy), 1), cz), k)
            elif cx == -1:
                val = dec(zroll(xcat(src, ycat(fhi, k, cy, 0), -1), cz), k)
            else:
                val = dec(zroll(src, cz), k)
            if sharded and cx == 1:
                # slab-edge rows: the left neighbor's last plane, striped
                # with its own y-halo so the diagonal pulls stay static
                ev = dec(zroll(ysel(fe_ref[k, 0, 0], -cy), cz), k)[None]
                val = jnp.where(lix3 == 0, ev, val)
            elif sharded and cx == -1:
                ev = dec(zroll(ysel(fe_ref[k, 1, 0], -cy), cz), k)[None]
                val = jnp.where(lix3 == XL - 1, ev, val)
            if cz > 0:
                val = jnp.where(iz3 == 0, face_value(k, 4), val)
            elif cz < 0:
                val = jnp.where(iz3 == Z - 1, face_value(k, 5), val)
            if cy > 0:
                val = jnp.where(iy3 == 0, face_value(k, 2), val)
            elif cy < 0:
                val = jnp.where(iy3 == Y - 1, face_value(k, 3), val)
            if cx < 0:
                val = jnp.where(ix3 == X - 1, face_value(k, 1), val)
            elif cx > 0:
                val = jnp.where(ix3 == 0, face_value(k, 0), val)
            streamed.append(val)

        def vel_nbr(dx, dy, dz):
            src = ycat(vwin, slice(None), -dy, 2)  # (3, PX, PY, ZS)
            if dx == -1:
                r = zroll(xcat(src, ycat(vlo, slice(None), -dy, 1), 1, ax=1),
                          -dz)
            elif dx == 1:
                r = zroll(xcat(src, ycat(vhi, slice(None), -dy, 1), -1, ax=1),
                          -dz)
            else:
                r = zroll(src, -dz)
            if sharded and dx == -1:
                ev = zroll(ysel(ve_ref[:, 0, 0], dy), -dz)[:, None]
                r = jnp.where(lix3 == 0, ev, r)
            elif sharded and dx == 1:
                ev = zroll(ysel(ve_ref[:, 1, 0], dy), -dz)[:, None]
                r = jnp.where(lix3 == XL - 1, ev, r)
            own = vwin.at[s_cur][:]
            if dx > 0:
                r = jnp.where(ix3 == X - 1, own, r)
            elif dx < 0:
                r = jnp.where(ix3 == 0, own, r)
            if dy > 0:
                r = jnp.where(iy3 == Y - 1, own, r)
            elif dy < 0:
                r = jnp.where(iy3 == 0, own, r)
            if dz > 0:
                r = jnp.where(iz3 == Z - 1, own, r)
            elif dz < 0:
                r = jnp.where(iz3 == 0, own, r)
            return r

        nbrs = (
            vel_nbr(1, 0, 0), vel_nbr(-1, 0, 0),
            vel_nbr(0, 1, 0), vel_nbr(0, -1, 0),
            vel_nbr(0, 0, 1), vel_nbr(0, 0, -1),
        )

        kw = dict(
            tau=patch.tau,
            c_wale=c_wale,
            nu_sgs_background=nu_sgs_background,
            wall_model=wall_model,
            sponge_blend=sponge_blend,
        )
        if g_native:
            kw["g_shifted"] = True
        f_out, rho_out, vel_out = cm.collide_unrolled_v2(
            streamed, nbrs, obstacle_ref[:] != 0,
            sponge_ref[:], wall_ref[:], u_inlet, **kw,
        )
        for k in range(27):
            fout_ref[k] = enc(f_out[k], k)
        rho_ref[:] = rho_out
        velout_ref[:] = vel_out

    n_scalar = 2 + (1 if sharded else 0)
    if sharded:
        # striped-edge gather rows: strip cj needs edge-plane rows
        # [cj*PY - 1, cj*PY + PY], clamped at the global y ends (junk rows
        # feed only mask-overwritten destinations)
        _stripe_idx = np.clip(
            np.arange(-1, PY + 1)[None, :] + PY * np.arange(NCY)[:, None],
            0, YS - 1,
        ).reshape(-1)

    def step(f, vel, u_inlet, t_seed, statics3d, iface=None,
             edges=None, x_off=None, nsub=None):
        assert not iface, "2-D chunked kernel: no interface faces"
        edge_vals = ()
        edge_specs = []
        if sharded:
            f_edges, v_edges = edges
            fe = f_edges[:, :, _stripe_idx].reshape(27, 2, NCY, PY + 2, ZS)
            ve = v_edges[:, :, _stripe_idx].reshape(3, 2, NCY, PY + 2, ZS)
            edge_vals = (fe, ve)
            edge_specs = [
                pl.BlockSpec((27, 2, 1, PY + 2, ZS),
                             lambda i, j, *_: (0, 0, j, 0, 0)),
                pl.BlockSpec((3, 2, 1, PY + 2, ZS),
                             lambda i, j, *_: (0, 0, j, 0, 0)),
            ]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=n_scalar,
            grid=(NCX, NCY),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # f
                pl.BlockSpec(memory_space=pl.ANY),  # vel
                pl.BlockSpec((PX, PY, ZS), lambda i, j, *_: (i, j, 0)),
                pl.BlockSpec((PX, PY, ZS), lambda i, j, *_: (i, j, 0)),
                pl.BlockSpec((PX, PY, ZS), lambda i, j, *_: (i, j, 0)),
            ]
            + edge_specs,
            out_specs=[
                pl.BlockSpec((27, PX, PY, ZS), lambda i, j, *_: (0, i, j, 0)),
                pl.BlockSpec((PX, PY, ZS), lambda i, j, *_: (i, j, 0)),
                pl.BlockSpec((3, PX, PY, ZS), lambda i, j, *_: (0, i, j, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((_SLOTS, 27, PX, PY, ZS), f_dtype),
                pltpu.VMEM((_SLOTS, 3, PX, PY, ZS), jnp.float32),
            ]
            + (
                [] if alias_f
                else [pltpu.VMEM((_SLOTS, 27, PY, ZS), f_dtype)]  # x-lo halo
            )
            + [
                pltpu.VMEM((_SLOTS, 27, PY, ZS), f_dtype),  # x-hi halo plane
                pltpu.VMEM((_SLOTS, 3, PY, ZS), jnp.float32),
                pltpu.VMEM((_SLOTS, 3, PY, ZS), jnp.float32),
                pltpu.SemaphoreType.DMA((6, _SLOTS)),
            ]
            + (
                # parity-double-buffered x-lo save planes (flattened
                # (parity, strip) leading index; see the kernel's save/read)
                [pltpu.VMEM((2 * NCY, 27, PY, ZS), f_dtype),
                 pltpu.VMEM((2 * NCY, 27, 8, ZS), f_dtype)]
                if alias_f else []
            ),
        )
        est = _chunks_2d_vmem_est(PX, PY, ZS, f_bytes, YS=YS,
                                  alias_f=alias_f)
        fo, rho, vo = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((27, XL, YS, ZS), f_dtype),
                jax.ShapeDtypeStruct((XL, YS, ZS), jnp.float32),
                jax.ShapeDtypeStruct((3, XL, YS, ZS), jnp.float32),
            ],
            # f's flattened-input index (after the scalar-prefetch args)
            input_output_aliases={n_scalar: 0} if alias_f else {},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=min(
                    100 * 2**20, int(est * VMEM_DECL_SCALE) + VMEM_DECL_PAD
                ),
            ),
            interpret=interpret,
        )(
            jnp.asarray(u_inlet, jnp.float32).reshape(1),
            jnp.asarray(t_seed, jnp.int32).reshape(1),
            *(
                (jnp.asarray(x_off, jnp.int32).reshape(1),) if sharded else ()
            ),
            f,
            vel,
            statics3d["obstacle_u8"],
            statics3d["sponge3d"],
            statics3d["wall3d"],
            *edge_vals,
        )
        return fo, rho, vo

    step.g_native = g_native
    step.iface_pair = False
    step.bz_folded = False
    step.chunk_dims = (PX, PY)
    return step


def choose_flat_px(XL: int, M: int, f_bytes: int):
    """Valid PX for make_pallas_step_flat, or None if the flat layout cannot
    run on this shape.  Mosaic requires the sublane block dim to be a
    multiple of 8 (or the whole array dim), so only 16 and 8 are candidates
    — round 3's auto-try list included 4 and 2, which lower ONLY when
    XL == PX and crash otherwise (hit by a 112-x f32 level at M=11520).
    Shared by the kernel, the solver's availability guard, and the patch
    builder's flat_yz gate so all three agree on what can run."""
    per = (_SLOTS * (27 * f_bytes + 12) + 2 * 9 + 2 * (27 * f_bytes + 16)) * M
    for cand in (16, 8):
        if XL % cand == 0 and cand * per < 36 * 2**20:
            return cand
    # nothing under the perf budget: PX=8 still lowers while the footprint
    # stays under the hard VMEM ceiling (~128 MiB, keep headroom)
    if XL % 8 == 0 and 8 * per < 100 * 2**20:
        return 8
    if XL % 16 == 0 and 16 * per < 100 * 2**20:
        return 16
    return None


def make_pallas_step_flat(
    patch: PatchLevel,
    *,
    c_wale: float,
    nu_sgs_background: float,
    inlet_turbulence: float,
    wall_model: bool,
    sponge_blend: bool,
    interpret: bool = False,
    planes_per_step: int = 0,
    store_bf16: bool = False,
    alias_f: bool = False,
    shard_nx: int = 1,
):
    """make_pallas_step for the flat-(y,z) state layout (PatchLevel.flat_yz):
    arrays are (27|3|1, XS, M) with flat index n = y*Z + z over INTERIOR y/z
    and M = ceil(Y*Z, 128).  Small transverse extents then pad the lane axis
    ONCE instead of per-z-row (the Re1M bench coarse level is (64, 56, 56):
    3-D layout stores 56 of every 128 lanes; flat stores 3136 of 3200).

    Only levels with NO interface faces qualify: the y/z streaming shifts
    collapse to ONE flat lane roll by cy*Z + cz, whose cross-row artifacts
    (a z-wrap bleeding into the adjacent y row, a y-wrap bleeding through the
    pad tail) land exactly on the destination rows the direction's y/z
    boundary masks overwrite — inlet/outlet/mirror masks cover every such
    row, interface ghost rows would not.  Physics per cell is identical to
    make_pallas_step (same collide_math, same BC forms, same rotating-window
    x DMA pipeline); only the index algebra changes.
    """
    XS = patch.padded[0]
    X, Y, Z = patch.interior
    M, M0 = patch.flat_m, patch.flat_m0
    fb = patch.face_bc
    assert BC_INTERFACE not in fb, "flat layout requires interface-free faces"
    sharded = shard_nx > 1
    assert XS % shard_nx == 0, (XS, shard_nx)
    XL = XS // shard_nx
    f_dtype = jnp.bfloat16 if store_bf16 else jnp.float32
    f_bytes = 2 if store_bf16 else 4
    g_native = store_bf16

    def dec(x, k):
        return x.astype(jnp.float32) if store_bf16 else x

    def enc(x, k):
        return x.astype(jnp.bfloat16) if store_bf16 else x

    if planes_per_step:
        PX = planes_per_step
    elif PX_OVERRIDE.get(patch.level_id):
        PX = PX_OVERRIDE[patch.level_id]
    else:
        # flat levels favor LARGER chunks than the 3-D kernel's (8, 4, 2):
        # the Re1M bench coarse level measured 1473 -> 1304 us/coarse going
        # PX 8 -> 16 (interleaved A/B, tools/probe_coarse --px "1:8;1:16")
        # — per-chunk DMA/dispatch overhead dominates at M-wide flat planes
        PX = choose_flat_px(XL, M, f_bytes)
        assert PX is not None, (
            "flat layout unavailable at this shape — the builder's flat_yz "
            "gate (core.patch._use_flat_yz) should have declined it")
    assert XL % PX == 0, (XL, PX)
    # Mosaic sublane-block validity: PX is the second-to-last block dim of
    # the rank-2 (XS, M) refs
    assert PX % 8 == 0 or PX == XL, (PX, XL)
    NCH = XL // PX

    def kernel(u_ref, seed_ref, *pre_rest):
        if sharded:
            xoff_ref, *pre_rest = pre_rest
        f_hbm, vel_hbm = pre_rest[0], pre_rest[1]  # ANY (manual DMA)
        obstacle_ref, sponge_ref, wall_ref = pre_rest[2:5]  # (PX, M) VMEM
        rest = pre_rest[5:]
        off = 0
        if sharded:
            fe_ref, ve_ref = rest[off], rest[off + 1]  # (27|3, 2, M)
            off += 2
        fout_ref, rho_ref, velout_ref = rest[off : off + 3]
        fwin, vwin, sems = rest[off + 3 :]

        ci = pl.program_id(0)
        lix2 = jax.lax.broadcasted_iota(jnp.int32, (PX, M), 0) + ci * PX
        ix2 = lix2 + xoff_ref[0] if sharded else lix2
        nidx = jax.lax.broadcasted_iota(jnp.int32, (1, M), 1)
        ify = nidx // Z  # pad slots get y >= Y: matched by NO face mask,
        ifz = nidx - ify * Z  # their output is the obstacle branch (don't-care)

        def start_dma(chunk):
            slot = chunk % _SLOTS
            pltpu.make_async_copy(
                f_hbm.at[:, pl.ds(chunk * PX, PX)], fwin.at[slot],
                sems.at[0, slot],
            ).start()
            pltpu.make_async_copy(
                vel_hbm.at[:, pl.ds(chunk * PX, PX)], vwin.at[slot],
                sems.at[1, slot],
            ).start()

        def wait_dma(chunk):
            slot = chunk % _SLOTS
            pltpu.make_async_copy(
                f_hbm.at[:, pl.ds(chunk * PX, PX)], fwin.at[slot],
                sems.at[0, slot],
            ).wait()
            pltpu.make_async_copy(
                vel_hbm.at[:, pl.ds(chunk * PX, PX)], vwin.at[slot],
                sems.at[1, slot],
            ).wait()

        @pl.when(ci == 0)
        def _warmup():
            start_dma(jnp.int32(0))
            if NCH > 1:
                start_dma(jnp.int32(1))
            wait_dma(jnp.int32(0))
            if NCH > 1:
                wait_dma(jnp.int32(1))

        @pl.when(ci + 2 <= NCH - 1)
        def _prefetch():
            start_dma(ci + 2)

        @pl.when((ci >= 1) & (ci + 1 <= NCH - 1))
        def _await_next():
            wait_dma(ci + 1)

        u_inlet = u_ref[0]
        t_seed = seed_ref[0]

        c_prev = jnp.maximum(ci - 1, 0)
        c_next = jnp.minimum(ci + 1, NCH - 1)
        f_prev_ch = fwin.at[c_prev % _SLOTS]
        f_cur_ch = fwin.at[ci % _SLOTS]
        f_next_ch = fwin.at[c_next % _SLOTS]
        v_prev_ch = vwin.at[c_prev % _SLOTS]
        v_cur_ch = vwin.at[ci % _SLOTS]
        v_next_ch = vwin.at[c_next % _SLOTS]

        if fb[0] == BC_INLET:
            gy1 = ify + (patch.lo[1] + 1)
            gz1 = ifz + (patch.lo[2] + 1)
            if inlet_turbulence > 0.0:
                noise = cm.hash_noise(gy1, gz1, t_seed)
                u_inst = u_inlet + noise * jnp.float32(inlet_turbulence) * u_inlet
            else:
                u_inst = jnp.broadcast_to(u_inlet, (1, M)).astype(jnp.float32)
            base1 = 0.0 if g_native else 1.0
            inlet_factor = base1 + 3.0 * u_inst + 3.0 * u_inst * u_inst
        else:
            inlet_factor = None

        def face_value(k, face):
            bc = fb[face]
            if bc == BC_INLET:
                return float(lat.W[k]) * inlet_factor
            if bc == BC_OUTLET:
                cu = float(lat.C_X[k]) * u_inlet
                return float(lat.W[k]) * (
                    (0.0 if g_native else 1.0)
                    + 3.0 * cu + 4.5 * cu * cu - 1.5 * u_inlet * u_inlet
                )
            if bc == BC_MIRROR_Y:
                return dec(f_cur_ch[int(lat.MIRROR_Y[k])], k)
            if bc == BC_MIRROR_Z:
                return dec(f_cur_ch[int(lat.MIRROR_Z[k])], k)
            raise AssertionError(bc)

        def shift_flat(a, sy: int, sz: int):
            """out[., n] = a[., n - sy*Z - sz]: the 2-D (y, z) shift as one
            lane roll.  Cross-row and pad-tail artifacts land only on y/z
            boundary destination rows, all overwritten below."""
            s = sy * Z + sz
            return jnp.roll(a, s, axis=-1) if s else a

        streamed = []
        for k in range(27):
            cx, cy, cz = int(lat.C_X[k]), int(lat.C_Y[k]), int(lat.C_Z[k])
            if cx == 0:
                src = f_cur_ch[k]
            elif cx == 1:
                if PX > 1:
                    src = jnp.concatenate(
                        [f_prev_ch[k, PX - 1 :], f_cur_ch[k, : PX - 1]], axis=0
                    )
                else:
                    src = f_prev_ch[k]
            else:
                if PX > 1:
                    src = jnp.concatenate(
                        [f_cur_ch[k, 1:], f_next_ch[k, :1]], axis=0
                    )
                else:
                    src = f_next_ch[k]
            val = dec(shift_flat(src, cy, cz), k)
            if sharded and cx == 1:
                ev = dec(shift_flat(fe_ref[k, 0], cy, cz), k)[None]
                val = jnp.where(lix2 == 0, ev, val)
            elif sharded and cx == -1:
                ev = dec(shift_flat(fe_ref[k, 1], cy, cz), k)[None]
                val = jnp.where(lix2 == XL - 1, ev, val)
            if cz > 0:
                val = jnp.where(ifz == 0, face_value(k, 4), val)
            elif cz < 0:
                val = jnp.where(ifz == Z - 1, face_value(k, 5), val)
            if cy > 0:
                val = jnp.where(ify == 0, face_value(k, 2), val)
            elif cy < 0:
                val = jnp.where(ify == Y - 1, face_value(k, 3), val)
            if cx < 0:
                val = jnp.where(ix2 == X - 1, face_value(k, 1), val)
            elif cx > 0:
                val = jnp.where(ix2 == 0, face_value(k, 0), val)
            streamed.append(val)

        def vel_nbr(dx, dy, dz):
            if dx == 0:
                src = v_cur_ch[:]
            elif dx == -1:
                if PX > 1:
                    src = jnp.concatenate(
                        [v_prev_ch[:, PX - 1 :], v_cur_ch[:, : PX - 1]], axis=1
                    )
                else:
                    src = v_prev_ch[:]
            else:
                if PX > 1:
                    src = jnp.concatenate(
                        [v_cur_ch[:, 1:], v_next_ch[:, :1]], axis=1
                    )
                else:
                    src = v_next_ch[:]
            r = shift_flat(src, -dy, -dz)
            if sharded and dx == -1:
                ev = shift_flat(ve_ref[:, 0], -dy, -dz)[:, None]
                r = jnp.where(lix2 == 0, ev, r)
            elif sharded and dx == 1:
                ev = shift_flat(ve_ref[:, 1], -dy, -dz)[:, None]
                r = jnp.where(lix2 == XL - 1, ev, r)
            own = v_cur_ch[:]
            if dx > 0:
                r = jnp.where(ix2 == X - 1, own, r)
            elif dx < 0:
                r = jnp.where(ix2 == 0, own, r)
            if dy > 0:
                r = jnp.where(ify == Y - 1, own, r)
            elif dy < 0:
                r = jnp.where(ify == 0, own, r)
            if dz > 0:
                r = jnp.where(ifz == Z - 1, own, r)
            elif dz < 0:
                r = jnp.where(ifz == 0, own, r)
            return r

        nbrs = (
            vel_nbr(1, 0, 0), vel_nbr(-1, 0, 0),
            vel_nbr(0, 1, 0), vel_nbr(0, -1, 0),
            vel_nbr(0, 0, 1), vel_nbr(0, 0, -1),
        )

        kw = dict(
            tau=patch.tau,
            c_wale=c_wale,
            nu_sgs_background=nu_sgs_background,
            wall_model=wall_model,
            sponge_blend=sponge_blend,
        )
        if g_native:
            kw["g_shifted"] = True
        f_out, rho_out, vel_out = cm.collide_unrolled_v2(
            streamed, nbrs, obstacle_ref[:] != 0,
            sponge_ref[:], wall_ref[:], u_inlet, **kw,
        )
        for k in range(27):
            fout_ref[k] = enc(f_out[k], k)
        rho_ref[:] = rho_out
        velout_ref[:] = vel_out

    n_scalar = 2 + (1 if sharded else 0)

    def step(f, vel, u_inlet, t_seed, statics3d, iface=None,
             edges=None, x_off=None, nsub=None):
        assert not iface, "flat levels have no interface faces"
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=n_scalar,
            grid=(NCH,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # f
                pl.BlockSpec(memory_space=pl.ANY),  # vel
                pl.BlockSpec((PX, M), lambda i, *_: (i, 0)),
                pl.BlockSpec((PX, M), lambda i, *_: (i, 0)),
                pl.BlockSpec((PX, M), lambda i, *_: (i, 0)),
            ]
            + (
                [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2 if sharded else []
            ),
            out_specs=[
                pl.BlockSpec((27, PX, M), lambda i, *_: (0, i, 0)),
                pl.BlockSpec((PX, M), lambda i, *_: (i, 0)),
                pl.BlockSpec((3, PX, M), lambda i, *_: (0, i, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((_SLOTS, 27, PX, M), f_dtype),
                pltpu.VMEM((_SLOTS, 3, PX, M), jnp.float32),
                pltpu.SemaphoreType.DMA((2, _SLOTS)),
            ],
        )
        plane = PX * M
        est = (
            _SLOTS * (27 * f_bytes + 3 * 4) * plane
            + 2 * (1 + 4 + 4) * plane
            + 2 * (27 * f_bytes + 4 + 3 * 4) * plane
        )
        fo, rho, vo = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((27, XL, M), f_dtype),
                jax.ShapeDtypeStruct((XL, M), jnp.float32),
                jax.ShapeDtypeStruct((3, XL, M), jnp.float32),
            ],
            input_output_aliases={n_scalar: 0} if alias_f else {},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=min(
                    100 * 2**20, int(est * VMEM_DECL_SCALE) + VMEM_DECL_PAD
                ),
            ),
            interpret=interpret,
        )(
            jnp.asarray(u_inlet, jnp.float32).reshape(1),
            jnp.asarray(t_seed, jnp.int32).reshape(1),
            *(
                (jnp.asarray(x_off, jnp.int32).reshape(1),) if sharded else ()
            ),
            f,
            vel,
            statics3d["obstacle_u8"],
            statics3d["sponge3d"],
            statics3d["wall3d"],
            *(edges if sharded else ()),
        )
        return fo, rho, vo

    step.g_native = g_native
    step.iface_pair = False
    step.bz_folded = False
    step.flat = True
    return step
