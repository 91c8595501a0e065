"""Multi-chip spatial domain decomposition via shard_map + ppermute.

The reference is strictly single-GPU (SURVEY.md section 2.6); the TPU-native
scaling story for a block-sparse LBM is 1-D slab decomposition of the block
list over a device mesh with halo exchange of boundary block columns over ICI:

  - blocks are assigned to shards by whole bx-columns (a block's 26 neighbors
    then live on the same shard or an adjacent one), padded to equal count;
  - each step, every shard ships its first/last bx-column blocks to its
    neighbors with jax.lax.ppermute (two bidirectional ICI hops);
  - the streaming fixup gather reads from [local f ; recv_left ; recv_right]
    using per-shard index tables carried as sharded data (SPMD-uniform code,
    per-shard indices).

All topology is static, so the per-shard plans are precomputed on host and
stacked into (n_shards, ...) arrays sharded on axis 0.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import lattice as lat
from ..domain.builder import LevelGeometry

BLOCK_CELLS = 512


def _pad_to(arr: np.ndarray, n: int, fill) -> np.ndarray:
    out = np.full((n,) + arr.shape[1:], fill, arr.dtype)
    out[: len(arr)] = arr
    return out


@dataclass
class ShardedLevel:
    """Host-side sharded plan for one level."""

    n_shards: int
    nbp: int  # padded blocks per shard
    col_max: int  # max blocks in a boundary column (halo buffer size)
    # (n_shards, nbp) global block id or -1 for padding
    block_of: np.ndarray
    # (n_shards, col_max) local block ids to send left/right (-1 pad)
    send_left: np.ndarray
    send_right: np.ndarray
    # per-shard fixup plan, stacked + padded
    scatter_dst: np.ndarray  # (n_shards, n_fix_max) into local f space; pad -> dump slot
    gather_src: np.ndarray  # (n_shards, n_fix_max) into [local|recvL|recvR|const] space
    const_vals: np.ndarray  # (n_shards, n_fix_max) value used when src == CONST slot
    src_kind: np.ndarray  # (n_shards, n_fix_max) 0=gather 1=inlet 2=outlet 3=const 4=pad
    inlet_gy: np.ndarray
    inlet_gz: np.ndarray
    k_of: np.ndarray  # (n_shards, n_fix_max) direction of the pair
    obstacle: np.ndarray  # (n_shards, nbp, 512)
    sponge: np.ndarray
    wall_dist: np.ndarray


def build_sharded_level(geo: LevelGeometry, n_shards: int) -> ShardedLevel:
    """Column-aligned slab partition of one level + per-shard fixup plans."""
    coords = geo.coords
    nb = geo.n_blocks
    bx = coords[:, 0]
    # split whole bx-columns into n_shards groups with balanced block counts
    cols, col_counts = np.unique(bx, return_counts=True)
    target = nb / n_shards
    col_shard = np.minimum(
        (np.cumsum(col_counts) - 1) // max(int(np.ceil(target)), 1), n_shards - 1
    )
    # greedy: assign columns sequentially, moving to next shard when full
    col_shard = np.zeros(len(cols), np.int64)
    acc, s = 0, 0
    for i, c in enumerate(col_counts):
        if acc >= target and s < n_shards - 1:
            s += 1
            acc = 0
        col_shard[i] = s
        acc += c
    shard_of_block = col_shard[np.searchsorted(cols, bx)]

    members = [np.nonzero(shard_of_block == s)[0] for s in range(n_shards)]
    nbp = max(max(len(m) for m in members), 1)
    block_of = np.stack([_pad_to(m.astype(np.int64), nbp, -1) for m in members])

    # local id of each global block within its shard
    local_id = np.full(nb, -1, np.int64)
    for s, m in enumerate(members):
        local_id[m] = np.arange(len(m))

    # boundary columns
    send_left_l, send_right_l = [], []
    for s, m in enumerate(members):
        if len(m) == 0:
            send_left_l.append(np.zeros(0, np.int64))
            send_right_l.append(np.zeros(0, np.int64))
            continue
        bxs = bx[m]
        send_left_l.append(local_id[m[bxs == bxs.min()]])
        send_right_l.append(local_id[m[bxs == bxs.max()]])
    col_max = max(max(len(a) for a in send_left_l), max(len(a) for a in send_right_l), 1)
    send_left = np.stack([_pad_to(a, col_max, -1) for a in send_left_l])
    send_right = np.stack([_pad_to(a, col_max, -1) for a in send_right_l])

    # position of each global block inside the neighbor's send buffer
    # (so remote reads know the slot in recv_left / recv_right)
    slot_in_left_send = np.full(nb, -1, np.int64)  # slot when shipped rightwards
    slot_in_right_send = np.full(nb, -1, np.int64)
    for s, m in enumerate(members):
        for j, lid in enumerate(send_right[s]):
            if lid >= 0:
                slot_in_right_send[m[lid]] = j
        for j, lid in enumerate(send_left[s]):
            if lid >= 0:
                slot_in_left_send[m[lid]] = j

    # --- per-shard fixup plans -------------------------------------------
    nbr = geo.neighbor_table.astype(np.int64)
    nx_g, ny_g, nz_g = geo.grid_cells
    KIND_GATHER, KIND_INLET, KIND_OUTLET, KIND_CONST, KIND_PAD = range(5)

    per_shard = []
    for s in range(n_shards):
        m = members[s]
        rec_dst, rec_src, rec_kind, rec_cv, rec_gy, rec_gz, rec_k = (
            [], [], [], [], [], [], [])
        # virtual space layout: [local nbp*512*27 | recvL col_max*512*27 |
        #                        recvR col_max*512*27]
        local_sz = 27 * nbp * BLOCK_CELLS
        recv_sz = 27 * col_max * BLOCK_CELLS
        for k in range(27):
            if k == 13:
                continue
            from ..core.plan import _crossing_template

            cells, sx, sy, sz = _crossing_template(k)
            if len(cells) == 0 or len(m) == 0:
                continue
            offx = np.where(sx < 0, -1, np.where(sx > 7, 1, 0))
            offy = np.where(sy < 0, -1, np.where(sy > 7, 1, 0))
            offz = np.where(sz < 0, -1, np.where(sz > 7, 1, 0))
            d = (offx + 1) + 3 * (offy + 1) + 9 * (offz + 1)
            wrap = (sz % 8) * 64 + (sy % 8) * 8 + (sx % 8)

            gblocks = m  # global ids of this shard's real blocks
            nb_id = nbr[gblocks][:, d]  # (ml, ncell) global neighbor ids
            lids = np.arange(len(m))
            dst = (k * nbp + lids[:, None]) * BLOCK_CELLS + cells[None, :]

            has = nb_id >= 0
            nb_shard = np.where(has, shard_of_block[np.maximum(nb_id, 0)], -9)
            nb_local = np.where(has, local_id[np.maximum(nb_id, 0)], 0)
            same = has & (nb_shard == s)
            from_left = has & (nb_shard == s - 1)
            from_right = has & (nb_shard == s + 1)

            src = np.zeros_like(dst)
            src = np.where(same, (k * nbp + nb_local) * BLOCK_CELLS + wrap[None, :], src)
            # remote: slot within the neighbor's send buffer
            slotL = slot_in_right_send[np.maximum(nb_id, 0)]  # left nbr ships its right col
            slotR = slot_in_left_send[np.maximum(nb_id, 0)]
            src = np.where(
                from_left,
                local_sz + (k * col_max + slotL) * BLOCK_CELLS + wrap[None, :],
                src,
            )
            src = np.where(
                from_right,
                local_sz + recv_sz + (k * col_max + slotR) * BLOCK_CELLS + wrap[None, :],
                src,
            )
            kind = np.where(has, KIND_GATHER, KIND_CONST)

            # boundary classification for missing neighbors
            miss = ~has
            if miss.any():
                bsel, csel = np.nonzero(miss)
                from ..core.plan import _LX, _LY, _LZ

                gcoords = coords[gblocks[bsel]]
                gx = gcoords[:, 0] * 8 + _LX[cells[csel]]
                gy = gcoords[:, 1] * 8 + _LY[cells[csel]]
                gz = gcoords[:, 2] * 8 + _LZ[cells[csel]]
                sgx, sgy, sgz = gx - lat.C_X[k], gy - lat.C_Y[k], gz - lat.C_Z[k]
                inlet = sgx < 0
                outlet = ~inlet & (sgx >= nx_g)
                ymir = ~inlet & ~outlet & ((sgy < 0) | (sgy >= ny_g))
                zmir = ~inlet & ~outlet & ~ymir & ((sgz < 0) | (sgz >= nz_g))
                kindm = np.full(len(bsel), KIND_CONST)
                kindm[inlet] = KIND_INLET
                kindm[outlet] = KIND_OUTLET
                srcm = np.zeros(len(bsel), np.int64)
                own = lids[bsel] * BLOCK_CELLS + cells[csel]
                srcm[ymir] = (lat.MIRROR_Y[k] * nbp) * BLOCK_CELLS + own[ymir]
                srcm[zmir] = (lat.MIRROR_Z[k] * nbp) * BLOCK_CELLS + own[zmir]
                kindm[ymir | zmir] = KIND_GATHER
                kind[miss] = kindm
                src[miss] = srcm
                gys = np.zeros_like(dst)
                gzs = np.zeros_like(dst)
                gys_m = np.zeros(len(bsel), np.int64)
                gzs_m = np.zeros(len(bsel), np.int64)
                gys_m[:] = gy + 1
                gzs_m[:] = gz + 1
                gys[miss] = gys_m
                gzs[miss] = gzs_m
            else:
                gys = np.zeros_like(dst)
                gzs = np.zeros_like(dst)

            rec_dst.append(dst.ravel())
            rec_src.append(src.ravel())
            rec_kind.append(kind.ravel())
            rec_cv.append(np.full(dst.size, lat.W[k], np.float32))
            rec_gy.append(gys.ravel())
            rec_gz.append(gzs.ravel())
            rec_k.append(np.full(dst.size, k, np.int64))

        if rec_dst:
            per_shard.append(
                tuple(np.concatenate(x) for x in
                      (rec_dst, rec_src, rec_kind, rec_cv, rec_gy, rec_gz, rec_k))
            )
        else:
            per_shard.append(tuple(np.zeros(0, t) for t in
                                   (np.int64, np.int64, np.int64, np.float32,
                                    np.int64, np.int64, np.int64)))

    n_fix_max = max(max(len(p[0]) for p in per_shard), 1)
    dump = 27 * nbp * BLOCK_CELLS  # scatter dump slot (extra element)

    def stack(i, fill, dtype):
        return np.stack(
            [_pad_to(p[i].astype(dtype), n_fix_max, fill) for p in per_shard]
        )

    # fields per shard
    def field(arr, fill):
        out = np.full((n_shards, nbp, BLOCK_CELLS), fill, arr.dtype)
        for s, m in enumerate(members):
            out[s, : len(m)] = arr[m]
        return out

    return ShardedLevel(
        n_shards=n_shards,
        nbp=nbp,
        col_max=col_max,
        block_of=block_of,
        send_left=np.maximum(send_left, 0),
        send_right=np.maximum(send_right, 0),
        scatter_dst=stack(0, dump, np.int64).astype(np.int32),
        gather_src=stack(1, 0, np.int64).astype(np.int32),
        src_kind=stack(2, 4, np.int64).astype(np.int32),
        const_vals=stack(3, 0.0, np.float32),
        inlet_gy=stack(4, 0, np.int64).astype(np.int32),
        inlet_gz=stack(5, 0, np.int64).astype(np.int32),
        k_of=stack(6, 13, np.int64).astype(np.int32),
        obstacle=field(geo.obstacle, True),
        sponge=field(geo.sponge, np.float32(0.0)),
        wall_dist=field(geo.wall_dist, np.float32(100.0)),
    )


def make_sharded_step(
    sl: ShardedLevel,
    mesh: Mesh,
    *,
    tau: float,
    c_wale: float,
    nu_sgs_background: float,
    inlet_turbulence: float,
    wall_model: bool,
    sponge_blend: bool,
):
    """Returns a jitted sharded step fn over mesh axis 'x':
    (f, vel, u_inlet, t_seed) -> (f', rho, vel')."""
    from jax import shard_map

    axis = "x"
    nbp, col_max = sl.nbp, sl.col_max
    n_fix = sl.scatter_dst.shape[1]

    consts = {
        "scatter_dst": sl.scatter_dst,
        "gather_src": sl.gather_src,
        "src_kind": sl.src_kind,
        "const_vals": sl.const_vals,
        "inlet_gy": sl.inlet_gy,
        "inlet_gz": sl.inlet_gz,
        "k_of": sl.k_of,
        "send_left": sl.send_left.astype(np.int32),
        "send_right": sl.send_right.astype(np.int32),
        "obstacle": sl.obstacle,
        "sponge": sl.sponge,
        "wall_dist": sl.wall_dist,
    }
    sharded_consts = {
        k: jax.device_put(jnp.asarray(v), NamedSharding(mesh, P(axis)))
        for k, v in consts.items()
    }

    from ..ops.stream_collide import _CX, _W, _hash_noise, _inlet_eq_1d, _OPP, _C, _PI_MAT, _REG_MAT

    n_shards = sl.n_shards

    def local_step(f, vel, u_inlet, t_seed, cst):
        # f: (1?, 27, nbp, 512) per-shard slice -> squeeze shard axis
        f = f[0]
        vel = vel[0]
        c = {k: v[0] for k, v in cst.items()}

        # halo exchange: ship whole boundary columns both ways
        send_r = f[:, c["send_right"], :]  # (27, col_max, 512)
        send_l = f[:, c["send_left"], :]
        # full-ring permutations (ppermute requires a bijection); the wrapped
        # deliveries land on edge shards whose plans never reference the
        # recv buffers, so no masking is needed
        perm_r = [(i, (i + 1) % n_shards) for i in range(n_shards)]
        perm_l = [((i + 1) % n_shards, i) for i in range(n_shards)]
        recv_left = jax.lax.ppermute(send_r, axis, perm_r)  # from s-1
        recv_right = jax.lax.ppermute(send_l, axis, perm_l)  # from s+1

        N = nbp * BLOCK_CELLS
        f_str = jnp.stack(
            [jnp.roll(f[k], int(lat.OFF[k]), axis=-1) for k in range(27)]
        ).reshape(27 * N)

        virtual = jnp.concatenate(
            [f.reshape(-1), recv_left.reshape(-1), recv_right.reshape(-1)]
        )
        gathered = virtual[c["gather_src"]]
        kk = c["k_of"]
        if inlet_turbulence > 0.0:
            noise = _hash_noise(c["inlet_gy"], c["inlet_gz"], t_seed)
            u_inst = u_inlet + noise * jnp.float32(inlet_turbulence) * u_inlet
        else:
            u_inst = jnp.broadcast_to(u_inlet, kk.shape).astype(jnp.float32)
        vals_inlet = _inlet_eq_1d(_CX[kk], _W[kk], u_inst)
        vals_outlet = _inlet_eq_1d(_CX[kk], _W[kk], jnp.broadcast_to(u_inlet, kk.shape).astype(jnp.float32))
        kind = c["src_kind"]
        vals = jnp.where(
            kind == 0, gathered,
            jnp.where(kind == 1, vals_inlet,
                      jnp.where(kind == 2, vals_outlet, c["const_vals"])),
        )
        # pad entries (kind 4) go to the dump slot
        f_ext = jnp.concatenate([f_str, jnp.zeros((1,), f.dtype)])
        f_ext = f_ext.at[c["scatter_dst"]].set(
            jnp.where(kind == 4, 0.0, vals), unique_indices=True
        )
        f_str = f_ext[: 27 * N].reshape(27, N)

        # ---- collision (same math as ops.stream_collide, local arrays) ----
        f_bb = f_str[_OPP]
        rho_raw = jnp.maximum(jnp.sum(f_str, axis=0), 0.01)
        jmom = jnp.dot(_C, f_str, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        inv_rho_raw = 1.0 / rho_raw
        u = jmom * inv_rho_raw
        sp = c["sponge"].reshape(N)
        one_m = 1.0 - sp
        rho = rho_raw * one_m + sp
        u = jnp.stack([u[0] * one_m + u_inlet * sp, u[1] * one_m, u[2] * one_m])
        if sponge_blend:
            feq_t = _inlet_eq_1d(_CX, _W, u_inlet)
            f_str = f_str * one_m[None] + feq_t[:, None] * sp[None]
        # (wall model / WALE omitted in the sharded single-level path v1:
        #  gradients need a velocity halo exchange — planned follow-up; the
        #  collision runs with the background eddy viscosity only)
        omega = 1.0 / max(tau + 3.0 * nu_sgs_background, 0.500001)
        cu = jnp.dot(_C.T, u, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        usq = jnp.sum(u * u, axis=0)
        feq = rho[None] * _W[:, None] * (1 + 3 * cu + 4.5 * cu * cu - 1.5 * usq)
        fneq = f_str - feq
        pi6 = jnp.dot(_PI_MAT, fneq, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
        freg = jnp.dot(_REG_MAT, pi6, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        f_coll = feq + (1.0 - omega) * freg
        obs = c["obstacle"].reshape(N)
        f_out = jnp.where(obs[None], f_bb, f_coll)
        rho_out = jnp.where(obs, 1.0, rho)
        vel_out = jnp.where(obs[None], 0.0, u)
        return (
            f_out.reshape(1, 27, nbp, BLOCK_CELLS),
            rho_out.reshape(1, nbp, BLOCK_CELLS),
            vel_out.reshape(1, 3, nbp, BLOCK_CELLS),
        )

    sm = shard_map(
        partial(local_step),
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(), P(),
                  {k: P(axis) for k in consts}),
        out_specs=(P(axis), P(axis), P(axis)),
    )

    @jax.jit
    def step(f, vel, u_inlet, t_seed):
        return sm(f, vel, u_inlet, t_seed, sharded_consts)

    return step, sharded_consts
