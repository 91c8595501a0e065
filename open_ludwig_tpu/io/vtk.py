"""Minimal VTK XML (.vtu) writer + flow-field / surface exporters.

Replaces the reference's WriteVTK.jl usage (reference: src/io_vtk.jl,
src/forces/io.jl:26-82) with a self-contained writer: inline base64 binary
DataArrays, VTK_VOXEL cells for block flow fields, VTK_TRIANGLE cells for the
surface.  Blocks fully covered by 8 finer children are skipped
(reference: src/io_vtk.jl:27-47); NaN/Inf are scrubbed before writing
(reference: src/io_vtk.jl:112-113).
"""

from __future__ import annotations

import base64
import logging
import os
import struct
import zlib
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..config import OutputFields
from ..domain.builder import LevelGeometry

log = logging.getLogger("open_ludwig_tpu")

BLOCK_EDGE = 8
VTK_VOXEL = 11
VTK_TRIANGLE = 5

#: zlib-compressed appended blocks, matching the reference's WriteVTK default
#: (reference: src/io_vtk.jl:123 writes compressed .vtu); flow fields at
#: production resolution are multi-GB uncompressed.  Set False for plain
#: base64 (useful when diffing outputs byte-wise in tests).
COMPRESS = True


def _b64(arr: np.ndarray) -> str:
    raw = np.ascontiguousarray(arr).tobytes()
    if COMPRESS:
        # VTK XML compressed format: one block; the UInt32[4] block header
        # [nblocks, blocksize, last_blocksize, compressed_size] is base64
        # encoded SEPARATELY from the compressed payload
        comp = zlib.compress(raw, 6)
        head = struct.pack("<4I", 1, len(raw), len(raw), len(comp))
        return (base64.b64encode(head) + base64.b64encode(comp)).decode()
    return base64.b64encode(struct.pack("<I", len(raw)) + raw).decode()


_VTK_TYPE = {
    np.dtype(np.float32): "Float32",
    np.dtype(np.float64): "Float64",
    np.dtype(np.int32): "Int32",
    np.dtype(np.int64): "Int64",
    np.dtype(np.uint8): "UInt8",
}


def write_vtu(
    path: str,
    points: np.ndarray,  # (n_pts, 3) float32
    connectivity: np.ndarray,  # (n_cells, verts_per_cell) int
    cell_type: int,
    cell_data: Dict[str, np.ndarray],
) -> None:
    n_pts = len(points)
    n_cells = len(connectivity)
    vpc = connectivity.shape[1]
    offsets = (np.arange(1, n_cells + 1, dtype=np.int32)) * vpc
    types = np.full(n_cells, cell_type, np.uint8)

    compressor = (
        ' compressor="vtkZLibDataCompressor"' if COMPRESS else ""
    )
    parts = [
        '<?xml version="1.0"?>',
        '<VTKFile type="UnstructuredGrid" version="0.1" '
        f'byte_order="LittleEndian" header_type="UInt32"{compressor}>',
        "<UnstructuredGrid>",
        f'<Piece NumberOfPoints="{n_pts}" NumberOfCells="{n_cells}">',
        "<Points>",
        '<DataArray type="Float32" NumberOfComponents="3" format="binary">',
        _b64(points.astype(np.float32)),
        "</DataArray>",
        "</Points>",
        "<Cells>",
        '<DataArray type="Int32" Name="connectivity" format="binary">',
        _b64(connectivity.astype(np.int32)),
        "</DataArray>",
        '<DataArray type="Int32" Name="offsets" format="binary">',
        _b64(offsets),
        "</DataArray>",
        '<DataArray type="UInt8" Name="types" format="binary">',
        _b64(types),
        "</DataArray>",
        "</Cells>",
        "<CellData>",
    ]
    for name, arr in cell_data.items():
        arr = np.asarray(arr)
        ncomp = 1 if arr.ndim == 1 else arr.shape[1]
        vtype = _VTK_TYPE[arr.dtype]
        parts.append(
            f'<DataArray type="{vtype}" Name="{name}" '
            f'NumberOfComponents="{ncomp}" format="binary">'
        )
        parts.append(_b64(arr))
        parts.append("</DataArray>")
    parts += ["</CellData>", "</Piece>", "</UnstructuredGrid>", "</VTKFile>"]
    with open(path, "w") as f:
        f.write("\n".join(parts))


# local cell decomposition (flat = lz*64 + ly*8 + lx)
_LF = np.arange(512)
_LX, _LY, _LZ = _LF % 8, (_LF // 8) % 8, _LF // 64


def export_flow_vtu(
    path: str,
    levels: List[LevelGeometry],
    states: List[Dict],
    fields: OutputFields,
) -> None:
    """Merged multi-level flow field, one voxel cell per lattice cell."""
    # mark blocks fully covered by children (skip exporting them)
    blocks = []  # (lvl_idx, block_id)
    for li, geo in enumerate(levels):
        if li + 1 < len(levels):
            nxt = levels[li + 1]
            child_mask = np.zeros(geo.dims, np.int8)
            # count children per parent block
            cnt = np.zeros(geo.dims, np.int32)
            par = nxt.coords // 2
            np.add.at(cnt, (par[:, 0], par[:, 1], par[:, 2]), 1)
            covered = cnt[geo.coords[:, 0], geo.coords[:, 1], geo.coords[:, 2]] == 8
        else:
            covered = np.zeros(geo.n_blocks, bool)
        keep = np.nonzero(~covered)[0]
        blocks.append(keep)

    pt_chunks, conn_chunks = [], []
    data = {name: [] for name in ("Density", "Velocity", "VelocityMagnitude",
                                  "Vorticity", "Obstacle", "Level")}
    pt_base = 0
    e = BLOCK_EDGE + 1
    # template point lattice / connectivity for one block
    pz, py, px = np.meshgrid(np.arange(e), np.arange(e), np.arange(e), indexing="ij")
    tmpl_pts = np.stack([px, py, pz], axis=-1).reshape(-1, 3).astype(np.float32)
    # voxel corner ids per cell, VTK_VOXEL corner order (x fastest)
    cidx = (_LZ * e + _LY) * e + _LX
    tmpl_conn = np.stack(
        [
            cidx,
            cidx + 1,
            cidx + e,
            cidx + e + 1,
            cidx + e * e,
            cidx + e * e + 1,
            cidx + e * e + e,
            cidx + e * e + e + 1,
        ],
        axis=1,
    ).astype(np.int64)

    for li, geo in enumerate(levels):
        keep = blocks[li]
        if len(keep) == 0:
            continue
        st = states[li]
        rho = np.asarray(st["rho"])[keep]  # (m, 512)
        vel = np.asarray(st["vel"])[:, keep]  # (3, m, 512)
        obs = geo.obstacle[keep]
        m = len(keep)
        origin = geo.coords[keep] * BLOCK_EDGE  # (m, 3)
        pts = (tmpl_pts[None, :, :] + origin[:, None, :]) * np.float32(geo.dx)
        pt_chunks.append(pts.reshape(-1, 3))
        conn = tmpl_conn[None, :, :] + (np.arange(m)[:, None, None] * (e**3) + pt_base)
        conn_chunks.append(conn.reshape(-1, 8))
        pt_base += m * e**3
        data["Density"].append(rho.reshape(-1))
        data["Velocity"].append(np.moveaxis(vel, 0, -1).reshape(-1, 3))
        data["VelocityMagnitude"].append(np.sqrt((vel**2).sum(axis=0)).reshape(-1))
        if fields.vorticity:
            from ..diagnostics import vorticity_blocks_host

            # seam-free across block faces: dense assembly + mask-aware
            # differences (intra-block rolls would print an artifact sheet
            # at every 8-cell boundary into the file)
            w = vorticity_blocks_host(
                np.asarray(st["vel"]), geo.coords, geo.dims
            )[keep]
            data["Vorticity"].append(w.reshape(-1))
        data["Obstacle"].append(obs.reshape(-1).astype(np.uint8))
        data["Level"].append(np.full(m * 512, geo.level_id, np.int32))

    if not pt_chunks:
        return
    cell_data = {}
    if fields.density:
        cell_data["Density"] = _scrub(np.concatenate(data["Density"]))
    if fields.velocity:
        cell_data["Velocity"] = _scrub(np.concatenate(data["Velocity"]))
    if fields.velocity_magnitude:
        cell_data["VelocityMagnitude"] = _scrub(np.concatenate(data["VelocityMagnitude"]))
    if fields.vorticity and data["Vorticity"]:
        cell_data["Vorticity"] = _scrub(np.concatenate(data["Vorticity"]))
    if fields.obstacle:
        cell_data["Obstacle"] = np.concatenate(data["Obstacle"])
    if fields.level:
        cell_data["Level"] = np.concatenate(data["Level"])
    write_vtu(
        path,
        np.concatenate(pt_chunks),
        np.concatenate(conn_chunks),
        VTK_VOXEL,
        cell_data,
    )
    log.info("[VTK] wrote %s (%d cells)", path, sum(len(v) for v in data["Density"]))


def _scrub(a: np.ndarray) -> np.ndarray:
    a = np.asarray(a, np.float32)
    return np.nan_to_num(a, nan=0.0, posinf=0.0, neginf=0.0)


def export_surface_vtu(
    path: str,
    vertices: np.ndarray,  # (n_tri, 3, 3) in STL coords
    normals: np.ndarray,  # (n_tri, 3)
    areas: np.ndarray,  # (n_tri,)
    pressure: np.ndarray,  # (n_tri,) Pa
    shear: np.ndarray,  # (3, n_tri) Pa
) -> None:
    """Per-triangle surface loads (reference: src/forces/io.jl:26-82)."""
    n = len(vertices)
    pts = vertices.reshape(-1, 3).astype(np.float32)
    conn = np.arange(3 * n, dtype=np.int32).reshape(n, 3)
    shear_mag = np.sqrt((shear**2).sum(axis=0))
    quality = ((np.abs(pressure) > 1e-10) | (np.abs(shear[0]) > 1e-10)).astype(
        np.float32
    )
    write_vtu(
        path,
        pts,
        conn,
        VTK_TRIANGLE,
        {
            "Pressure_Pa": _scrub(pressure),
            "ShearX_Pa": _scrub(shear[0]),
            "ShearY_Pa": _scrub(shear[1]),
            "ShearZ_Pa": _scrub(shear[2]),
            "ShearMagnitude_Pa": _scrub(shear_mag),
            "Normal": normals.astype(np.float32),
            "Area_m2": areas.astype(np.float32),
            "MappingQuality": quality,
        },
    )


def export_flow_vtu_patches(path, patches, states, fields) -> None:
    """Merged multi-level flow field for the dense-patch layout.  Cells of a
    level covered by the next-finer patch are skipped (the dense analogue of
    the reference's fully-refined-block filter, reference: src/io_vtk.jl:27-47).
    Points are shared per patch grid."""
    pt_chunks, conn_chunks = [], []
    data = {n: [] for n in ("Density", "Velocity", "VelocityMagnitude",
                            "Vorticity", "Obstacle", "Level")}
    pt_base = 0
    for li, p in enumerate(patches):
        X, Y, Z = p.interior
        lo = np.asarray(p.lo)
        # cell mask: keep cells not covered by the child patch
        keep = np.ones((X, Y, Z), bool)
        if li + 1 < len(patches):
            c = patches[li + 1]
            clo = np.asarray(c.lo) // 2 - lo
            chi = (np.asarray(c.lo) + np.asarray(c.interior)) // 2 - lo
            clo = np.clip(clo, 0, [X, Y, Z])
            chi = np.clip(chi, 0, [X, Y, Z])
            keep[clo[0]:chi[0], clo[1]:chi[1], clo[2]:chi[2]] = False
        idx = np.nonzero(keep)
        if len(idx[0]) == 0:
            continue
        # point grid (X+1)(Y+1)(Z+1), shared by all cells of this patch
        px, py, pz = np.meshgrid(
            np.arange(X + 1), np.arange(Y + 1), np.arange(Z + 1), indexing="ij"
        )
        pts = (np.stack([px, py, pz], axis=-1).reshape(-1, 3) + lo) * np.float32(p.dx)
        pt_chunks.append(pts.astype(np.float32))
        sy, sz = (Y + 1) * (Z + 1), Z + 1
        base = idx[0] * sy + idx[1] * sz + idx[2] + pt_base
        conn = np.stack(
            [base, base + sy, base + sz, base + sy + sz,
             base + 1, base + sy + 1, base + sz + 1, base + sy + sz + 1],
            axis=1,
        )
        # VTK_VOXEL corner order is x-fastest: (0,0,0),(1,0,0),(0,1,0),(1,1,0),
        # then +z; our axes are (x,y,z) so offsets above are arranged to match
        conn_chunks.append(conn.astype(np.int64))
        pt_base += (X + 1) * (Y + 1) * (Z + 1)

        st = states[li]
        # flat-(y,z) levels store (XS, M); unflatten to interior 3-D
        vel3d = p.unflatten_host(np.asarray(st["vel"]))[:, :X, :Y, :Z]
        rho = p.unflatten_host(np.asarray(st["rho"]))[:X, :Y, :Z][keep]
        vel = vel3d[:, keep]
        obs = p.obstacle[:X, :Y, :Z][keep]
        data["Density"].append(rho)
        data["Velocity"].append(vel.T)
        data["VelocityMagnitude"].append(np.sqrt((vel**2).sum(axis=0)))
        if fields.vorticity:
            # central-difference curl in lattice units (the reference defines
            # but never writes this field, reference: src/diagnostics.jl:12-51)
            g = [np.gradient(vel3d[c], axis=(0, 1, 2)) for c in range(3)]
            wx = g[2][1] - g[1][2]
            wy = g[0][2] - g[2][0]
            wz = g[1][0] - g[0][1]
            data["Vorticity"].append(np.sqrt(wx**2 + wy**2 + wz**2)[keep])
        data["Obstacle"].append(obs.astype(np.uint8))
        data["Level"].append(np.full(len(rho), p.level_id, np.int32))

    if not pt_chunks:
        return
    cell_data = {}
    if fields.density:
        cell_data["Density"] = _scrub(np.concatenate(data["Density"]))
    if fields.velocity:
        cell_data["Velocity"] = _scrub(np.concatenate(data["Velocity"]))
    if fields.velocity_magnitude:
        cell_data["VelocityMagnitude"] = _scrub(np.concatenate(data["VelocityMagnitude"]))
    if fields.vorticity and data["Vorticity"]:
        cell_data["Vorticity"] = _scrub(np.concatenate(data["Vorticity"]))
    if fields.obstacle:
        cell_data["Obstacle"] = np.concatenate(data["Obstacle"])
    if fields.level:
        cell_data["Level"] = np.concatenate(data["Level"])
    write_vtu(path, np.concatenate(pt_chunks), np.concatenate(conn_chunks),
              VTK_VOXEL, cell_data)
    log.info("[VTK] wrote %s (%d cells)", path, len(cell_data.get("Level", [])))
