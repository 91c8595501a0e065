"""Production multi-chip execution: GSPMD x-slab sharding of the FULL
dense-patch multi-level step.

The single-device production step (solver_dense.make_coarse_step_dense) is
already pure functional XLA: streaming = rolls, BCs = masked selects,
refinement interfaces = static slabs + upsampling, Bouzidi = a dense sub-box
update, WALE/wall-model = elementwise.  Every one of those partitions under
XLA's SPMD partitioner, so multi-chip is sharding annotations, not new
physics: every level's state arrays are sharded along the x (streaming) axis
over a 1-D device mesh, and XLA inserts the halo collective-permutes for the
x-rolls, the slab exchanges for the interface endpoints, and the psum for
force/diagnostic reductions — the "pick a mesh, annotate, let XLA insert
collectives" recipe (SURVEY.md section 2.6, section 5).

The physics is bit-identical to the single-device XLA path because it IS the
single-device XLA path (no WALE/wall-model gap, unlike the retired
block-column prototype).  The reference has no multi-GPU support at all
(reference: src/ has a single CUDABackend, main.jl:75); this module is the
TPU-native scaling extension.

Levels whose padded x-extent divides the mesh run the SAME fused Pallas
kernel as single-chip, wrapped in shard_map with a one-hop lax.ppermute
halo exchange of the slab boundary planes (solver_dense._shard_map_pstep);
the remaining levels and all non-kernel ops (interfaces, Bouzidi sub-box,
forces) stay GSPMD-partitioned XLA.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import CaseConfig
from ..core.patch import PatchLevel
from ..scaling import DomainParams
from ..solver_dense import make_coarse_step_dense, statics_arg_arrays


def make_x_mesh(n_devices: int = 0) -> Mesh:
    """1-D device mesh over the streaming axis.  n_devices = 0 uses all
    local devices."""
    devs = jax.devices()
    n = n_devices if n_devices > 0 else len(devs)
    if n > len(devs):
        raise ValueError(f"requested {n} devices, have {len(devs)}")
    return Mesh(np.array(devs[:n]), axis_names=("x",))


def state_shardings(mesh: Mesh) -> Dict[str, NamedSharding]:
    """Shardings for one level's {f, rho, vel} state dict: x-slabs."""
    return {
        "f": NamedSharding(mesh, P(None, "x")),      # (27, XS, YS, ZS)
        "rho": NamedSharding(mesh, P("x")),           # (XS, YS, ZS)
        "vel": NamedSharding(mesh, P(None, "x")),     # (3, XS, YS, ZS)
    }


def shard_states(states: List[Dict], mesh: Mesh) -> List[Dict]:
    sh = state_shardings(mesh)
    # derived carries (e.g. "_ifsl" slabs) are dropped: the batch runner
    # re-seeds them on device with GSPMD-inferred placements
    return [
        {k: jax.device_put(v, sh[k]) for k, v in st.items() if k in sh}
        for st in states
    ]


def shard_statics(statics: List[Dict], patches: List[PatchLevel],
                  mesh: Mesh) -> List[Dict]:
    """Static fields: the flat (N,) per-cell fields are x-major, so an x-slab
    sharding of dim 0 lines up with the state slabs when XS divides evenly;
    XLA reshards transparently when it doesn't.  Small Bouzidi boxes and the
    Pallas 3-D copies are replicated."""
    rep = NamedSharding(mesh, P())
    flat = NamedSharding(mesh, P("x"))
    out = []
    for st, p in zip(statics, patches):
        d = {}
        # flat-(y,z) levels carry (XS, M) rank-2 kernel fields
        x3 = NamedSharding(
            mesh, P("x", None) if p.flat_yz else P("x", None, None)
        )
        for k, v in st.items():
            if k == "bouzidi":
                d[k] = (
                    None if v is None
                    else {kk: (jax.device_put(vv, rep) if hasattr(vv, "shape") else vv)
                          for kk, vv in v.items()}
                )
            elif k in ("obstacle", "sponge", "wall_dist") and p.padded[0] % mesh.size == 0:
                d[k] = jax.device_put(v, flat)
            elif k in ("obstacle_u8", "sponge3d", "wall3d") and p.padded[0] % mesh.size == 0:
                # 3-D copies feed the shard_map'd Pallas kernel as local slabs
                d[k] = jax.device_put(v, x3)
            else:
                d[k] = jax.device_put(v, rep)
        out.append(d)
    return out


def make_batch_runner_sharded(
    cfg: CaseConfig,
    params: DomainParams,
    patches: List[PatchLevel],
    statics: List[Dict],
    mesh: Mesh,
    use_pallas: bool = None,
):
    """Sharded analogue of solver_dense.make_batch_runner_dense: the whole
    diagnostics interval is one jitted lax.scan over the sharded states,
    with the Pallas kernel under shard_map on every level that fits."""
    coarse_step = make_coarse_step_dense(
        cfg, params, patches, statics, use_pallas=use_pallas, mesh=mesh
    )
    # statics ride as traced jit arguments (statics_arg_arrays) exactly as in
    # make_batch_runner_dense: closure capture would inline every multi-MB
    # static field into the HLO as a literal constant (134 MB payloads and
    # tens-of-minutes compiles measured on large cases).  The arrays keep the
    # shardings shard_statics committed them with; in_shardings is left
    # unspecified for that argument so jit honors those placements.
    arrs = statics_arg_arrays(statics)

    @partial(jax.jit, static_argnums=(3,), donate_argnums=(0,))
    def _run(states, arrs_, t0, n: int):
        def body(carry, t):
            return coarse_step(list(carry), t, arrs_), None

        out, _ = jax.lax.scan(
            body, states, t0 + jax.numpy.arange(n, dtype=jax.numpy.int32)
        )
        return out

    def run(states, t0, n: int):
        # seed the carried endpoint slabs (same carry-structure contract as
        # make_batch_runner_dense); the slab arrays inherit GSPMD placements
        states = coarse_step.seed_slabs(states)
        return _run(states, arrs, t0, n)

    run.pallas_levels = coarse_step.pallas_levels
    return run
