"""Interleaved A/B: signed single-array Bouzidi coefficients (S) vs the
retired two-array (A, B) encoding, standalone on the bench finest-level box.

The old arrays are exactly recoverable from S (A = |S|, B = sign(S)(1-|S|)),
so both kernels run on identical data in ONE process with interleaved timed
windows (the tunnel TPU is shared; see NOTES_ROUND3_PERF.md discipline).

Usage: python tools/probe_bz_encoding.py [--res 25] [--n 300] [--reps 6]
"""

import argparse
import sys
import tempfile
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=25)
    ap.add_argument("--levels", type=int, default=3)
    ap.add_argument("--n", type=int, default=300)
    ap.add_argument("--reps", type=int, default=6)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from open_ludwig_tpu.jax_setup import setup_jax_cache

    setup_jax_cache()

    from open_ludwig_tpu import lattice as lat
    from open_ludwig_tpu.cases import make_case_sphere
    from open_ludwig_tpu.config import load_case_config
    from open_ludwig_tpu.core.patch import build_patches
    from open_ludwig_tpu.geometry import load_mesh
    from open_ludwig_tpu.ops.dense_step import build_bouzidi_dense_plan
    from open_ludwig_tpu.ops.pallas_step import _shift2d, make_bouzidi_pallas
    from open_ludwig_tpu.scaling import compute_domain_params

    print(f"device: {jax.devices()[0]}", flush=True)
    tmp = tempfile.mkdtemp()
    make_case_sphere(
        tmp, "1M", surface_resolution=args.res, num_levels=args.levels,
        steps=400, ramp_steps=200, output_freq=100000, diag_freq=100000,
        wake_enabled=True, precision="bfloat16",
    )
    cfg = load_case_config(tmp)
    mesh = load_mesh(cfg.stl_path, scale=cfg.stl_scale)
    params = compute_domain_params(cfg, mesh.min_bounds, mesh.max_bounds)
    levels = build_patches(cfg, mesh, params)
    fine = levels[-1]
    plan = build_bouzidi_dense_plan(fine, q_min=cfg.q_min_threshold)
    S = np.asarray(plan["S"], np.float32)
    A = np.abs(S)
    B = np.where(S < 0, -(1.0 - A), np.where(S > 0, 1.0 - A, 0.0))
    B[S == 1.0] = 0.0  # lo-outside fallback: folded, coef 0
    print(f"box dim={plan['dim']} lo={plan['lo']} "
          f"links={(S != 0).sum()}", flush=True)

    shape = (27,) + tuple(fine.padded)
    f_dtype = jnp.bfloat16

    # --- new: signed single-array (production make_bouzidi_pallas) ---
    apply_s = make_bouzidi_pallas(plan, shape, f_dtype)

    # --- old: two-array (A, B), reconstructed verbatim from round-2 ---
    lx, ly, lz = plan["lo"]
    bx, by, bz = plan["dim"]

    def kernel(a_ref, b_ref, f_ref, out_ref, box_ref, row_ref, sem, rsem):
        cp_in = pltpu.make_async_copy(
            f_ref.at[:, pl.ds(lx, bx), pl.ds(ly, by), pl.ds(lz, bz)],
            box_ref, sem,
        )
        cp_in.start()
        cp_in.wait()
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
                continue
            k = int(lat.OPP[j])
            cxk, cyk, czk = int(lat.C_X[k]), int(lat.C_Y[k]), int(lat.C_Z[k])
            ff = box_ref[k]
            if cxk:
                ff = jnp.roll(ff, cxk, axis=0)
            ff = _shift2d(ff, cyk, czk)
            a = a_ref[k].astype(jnp.float32)
            b = b_ref[k].astype(jnp.float32)
            other = jnp.where(b < 0, box_ref[j].astype(jnp.float32),
                              ff.astype(jnp.float32))
            val = (a * box_ref[k].astype(jnp.float32) + jnp.abs(b) * other
                   ).astype(f_dtype)
            if slot in pending:
                row_dma(slot, pending.pop(slot)).wait()
            row_ref[slot] = jnp.where(a > 0, val, box_ref[j])
            row_dma(slot, j).start()
            pending[slot] = j
            slot = 1 - slot
        for s, j in pending.items():
            row_dma(s, j).wait()

    call_ab = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(shape, f_dtype),
        input_output_aliases={2: 0},
        scratch_shapes=[
            pltpu.VMEM((27, bx, by, bz), f_dtype),
            pltpu.VMEM((2, bx, by, bz), f_dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20,
        ),
    )
    a_dev = jnp.asarray(A, jnp.bfloat16)
    b_dev = jnp.asarray(B, jnp.bfloat16)
    s_dev = jnp.asarray(S, jnp.bfloat16)

    rng = np.random.default_rng(0)
    f0 = jnp.asarray(
        rng.standard_normal(shape, np.float32) * 0.01, f_dtype
    )

    import functools

    @functools.partial(jax.jit, static_argnums=(1,), donate_argnums=(0,))
    def run_s(f, n):
        def body(f, _):
            return apply_s(f, s_dev), None
        f, _ = jax.lax.scan(body, f, None, length=n)
        return f

    @functools.partial(jax.jit, static_argnums=(1,), donate_argnums=(0,))
    def run_ab(f, n):
        def body(f, _):
            return call_ab(a_dev, b_dev, f), None
        f, _ = jax.lax.scan(body, f, None, length=n)
        return f

    # correctness: one application must match to bf16 exactness
    one_s = apply_s(jnp.array(f0), s_dev)
    one_ab = call_ab(a_dev, b_dev, jnp.array(f0))
    err = float(jnp.max(jnp.abs(
        one_s.astype(jnp.float32) - one_ab.astype(jnp.float32))))
    print(f"one-step |S - AB| max = {err:.2e}", flush=True)

    runners = {"S": run_s, "AB": run_ab}
    states = {m: jnp.array(f0) for m in runners}
    for m, r in runners.items():  # compile
        states[m] = r(states[m], args.n)
        jax.block_until_ready(states[m])
    dts = {m: [] for m in runners}
    for _ in range(args.reps):
        for m, r in runners.items():
            t0 = time.perf_counter()
            states[m] = r(states[m], args.n)
            jax.block_until_ready(states[m])
            dts[m].append((time.perf_counter() - t0) / args.n)
    for m in runners:
        print(f"bz[{m:2s}] {min(dts[m])*1e6:7.2f} us  (reps "
              + ",".join(f"{d*1e6:.1f}" for d in dts[m]) + ")", flush=True)


if __name__ == "__main__":
    main()
