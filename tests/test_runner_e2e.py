"""End-to-end runner tests on CPU: tiny sphere case through solve_case with
both layouts, checkpoint/resume, and output artifact schemas."""

import csv
import os
import xml.etree.ElementTree as ET

import numpy as np
import pytest

from open_ludwig_tpu.cases import make_case_sphere
from open_ludwig_tpu.config import load_case_config
from open_ludwig_tpu.runner import solve_case


@pytest.fixture(scope="module")
def tiny_case(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("case"))
    make_case_sphere(
        d, "1M", surface_resolution=10, num_levels=1, steps=20, ramp_steps=10,
        output_freq=20, diag_freq=10, wake_enabled=False,
        boundary_method="bounce_back", wall_model=False,
    )
    return d


@pytest.mark.slow  # compile-heavy on CPU; full suite still runs it
def test_solve_case_patch_layout(tiny_case):
    cfg = load_case_config(tiny_case)
    res = solve_case(cfg)
    assert res.final_stats.rho_min > 0.8
    assert np.isfinite(res.final_forces.Cd)
    out = cfg.output_path
    files = os.listdir(out)
    assert "convergence.csv" in files and "forces.csv" in files
    assert any(f.startswith("flow_") for f in files)
    assert any(f.startswith("surface_") for f in files)
    # schema checks (reference: main.jl:82, forces/io.jl:91)
    conv = list(csv.reader(open(os.path.join(out, "convergence.csv"))))
    assert conv[0] == ["Step", "Walltime", "Time_phys_s", "U_inlet_lat",
                       "Rho_min", "MLUPS", "Cd", "Cl"]
    forces = list(csv.reader(open(os.path.join(out, "forces.csv"))))
    assert forces[0] == ["Step", "Time_s", "U_inlet", "Fx_N", "Fy_N", "Fz_N",
                         "Fx_p_N", "Fx_v_N", "Mx_Nm", "My_Nm", "Mz_Nm",
                         "Cd", "Cl", "Cs", "Cmy"]
    # vtu parses
    flow = [f for f in files if f.startswith("flow_")][0]
    root = ET.parse(os.path.join(out, flow)).getroot()
    assert root.attrib["type"] == "UnstructuredGrid"


@pytest.mark.slow  # compile-heavy on CPU; full suite still runs it
def test_checkpoint_resume(tiny_case):
    cfg = load_case_config(tiny_case).with_overrides(
        checkpoint_freq=10, steps=20
    )
    solve_case(cfg)
    ckpt_dir = os.path.join(cfg.output_path, "checkpoints")
    ckpts = sorted(os.listdir(ckpt_dir))
    assert len(ckpts) == 2
    # force a resume from step 10 while the CSVs already have rows to 20:
    # the runner must truncate past-resume rows so histories have no
    # duplicate Step entries
    os.remove(os.path.join(ckpt_dir, ckpts[-1]))
    cfg2 = cfg.with_overrides(checkpoint_resume=True, steps=30)
    res = solve_case(cfg2)
    assert res.final_stats.rho_min > 0.8
    conv = list(csv.DictReader(open(os.path.join(cfg.output_path, "convergence.csv"))))
    steps = [int(r["Step"]) for r in conv]
    assert len(steps) == len(set(steps)), f"duplicate Step rows: {steps}"
    assert max(steps) == 30


def test_force_output_freq_cadence(tmp_path):
    """forces.csv cadence independent of diagnostics (reference:
    config_loader.jl:192 FORCE_OUTPUT_FREQ fallback semantics)."""
    import yaml

    d = str(tmp_path)
    make_case_sphere(
        d, "1M", surface_resolution=10, num_levels=1, steps=20, ramp_steps=10,
        output_freq=100, diag_freq=10, wake_enabled=False,
        boundary_method="bounce_back", wall_model=False,
    )
    cfgd = yaml.safe_load(open(os.path.join(d, "config.yaml")))
    cfgd["advanced"].setdefault("forces", {})["output_freq"] = 5
    yaml.safe_dump(cfgd, open(os.path.join(d, "config.yaml"), "w"))
    cfg = load_case_config(d)
    assert cfg.effective_force_output_freq == 5
    solve_case(cfg)
    forces = list(csv.DictReader(open(os.path.join(cfg.output_path, "forces.csv"))))
    assert [int(r["Step"]) for r in forces] == [5, 10, 15, 20]
    conv = list(csv.DictReader(open(os.path.join(cfg.output_path, "convergence.csv"))))
    assert [int(r["Step"]) for r in conv] == [10, 20]


@pytest.mark.slow  # compile-heavy on CPU; full suite still runs it
def test_async_depth_subbatching(tiny_case):
    """async_depth bounds steps per dispatch without changing results
    (reference: gpu.async_depth, main.jl:166-180)."""
    cfg = load_case_config(tiny_case).with_overrides(
        async_depth=3, checkpoint_freq=0, output_dir="RESULTS_AD"
    )
    res = solve_case(cfg)
    assert res.final_stats.rho_min > 0.8
    conv = list(csv.DictReader(open(os.path.join(cfg.output_path, "convergence.csv"))))
    assert [int(r["Step"]) for r in conv] == [10, 20]


def test_solve_case_blocks_layout(tiny_case):
    cfg = load_case_config(tiny_case).with_overrides(layout="blocks", steps=10)
    res = solve_case(cfg)
    assert res.final_stats.rho_min > 0.8
    assert np.isfinite(res.final_forces.Cd)


def test_batch_runner(tmp_path):
    import yaml

    from open_ludwig_tpu.runner import run_all_cases

    root = tmp_path / "CASES"
    make_case_sphere(
        str(root / "good"), "1M", surface_resolution=10, num_levels=1, steps=6,
        ramp_steps=3, output_freq=100, diag_freq=100, wake_enabled=False,
        boundary_method="bounce_back", wall_model=False,
    )
    (root / "broken").mkdir(parents=True)
    (root / "broken" / "config.yaml").write_text("basic: {}\n")
    batch = tmp_path / "cases_to_run.yaml"
    batch.write_text(yaml.safe_dump({"case_folders": ["broken", "good"]}))
    # the broken case must not kill the batch (reference: main.jl:261-267)
    run_all_cases(str(root), str(batch))
    assert (root / "good" / "RESULTS" / "convergence.csv").exists()


def test_symmetric_half_model_e2e(tmp_path):
    """Half-model with y=0 symmetry plane end-to-end: mirror BC at y-min,
    halved reference area, doubled Fx/Fz (reference: forces/surface.jl:517)."""
    import yaml

    from open_ludwig_tpu.cases import make_case_sphere

    d = str(tmp_path)
    make_case_sphere(
        d, "1M", surface_resolution=10, num_levels=1, steps=8, ramp_steps=4,
        output_freq=100, diag_freq=100, wake_enabled=False,
        boundary_method="bounce_back", wall_model=False,
    )
    cfgd = yaml.safe_load(open(os.path.join(d, "config.yaml")))
    cfgd["advanced"]["refinement"]["symmetric_analysis"] = True
    yaml.safe_dump(cfgd, open(os.path.join(d, "config.yaml"), "w"))
    cfg = load_case_config(d)
    assert cfg.symmetric_analysis
    res = solve_case(cfg)
    assert res.final_stats.rho_min > 0.8
    # symmetry zeroing
    assert res.final_forces.Fy == 0.0
    assert res.final_forces.Mx == 0.0 and res.final_forces.Mz == 0.0
    assert np.isfinite(res.final_forces.Cd)


@pytest.mark.slow  # compile-heavy on CPU; full suite still runs it
def test_three_level_production_e2e(tmp_path):
    """Flagship configuration guard: 3 levels + Bouzidi + wall model + WALE +
    forces end-to-end, asserting finite Cd and bounded rho (VERDICT r1 #8)."""
    d = str(tmp_path)
    make_case_sphere(
        d, "1M", surface_resolution=12, num_levels=3, steps=12, ramp_steps=6,
        output_freq=100, diag_freq=6, wake_enabled=True,
        boundary_method="bouzidi", wall_model=True,
    )
    cfg = load_case_config(d)
    assert cfg.wall_model_enabled and cfg.boundary_method == "bouzidi"
    res = solve_case(cfg)
    assert res.final_stats.rho_min > 0.8
    assert res.final_stats.rho_max < 1.2
    assert np.isfinite(res.final_forces.Cd)
    assert np.isfinite(res.final_forces.Cmy)
    forces = list(csv.DictReader(open(os.path.join(cfg.output_path, "forces.csv"))))
    assert len(forces) == 2


@pytest.mark.slow  # compile-heavy on CPU; full suite still runs it
@pytest.mark.parametrize("mode", ["zero", "auto"])
def test_num_levels_auto(tmp_path, mode):
    """num_levels: 0 and auto_levels pick the domain-capped level count
    (reference: physics_scaling.jl compute_max_levels_for_domain)."""
    import yaml

    from open_ludwig_tpu.geometry import load_mesh
    from open_ludwig_tpu.scaling import compute_domain_params

    d = str(tmp_path)
    make_case_sphere(
        d, "1M", surface_resolution=10, num_levels=0, steps=6, ramp_steps=3,
        output_freq=100, diag_freq=100, wake_enabled=False,
        boundary_method="bounce_back", wall_model=False,
    )
    if mode == "auto":
        cfgd = yaml.safe_load(open(os.path.join(d, "config.yaml")))
        cfgd["advanced"].setdefault("high_re", {})["auto_levels"] = True
        cfgd["advanced"]["high_re"]["max_levels"] = 2
        yaml.safe_dump(cfgd, open(os.path.join(d, "config.yaml"), "w"))
    cfg = load_case_config(d)
    assert cfg.num_levels == 0
    mesh = load_mesh(cfg.stl_path, scale=cfg.stl_scale)
    params = compute_domain_params(cfg, mesh.min_bounds, mesh.max_bounds)
    if mode == "auto":
        assert cfg.auto_levels and params.num_levels <= 2
    assert params.num_levels >= 1
    res = solve_case(cfg)
    assert res.final_stats.rho_min > 0.8


def test_stability_abort(tmp_path):
    """stability_action: abort ends a diverged case cleanly (checkpointing
    the last state) instead of burning the remaining wall-clock; the
    reference only ever warns (its check_stability is dead code,
    reference: diagnostics.jl:99-125)."""
    import yaml

    d = str(tmp_path)
    make_case_sphere(
        d, "1M", surface_resolution=10, num_levels=1, steps=200, ramp_steps=2,
        output_freq=1000, diag_freq=5, wake_enabled=False,
        boundary_method="bounce_back", wall_model=False,
    )
    cfgd = yaml.safe_load(open(os.path.join(d, "config.yaml")))
    # deliberately unstable: Ma ~ 0.7 lattice velocity with no ramp
    cfgd["advanced"]["numerics"]["u_lattice"] = 0.4
    cfgd["advanced"].setdefault("diagnostics", {})["stability_action"] = "abort"
    yaml.safe_dump(cfgd, open(os.path.join(d, "config.yaml"), "w"))
    cfg = load_case_config(d)
    assert cfg.stability_action == "abort"
    with pytest.raises(RuntimeError, match="diverged"):
        solve_case(cfg)
    # the abort path checkpoints the last state before raising
    ckpts = os.listdir(os.path.join(cfg.output_path, "checkpoints"))
    assert len(ckpts) == 1


def test_wing_case_smoke(tmp_path):
    from open_ludwig_tpu.cases import make_case_wing

    d = str(tmp_path)
    make_case_wing(
        d, alpha_deg=5.0, surface_resolution=8, num_levels=1, steps=8,
        ramp_steps=4, output_freq=100, diag_freq=100, wake_enabled=False,
        boundary_method="bounce_back",
    )
    cfg = load_case_config(d)
    res = solve_case(cfg)
    assert res.final_stats.rho_min > 0.8
    assert np.isfinite(res.final_forces.Cl)


@pytest.mark.slow
def test_checkpoint_resume_under_sharding(tmp_path):
    """Multi-chip e2e: solve_case on a 4-device x mesh (engine.devices) with
    checkpointing, then resume under the same sharding — state and forces
    must continue seamlessly (no duplicate Step rows, finite Cd, and the
    resumed run's states match an uninterrupted sharded run)."""
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    d = str(tmp_path)
    make_case_sphere(
        d, "1M", surface_resolution=10, num_levels=2, steps=20, ramp_steps=10,
        output_freq=100, diag_freq=10, wake_enabled=False,
        boundary_method="bouzidi", wall_model=True, precision="bfloat16",
    )
    cfg = load_case_config(d).with_overrides(devices=4, checkpoint_freq=10)
    assert cfg.devices == 4
    res_full = solve_case(cfg.with_overrides(output_dir="RESULTS_FULL",
                                             checkpoint_freq=0))
    # interrupted run: stop at 10, then resume to 20 under the same mesh
    solve_case(cfg.with_overrides(steps=10))
    res_resumed = solve_case(cfg.with_overrides(checkpoint_resume=True))
    assert np.isfinite(res_resumed.final_forces.Cd)
    # resume is DETERMINISTIC: checkpoints round-trip bf16 bit-exactly
    # (test_precision.py), the carried "_ifsl" slabs re-derive from the
    # saved state, and the full/resumed runs share batch boundaries (diag
    # every 10), so the resumed trajectory is the uninterrupted one — the
    # final Cd must match to float32 roundoff, not a loose physics band
    # (a 2e-2 band would pass even if resume re-initialized a level)
    assert abs(res_resumed.final_forces.Cd - res_full.final_forces.Cd) < 1e-5
    conv = list(csv.DictReader(
        open(os.path.join(cfg.output_path, "convergence.csv"))))
    steps = [int(r["Step"]) for r in conv]
    assert len(steps) == len(set(steps)) and max(steps) == 20


# ---- fast-tier smoke variants of the slow guards (ADVICE r3): the full
# checkpoint-resume / production-e2e tests above are slow-marked, so these
# minimal versions keep the production paths guarded in `-m "not slow"` ----


def test_checkpoint_resume_smoke(tmp_path):
    """Fast-tier resume guard: save at 4, resume to 8, no duplicate rows."""
    d = str(tmp_path)
    make_case_sphere(
        d, "1M", surface_resolution=8, num_levels=1, steps=4, ramp_steps=2,
        output_freq=100, diag_freq=4, wake_enabled=False,
        boundary_method="bounce_back", wall_model=False,
    )
    cfg = load_case_config(d).with_overrides(checkpoint_freq=4)
    solve_case(cfg)
    assert os.listdir(os.path.join(cfg.output_path, "checkpoints"))
    res = solve_case(cfg.with_overrides(checkpoint_resume=True, steps=8))
    assert res.final_stats.rho_min > 0.8
    conv = list(csv.DictReader(
        open(os.path.join(cfg.output_path, "convergence.csv"))))
    steps = [int(r["Step"]) for r in conv]
    assert len(steps) == len(set(steps)) and max(steps) == 8


def test_production_features_e2e_smoke(tmp_path):
    """Fast-tier flagship guard: 2 levels + Bouzidi + wall model + bf16 +
    forces through solve_case (the slow 3-level version runs in the full
    suite)."""
    d = str(tmp_path)
    make_case_sphere(
        d, "1M", surface_resolution=8, num_levels=2, steps=6, ramp_steps=3,
        output_freq=100, diag_freq=6, wake_enabled=False,
        boundary_method="bouzidi", wall_model=True, precision="bfloat16",
    )
    cfg = load_case_config(d)
    res = solve_case(cfg)
    assert res.final_stats.rho_min > 0.8
    assert np.isfinite(res.final_forces.Cd)
