"""Config-time validation (SURVEY.md §6.6 param-struct discipline):
every constraint that used to surface as a bare assert deep inside
MG/mesh setup must fail at load_config time with an actionable message.
"""
import pytest

from tpuqcd.utils.config import (ConfigError, load_config, RunConfig,
                                 validate_config)


def _write(tmp_path, text):
    p = tmp_path / "cfg.yaml"
    p.write_text(text)
    return str(p)


def test_valid_default_roundtrip(tmp_path):
    cfg = load_config(_write(tmp_path, "gauge: {dims: [8, 8, 8, 16]}\n"))
    assert cfg.gauge.dims == (8, 8, 8, 16)
    assert cfg.mesh.nt == 1


def test_odd_dims_rejected(tmp_path):
    with pytest.raises(ConfigError, match="even"):
        load_config(_write(tmp_path, "gauge: {dims: [7, 8, 8, 16]}\n"))


def test_bad_solver_name(tmp_path):
    with pytest.raises(ConfigError, match="solver.solver"):
        load_config(_write(tmp_path, "solver: {solver: gmres}\n"))


def test_eigcg_with_csw_rejected(tmp_path):
    with pytest.raises(ConfigError, match="eigcg"):
        load_config(_write(
            tmp_path,
            "action: {csw: 1.6}\nsolver: {solver: eigcg}\n"))


def test_mg_block_divisibility(tmp_path):
    with pytest.raises(ConfigError, match="divide"):
        load_config(_write(
            tmp_path,
            "gauge: {dims: [8, 8, 8, 16]}\n"
            "mg: {enabled: true, n_vec: [8], block: [[3, 4, 4, 4]]}\n"))


def test_mg_nvec_block_length_mismatch(tmp_path):
    with pytest.raises(ConfigError, match="one entry per"):
        load_config(_write(
            tmp_path,
            "mg: {enabled: true, n_vec: [8, 8], block: [[4, 4, 4, 4]]}\n"))


def test_mg_second_level_divisibility(tmp_path):
    # 16/4 = 4 along T, then bt=8 cannot divide 4
    with pytest.raises(ConfigError, match="level-1"):
        load_config(_write(
            tmp_path,
            "gauge: {dims: [8, 8, 8, 16]}\n"
            "mg: {enabled: true, n_vec: [8, 8],"
            " block: [[4, 4, 4, 4], [8, 2, 2, 2]]}\n"))


def test_source_position_bounds(tmp_path):
    with pytest.raises(ConfigError, match="outside lattice"):
        load_config(_write(
            tmp_path,
            "gauge: {dims: [8, 8, 8, 16]}\n"
            "physics: {source_positions: [[16, 0, 0, 0]]}\n"))


def test_t_sink_bounds(tmp_path):
    with pytest.raises(ConfigError, match="t_sinks"):
        load_config(_write(
            tmp_path,
            "gauge: {dims: [8, 8, 8, 16]}\nphysics: {t_sinks: [16]}\n"))


def test_mesh_divisibility(tmp_path):
    with pytest.raises(ConfigError, match="mesh.nt"):
        load_config(_write(
            tmp_path,
            "gauge: {dims: [8, 8, 8, 16]}\nmesh: {nt: 3}\n"))


def test_mesh_mg_block_interplay(tmp_path):
    # local T = 16/2 = 8 is fine for eo but not divisible by bt = 3... use
    # bt that divides Lt globally but not per shard: Lt=16, nt=4 -> local 4;
    # bt=8 divides 16 but not 4
    with pytest.raises(ConfigError, match="shard-local"):
        load_config(_write(
            tmp_path,
            "gauge: {dims: [8, 8, 8, 16]}\n"
            "mg: {enabled: true, n_vec: [8], block: [[8, 4, 4, 4]]}\n"
            "mesh: {nt: 4}\n"))


def test_validate_default_runconfig():
    validate_config(RunConfig())


def test_musweep_composition_rejected(tmp_path):
    with pytest.raises(ConfigError, match="mu_list"):
        load_config(_write(tmp_path, (
            "gauge: {dims: [8, 8, 8, 16]}\n"
            "action: {mu_list: [0.05, 0.1]}\n"
            "mg: {enabled: true}\n")))


def test_ndeg_mesh_accepted(tmp_path):
    """epsbar + mesh is a supported combination (the sharded ndeg
    doublet path, cli/run_invert._main_ndeg)."""
    cfg = load_config(_write(tmp_path, (
        "gauge: {dims: [8, 8, 8, 16]}\n"
        "action: {mubar: 0.05, epsbar: 0.03}\n"
        "mesh: {nt: 2}\n")))
    assert cfg.action.epsbar == 0.03 and cfg.mesh.nt == 2


def test_musweep_mesh_accepted(tmp_path):
    """mu_list + mesh is supported (sharded-fine-level multishift)."""
    cfg = load_config(_write(tmp_path, (
        "gauge: {dims: [8, 8, 8, 16]}\n"
        "action: {mu_list: [0.05, 0.1]}\n"
        "mesh: {nt: 2}\n")))
    assert tuple(cfg.action.mu_list) == (0.05, 0.1) and cfg.mesh.nt == 2


def test_eigcg_mesh_accepted(tmp_path):
    """eigcg + mesh is supported (ShardedEigCGSolver, SURVEY.md C20)."""
    cfg = load_config(_write(tmp_path, (
        "gauge: {dims: [8, 8, 8, 16]}\n"
        "solver: {solver: eigcg}\n"
        "mesh: {nt: 2}\n")))
    assert cfg.solver.solver == "eigcg" and cfg.mesh.nt == 2


def test_ensemble_modes_exclusive(tmp_path):
    with pytest.raises(ConfigError, match="ensemble"):
        load_config(_write(tmp_path, (
            "gauge: {dims: [8, 8, 8, 16], config_files: [a.lime],"
            " random_seeds: [1, 2]}\n")))


def test_ensemble_valid_roundtrip(tmp_path):
    cfg = load_config(_write(tmp_path, (
        "gauge: {dims: [8, 8, 8, 16], random_seeds: [1, 2, 3]}\n")))
    assert tuple(cfg.gauge.random_seeds) == (1, 2, 3)


def test_meson_channels_validated(tmp_path):
    with pytest.raises(ConfigError, match="meson_channels"):
        load_config(_write(tmp_path, (
            "gauge: {dims: [8, 8, 8, 16]}\n"
            "physics: {meson_channels: [pion, eta_prime]}\n")))
    cfg = load_config(_write(tmp_path, (
        "gauge: {dims: [8, 8, 8, 16]}\n"
        "physics: {meson_channels: [pion, rho_x, a1_z, b0]}\n")))
    assert cfg.physics.meson_channels == ("pion", "rho_x", "a1_z", "b0")


def test_projector_names_validated(tmp_path):
    with pytest.raises(ConfigError, match="projectors"):
        load_config(_write(tmp_path, (
            "gauge: {dims: [8, 8, 8, 16]}\n"
            "physics: {projectors: [P+, G5G3]}\n")))
    cfg = load_config(_write(tmp_path, (
        "gauge: {dims: [8, 8, 8, 16]}\n"
        "physics: {projectors: [P+, P5x, P5z]}\n")))
    assert cfg.physics.projectors == ("P+", "P5x", "P5z")


def test_baryons_validated(tmp_path):
    with pytest.raises(ConfigError, match="baryons"):
        load_config(_write(tmp_path, (
            "gauge: {dims: [8, 8, 8, 16]}\n"
            "physics: {baryons: [proton, lambda]}\n")))
    cfg = load_config(_write(tmp_path, (
        "gauge: {dims: [8, 8, 8, 16]}\n"
        "physics: {baryons: [proton, neutron]}\n")))
    assert cfg.physics.baryons == ("proton", "neutron")


def test_mom_max_sq_generates_momenta(tmp_path):
    cfg = load_config(_write(tmp_path, (
        "gauge: {dims: [8, 8, 8, 16]}\n"
        "physics: {mom_max_sq: 1}\n")))
    assert sorted(cfg.physics.momenta) == sorted([
        (0, 0, 0), (1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0),
        (0, 0, 1), (0, 0, -1)])
    with pytest.raises(ConfigError, match="exclusive"):
        load_config(_write(tmp_path, (
            "gauge: {dims: [8, 8, 8, 16]}\n"
            "physics: {mom_max_sq: 1, momenta: [[0, 0, 0]]}\n")))


def test_smear_type_validated(tmp_path):
    with pytest.raises(ConfigError, match="smear_type"):
        load_config(_write(tmp_path, (
            "gauge: {dims: [8, 8, 8, 16]}\n"
            "physics: {smear_type: hyp}\n")))
    cfg = load_config(_write(tmp_path, (
        "gauge: {dims: [8, 8, 8, 16]}\n"
        "physics: {smear_type: stout, smear_rho_stout: 0.12}\n")))
    assert cfg.physics.smear_type == "stout"


def test_mg_preset_near_critical(tmp_path):
    """mg.preset rebases defaults on the tuned recipe; explicit keys
    win (VERDICT r4 #7)."""
    cfg = load_config(_write(tmp_path, (
        "gauge: {dims: [16, 16, 16, 32]}\n"
        "mg: {enabled: true, preset: near_critical}\n")))
    assert cfg.mg.setup_solver == "cgne"
    assert cfg.mg.setup_iters == 300
    assert cfg.mg.restart == 24
    assert cfg.mg.coarse_maxiter == 24
    assert cfg.mg.smoother_dtype == "bfloat16"
    assert cfg.mg.coarse_dtype == "bfloat16"
    # explicit key overrides the preset
    cfg = load_config(_write(tmp_path, (
        "gauge: {dims: [16, 16, 16, 32]}\n"
        "mg: {enabled: true, preset: near_critical, setup_iters: 40}\n")))
    assert cfg.mg.setup_iters == 40
    assert cfg.mg.setup_solver == "cgne"
    with pytest.raises(ConfigError, match="preset"):
        load_config(_write(tmp_path, (
            "gauge: {dims: [16, 16, 16, 32]}\n"
            "mg: {enabled: true, preset: nope}\n")))


def test_device_mg_params_near_critical_preset():
    from tpuqcd.mg.dsolve import DeviceMGParams
    p = DeviceMGParams.near_critical()
    assert p.n_vec == (16,) and p.setup_solver == "cgne"
    assert p.restart == 24 and p.coarse_iters == 24
    assert p.inner_tol == 1e-7
    p3 = DeviceMGParams.near_critical(levels=3)
    assert p3.n_vec == (16, 16) and len(p3.block) == 2
