"""Config-5 multi-chip production pipeline (VERDICT r1 #1): the full
CLI programs run on the forced 8-device CPU mesh (mesh: {nt, nz} config)
and must reproduce the single-device outputs to reduction tolerance.

The solves go through the sharded operators / sharded MG fine level;
the contraction, momentum-projection, sequential-source and smearing
engines run on mesh-sharded packed arrays under GSPMD.
"""
import sys

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

MESHY = """
gauge:
  dims: [4, 4, 4, 8]
  random_seed: 3
action: {{kappa: 0.12, mu: 0.06}}
solver: {{tol: 1.0e-8, backend: xla}}
{mesh}
physics:
{physics}
  output: {out}
"""

THREEP_PHYS = """  source_positions: [[0, 0, 0, 0]]
  t_sinks: [4]
  projectors: [P+]
  momenta: [[0, 0, 0], [1, 0, 0]]
  smear_n_ape: 0
  smear_n_gauss: 1
  smear_alpha_gauss: 1.0"""

LOOPS_PHYS = """  n_noise: 2
  dilute_t: 2
  momenta: [[0, 0, 0]]"""


def _run(monkeypatch, tmp_path, module_main, physics, name, mesh="",
         dev=False):
    out = str(tmp_path / name)
    cfgp = tmp_path / f"{name}.yaml"
    cfgp.write_text(MESHY.format(physics=physics, out=out, mesh=mesh))
    monkeypatch.setattr(sys, "argv", ["prog", "--config", str(cfgp),
                                      "--device", "cpu"])
    if dev:
        monkeypatch.setenv("TPUQCD_DEVICE_CONTRACT", "1")
    else:
        monkeypatch.delenv("TPUQCD_DEVICE_CONTRACT", raising=False)
    module_main()
    return out


def _h5_all(path):
    vals = {}

    def visit(name, obj):
        if isinstance(obj, h5py.Dataset):
            vals[name] = np.asarray(obj)
    with h5py.File(path, "r") as f:
        f.visititems(visit)
    return vals


@pytest.mark.slow
def test_threeptwop_mesh_matches_single(monkeypatch, tmp_path):
    """2pt + 3pt correlators from the (t=2, z=2) mesh == the
    single-device device-path run (deterministic pipeline)."""
    from tpuqcd.cli.run_threeptwop import main
    single = _run(monkeypatch, tmp_path, main, THREEP_PHYS, "tp_1.h5",
                  dev=True)
    mesh = _run(monkeypatch, tmp_path, main, THREEP_PHYS, "tp_m.h5",
                mesh="mesh: {nt: 2, nz: 2}")
    v1, vm = _h5_all(single), _h5_all(mesh)
    assert set(v1) == set(vm)
    assert any(k.startswith("threep/proton") for k in v1)
    for k in v1:
        np.testing.assert_allclose(
            vm[k], v1[k], rtol=2e-3,
            atol=1e-5 * max(1.0, np.abs(v1[k]).max()), err_msg=k)


@pytest.mark.slow
def test_loops_mesh_matches_single(monkeypatch, tmp_path):
    """Disconnected loops (one-end + derivative, diluted) on the mesh ==
    single-device device path (same noise keys -> deterministic)."""
    from tpuqcd.cli.run_loops import main
    single = _run(monkeypatch, tmp_path, main, LOOPS_PHYS, "lp_1.h5",
                  dev=True)
    mesh = _run(monkeypatch, tmp_path, main, LOOPS_PHYS, "lp_m.h5",
                mesh="mesh: {nt: 2, nz: 2}")
    v1, vm = _h5_all(single), _h5_all(mesh)
    assert set(v1) == set(vm)
    assert any("loops/oneend/" in k for k in v1)
    for k in v1:
        np.testing.assert_allclose(
            vm[k], v1[k], rtol=5e-3,
            atol=5e-5 * max(1.0, np.abs(v1[k]).max()), err_msg=k)


LOOPS_DEFL_PHYS = """  n_noise: 2
  dilute_t: 2
  n_deflate: 4
  momenta: [[0, 0, 0]]"""


@pytest.mark.slow
def test_loops_deflated_mesh_matches_single(monkeypatch, tmp_path):
    """Lanczos-deflated loops on the mesh == single-device (SURVEY.md
    C27 / VERDICT r2 #4: the deflation basis is built by GSPMD-
    partitioned Lanczos over the sharded gauge, and the exact low-mode
    complement solves run through the sharded solver)."""
    from tpuqcd.cli.run_loops import main
    single = _run(monkeypatch, tmp_path, main, LOOPS_DEFL_PHYS, "ld_1.h5",
                  dev=True)
    mesh = _run(monkeypatch, tmp_path, main, LOOPS_DEFL_PHYS, "ld_m.h5",
                mesh="mesh: {nt: 2, nz: 1}")
    v1, vm = _h5_all(single), _h5_all(mesh)
    assert set(v1) == set(vm)
    assert any("loops/oneend_lowmode/" in k for k in v1)
    for k in v1:
        np.testing.assert_allclose(
            vm[k], v1[k], rtol=5e-3,
            atol=5e-5 * max(1.0, np.abs(v1[k]).max()), err_msg=k)


@pytest.mark.slow
def test_twop_mesh_mg_matches_single(monkeypatch, tmp_path):
    """Two-point production with the SHARDED MG solver (mesh + mg) ==
    single-device MG run."""
    from tpuqcd.cli.run_twop import main
    phys = """  source_positions: [[0, 0, 0, 0]]
  momenta: [[0, 0, 0]]
  smear_n_ape: 0
  smear_n_gauss: 1
  smear_alpha_gauss: 1.0
  projectors: [P+]"""
    mg = ("mg: {enabled: true, n_vec: [4], block: [[2, 2, 2, 4]],"
          " setup_iters: 8, smoother_iters: 2, coarse_maxiter: 8}\n")
    single = _run(monkeypatch, tmp_path, main, phys, "tw_1.h5",
                  mesh=mg, dev=True)
    mesh = _run(monkeypatch, tmp_path, main, phys, "tw_m.h5",
                mesh=mg + "mesh: {nt: 2, nz: 1}")
    v1, vm = _h5_all(single), _h5_all(mesh)
    assert set(v1) == set(vm)
    for k in v1:
        np.testing.assert_allclose(
            vm[k], v1[k], rtol=2e-3,
            atol=1e-5 * max(1.0, np.abs(v1[k]).max()), err_msg=k)


@pytest.mark.slow
def test_twop_mesh_mg_y_matches_single(monkeypatch, tmp_path):
    """Two-point production with the sharded MG solver on a 3-axis
    (t=2, y=2) mesh == single-device MG run (MG x y-decomposition x
    physics pipeline in one config)."""
    from tpuqcd.cli.run_twop import main
    phys = """  source_positions: [[0, 0, 0, 0]]
  momenta: [[0, 0, 0]]
  smear_n_ape: 0
  smear_n_gauss: 1
  smear_alpha_gauss: 1.0
  projectors: [P+]"""
    mg = ("mg: {enabled: true, n_vec: [4], block: [[2, 2, 2, 4]],"
          " setup_iters: 8, smoother_iters: 2, coarse_maxiter: 8}\n")
    single = _run(monkeypatch, tmp_path, main, phys, "twy_1.h5",
                  mesh=mg, dev=True)
    mesh = _run(monkeypatch, tmp_path, main, phys, "twy_m.h5",
                mesh=mg + "mesh: {nt: 2, nz: 1, ny: 2}")
    v1, vm = _h5_all(single), _h5_all(mesh)
    assert set(v1) == set(vm)
    for k in v1:
        np.testing.assert_allclose(
            vm[k], v1[k], rtol=2e-3,
            atol=1e-5 * max(1.0, np.abs(v1[k]).max()), err_msg=k)


@pytest.mark.slow
def test_invert_ndeg_mesh(monkeypatch, tmp_path, capsys):
    """run_invert with epsbar + mesh: the sharded non-degenerate
    doublet solve certifies on the forced 8-device CPU mesh (heavy
    s/c doublet under --gridsize [U])."""
    from tpuqcd.cli.run_invert import main

    cfgp = tmp_path / "ndeg.yaml"
    cfgp.write_text(
        "gauge: {dims: [4, 4, 4, 8], random_seed: 3}\n"
        "action: {kappa: 0.12, mubar: 0.05, epsbar: 0.03}\n"
        "solver: {tol: 1.0e-8, backend: xla}\n"
        "mesh: {nt: 2, nz: 1}\n")
    monkeypatch.setattr(sys, "argv", ["prog", "--config", str(cfgp),
                                      "--device", "cpu"])
    main()
    out = capsys.readouterr().out
    line = [ln for ln in out.splitlines() if ln.startswith("RESULT")][-1]
    rel = float(line.split("relres=")[1].split()[0])
    assert rel < 1e-8
    assert "ndeg=1" in line
