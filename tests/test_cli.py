"""End-to-end CLI smoke tests (SURVEY.md §4 entry points, tiny volumes).

Each production program runs in-process on a 2^3 x 4 random gauge and
must produce the expected HDF5 structure; the threeptwop program is run
twice — host contractions and the device-contraction path
(TPUQCD_DEVICE_CONTRACT=1, which on CPU exercises the same packed
engines that run on the TPU) — and the two outputs must agree."""
import os
import sys

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

TINY = """
gauge:
  dims: [2, 2, 2, 4]
  random_seed: 3
action: {{kappa: 0.11, mu: 0.07}}
solver: {{tol: 1.0e-8, backend: xla}}
physics:
{physics}
  output: {out}
"""


def _run(monkeypatch, tmp_path, module_main, physics, name, dev=False):
    out = str(tmp_path / name)
    cfgp = tmp_path / f"{name}.yaml"
    cfgp.write_text(TINY.format(physics=physics, out=out))
    monkeypatch.setattr(sys, "argv", ["prog", "--config", str(cfgp),
                                      "--device", "cpu"])
    if dev:
        monkeypatch.setenv("TPUQCD_DEVICE_CONTRACT", "1")
    else:
        monkeypatch.delenv("TPUQCD_DEVICE_CONTRACT", raising=False)
    module_main()
    return out


TWOP_PHYS = """  source_positions: [[0, 0, 0, 0]]
  momenta: [[0, 0, 0], [1, 0, 0]]
  smear_n_ape: 0
  smear_n_gauss: 1
  smear_alpha_gauss: 1.0
  projectors: [P+]"""

THREEP_PHYS = """  source_positions: [[0, 0, 0, 0]]
  t_sinks: [2]
  projectors: [P+]
  baryons: [proton, neutron]
  momenta: [[0, 0, 0]]
  smear_n_ape: 0
  smear_n_gauss: 1
  smear_alpha_gauss: 1.0"""

LOOPS_PHYS = """  n_noise: 2
  momenta: [[0, 0, 0]]"""


def _h5_all(path):
    vals = {}

    def visit(name, obj):
        if isinstance(obj, h5py.Dataset):
            vals[name] = np.asarray(obj)
    with h5py.File(path, "r") as f:
        f.visititems(visit)
    return vals


@pytest.mark.slow
def test_cli_twop_host_vs_device(monkeypatch, tmp_path):
    from tpuqcd.cli.run_twop import main
    host = _run(monkeypatch, tmp_path, main, TWOP_PHYS, "twop_h.h5")
    dev = _run(monkeypatch, tmp_path, main, TWOP_PHYS, "twop_d.h5",
               dev=True)
    vh, vd = _h5_all(host), _h5_all(dev)
    assert any("twop/proton" in k for k in vh)
    assert set(vh) == set(vd)
    for k in vh:
        np.testing.assert_allclose(vd[k], vh[k], rtol=5e-3,
                                   atol=1e-5 * max(1.0, np.abs(vh[k]).max()))


@pytest.mark.slow
def test_cli_threeptwop_host_vs_device(monkeypatch, tmp_path):
    from tpuqcd.cli.run_threeptwop import main
    host = _run(monkeypatch, tmp_path, main, THREEP_PHYS, "tp_h.h5")
    dev = _run(monkeypatch, tmp_path, main, THREEP_PHYS, "tp_d.h5",
               dev=True)
    vh, vd = _h5_all(host), _h5_all(dev)
    assert any(k.startswith("threep/proton") for k in vh)
    assert any(k.startswith("threep/neutron") for k in vh)
    assert any(k.startswith("threep_der/proton") for k in vh)
    assert any(k.startswith("twop/neutron") for k in vh)
    assert set(vh) == set(vd)
    for k in vh:
        np.testing.assert_allclose(vd[k], vh[k], rtol=1e-2,
                                   atol=1e-4 * max(1.0, np.abs(vh[k]).max()))


@pytest.mark.slow
def test_cli_loops(monkeypatch, tmp_path):
    from tpuqcd.cli.run_loops import main
    out = _run(monkeypatch, tmp_path, main, LOOPS_PHYS, "loops.h5")
    vals = _h5_all(out)
    assert vals, "loops CLI wrote no datasets"
    # device-contraction path (different noise realization, same schema)
    dev = _run(monkeypatch, tmp_path, main, LOOPS_PHYS, "loops_d.h5",
               dev=True)
    vd = _h5_all(dev)
    assert set(vd) == set(vals)
    for k in vd:
        assert vd[k].shape == vals[k].shape
        assert np.all(np.isfinite(vd[k]))


@pytest.mark.slow
def test_cli_loops_unified_tsm_dilution_deflation(monkeypatch, tmp_path):
    """The full reference estimator structure in ONE run (SURVEY.md
    §4.5 calcMG_loops_w_oneD_TSM): TSM x one-end x one-derivative x
    dilution x deflation, host and device paths, same schema."""
    from tpuqcd.cli.run_loops import main
    phys = """  n_noise: 1
  tsm_cheap: 1
  tsm_maxiter_cheap: 5
  n_deflate: 2
  dilute_t: 2
  momenta: [[0, 0, 0]]"""
    out = _run(monkeypatch, tmp_path, main, phys, "loops_uni.h5")
    vals = _h5_all(out)
    assert any("oneend_lowmode/" in k for k in vals), list(vals)
    assert any("loops/oneend/" in k for k in vals)
    assert any("oneend_der/" in k for k in vals)
    assert any("oneend_lowmode_der/" in k for k in vals)
    for k in vals:
        assert np.all(np.isfinite(vals[k])), k
    dev = _run(monkeypatch, tmp_path, main, phys, "loops_uni_d.h5",
               dev=True)
    vd = _h5_all(dev)
    assert set(vd) == set(vals)


@pytest.mark.slow
def test_cli_loops_deflated(monkeypatch, tmp_path):
    """Deflated loops: exact low-mode part + deflated stochastic part."""
    from tpuqcd.cli.run_loops import main
    phys = """  n_noise: 2
  n_deflate: 2
  momenta: [[0, 0, 0]]"""
    out = _run(monkeypatch, tmp_path, main, phys, "loops_defl.h5")
    vals = _h5_all(out)
    assert any("lowmode" in k for k in vals), list(vals)
    assert any("oneend" in k for k in vals)
    for k in vals:
        assert np.all(np.isfinite(vals[k])), k


@pytest.mark.slow
def test_cli_invert(monkeypatch, tmp_path, capsys):
    from tpuqcd.cli.run_invert import main
    cfgp = tmp_path / "inv.yaml"
    cfgp.write_text("""
gauge: {dims: [2, 2, 2, 4], random_seed: 1}
action: {kappa: 0.11, mu: 0.07}
solver: {tol: 1.0e-9, solver: cg, backend: xla}
""")
    monkeypatch.setattr(sys, "argv", ["prog", "--config", str(cfgp),
                                      "--device", "cpu"])
    main()


@pytest.mark.slow
def test_cli_invert_musweep(monkeypatch, tmp_path, caplog):
    """action.mu_list drives the multishift mass-sweep path: one
    Krylov space, every mass certified."""
    import logging
    from tpuqcd.cli.run_invert import main
    cfgp = tmp_path / "inv_sweep.yaml"
    cfgp.write_text("""
gauge: {dims: [2, 2, 2, 4], random_seed: 1}
action: {kappa: 0.11, mu: 0.07, mu_list: [0.07, 0.15, 0.3]}
solver: {tol: 1.0e-9, solver: cg, backend: xla}
""")
    monkeypatch.setattr(sys, "argv", ["prog", "--config", str(cfgp),
                                      "--device", "cpu"])
    with caplog.at_level(logging.INFO, logger="tpuqcd"):
        main()
    rels = [float(r.message.split("relres=")[1])
            for r in caplog.records if "certified relres" in r.message]
    assert len(rels) == 3
    assert all(r < 1e-6 for r in rels), rels


@pytest.mark.slow
def test_cli_twop_ensemble(monkeypatch, tmp_path):
    """gauge.random_seeds ensemble mode: one process measures every
    member (compile amortization), per-member output files, and each
    member reproduces the corresponding single-config run exactly."""
    from tpuqcd.cli.run_twop import main
    out = str(tmp_path / "ens.h5")
    cfgp = tmp_path / "ens.yaml"
    cfgp.write_text(f"""
gauge:
  dims: [2, 2, 2, 4]
  random_seeds: [3, 5]
action: {{kappa: 0.11, mu: 0.07}}
solver: {{tol: 1.0e-8, backend: xla}}
physics:
{TWOP_PHYS}
  output: {out}
""")
    monkeypatch.setattr(sys, "argv", ["prog", "--config", str(cfgp),
                                      "--device", "cpu"])
    monkeypatch.delenv("TPUQCD_DEVICE_CONTRACT", raising=False)
    main()
    v3 = _h5_all(str(tmp_path / "ens.s3.h5"))
    v5 = _h5_all(str(tmp_path / "ens.s5.h5"))
    assert set(v3) == set(v5) and len(v3) > 0
    # different configs -> different correlators
    k = next(iter(v3))
    assert not np.allclose(v3[k], v5[k])
    # member s3 == the plain single-config run with random_seed 3
    single = _run(monkeypatch, tmp_path, main, TWOP_PHYS, "one.h5")
    v1 = _h5_all(single)
    for k in v1:
        np.testing.assert_allclose(v3[k], v1[k], rtol=1e-6, atol=1e-8,
                                   err_msg=k)


@pytest.mark.slow
def test_cli_twop_ensemble_files_prefetch(monkeypatch, tmp_path):
    """gauge.config_files ensemble mode: ILDG members stream through
    the background read-ahead (io/prefetch.py) and each produces its
    own output file with finite, distinct correlators."""
    import jax
    import numpy as np_
    from tpuqcd import su3
    from tpuqcd.io.lime import write_ildg_gauge
    from tpuqcd.lattice import Lattice
    from tpuqcd.cli.run_twop import main
    lat = Lattice((2, 2, 2, 4))
    paths = []
    for seed in (3, 5):
        u = su3.random_gauge(jax.random.PRNGKey(seed), lat)
        p = str(tmp_path / f"conf{seed}.lime")
        write_ildg_gauge(p, np_.asarray(u), lat)
        paths.append(p)
    out = str(tmp_path / "ensf.h5")
    cfgp = tmp_path / "ensf.yaml"
    cfgp.write_text(f"""
gauge:
  dims: [2, 2, 2, 4]
  config_files: [{paths[0]}, {paths[1]}]
action: {{kappa: 0.11, mu: 0.07}}
solver: {{tol: 1.0e-8, backend: xla}}
physics:
{TWOP_PHYS}
  output: {out}
""")
    monkeypatch.setattr(sys, "argv", ["prog", "--config", str(cfgp),
                                      "--device", "cpu"])
    monkeypatch.delenv("TPUQCD_DEVICE_CONTRACT", raising=False)
    main()
    va = _h5_all(str(tmp_path / "ensf.conf3.h5"))
    vb = _h5_all(str(tmp_path / "ensf.conf5.h5"))
    assert set(va) == set(vb) and len(va) > 0
    k = next(iter(va))
    assert np.all(np.isfinite(va[k])) and np.all(np.isfinite(vb[k]))
    assert not np.allclose(va[k], vb[k])


@pytest.mark.slow
def test_cli_loops_eigenpair_checkpoint(monkeypatch, tmp_path):
    """Deflation eigenpairs dump on the first run and reload on the
    second (reference QKXTM_Deflation eigenvector read/write); the
    reloaded basis reproduces the exact low-mode datasets bit-for-bit
    and the deflated stochastic estimate to reduction tolerance."""
    from tpuqcd.cli.run_loops import main
    eig = str(tmp_path / "eig.npz")
    phys1 = f"""  n_noise: 1
  n_deflate: 2
  momenta: [[0, 0, 0]]
  eig_outfile: {eig}"""
    phys2 = f"""  n_noise: 1
  n_deflate: 2
  momenta: [[0, 0, 0]]
  eig_infile: {eig}"""
    out1 = _run(monkeypatch, tmp_path, main, phys1, "loops_eo.h5")
    assert os.path.exists(eig)
    out2 = _run(monkeypatch, tmp_path, main, phys2, "loops_ei.h5")
    v1, v2 = _h5_all(out1), _h5_all(out2)
    assert set(v1) == set(v2)
    for k in v1:
        np.testing.assert_allclose(
            v2[k], v1[k], rtol=1e-5,
            atol=1e-6 * max(1.0, np.abs(v1[k]).max()), err_msg=k)
