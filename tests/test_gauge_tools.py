"""Gauge tools: plaquette, gauge invariance, APE smearing."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuqcd import su3
from tpuqcd.lattice import Lattice
from tpuqcd.ops import mat3
from tpuqcd.ops.gauge_tools import (ape_smear, plaquette, spatial_plaquette)
from tpuqcd.ops.shifts import field_at, neighbor

LAT = Lattice((4, 6, 4, 8))


def _u():
    return su3.random_gauge_dev(jax.random.PRNGKey(3), LAT)


def test_plaquette_unit_gauge():
    u = su3.unit_gauge_dev(LAT)
    assert abs(float(plaquette(u, LAT)) - 1.0) < 1e-6
    assert abs(float(spatial_plaquette(u, LAT)) - 1.0) < 1e-6


def test_plaquette_gauge_invariance():
    """Plaquette unchanged under U_mu(x) -> g(x) U_mu(x) g(x+mu)^dag.

    Exercises the whole eo shift algebra in one shot."""
    u = _u()
    p0 = float(plaquette(u, LAT))
    # random gauge transform field g, one SU(3) per site: [2, 3, 3, T, Z, S]
    T, Z, Y, Xh = (*LAT.full_shape[:3], LAT.Lx // 2)
    g = su3.random_su3_leading(jax.random.PRNGKey(9), (2, T, Z, Y * Xh))
    g = jnp.transpose(g, (2, 0, 1, 3, 4, 5))  # -> [2(par), 3, 3, T, Z, S]
    u_new = []
    for mu in range(4):
        pars = []
        for p in (0, 1):
            g_xmu = field_at(g, p, [(mu, +1)], LAT)
            pars.append(mat3.mul(mat3.mul(g[p], u[mu, p]), g_xmu, bdag=True))
        u_new.append(jnp.stack(pars))
    u_new = jnp.stack(u_new)
    p1 = float(plaquette(u_new, LAT))
    assert abs(p1 - p0) < 1e-5, (p0, p1)


def test_neighbor_roundtrip():
    """neighbor(+mu) then neighbor(-mu) is the identity."""
    u = _u()
    f = u[0, 0]  # [3,3,T,Z,S] at even sites
    g = neighbor(f, 0, +1, 0, LAT)   # at odd sites
    h = neighbor(g, 0, -1, 1, LAT)   # back at even sites
    np.testing.assert_allclose(np.asarray(h), np.asarray(f), atol=0)
    for mu in range(4):
        g = neighbor(f, mu, +1, 0, LAT)
        h = neighbor(g, mu, -1, 1, LAT)
        np.testing.assert_allclose(np.asarray(h), np.asarray(f), atol=0)


def test_ape_smear():
    """APE smearing raises the spatial plaquette and stays in SU(3)."""
    u = _u()
    p0 = float(spatial_plaquette(u, LAT))
    us = ape_smear(u, LAT, alpha=0.5, n_steps=3)
    p1 = float(spatial_plaquette(us, LAT))
    assert p1 > p0 + 0.05, (p0, p1)
    # t links untouched
    np.testing.assert_allclose(np.asarray(us[3]), np.asarray(u[3]), atol=0)
    # SU(3): U U^dag = 1, det = 1
    m = np.asarray(us[0, 0]).reshape(3, 3, -1).transpose(2, 0, 1)
    np.testing.assert_allclose(m @ m.conj().transpose(0, 2, 1),
                               np.broadcast_to(np.eye(3), m.shape),
                               atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(m), np.ones(len(m)), atol=1e-5)


@pytest.mark.slow
def test_gauge_fixing_landau():
    """Overrelaxed Landau gauge fixing monotonically raises the gauge
    functional, leaves the plaquette invariant, and keeps links SU(3)."""
    from tpuqcd.ops.gauge_fix import gauge_fix
    u = _u()
    p0 = float(plaquette(u, LAT))
    uf, hist = gauge_fix(u, LAT, n_sweeps=40, tol=1e-12)
    assert len(hist) > 3
    # functional increases overall and ends higher than start
    assert hist[-1] > hist[0]
    # gauge-invariant observable unchanged (up to f32 roundoff from ~80
    # successive SU(3) projections)
    p1 = float(plaquette(uf, LAT))
    assert abs(p1 - p0) < 3e-4, (p0, p1)
    # SU(3) preserved
    m = np.asarray(uf[0, 0]).reshape(3, 3, -1).transpose(2, 0, 1)
    np.testing.assert_allclose(m @ m.conj().transpose(0, 2, 1),
                               np.broadcast_to(np.eye(3), m.shape),
                               atol=2e-5)


@pytest.mark.slow
def test_setup_gauge_fix_config_path(tmp_path):
    """gauge.fix: coulomb in a run config routes the loaded field
    through ops/gauge_fix before boundary phases: the plaquette (gauge
    invariant) is unchanged and the Coulomb functional of the returned
    pre-phase device field exceeds the unfixed one."""
    from tpuqcd.cli.common import setup_gauge
    from tpuqcd.fields import gauge_full_to_eo
    from tpuqcd.ops import mat3 as m3
    from tpuqcd.ops.layout import gauge_to_device
    from tpuqcd.utils.config import load_config

    def coulomb_f(u_dev):
        return sum(float(jnp.sum(jnp.real(m3.trace(u_dev[mu, p]))))
                   for p in (0, 1) for mu in (0, 1, 2))

    cfgp = tmp_path / "fix.yaml"
    cfgp.write_text(
        "gauge: {dims: [4, 4, 4, 8], random_seed: 7, fix: coulomb,"
        " fix_sweeps: 30, antiperiodic_t: false}\n")
    cfg = load_config(str(cfgp))
    lat, u_full, u_pk, u_dev = setup_gauge(cfg)
    # unfixed baseline with the same seed
    u0 = gauge_to_device(gauge_full_to_eo(
        su3.random_gauge(jax.random.PRNGKey(7), lat), lat), lat)
    assert coulomb_f(u_dev) > coulomb_f(u0) + 1.0
    p0, p1 = float(plaquette(u0, lat)), float(plaquette(u_dev, lat))
    assert abs(p1 - p0) < 3e-4, (p0, p1)


def test_config_rejects_bad_gauge_fix(tmp_path):
    from tpuqcd.utils.config import ConfigError, load_config
    cfgp = tmp_path / "bad.yaml"
    cfgp.write_text("gauge: {dims: [4, 4, 4, 8], fix: axial}\n")
    with pytest.raises(ConfigError, match="gauge.fix"):
        load_config(str(cfgp))


def test_tile_field_dev_plaquette_and_operator():
    """tile_field_dev: exact periodic replication in the eo-packed
    device layout.  (1) the tiled gauge's plaquette equals the
    original's; (2) replication commutes with the (phase-free,
    periodic-BC) twisted-mass operator: D_big(tile psi) == tile(D_small
    psi) — the identity that certifies the parity/packing arithmetic
    site-exactly."""
    import jax.numpy as jnp

    from tpuqcd.mg.device import DeviceFineLevel
    from tpuqcd.ops.gauge_tools import tile_field_dev
    from tpuqcd.utils.packed import pack_gauge

    lat_s = Lattice((4, 4, 4, 8))
    lat_b = Lattice((8, 8, 8, 16))
    u_s = su3.random_gauge_dev(jax.random.PRNGKey(5), lat_s)
    u_b = tile_field_dev(u_s, lat_s)
    p_s = float(jnp.real(plaquette(u_s, lat_s)))
    p_b = float(jnp.real(plaquette(u_b, lat_b)))
    assert abs(p_s - p_b) < 1e-6, (p_s, p_b)

    lv_s = DeviceFineLevel(lat_s, pack_gauge(u_s), 0.15, 0.01,
                           backend="xla")
    lv_b = DeviceFineLevel(lat_b, pack_gauge(u_b), 0.15, 0.01,
                           backend="xla")
    psi = lv_s.random_field(jax.random.PRNGKey(6))
    psi_b = tile_field_dev(psi, lat_s)
    want = tile_field_dev(jax.jit(lv_s.apply)(psi), lat_s)
    got = jax.jit(lv_b.apply)(psi_b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
