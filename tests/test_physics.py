"""Physics layer: smearing, propagators, 2pt contractions.

Oracles: dense all-to-all inverses on tiny lattices, physics invariants
(pion positivity, gamma5-hermiticity flavor relation, translation
invariance of correlators).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuqcd import su3
from tpuqcd.fields import apply_boundary_phase, eo_to_full, full_to_eo
from tpuqcd.gammas import GAMMA5
from tpuqcd.lattice import Lattice
from tpuqcd.operators import TMOperator
from tpuqcd.ops.layout import gauge_to_device
from tpuqcd.phys.contract import meson_2pt, proton_2pt, proton_2pt_site
from tpuqcd.phys.propagator import (compute_propagator, full_to_packed,
                                    packed_to_full, point_sources)
from tpuqcd.phys.smear import gaussian_smear
from tpuqcd.utils.dense import (all_to_all_propagator,
                                point_propagator_from_dense)
from tpuqcd.utils.packed import pack_gauge

LAT = Lattice((2, 2, 2, 4))   # tiny: dense oracle is 12V = 384-dim
KAPPA, MU = 0.11, 0.07


def _u(key=1):
    return apply_boundary_phase(su3.random_gauge(jax.random.PRNGKey(key),
                                                 LAT), LAT)


_ATA_CACHE = {}


def _dense_all(u, tag):
    """cached u/d all-to-all propagators (flavor = +-mu)."""
    if tag in _ATA_CACHE:
        return _ATA_CACHE[tag]
    out = {}
    for name, flav in (("u", +1), ("d", -1)):
        m = TMOperator(LAT, kappa=KAPPA, mu=MU, flavor=flav)
        u128 = u.astype(jnp.complex128)

        @jax.jit
        def ap(v, m=m, u128=u128):
            return m.apply(u128, v.reshape(*LAT.full_shape, 4, 3)).reshape(
                *LAT.full_shape, 12)
        out[name] = all_to_all_propagator(ap, LAT)
    _ATA_CACHE[tag] = out
    return out


def _dense_props(u, tag="main", src=(0, 0, 0, 0)):
    ata = _dense_all(u, tag)
    return {k: point_propagator_from_dense(v, src) for k, v in ata.items()}


@pytest.mark.slow
def test_propagator_matches_dense():
    """12-RHS iterative propagator == dense-inverse propagator column."""
    u = _u()
    from tpuqcd.fields import gauge_full_to_eo
    from tpuqcd.ops.layout import gauge_to_device
    u_pk = pack_gauge(gauge_to_device(gauge_full_to_eo(u, LAT), LAT))
    srcs = point_sources(LAT, (0, 0, 0, 0))
    prop = compute_propagator(u_pk, srcs, LAT, kappa=KAPPA, mu=MU,
                              tol=1e-8, backend="xla")
    dense = _dense_props(u)["u"]
    np.testing.assert_allclose(np.asarray(prop), dense.astype(np.complex64),
                               atol=5e-6)


def test_flavor_g5_relation():
    """S_d(x,0) = g5 S_u(0,x)^dag g5 — for point sources this links the
    dense all-to-all flavors: Sd[x; 0] = g5 Su[0; x]^dag g5."""
    u = _u()
    ata = _dense_all(u, "main")
    s_u, s_d = ata["u"], ata["d"]
    g5 = np.real(np.diag(GAMMA5))
    # Sd(x,y) = g5 Su(y,x)^dag g5 elementwise in spin/color:
    # Sd[x, s a, y, u b] = g5[s] conj(Su[y, u b, x, s a]) g5[u]
    rhs = np.einsum("s,u,YZWXubtzyxsa->tzyxsaYZWXub",
                    g5, g5, np.conj(s_u))
    np.testing.assert_allclose(s_d, rhs, atol=1e-10)


def test_pion_positive_and_equals_norm():
    """Pion correlator (Gamma = g5, s1 = s2 = Su) = sum |S|^2 > 0."""
    u = _u()
    su_ = _dense_props(u)["u"]
    c = np.asarray(meson_2pt(jnp.asarray(su_), jnp.asarray(su_), GAMMA5,
                             LAT, np.array([[0, 0, 0]])))[0]
    direct = np.sum(np.abs(su_) ** 2, axis=(1, 2, 3, 4, 5, 6, 7))
    np.testing.assert_allclose(np.real(c), direct, rtol=1e-5)
    assert np.max(np.abs(np.imag(c))) < 1e-8 * np.max(np.abs(c))


def test_proton_translation_invariance():
    """Spatial relabeling: proton C(t, p=0) from the x-rolled gauge with
    the source at the origin equals C(t, p=0) from the original gauge
    with the source at x=1 (pure site relabeling; x has no boundary
    phase).  Exercises the full Wick/epsilon machinery."""
    u = _u()
    props1 = _dense_props(u, src=(0, 0, 0, 1))   # source at x=1
    c_ref = np.asarray(proton_2pt(jnp.asarray(props1["u"]),
                                  jnp.asarray(props1["d"]), LAT,
                                  np.array([[0, 0, 0]])))[0]
    u_roll = jnp.roll(u, shift=-1, axis=4)       # x-axis of [4,T,Z,Y,X,..]
    props0 = _dense_props(u_roll, tag="xroll")
    c_roll = np.asarray(proton_2pt(jnp.asarray(props0["u"]),
                                   jnp.asarray(props0["d"]), LAT,
                                   np.array([[0, 0, 0]])))[0]
    np.testing.assert_allclose(c_roll, c_ref, rtol=2e-5, atol=1e-10)


def test_proton_nonzero_and_parity_structure():
    u = _u()
    props = _dense_props(u)
    su_, sd_ = jnp.asarray(props["u"]), jnp.asarray(props["d"])
    c = np.asarray(proton_2pt(su_, sd_, LAT, np.array([[0, 0, 0]])))[0]
    assert np.all(np.isfinite(c)) and np.max(np.abs(c)) > 0


def test_gaussian_smearing_preserves_norm_shape():
    """Smearing conserves total charge-like sum for the free field
    ((1+aH)/(1+6a) with H 1 -> sum preserved on constant fields) and
    spreads a point source."""
    from tpuqcd.fields import gauge_full_to_eo
    u_dev = gauge_to_device(gauge_full_to_eo(
        su3.unit_gauge(LAT), LAT), LAT)
    from tpuqcd.phys.propagator import point_sources
    src = point_sources(LAT, (0, 0, 0, 0))[0, 0]   # spin 0 color 0
    from tpuqcd.ops.layout import spinor_to_device
    dev = spinor_to_device(full_to_eo(src, LAT), LAT)
    sm = gaussian_smear(u_dev, dev, LAT, alpha=1.0, n_steps=4)
    from tpuqcd.ops.layout import spinor_from_device
    out = np.asarray(eo_to_full(spinor_from_device(sm, LAT), LAT))
    # support has spread beyond the source site within the timeslice
    t0 = out[0]
    assert np.count_nonzero(np.abs(t0) > 1e-8) > np.count_nonzero(
        np.abs(np.asarray(src)[0]) > 1e-8)
    # spatial-only: other timeslices stay empty
    assert np.max(np.abs(out[1])) < 1e-7
    # free field: spatial sum per timeslice is invariant ((1+6a)/(1+6a)=1)
    s_before = np.asarray(src)[0].sum()
    s_after = t0.sum()
    np.testing.assert_allclose(s_after, s_before, rtol=1e-5)


def test_gaussian_smear_pk_matches_complex():
    """Packed-real Wuppertal smearing == the complex-layout version (the
    TPU production path; complex arrays cannot transfer to the axon
    backend)."""
    from tpuqcd import su3
    from tpuqcd.fields import gauge_full_to_eo
    from tpuqcd.lattice import Lattice
    from tpuqcd.ops.layout import gauge_to_device
    from tpuqcd.phys.smear import gaussian_smear, gaussian_smear_pk
    from tpuqcd.utils.packed import pack_gauge

    lat = Lattice((4, 4, 4, 8))
    u = su3.random_gauge(jax.random.PRNGKey(3), lat)
    u_dev = gauge_to_device(gauge_full_to_eo(u, lat), lat)
    u_pk = pack_gauge(u_dev)
    k1, k2 = jax.random.split(jax.random.PRNGKey(5))
    shape = (2, 4, 3, lat.Lt, lat.Lz, lat.Ly * lat.Lx // 2)
    psi = (jax.random.normal(k1, shape) +
           1j * jax.random.normal(k2, shape)).astype(jnp.complex64)
    want = gaussian_smear(u_dev, psi, lat, alpha=1.5, n_steps=4)
    psi_pk = jnp.stack([jnp.real(psi), jnp.imag(psi)], axis=1)
    got = gaussian_smear_pk(u_pk, psi_pk, lat, alpha=1.5, n_steps=4)
    got_c = got[:, 0] + 1j * got[:, 1]
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(want),
                               rtol=2e-4, atol=2e-5)
