"""Device-resident loop estimators vs the host implementations
(phys/loops.py, themselves validated against dense identities in
test_loops_deflation.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from tpuqcd.gammas import INSERTION_GAMMAS
from tpuqcd.lattice import Lattice
from tpuqcd.phys.loops import loop_one_end, loop_plain
from tpuqcd.phys.loops_dev import (loop_one_end_pk, loop_plain_pk,
                                   z4_noise_pk)
from tpuqcd.phys.propagator import full_to_packed, packed_to_full

LAT = Lattice((4, 4, 4, 8))
MOMENTA = np.array([[0, 0, 0], [0, 0, 1], [1, -1, 0]])


def _rand_field(key):
    k1, k2 = jax.random.split(key)
    shape = (*LAT.full_shape, 4, 3)
    return (jax.random.normal(k1, shape) +
            1j * jax.random.normal(k2, shape)).astype(jnp.complex64)


def test_loop_plain_pk_matches_host():
    eta = _rand_field(jax.random.PRNGKey(0))
    psi = _rand_field(jax.random.PRNGKey(1))
    want = loop_plain(eta, psi, INSERTION_GAMMAS, LAT, MOMENTA)
    got = loop_plain_pk(full_to_packed(eta, LAT), full_to_packed(psi, LAT),
                        INSERTION_GAMMAS, LAT, MOMENTA)
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                   rtol=3e-4, atol=5e-3)


def test_loop_one_end_pk_matches_host():
    psi = _rand_field(jax.random.PRNGKey(2))
    kappa, mu = 0.12, 0.03
    want = loop_one_end(psi, INSERTION_GAMMAS, LAT, MOMENTA, kappa, mu)
    got = loop_one_end_pk(full_to_packed(psi, LAT), INSERTION_GAMMAS, LAT,
                          MOMENTA, kappa, mu)
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                   rtol=3e-4, atol=5e-3)


def test_loop_der_pk_matches_host():
    """One-derivative loop insertions, device vs host (the covariant
    derivative itself is dense-oracle-tested in test_threep)."""
    from tpuqcd import su3
    from tpuqcd.fields import gauge_full_to_eo
    from tpuqcd.ops.layout import gauge_to_device
    from tpuqcd.phys.loops import loop_one_end_der, loop_plain_der
    from tpuqcd.phys.loops_dev import loop_one_end_der_pk, loop_plain_der_pk
    from tpuqcd.utils.packed import pack_gauge

    u = su3.random_gauge(jax.random.PRNGKey(4), LAT)
    u_pk = pack_gauge(gauge_to_device(gauge_full_to_eo(u, LAT), LAT))
    eta = _rand_field(jax.random.PRNGKey(5))
    psi = _rand_field(jax.random.PRNGKey(6))
    eta_pk, psi_pk = full_to_packed(eta, LAT), full_to_packed(psi, LAT)
    kappa, mu = 0.12, 0.03
    for nu in (0, 2, 3):
        want = loop_plain_der(eta, psi, u, INSERTION_GAMMAS, nu, LAT,
                              MOMENTA)
        got = loop_plain_der_pk(eta_pk, psi_pk, u_pk, INSERTION_GAMMAS,
                                nu, LAT, MOMENTA)
        for k in want:
            np.testing.assert_allclose(np.asarray(got[k]),
                                       np.asarray(want[k]),
                                       rtol=3e-4, atol=5e-3,
                                       err_msg=f"plain_der {k} nu={nu}")
        want = loop_one_end_der(psi, u, INSERTION_GAMMAS, nu, LAT,
                                MOMENTA, kappa, mu)
        got = loop_one_end_der_pk(psi_pk, u_pk, INSERTION_GAMMAS, nu,
                                  LAT, MOMENTA, kappa, mu)
        for k in want:
            np.testing.assert_allclose(np.asarray(got[k]),
                                       np.asarray(want[k]),
                                       rtol=3e-4, atol=5e-3,
                                       err_msg=f"oneend_der {k} nu={nu}")


def test_neutron_2pt_dev_matches_host():
    from tpuqcd.phys.contract import neutron_2pt
    from tpuqcd.phys.contract_dev import neutron_2pt_dev, prop_to_device
    k1, k2 = jax.random.split(jax.random.PRNGKey(9))
    shape = (*LAT.full_shape, 4, 3, 4, 3)
    su = (jax.random.normal(k1, shape) +
          1j * jax.random.normal(jax.random.fold_in(k1, 1), shape)
          ).astype(jnp.complex64)
    sd = (jax.random.normal(k2, shape) +
          1j * jax.random.normal(jax.random.fold_in(k2, 1), shape)
          ).astype(jnp.complex64)
    want = np.asarray(neutron_2pt(su, sd, LAT, MOMENTA))
    got = np.asarray(neutron_2pt_dev(prop_to_device(su, LAT),
                                     prop_to_device(sd, LAT), LAT,
                                     MOMENTA))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=2e-2)
    # isospin: neutron(u, d) == proton(d, u), and differs from proton
    from tpuqcd.phys.contract import proton_2pt
    np.testing.assert_allclose(want,
                               np.asarray(proton_2pt(sd, su, LAT, MOMENTA)))
    assert not np.allclose(want, np.asarray(proton_2pt(su, sd, LAT,
                                                       MOMENTA)))


def test_z4_noise_pk_statistics():
    eta_pk = z4_noise_pk(jax.random.PRNGKey(5), LAT)
    # unit modulus everywhere, exactly one of re/im nonzero
    mod2 = eta_pk[:, 0] ** 2 + eta_pk[:, 1] ** 2
    np.testing.assert_allclose(np.asarray(mod2), 1.0)
    # round-trips through the full layout (valid packed structure)
    eta = packed_to_full(eta_pk, LAT)
    assert eta.shape == (*LAT.full_shape, 4, 3)
    vals = np.unique(np.round(np.asarray(jnp.real(eta)), 6))
    assert set(vals) <= {-1.0, 0.0, 1.0}


def test_loop_plain_pk_fft_path_matches_host():
    """Dense momentum sets (>= FFT_MOM_THRESHOLD) route through the
    on-device FFT projection and must match the host phase sums."""
    from tpuqcd.phys.threep_dev import FFT_MOM_THRESHOLD
    nmax = 2
    moms = np.array([(nx, ny, nz)
                     for nx in range(-nmax, nmax + 1)
                     for ny in range(-nmax, nmax + 1)
                     for nz in range(-nmax, nmax + 1)
                     if nx * nx + ny * ny + nz * nz <= 4])
    assert len(moms) >= FFT_MOM_THRESHOLD    # 33: the FFT path fires
    eta = _rand_field(jax.random.PRNGKey(5))
    psi = _rand_field(jax.random.PRNGKey(6))
    want = loop_plain(eta, psi, INSERTION_GAMMAS, LAT, moms)
    got = loop_plain_pk(full_to_packed(eta, LAT), full_to_packed(psi, LAT),
                        INSERTION_GAMMAS, LAT, moms)
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                   rtol=3e-4, atol=5e-3, err_msg=k)
