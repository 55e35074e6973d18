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
