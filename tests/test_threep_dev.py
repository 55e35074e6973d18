"""Device-resident 3pt contraction engine vs the host implementation
(phys/threep.py, itself validated against the dense all-to-all oracle in
test_threep.py).  Pure contraction identities — random "propagators"
exercise every spin/color/parity pathway without solves."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuqcd import su3
from tpuqcd.fields import gauge_full_to_eo
from tpuqcd.gammas import INSERTION_GAMMAS
from tpuqcd.lattice import Lattice
from tpuqcd.ops.layout import gauge_to_device
from tpuqcd.utils.packed import pack_gauge
from tpuqcd.phys.contract_dev import prop_to_device
from tpuqcd.phys.threep import threep_one_derivative, threep_ultralocal
from tpuqcd.phys.threep_dev import (cov_deriv_sym_pk, momentum_phases_pk,
                                    project_momenta_pk,
                                    threep_one_derivative_pk,
                                    threep_ultralocal_pk)

LAT = Lattice((4, 4, 4, 8))
MOMENTA = np.array([[0, 0, 0], [1, 0, 0], [0, 1, -1]])
SRC = (1, 0, 2, 3)  # (t, z, y, x)


def _rand_prop(key):
    k1, k2 = jax.random.split(key)
    shape = (*LAT.full_shape, 4, 3, 4, 3)
    return (jax.random.normal(k1, shape) +
            1j * jax.random.normal(k2, shape)).astype(jnp.complex64)


def test_packed_momentum_projection_roundtrip():
    """project_momenta_pk on a packed density == host projection."""
    from tpuqcd.phys.contract import project_momenta
    key = jax.random.PRNGKey(0)
    dens = (jax.random.normal(key, LAT.full_shape) +
            1j * jax.random.normal(jax.random.PRNGKey(1), LAT.full_shape)
            ).astype(jnp.complex64)
    from tpuqcd.fields import full_to_eo
    eo = full_to_eo(dens, LAT)  # [2,T,Z,Y,Xh]
    pk = jnp.stack([jnp.real(eo), jnp.imag(eo)]).reshape(
        2, 2, LAT.Lt, LAT.Lz, LAT.Ly * LAT.Lx // 2)
    sp = (SRC[3], SRC[2], SRC[1])
    want = np.asarray(project_momenta(dens, LAT, MOMENTA, sp))
    got = np.asarray(project_momenta_pk(pk, LAT, MOMENTA, sp))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-4)


def test_threep_ultralocal_dev_matches_host():
    bwd = _rand_prop(jax.random.PRNGKey(10))
    fwd = _rand_prop(jax.random.PRNGKey(11))
    want = threep_ultralocal(bwd, fwd, INSERTION_GAMMAS, LAT, MOMENTA,
                             src_pos=SRC)
    got = threep_ultralocal_pk(prop_to_device(bwd, LAT),
                               prop_to_device(fwd, LAT),
                               INSERTION_GAMMAS, LAT, MOMENTA, src_pos=SRC)
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                   rtol=3e-4, atol=2e-2)


@pytest.mark.slow
def test_cov_deriv_sym_pk_matches_host():
    from tpuqcd.phys.threep import cov_deriv_sym
    u = su3.random_gauge(jax.random.PRNGKey(2), LAT)
    u_pk = pack_gauge(gauge_to_device(gauge_full_to_eo(u, LAT), LAT))
    prop = _rand_prop(jax.random.PRNGKey(3))
    prop_pk = prop_to_device(prop, LAT)
    for nu in range(4):
        want = cov_deriv_sym(u, prop, nu)
        got_pk = cov_deriv_sym_pk(u_pk, prop_pk, nu, LAT)
        want_pk = np.asarray(prop_to_device(want, LAT))
        np.testing.assert_allclose(np.asarray(got_pk), want_pk,
                                   rtol=1e-4, atol=1e-5)
    # conjugated links (the D^T B case)
    want = cov_deriv_sym(jnp.conj(u), prop, 1)
    got_pk = cov_deriv_sym_pk(u_pk, prop_pk, 1, LAT, conj_links=True)
    np.testing.assert_allclose(np.asarray(got_pk),
                               np.asarray(prop_to_device(want, LAT)),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_proton_seq_source_pk_matches_host():
    from tpuqcd.gammas import PARITY_MINUS, PARITY_PLUS
    from tpuqcd.phys.threep import proton_seq_source
    from tpuqcd.phys.threep_dev import proton_seq_source_pk
    su = _rand_prop(jax.random.PRNGKey(20))
    sd = _rand_prop(jax.random.PRNGKey(21))
    su_pk, sd_pk = prop_to_device(su, LAT), prop_to_device(sd, LAT)
    # one leg per projector keeps the (heavy) CPU grad test quick; the
    # two legs share all code paths except the argnum of the grad
    from tpuqcd.gammas import PROJECTORS
    for leg, proj, snk in (("u", PARITY_PLUS, None),
                           ("d", PARITY_MINUS, None),
                           ("u", PROJECTORS["P5z"], None),  # complex pol.
                           ("u", PARITY_PLUS, np.array([1, 0, -1]))):
        want = proton_seq_source(su, sd, 3, leg, LAT, proj=proj,
                                 snk_mom=snk)
        got = proton_seq_source_pk(su_pk, sd_pk, 3, leg, LAT, proj=proj,
                                   snk_mom=snk)
        np.testing.assert_allclose(np.asarray(got),
                                   np.asarray(prop_to_device(want, LAT)),
                                   rtol=2e-3, atol=5e-3)


def test_backward_prop_pk_matches_host():
    """Identity 'solver' on both paths checks the g5/conj/transpose
    plumbing exactly; the real solvers are tested elsewhere."""
    from tpuqcd.phys.threep import backward_prop
    from tpuqcd.phys.threep_dev import backward_prop_pk
    seq = _rand_prop(jax.random.PRNGKey(30))
    want = backward_prop(seq, lambda b: b)
    got = backward_prop_pk(prop_to_device(seq, LAT), lambda b: b)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(prop_to_device(want, LAT)),
                               rtol=1e-5, atol=1e-6)


def test_threep_one_derivative_dev_matches_host():
    u = su3.random_gauge(jax.random.PRNGKey(4), LAT)
    u_pk = pack_gauge(gauge_to_device(gauge_full_to_eo(u, LAT), LAT))
    bwd = _rand_prop(jax.random.PRNGKey(12))
    fwd = _rand_prop(jax.random.PRNGKey(13))
    bwd_pk, fwd_pk = prop_to_device(bwd, LAT), prop_to_device(fwd, LAT)
    for mu, nu in ((0, 3), (3, 0), (1, 1), (2, 2)):
        want = np.asarray(threep_one_derivative(
            bwd, fwd, u, mu, nu, LAT, MOMENTA, src_pos=SRC))
        got = np.asarray(threep_one_derivative_pk(
            bwd_pk, fwd_pk, u_pk, mu, nu, LAT, MOMENTA, src_pos=SRC))
        np.testing.assert_allclose(got, want, rtol=3e-4, atol=2e-2)


def test_sink_smear_prop_pk_matches_host():
    """Packed sink smearing of a propagator / sequential source == the
    host sink_smear_propagator (the smeared-sink 3pt pipeline of
    run_threeptwop; reference seqSourceFixSink smears both the sink legs
    and the sequential source before the backward inversion)."""
    from tpuqcd.phys.propagator import (sink_smear_prop_pk,
                                        sink_smear_propagator)
    u = su3.random_gauge(jax.random.PRNGKey(7), LAT)
    u_dev = gauge_to_device(gauge_full_to_eo(u, LAT), LAT)
    u_pk = pack_gauge(u_dev)
    prop = _rand_prop(jax.random.PRNGKey(8))
    want = sink_smear_propagator(u_dev, prop, LAT, 1.5, 3)
    got = sink_smear_prop_pk(u_pk, prop_to_device(prop, LAT), LAT, 1.5, 3)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(prop_to_device(want, LAT)),
                               rtol=2e-4, atol=2e-4)


def test_project_all_momenta_fft_pk_matches_list():
    """One on-device FFT == the phase-list projection at every momentum
    (C25 cuFFT parity; incl. negative momenta via the % L index map and
    a nonzero source position via the pre-FFT roll)."""
    from tpuqcd.fields import full_to_eo
    from tpuqcd.phys.contract import project_momenta
    from tpuqcd.phys.threep_dev import project_all_momenta_fft_pk
    dens = (jax.random.normal(jax.random.PRNGKey(2), LAT.full_shape) +
            1j * jax.random.normal(jax.random.PRNGKey(3), LAT.full_shape)
            ).astype(jnp.complex64)
    eo = full_to_eo(dens, LAT)
    pk = jnp.stack([jnp.real(eo), jnp.imag(eo)]).reshape(
        2, 2, LAT.Lt, LAT.Lz, LAT.Ly * LAT.Lx // 2)
    sp = (SRC[3], SRC[2], SRC[1])
    moms = np.array([[0, 0, 0], [1, 0, 0], [0, -1, 2], [-1, 3, -2]])
    want = np.asarray(project_momenta(dens, LAT, moms, sp))
    grid = project_all_momenta_fft_pk(pk, LAT, sp)   # [T, Lz, Ly, Lx]
    got = np.stack([grid[:, n[2] % LAT.Lz, n[1] % LAT.Ly, n[0] % LAT.Lx]
                    for n in moms])
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-4)


def test_threep_ultralocal_fft_path_matches_host():
    """>= FFT_MOM_THRESHOLD momenta take the FFT projection inside
    threep_ultralocal_pk; results must match the host phase sums
    (nonzero source position exercises the pre-FFT roll)."""
    from tpuqcd.phys.threep_dev import FFT_MOM_THRESHOLD
    nmax = 2
    moms = np.array([(nx, ny, nz)
                     for nx in range(-nmax, nmax + 1)
                     for ny in range(-nmax, nmax + 1)
                     for nz in range(-nmax, nmax + 1)
                     if nx * nx + ny * ny + nz * nz <= 4])
    assert len(moms) >= FFT_MOM_THRESHOLD
    bwd = _rand_prop(jax.random.PRNGKey(40))
    fwd = _rand_prop(jax.random.PRNGKey(41))
    want = threep_ultralocal(bwd, fwd, INSERTION_GAMMAS, LAT, moms,
                             src_pos=SRC)
    got = threep_ultralocal_pk(prop_to_device(bwd, LAT),
                               prop_to_device(fwd, LAT),
                               INSERTION_GAMMAS, LAT, moms, src_pos=SRC)
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                   rtol=3e-4, atol=2e-2, err_msg=k)


def _dense_moms(q2max=4):
    nmax = int(q2max ** 0.5)
    return np.array([(nx, ny, nz)
                     for nx in range(-nmax, nmax + 1)
                     for ny in range(-nmax, nmax + 1)
                     for nz in range(-nmax, nmax + 1)
                     if nx * nx + ny * ny + nz * nz <= q2max])


def test_project_momenta_pk_fft_dispatch_matches_list():
    """project_momenta_pk itself dispatches to the FFT + gather at
    >= FFT_MOM_THRESHOLD momenta (covers the 2pt engines)."""
    from tpuqcd.fields import full_to_eo
    from tpuqcd.phys.contract import project_momenta
    from tpuqcd.phys.threep_dev import FFT_MOM_THRESHOLD
    moms = _dense_moms()
    assert len(moms) >= FFT_MOM_THRESHOLD
    dens = (jax.random.normal(jax.random.PRNGKey(8), LAT.full_shape) +
            1j * jax.random.normal(jax.random.PRNGKey(9), LAT.full_shape)
            ).astype(jnp.complex64)
    eo = full_to_eo(dens, LAT)
    pk = jnp.stack([jnp.real(eo), jnp.imag(eo)]).reshape(
        2, 2, LAT.Lt, LAT.Lz, LAT.Ly * LAT.Lx // 2)
    sp = (SRC[3], SRC[2], SRC[1])
    want = np.asarray(project_momenta(dens, LAT, moms, sp))
    got = np.asarray(project_momenta_pk(pk, LAT, moms, sp))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-4)


def test_threep_one_derivative_fft_path_matches_host():
    """Dense momenta route the one-derivative engine through the FFT."""
    moms = _dense_moms()
    u = su3.random_gauge(jax.random.PRNGKey(14), LAT)
    u_pk = pack_gauge(gauge_to_device(gauge_full_to_eo(u, LAT), LAT))
    bwd = _rand_prop(jax.random.PRNGKey(15))
    fwd = _rand_prop(jax.random.PRNGKey(16))
    bwd_pk, fwd_pk = prop_to_device(bwd, LAT), prop_to_device(fwd, LAT)
    for mu, nu in ((0, 3), (2, 1)):
        want = np.asarray(threep_one_derivative(
            bwd, fwd, u, mu, nu, LAT, moms, src_pos=SRC))
        got = np.asarray(threep_one_derivative_pk(
            bwd_pk, fwd_pk, u_pk, mu, nu, LAT, moms, src_pos=SRC))
        np.testing.assert_allclose(got, want, rtol=3e-4, atol=2e-2)
