"""Oracle Dslash correctness: eo vs full, g5-Hermiticity, free field."""
import jax
import jax.numpy as jnp
import numpy as np

from tpuqcd import su3
from tpuqcd.fields import (EVEN, ODD, apply_boundary_phase, full_to_eo,
                           gauge_full_to_eo, random_spinor)
from tpuqcd.gammas import GAMMA
from tpuqcd.lattice import Lattice
from tpuqcd.operators import TMOperator, TMOperatorPC, gamma5_apply
from tpuqcd.ops.dslash_ref import dslash_eo, dslash_full

LAT = Lattice((4, 4, 4, 8))
KEY = jax.random.PRNGKey(7)


def _setup(dtype=jnp.complex64):
    ku, kp = jax.random.split(KEY)
    u = apply_boundary_phase(su3.random_gauge(ku, LAT, dtype=dtype), LAT)
    psi = random_spinor(kp, LAT, dtype=dtype)
    return u, psi


def test_eo_matches_full():
    """full_to_eo(D_full psi) parity p == D_{p<-1-p} (full_to_eo psi)[1-p]."""
    u, psi = _setup()
    d_full = dslash_full(u, psi)
    d_full_eo = full_to_eo(d_full, LAT)
    u_eo = gauge_full_to_eo(u, LAT)
    psi_eo = full_to_eo(psi, LAT)
    d_even = dslash_eo(u_eo, psi_eo[ODD], ODD, LAT)
    d_odd = dslash_eo(u_eo, psi_eo[EVEN], EVEN, LAT)
    np.testing.assert_allclose(np.asarray(d_even), np.asarray(d_full_eo[EVEN]),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(d_odd), np.asarray(d_full_eo[ODD]),
                               atol=2e-5)


def test_free_field_momentum_space():
    """Unit gauge: D acts diagonally in momentum space with the known
    symbol D(p) = sum_mu [2 cos p_mu - 2 i gamma_mu sin p_mu]  (SURVEY §8.2).

    Plane wave psi(x) = e^{i p.x} chi must satisfy D psi = D(p) chi e^{i p.x}.
    Antiperiodic T folded in => use half-integer t momentum.
    """
    u = apply_boundary_phase(su3.unit_gauge(LAT), LAT)
    T, Z, Y, X = LAT.full_shape
    rng = np.random.default_rng(0)
    chi = (rng.normal(size=(4, 3)) + 1j * rng.normal(size=(4, 3)))
    # integer modes + antiperiodic half-integer shift in t
    n = np.array([1, 2, 0, 3])  # (x,y,z,t) mode numbers
    p = 2 * np.pi * n / np.array([X, Y, Z, T])
    p[3] = 2 * np.pi * (n[3] + 0.5) / T
    t, z, y, x = np.meshgrid(np.arange(T), np.arange(Z), np.arange(Y),
                             np.arange(X), indexing="ij")
    phase = np.exp(1j * (p[0] * x + p[1] * y + p[2] * z + p[3] * t))
    psi = (phase[..., None, None] * chi).astype(np.complex64)
    d = np.asarray(dslash_full(u, jnp.asarray(psi)))
    symbol = sum(2 * np.cos(p[mu]) * np.eye(4) -
                 2j * np.sin(p[mu]) * GAMMA[mu] for mu in range(4))
    expect = (phase[..., None, None] *
              np.einsum("ab,bc->ac", symbol, chi))
    np.testing.assert_allclose(d, expect.astype(np.complex64), atol=1e-4)


def test_g5_hermiticity_full():
    """g5 M(mu) g5 = M(-mu)^dag  <=>  <x, M y> = <g5 M(-mu) g5 x, y>."""
    u, psi = _setup()
    x = random_spinor(jax.random.PRNGKey(21), LAT)
    m = TMOperator(LAT, kappa=0.12, mu=0.05)
    my = np.asarray(m.apply(u, psi)).ravel()
    mdx = np.asarray(m.apply_dagger(u, x)).ravel()
    lhs = np.vdot(np.asarray(x).ravel(), my)
    rhs = np.vdot(mdx, np.asarray(psi).ravel())
    np.testing.assert_allclose(lhs, rhs, rtol=2e-5)


def test_pc_schur_consistency():
    """Mhat x_e from the PC operator == Schur complement of the full M."""
    u, psi = _setup()
    kappa, mu = 0.13, 0.03
    u_eo = gauge_full_to_eo(u, LAT)
    psi_eo = full_to_eo(psi, LAT)
    pc = TMOperatorPC(LAT, kappa=kappa, mu=mu)
    mhat = pc.apply(u_eo, psi_eo[EVEN])

    # build the same from full-operator pieces:
    m = TMOperator(LAT, kappa=kappa, mu=mu)
    from tpuqcd.operators import twist_apply, twist_inv_apply
    a_psi = twist_apply(psi_eo[EVEN], kappa, mu)
    d_oe = dslash_eo(u_eo, psi_eo[EVEN], EVEN, LAT)
    t = twist_inv_apply(d_oe, kappa, mu)
    d_eo = dslash_eo(u_eo, t, ODD, LAT)
    expect = a_psi - kappa ** 2 * d_eo
    np.testing.assert_allclose(np.asarray(mhat), np.asarray(expect), atol=1e-5)


def test_prepare_reconstruct_identity():
    """reconstruct(prepare) with the exact even solution reproduces the
    solution of the full system: if M x = b then
    Mhat x_e = bhat_e and reconstruct(x_e, b) = x."""
    u, x_full = _setup()
    kappa, mu = 0.11, 0.07
    m = TMOperator(LAT, kappa=kappa, mu=mu)
    b_full = m.apply(u, x_full)
    u_eo = gauge_full_to_eo(u, LAT)
    b_eo = full_to_eo(b_full, LAT)
    x_eo = full_to_eo(x_full, LAT)
    pc = TMOperatorPC(LAT, kappa=kappa, mu=mu)
    bhat = pc.prepare(u_eo, b_eo)
    np.testing.assert_allclose(np.asarray(pc.apply(u_eo, x_eo[EVEN])),
                               np.asarray(bhat), atol=3e-5)
    x_rec = pc.reconstruct(u_eo, x_eo[EVEN], b_eo)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x_eo), atol=3e-5)
