"""CG / mixed-precision refinement solver tests (config 1 of BASELINE.md).

True-residual self-oracle throughout (SURVEY.md §5): no golden data, a
solve is correct iff |b - M x| / |b| meets the requested tolerance.
"""
import jax
import jax.numpy as jnp
import pytest
import numpy as np

from tpuqcd import su3
from tpuqcd.fields import (EVEN, apply_boundary_phase, full_to_eo,
                           gauge_full_to_eo, point_source, random_spinor)
from tpuqcd.lattice import Lattice
from tpuqcd.operators import TMOperator, TMOperatorPC
from tpuqcd.solvers.cg import cg_normal, cg_refined
from tpuqcd.solvers.reductions import norm2

LAT = Lattice((4, 4, 4, 8))
KAPPA, MU = 0.115, 0.08


def _problem(dtype=jnp.complex64):
    ku, kb = jax.random.split(jax.random.PRNGKey(11))
    u = apply_boundary_phase(su3.random_gauge(ku, LAT), LAT).astype(dtype)
    b = random_spinor(kb, LAT).astype(dtype)
    return u, b


def test_cg_normal_fp32():
    """fp32 fields: converge to 1e-6 true residual (fp32 cancellation floor
    is ~1e-7, SURVEY.md §8.3)."""
    u, b = _problem()
    m = TMOperator(LAT, kappa=KAPPA, mu=MU)
    res = cg_normal(lambda x: m.apply(u, x), lambda x: m.apply_dagger(u, x),
                    b, tol=1e-6, maxiter=2000)
    assert bool(res.converged)
    assert float(res.relres) < 1e-6


def test_cg_refined_1e10():
    """Mixed precision: sloppy c64 inner + c128 true residual -> 1e-10.

    This is the CPU certification of the refinement algorithm; on TPU the
    hp operator is the f64 split-complex variant instead of c128.
    """
    u, b = _problem()
    u128 = u.astype(jnp.complex128)
    b128 = b.astype(jnp.complex128)
    m = TMOperator(LAT, kappa=KAPPA, mu=MU)

    def normal_sloppy(x):
        return m.apply_dagger(u, m.apply(u, x))

    def normal_hp(x):
        return m.apply_dagger(u128, m.apply(u128, x))

    bn = m.apply_dagger(u128, b128)
    res = cg_refined(normal_sloppy, normal_hp, bn, tol=1e-10,
                     inner_tol=1e-5, maxiter=4000)
    assert bool(res.converged), float(res.relres)
    # independent recomputation of the normal-system true residual:
    rel = float(jnp.sqrt(norm2(bn - normal_hp(res.x)) / norm2(bn)))
    assert rel < 1e-9
    # and the original system M x = b:
    rel_orig = float(jnp.sqrt(norm2(b128 - m.apply(u128, res.x)) / norm2(b128)))
    assert rel_orig < 1e-8, rel_orig


@pytest.mark.slow
def test_pc_solve_matches_full_solve():
    """Even-odd PC solve + reconstruct solves the full system."""
    u, b = _problem()
    m = TMOperator(LAT, kappa=KAPPA, mu=MU)
    u_eo = gauge_full_to_eo(u, LAT)
    b_eo = full_to_eo(b, LAT)
    pc = TMOperatorPC(LAT, kappa=KAPPA, mu=MU)
    bhat = pc.prepare(u_eo, b_eo)
    res = cg_normal(lambda x: pc.apply(u_eo, x),
                    lambda x: pc.apply_dagger(u_eo, x),
                    bhat, tol=1e-6, maxiter=2000)
    assert bool(res.converged)
    x_eo = pc.reconstruct(u_eo, res.x, b_eo)
    # full-system true residual
    from tpuqcd.fields import eo_to_full
    x_full = eo_to_full(x_eo, LAT)
    r = b - m.apply(u, x_full)
    rel = float(jnp.sqrt(norm2(r) / norm2(b)))
    assert rel < 5e-6, rel


def test_free_field_propagator():
    """Unit gauge: CG solution == analytic momentum-space propagator
    (SURVEY.md §8.2 minimum slice)."""
    u = apply_boundary_phase(su3.unit_gauge(LAT), LAT)
    b = point_source(LAT, t=0, z=0, y=0, x=0, spin=0, color=0)
    m = TMOperator(LAT, kappa=0.12, mu=0.05)
    res = cg_normal(lambda x: m.apply(u, x), lambda x: m.apply_dagger(u, x),
                    b, tol=1e-6, maxiter=4000)
    assert bool(res.converged)

    # analytic: x(p) = M(p)^{-1} b(p) with
    # M(p) = (1 + 2 i k mu g5) - k sum_mu (2 cos p_mu - 2 i g_mu sin p_mu)
    from tpuqcd.gammas import GAMMA, GAMMA5, ID4
    T, Z, Y, X = LAT.full_shape
    k, mu = 0.12, 0.05
    pt = 2 * np.pi * (np.arange(T) + 0.5) / T  # antiperiodic
    pz = 2 * np.pi * np.arange(Z) / Z
    py = 2 * np.pi * np.arange(Y) / Y
    px = 2 * np.pi * np.arange(X) / X
    # antiperiodic T: conjugate by the half-mode phase V(t) = e^{i pi t / T},
    # turning the -1 boundary link into the momentum shift p_t -> p_t + pi/T
    tt = np.arange(T)
    half = np.exp(-1j * np.pi * tt / T)
    bp = np.fft.fftn(np.asarray(b, dtype=np.complex128) *
                     half[:, None, None, None, None, None], axes=(0, 1, 2, 3))
    xp = np.zeros_like(bp)
    for it in range(T):
        for iz in range(Z):
            for iy in range(Y):
                for ix in range(X):
                    p = (px[ix], py[iy], pz[iz], pt[it])
                    mp = (ID4 + 2j * k * mu * GAMMA5 -
                          k * sum(2 * np.cos(p[d]) * ID4 -
                                  2j * np.sin(p[d]) * GAMMA[d]
                                  for d in range(4)))
                    xp[it, iz, iy, ix] = np.linalg.solve(
                        mp, bp[it, iz, iy, ix].reshape(4, 3)).reshape(4, 3)
    x_analytic = np.fft.ifftn(xp, axes=(0, 1, 2, 3)) / \
        half[:, None, None, None, None, None]
    np.testing.assert_allclose(np.asarray(res.x), x_analytic.astype(np.complex64),
                               atol=2e-5)
