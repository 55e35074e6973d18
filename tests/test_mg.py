"""Adaptive multigrid: transfer orthonormality, Galerkin exactness,
V-cycle preconditioning (config 3 of BASELINE.md, small-lattice form)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuqcd import su3
from tpuqcd.fields import apply_boundary_phase
from tpuqcd.lattice import Lattice
from tpuqcd.mg.coarse import build_coarse
from tpuqcd.mg.level import FineTMLevel
from tpuqcd.mg.transfer import setup_transfer
from tpuqcd.mg.vcycle import MG, MGParams, _random_field
from tpuqcd.solvers.gcr import gcr
from tpuqcd.solvers.reductions import norm2

LAT = Lattice((4, 4, 4, 8))
KAPPA, MU = 0.120, 0.03


def _level():
    u = apply_boundary_phase(
        su3.random_gauge(jax.random.PRNGKey(2), LAT), LAT)
    return FineTMLevel(LAT, u, kappa=KAPPA, mu=MU)


def _null_vecs(level, n_vec=4):
    key = jax.random.PRNGKey(11)
    vs = []
    for k in range(n_vec):
        key, sub = jax.random.split(key)
        vs.append(_random_field(sub, level.dims, level.n))
    return jnp.stack(vs)


def test_hop_decomposition():
    """apply == apply_diag + sum of the 8 single-direction hops."""
    lv = _level()
    v = _random_field(jax.random.PRNGKey(3), lv.dims, lv.n)
    full = lv.apply(v)
    parts = lv.apply_diag(v)
    for mu in range(4):
        parts = parts + lv.apply_hop(v, mu, +1) + lv.apply_hop(v, mu, -1)
    np.testing.assert_allclose(np.asarray(full), np.asarray(parts),
                               atol=2e-5)


def test_transfer_orthonormal():
    """R P = identity on coarse fields; P preserves chirality."""
    lv = _level()
    tr = setup_transfer(_null_vecs(lv), lv.g5vec, (2, 2, 2, 2))
    vc = _random_field(jax.random.PRNGKey(5), tr.dims_c, tr.n_c)
    back = tr.restrict(tr.prolong(vc))
    np.testing.assert_allclose(np.asarray(back), np.asarray(vc), atol=1e-5)


def test_galerkin_exactness():
    """Coarse links reproduce R A P exactly (matrix-free cross-check)."""
    lv = _level()
    tr = setup_transfer(_null_vecs(lv), lv.g5vec, (2, 2, 2, 2))
    coarse = build_coarse(lv, tr)
    vc = _random_field(jax.random.PRNGKey(6), tr.dims_c, tr.n_c)
    via_links = coarse.apply(vc)
    via_rap = tr.restrict(lv.apply(tr.prolong(vc)))
    np.testing.assert_allclose(np.asarray(via_links), np.asarray(via_rap),
                               atol=3e-5)


@pytest.mark.slow
def test_mg_preconditioned_gcr():
    """MG-GCR converges and uses (substantially) fewer fine-operator
    iterations than unpreconditioned GCR."""
    lv = _level()
    params = MGParams(n_vec=(4,), block=((2, 2, 2, 2),), setup_iters=40,
                      smoother_iters=4, coarse_tol=0.2, coarse_maxiter=24,
                      mu_factor=4.0)
    mg = MG(lv, params)
    b = _random_field(jax.random.PRNGKey(8), lv.dims, lv.n)
    # fp32 fields floor the achievable residual near 1e-7; certified
    # tighter tolerances come from the f64 defect-correction outer loop
    res = mg.solve(b, tol=1e-6, maxiter=120)
    assert bool(res.converged), float(res.relres)
    # true residual check
    r = b - lv.apply(res.x)
    assert float(jnp.sqrt(norm2(r) / norm2(b))) < 1e-5

    res_plain = gcr(lambda v: lv.apply(v), b, tol=1e-6, maxiter=400)
    assert int(res.iters) < int(res_plain.iters), \
        (int(res.iters), int(res_plain.iters))


@pytest.mark.slow
def test_mg_three_level():
    """3-level recursion (4x4x4x8 -> 2x2x2x4 -> 1x1x1x2) runs and solves."""
    lv = _level()
    params = MGParams(n_vec=(4, 4), block=((2, 2, 2, 2), (2, 2, 2, 2)),
                      setup_iters=30, smoother_iters=4, coarse_tol=0.2,
                      coarse_maxiter=16, mu_factor=4.0)
    mg = MG(lv, params)
    b = _random_field(jax.random.PRNGKey(9), lv.dims, lv.n)
    res = mg.solve(b, tol=1e-6, maxiter=150)
    assert bool(res.converged), float(res.relres)


def test_mg_certified_1e10():
    """MG + f64 defect correction reaches a certified 1e-10 residual
    (the BASELINE.json headline 'MG twisted-mass solve to 1e-10')."""
    lv = _level()
    params = MGParams(n_vec=(4,), block=((2, 2, 2, 2),), setup_iters=40,
                      smoother_iters=4, coarse_tol=0.2, coarse_maxiter=24,
                      mu_factor=4.0)
    mg = MG(lv, params)
    b = _random_field(jax.random.PRNGKey(10), lv.dims, lv.n)
    u128 = lv.u.astype(jnp.complex128)
    lv_hp = FineTMLevel(LAT, u128, kappa=KAPPA, mu=MU)
    x, rel, iters = mg.solve_certified(b, lv_hp.apply, tol=1e-10,
                                       inner_tol=1e-5)
    assert rel < 1e-10, rel
