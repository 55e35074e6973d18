"""Batched multi-RHS MG solves (mg/dsolve.DeviceMG.solve_batch /
solve_certified_batch; SURVEY.md §8.4 "batch the 12 RHS").

Oracle: per-RHS results must match the sequential solve_certified path
to the certified tolerance, and the batched relres must certify against
the f64 operator per column.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuqcd import su3
from tpuqcd.fields import apply_boundary_phase_dev
from tpuqcd.lattice import Lattice
from tpuqcd.mg.device import DeviceFineLevel
from tpuqcd.mg.dsolve import DeviceMG, DeviceMGParams
from tpuqcd.utils import pkalg as pk
from tpuqcd.utils.packed import pack_gauge

LAT = Lattice((4, 4, 4, 8))
KAPPA, MU = 0.15, 0.1


@pytest.fixture(scope="module")
def mg():
    u_dev = apply_boundary_phase_dev(
        su3.random_gauge_dev(jax.random.PRNGKey(0), LAT), LAT)
    u_pk = pack_gauge(u_dev).astype(jnp.float32)
    fine = DeviceFineLevel(LAT, u_pk, KAPPA, MU, +1, backend="xla")
    params = DeviceMGParams(n_vec=(6,), block=((4, 4, 4, 4),),
                            setup_iters=30, coarse_iters=16)
    return DeviceMG(fine, params)


def _rand_batch(n):
    shape = (n, 2, 2, 4, 3, LAT.Lt, LAT.Lz, LAT.Ly * LAT.Lx // 2)
    return jax.random.normal(jax.random.PRNGKey(5), shape, jnp.float32)


@pytest.mark.slow
def test_solve_batch_matches_sequential(mg):
    b = _rand_batch(3)
    res = mg.solve_batch(b, tol=1e-5, maxiter=100)
    assert (res.relres <= 1e-5).all()
    for i in range(b.shape[0]):
        ri = mg.solve(b[i], tol=1e-5, maxiter=100)
        # same preconditioner, same tol: solutions agree to solver tol
        d = float(pk.norm2(res.x[i] - ri.x)) ** 0.5
        nrm = float(pk.norm2(ri.x)) ** 0.5
        assert d / nrm < 5e-4, (i, d / nrm)


@pytest.mark.slow
def test_solve_certified_batch(mg):
    b = _rand_batch(2)
    x, rel, iters = mg.solve_certified_batch(b, tol=1e-9, maxiter=100)
    assert rel.shape == (2,)
    assert (rel <= 1e-9).all()
    # independent f64 certification per column
    hp = mg.levels[0].as_hp()
    for i in range(2):
        r = b[i].astype(jnp.float64) - hp.apply(x[i])
        tru = float(jnp.sqrt(pk.norm2(r, dtype=jnp.float64) /
                             pk.norm2(b[i].astype(jnp.float64),
                                      dtype=jnp.float64)))
        assert tru <= 2e-9, (i, tru)


@pytest.mark.slow
def test_solve_certified_batch_zero_column(mg):
    b = _rand_batch(2)
    b = b.at[1].set(0.0)
    x, rel, _ = mg.solve_certified_batch(b, tol=1e-9, maxiter=100)
    assert float(jnp.max(jnp.abs(x[1]))) == 0.0
    assert rel[1] == 0.0
    assert rel[0] <= 1e-9


def test_solve_tm_mg_batch_layout(mg):
    from tpuqcd.solve import solve_tm_mg, solve_tm_mg_batch
    b = jnp.swapaxes(_rand_batch(2), 1, 2)   # [n, 2par, 2ri, ...]
    res = solve_tm_mg_batch(mg, b, tol=1e-9)
    r0 = solve_tm_mg(mg, b[0], tol=1e-9)
    d = float(pk.norm2(jnp.swapaxes(res.x[0], 0, 1)
                       - jnp.swapaxes(r0.x, 0, 1))) ** 0.5
    nrm = float(pk.norm2(r0.x)) ** 0.5
    assert d / nrm < 1e-8
