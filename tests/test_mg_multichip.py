"""Multi-chip device MG (mg/shard.py): GSPMD-partitioned hierarchy on a
virtual CPU mesh must reproduce the single-device solve (SURVEY.md §5
single-device-equality discipline)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from tpuqcd import su3
from tpuqcd.fields import apply_boundary_phase_dev
from tpuqcd.lattice import Lattice
from tpuqcd.mg.device import DeviceFineLevel
from tpuqcd.mg.dsolve import DeviceMG, DeviceMGParams
from tpuqcd.mg.shard import make_mg_mesh, shard_fine_field, shard_mg
from tpuqcd.utils import pkalg as pk
from tpuqcd.utils.packed import pack_gauge

LAT = Lattice((8, 8, 8, 16))
KAPPA, MU = 0.137, 0.01


@pytest.fixture(scope="module")
def mg_and_rhs():
    u_dev = apply_boundary_phase_dev(
        su3.random_gauge_dev(jax.random.PRNGKey(3), LAT), LAT)
    u_pk = pack_gauge(u_dev)
    fine = DeviceFineLevel(LAT, u_pk, kappa=KAPPA, mu=MU, backend="xla")
    params = DeviceMGParams(n_vec=(6,), block=((4, 4, 4, 4),),
                            setup_iters=20, smoother_iters=3,
                            coarse_iters=16)
    mg = DeviceMG(fine, params)
    b = fine.random_field(jax.random.PRNGKey(11))
    return mg, b


def test_sharded_mg_matches_single_device(mg_and_rhs, cpu_devices):
    mg, b = mg_and_rhs
    res0 = mg.solve(b, tol=1e-6, maxiter=64)
    assert res0.converged, res0.relres
    x0 = np.asarray(res0.x)

    mesh = make_mg_mesh(4, devices=cpu_devices)
    shard_mg(mg, mesh)
    b_sh = shard_fine_field(mesh, b)
    res1 = mg.solve(b_sh, tol=1e-6, maxiter=64)
    assert res1.converged, res1.relres
    # same algorithm, same data -> same iterate up to reduction-order
    # noise amplified through the preconditioned Krylov iteration
    x1 = np.asarray(res1.x)
    ref = np.linalg.norm(x0)
    assert np.linalg.norm(x1 - x0) / ref < 2e-2, \
        np.linalg.norm(x1 - x0) / ref
    assert abs(res1.relres - res0.relres) < 1e-5


def test_sharded_vcycle_exact_match(mg_and_rhs, cpu_devices):
    """One V-cycle is a fixed arithmetic program — sharded vs single
    device must agree to f32 reduction-order tolerance."""
    mg, b = mg_and_rhs
    state = mg.state

    @jax.jit
    def pre(state, r):
        return mg._vcycle(state, 0, r)

    y0 = np.asarray(pre(state, b))
    mesh = make_mg_mesh(4, devices=cpu_devices)
    shard_mg(mg, mesh)
    y1 = np.asarray(pre(mg.state, shard_fine_field(mesh, b)))
    np.testing.assert_allclose(y1, y0, rtol=2e-4,
                               atol=2e-4 * float(np.abs(y0).max()))


def test_sharded_setup_matches(cpu_devices):
    """Null-vector generation on a SHARDED fine level (the setup itself
    runs multi-chip) produces the same hierarchy as single-device."""
    lat = Lattice((4, 4, 4, 8))
    u_dev = apply_boundary_phase_dev(
        su3.random_gauge_dev(jax.random.PRNGKey(5), lat), lat)
    u_pk = pack_gauge(u_dev)
    fine0 = DeviceFineLevel(lat, u_pk, kappa=0.12, mu=0.02, backend="xla")
    params = DeviceMGParams(n_vec=(4,), block=((2, 2, 2, 4),),
                            setup_iters=8, smoother_iters=2,
                            coarse_iters=8)
    mg0 = DeviceMG(fine0, params)

    from tpuqcd.mg.shard import shard_level
    mesh = make_mg_mesh(2, devices=cpu_devices)
    fine1 = shard_level(
        DeviceFineLevel(lat, u_pk, kappa=0.12, mu=0.02, backend="xla"),
        mesh)
    mg1 = DeviceMG(fine1, params)
    np.testing.assert_allclose(np.asarray(mg1.levels[1].links),
                               np.asarray(mg0.levels[1].links),
                               rtol=5e-4, atol=5e-5)
