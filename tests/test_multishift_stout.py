"""Multi-shift CG and stout smearing."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuqcd import su3
from tpuqcd.fields import apply_boundary_phase_dev, random_spinor_dev
from tpuqcd.lattice import Lattice
from tpuqcd.operators import PackedTMOperatorPC
from tpuqcd.solvers.multishift import multishift_cg
from tpuqcd.solvers.reductions import norm2
from tpuqcd.utils.packed import pack_gauge, pack_spinor

LAT = Lattice((4, 4, 4, 8))


def test_multishift_cg():
    """each shifted system solved to tolerance with ONE Krylov space."""
    u = apply_boundary_phase_dev(
        su3.random_gauge_dev(jax.random.PRNGKey(0), LAT), LAT)
    u_pk = pack_gauge(u)
    pc = PackedTMOperatorPC(LAT, kappa=0.115, mu=0.08, backend="xla")

    def normal(x):
        return pc.apply_dagger(u_pk, pc.apply(u_pk, x))

    b = random_spinor_dev(jax.random.PRNGKey(1), LAT, parities=1)
    b_pk = jnp.stack([jnp.real(b), jnp.imag(b)]).astype(jnp.float32)
    shifts = [0.0, 0.05, 0.2]
    res = multishift_cg(normal, b_pk, shifts, tol=1e-6, maxiter=600)
    for i, s in enumerate(shifts):
        r = b_pk - (normal(res.xs[i]) +
                    jnp.float32(s) * res.xs[i])
        rel = float(jnp.sqrt(norm2(r) / norm2(b_pk)))
        assert rel < 2e-5, (i, s, rel)


@pytest.mark.slow
def test_stout_smearing():
    from tpuqcd.ops.gauge_tools import plaquette, stout_smear
    u = su3.random_gauge_dev(jax.random.PRNGKey(3), LAT)
    p0 = float(plaquette(u, LAT))
    us = stout_smear(u, LAT, rho=0.1, n_steps=2)
    p1 = float(plaquette(us, LAT))
    assert p1 > p0 + 0.05, (p0, p1)
    # links stay in SU(3) (exp of traceless-Hermitian is SU(3))
    m = np.asarray(us[0, 0]).reshape(3, 3, -1).transpose(2, 0, 1)
    np.testing.assert_allclose(m @ m.conj().transpose(0, 2, 1),
                               np.broadcast_to(np.eye(3), m.shape),
                               atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(m), np.ones(len(m)),
                               atol=1e-5)


def test_solve_tm_musweep():
    """Production mass sweep: solve_tm_musweep returns certified
    solutions of M(mu_i) x_i = b for every mu from ONE Krylov space
    (the exact shift identity M(mu)^dag M(mu) = M_W^dag M_W +
    (2 kappa mu)^2)."""
    from tpuqcd.solve import solve_tm_musweep
    u = apply_boundary_phase_dev(
        su3.random_gauge_dev(jax.random.PRNGKey(2), LAT), LAT)
    u_pk = pack_gauge(u)
    b = random_spinor_dev(jax.random.PRNGKey(3), LAT)  # both parities
    b_pk = jnp.stack([pack_spinor(b[0]), pack_spinor(b[1])])
    mu_list = (0.2, 0.05, 0.1)   # deliberately unsorted
    xs, relres, iters = solve_tm_musweep(
        u_pk, b_pk, LAT, kappa=0.115, mu_list=mu_list, tol=1e-8,
        maxiter=2000, backend="xla")
    assert xs.shape[0] == 3
    for i, mu in enumerate(mu_list):
        assert float(relres[i]) < 5e-6, (mu, float(relres[i]))


def test_smeared_gauge_stout_dispatch():
    """physics.smear_type: stout routes the smearing-gauge build through
    3-D stout smearing (performSTOUTnStep wiring)."""
    import jax
    from tpuqcd.cli.common import smeared_gauge
    from tpuqcd.ops.gauge_tools import stout_smear
    from tpuqcd.utils.config import PhysicsParams, RunConfig
    import dataclasses
    import numpy as np
    from tpuqcd import su3
    from tpuqcd.fields import gauge_full_to_eo
    from tpuqcd.ops.layout import gauge_to_device
    u = su3.random_gauge(jax.random.PRNGKey(3), LAT)
    u_dev = gauge_to_device(gauge_full_to_eo(u, LAT), LAT)
    cfg = RunConfig(physics=PhysicsParams(
        smear_type="stout", smear_n_ape=2, smear_rho_stout=0.1))
    got = smeared_gauge(cfg, LAT, u_dev)
    want = stout_smear(u_dev, LAT, rho=0.1, n_steps=2, spatial_only=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want))


@pytest.mark.slow
def test_solve_tm_musweep_mesh_matches_single(cpu_devices):
    """Mass sweep on a (2,1) LatticeMesh (matvec through the sharded
    fine level) == the single-device sweep; every mass certified
    (reference inv_multi_cg_quda under --gridsize [U])."""
    from tpuqcd.parallel.mesh import LatticeMesh
    from tpuqcd.solve import solve_tm_musweep
    u = apply_boundary_phase_dev(
        su3.random_gauge_dev(jax.random.PRNGKey(2), LAT), LAT)
    u_pk = pack_gauge(u)
    b = random_spinor_dev(jax.random.PRNGKey(3), LAT)
    b_pk = jnp.stack([pack_spinor(b[0]), pack_spinor(b[1])])
    mu_list = (0.1, 0.05)
    xs1, rel1, _ = solve_tm_musweep(
        u_pk, b_pk, LAT, kappa=0.115, mu_list=mu_list, tol=1e-8,
        maxiter=2000, backend="xla")
    lmesh = LatticeMesh.make(LAT, 2, 1, devices=cpu_devices)
    xs2, rel2, _ = solve_tm_musweep(
        u_pk, b_pk, LAT, kappa=0.115, mu_list=mu_list, tol=1e-8,
        maxiter=2000, backend="xla", lmesh=lmesh)
    for i in range(len(mu_list)):
        assert float(rel2[i]) < 5e-6
    np.testing.assert_allclose(np.asarray(xs2), np.asarray(xs1),
                               atol=2e-5)
