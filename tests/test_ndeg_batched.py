"""Non-degenerate TM doublet operator + batched multi-RHS CG."""
import jax
import jax.numpy as jnp
import numpy as np

from tpuqcd import su3
from tpuqcd.fields import apply_boundary_phase, random_spinor
from tpuqcd.lattice import Lattice
from tpuqcd.operators import NdegTMOperator, PackedTMOperatorPC
from tpuqcd.solvers.cg import cg_batched, cg_normal
from tpuqcd.solvers.reductions import norm2

LAT = Lattice((4, 4, 4, 8))


def test_ndeg_adjointness_and_solve():
    u = apply_boundary_phase(
        su3.random_gauge(jax.random.PRNGKey(0), LAT), LAT)
    op = NdegTMOperator(LAT, kappa=0.115, mubar=0.06, epsbar=0.09)
    x = jnp.stack([random_spinor(jax.random.PRNGKey(1), LAT),
                   random_spinor(jax.random.PRNGKey(2), LAT)])
    y = jnp.stack([random_spinor(jax.random.PRNGKey(3), LAT),
                   random_spinor(jax.random.PRNGKey(4), LAT)])
    lhs = np.vdot(np.asarray(x).ravel(), np.asarray(op.apply(u, y)).ravel())
    rhs = np.vdot(np.asarray(op.apply_dagger(u, x)).ravel(),
                  np.asarray(y).ravel())
    np.testing.assert_allclose(lhs, rhs, rtol=3e-5)

    # solve via CG on the normal equations; true-residual self-oracle
    b = x
    res = cg_normal(lambda v: op.apply(u, v),
                    lambda v: op.apply_dagger(u, v), b, tol=1e-6,
                    maxiter=3000)
    assert bool(res.converged), float(res.relres)
    r = b - op.apply(u, res.x)
    assert float(jnp.sqrt(norm2(r) / norm2(b))) < 5e-6


def test_cg_batched_matches_sequential():
    """Batched 12-RHS CG == 12 sequential solves (SURVEY §8.4 design)."""
    from tpuqcd.fields import apply_boundary_phase_dev, random_spinor_dev
    from tpuqcd.utils.packed import pack_gauge, pack_spinor
    u = apply_boundary_phase_dev(
        su3.random_gauge_dev(jax.random.PRNGKey(5), LAT), LAT)
    u_pk = pack_gauge(u)
    pc = PackedTMOperatorPC(LAT, kappa=0.115, mu=0.08, backend="xla")

    def normal(x):
        return pc.apply_dagger(u_pk, pc.apply(u_pk, x))

    rhs = []
    for k in range(4):
        psi = random_spinor_dev(jax.random.PRNGKey(10 + k), LAT,
                                parities=1)
        rhs.append(pack_spinor(psi))
    b = jnp.stack(rhs)
    res = cg_batched(normal, b, tol=1e-6, maxiter=600)
    assert bool(res.converged)
    for k in range(4):
        r = b[k] - normal(res.x[k])
        rel = float(jnp.sqrt(norm2(r) / norm2(b[k])))
        assert rel < 5e-6, (k, rel)


def test_packed_ndeg_vs_host():
    """PackedNdegTMOperator (fused kernels, interpret) == host
    NdegTMOperator through layout conversion; dagger identity holds."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tpuqcd import su3
    from tpuqcd.fields import (apply_boundary_phase, gauge_full_to_eo,
                               random_spinor)
    from tpuqcd.lattice import Lattice
    from tpuqcd.operators import NdegTMOperator, PackedNdegTMOperator
    from tpuqcd.ops.layout import gauge_to_device
    from tpuqcd.phys.propagator import full_to_packed, packed_to_full
    from tpuqcd.utils.packed import pack_gauge

    lat = Lattice((4, 4, 4, 8))
    u_full = apply_boundary_phase(
        su3.random_gauge(jax.random.PRNGKey(0), lat), lat)
    u_pk = pack_gauge(gauge_to_device(gauge_full_to_eo(u_full, lat), lat))
    host = NdegTMOperator(lat=lat, kappa=0.13, mubar=0.05, epsbar=0.03)
    dev = PackedNdegTMOperator.create(lat, u_pk, 0.13, 0.05, 0.03,
                                      backend="xla")
    chi = jnp.stack([random_spinor(jax.random.PRNGKey(1), lat),
                     random_spinor(jax.random.PRNGKey(2), lat)])
    chi_pk = jnp.stack([full_to_packed(chi[0], lat),
                        full_to_packed(chi[1], lat)])
    # full_to_packed gives [2par, 2ri, ...]; operator wants [2ri, 2par, ..]
    chi_pk = jnp.swapaxes(chi_pk, 1, 2)
    for name, got_pk, want in (
            ("apply", dev.apply(chi_pk), host.apply(u_full, chi)),
            ("dagger", dev.apply_dagger(chi_pk),
             host.apply_dagger(u_full, chi))):
        for f in range(2):
            got = packed_to_full(jnp.swapaxes(got_pk[f], 0, 1), lat)
            np.testing.assert_allclose(np.asarray(got),
                                       np.asarray(want[f]), atol=5e-5,
                                       err_msg=name)

    # pallas-interpret path == xla path
    devp = PackedNdegTMOperator.create(lat, u_pk, 0.13, 0.05, 0.03,
                                       backend="pallas", interpret=True)
    np.testing.assert_allclose(np.asarray(devp.apply(chi_pk)),
                               np.asarray(dev.apply(chi_pk)), atol=5e-5)
