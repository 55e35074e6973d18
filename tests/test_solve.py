"""High-level solve API: certified 1e-10 residuals, CG and BiCGStab
(config 2 of BASELINE.md, CPU-runnable with the xla backend)."""
import jax
import jax.numpy as jnp
import pytest
import numpy as np

from tpuqcd import su3
from tpuqcd.fields import apply_boundary_phase_dev, random_spinor_dev
from tpuqcd.lattice import Lattice
from tpuqcd.operators import PackedTMOperatorPC
from tpuqcd.solve import solve_tm
from tpuqcd.solvers.bicgstab import bicgstab
from tpuqcd.solvers.reductions import norm2
from tpuqcd.utils.packed import pack_gauge

LAT = Lattice((4, 4, 4, 8))
KAPPA, MU = 0.115, 0.08


def _problem():
    u = apply_boundary_phase_dev(
        su3.random_gauge_dev(jax.random.PRNGKey(0), LAT), LAT)
    u_pk = pack_gauge(u)
    b = random_spinor_dev(jax.random.PRNGKey(1), LAT)
    b_pk = jnp.stack([
        jnp.stack([jnp.real(b[0]), jnp.imag(b[0])]),
        jnp.stack([jnp.real(b[1]), jnp.imag(b[1])])])
    return u_pk, b_pk


def test_bicgstab_converges():
    u_pk, b_pk = _problem()
    pc = PackedTMOperatorPC(LAT, kappa=KAPPA, mu=MU, backend="xla")
    bhat = pc.prepare(u_pk, b_pk)
    res = bicgstab(lambda x: pc.apply(u_pk, x), bhat, tol=1e-6,
                   maxiter=2000)
    assert bool(res.converged), float(res.relres)
    # true residual of the non-Hermitian system
    r = bhat - pc.apply(u_pk, res.x)
    rel = float(jnp.sqrt(norm2(r) / norm2(bhat)))
    assert rel < 1e-5, rel


@pytest.mark.slow
def test_solve_tm_cg_1e10():
    u_pk, b_pk = _problem()
    res = solve_tm(u_pk, b_pk, LAT, kappa=KAPPA, mu=MU, tol=1e-10,
                   backend="xla")
    assert float(res.relres) < 1e-10
    # independent f64 check of the full system M x = b
    pc_hp = PackedTMOperatorPC(LAT, kappa=KAPPA, mu=MU, backend="xla")
    u64 = u_pk.astype(jnp.float64)
    x = res.x
    from tpuqcd.ops.dslash_xla import dslash_eo_dev_ri
    from tpuqcd.operators import twist_apply_pk
    b64 = b_pk.astype(jnp.float64)
    re = twist_apply_pk(x[0], KAPPA, MU) - KAPPA * dslash_eo_dev_ri(
        u64, x[1], 1, LAT)
    ro = twist_apply_pk(x[1], KAPPA, MU) - KAPPA * dslash_eo_dev_ri(
        u64, x[0], 0, LAT)
    num = float(norm2(b64[0] - re) + norm2(b64[1] - ro))
    den = float(norm2(b64[0]) + norm2(b64[1]))
    assert (num / den) ** 0.5 < 1e-9


@pytest.mark.slow
def test_solve_tm_bicgstab():
    u_pk, b_pk = _problem()
    res = solve_tm(u_pk, b_pk, LAT, kappa=KAPPA, mu=MU, tol=1e-8,
                   solver="bicgstab", backend="xla")
    assert float(res.relres) < 1e-8


@pytest.mark.slow
def test_solve_tm_bf16_sloppy():
    """bf16 sloppy fields still reach 1e-8 via f64 refinement."""
    u_pk, b_pk = _problem()
    res = solve_tm(u_pk, b_pk, LAT, kappa=KAPPA, mu=MU, tol=1e-8,
                   sloppy_dtype=jnp.bfloat16, inner_tol=3e-2,
                   backend="xla")
    assert float(res.relres) < 1e-8, float(res.relres)


@pytest.mark.slow
def test_solve_tm_x0_warm_start_chunked():
    """Chunked executions via x0_e: two maxiter-limited calls restarting
    from the previous iterate reach the same certified tolerance as one
    long call (the bounded-execution pattern production uses at
    near-critical kappa — the remote TPU worker kills multi-minute
    single executions; BASELINE.md round-5 crash record)."""
    u_pk, b_pk = _problem()
    full = solve_tm(u_pk, b_pk, LAT, kappa=KAPPA, mu=MU, tol=1e-10,
                    backend="xla")
    total_iters = int(full.iters)
    chunk = max(4, total_iters // 2)
    r1 = solve_tm(u_pk, b_pk, LAT, kappa=KAPPA, mu=MU, tol=1e-10,
                  maxiter=chunk, backend="xla")
    assert float(r1.relres) > 1e-10          # genuinely mid-solve
    r2 = solve_tm(u_pk, b_pk, LAT, kappa=KAPPA, mu=MU, tol=1e-10,
                  backend="xla", x0_e=r1.x[0])
    assert float(r2.relres) <= 1e-10
    # the warm-started leg does roughly the remaining work, not a
    # from-scratch solve
    assert int(r2.iters) < total_iters
