"""Clover term: Hermiticity, free field, TM-clover operator + solve."""
import jax
import jax.numpy as jnp
import pytest
import numpy as np

from tpuqcd import su3
from tpuqcd.fields import EVEN, ODD
from tpuqcd.lattice import Lattice
from tpuqcd.operators import (CloverData, DeviceTMOperatorPC,
                              TMCloverOperatorPC)
from tpuqcd.ops.clover import clover_apply, clover_blocks
from tpuqcd.solvers.cg import cg_normal
from tpuqcd.solvers.reductions import norm2

LAT = Lattice((4, 4, 4, 8))
KAPPA, MU, CSW = 0.115, 0.06, 1.2


def _u(key=4):
    from tpuqcd.fields import apply_boundary_phase_dev
    return apply_boundary_phase_dev(
        su3.random_gauge_dev(jax.random.PRNGKey(key), LAT), LAT)


def _psi(key=5):
    from tpuqcd.fields import random_spinor_dev
    return random_spinor_dev(jax.random.PRNGKey(key), LAT, parities=1)


@pytest.mark.slow
def test_clover_blocks_hermitian():
    a = clover_blocks(_u(), LAT, KAPPA, CSW)
    an = np.asarray(a)  # [2,2,6,6,T,Z,S]
    np.testing.assert_allclose(an, np.conj(an.transpose(0, 1, 3, 2, 4, 5, 6)),
                               atol=1e-5)


@pytest.mark.slow
def test_clover_free_field_identity():
    """Unit gauge: F = 0, A = 1, clover apply is the identity and the
    TM-clover operator reduces to plain TM."""
    u = su3.unit_gauge_dev(LAT)
    a = clover_blocks(u, LAT, KAPPA, CSW)
    psi = _psi()
    out = clover_apply(a[EVEN], psi)
    np.testing.assert_allclose(np.asarray(out), np.asarray(psi), atol=1e-6)

    clov = CloverData.build(u, LAT, KAPPA, MU, CSW)
    op_c = TMCloverOperatorPC(LAT, kappa=KAPPA, mu=MU, csw=CSW)
    op_t = DeviceTMOperatorPC(LAT, kappa=KAPPA, mu=MU)
    np.testing.assert_allclose(np.asarray(op_c.apply(u, clov, psi)),
                               np.asarray(op_t.apply(u, psi)), atol=1e-5)


def test_tmclover_adjointness():
    """<x, M y> == <Mdag x, y> for the even-odd TM-clover operator."""
    u = _u()
    clov = CloverData.build(u, LAT, KAPPA, MU, CSW)
    op = TMCloverOperatorPC(LAT, kappa=KAPPA, mu=MU, csw=CSW)
    y = _psi(11)
    x = _psi(12)
    my = np.asarray(op.apply(u, clov, y)).ravel()
    mdx = np.asarray(op.apply_dagger(u, clov, x)).ravel()
    lhs = np.vdot(np.asarray(x).ravel(), my)
    rhs = np.vdot(mdx, np.asarray(y).ravel())
    np.testing.assert_allclose(lhs, rhs, rtol=3e-5)


@pytest.mark.slow
def test_tmclover_solve():
    """CG on the TM-clover normal equations + full-system residual through
    prepare/reconstruct (true-residual self-oracle)."""
    u = _u()
    clov = CloverData.build(u, LAT, KAPPA, MU, CSW)
    op = TMCloverOperatorPC(LAT, kappa=KAPPA, mu=MU, csw=CSW)
    from tpuqcd.fields import random_spinor_dev
    b = random_spinor_dev(jax.random.PRNGKey(21), LAT)  # [2, 4,3,T,Z,S]
    bhat = op.prepare(u, clov, b)
    res = cg_normal(lambda v: op.apply(u, clov, v),
                    lambda v: op.apply_dagger(u, clov, v),
                    bhat, tol=1e-6, maxiter=3000)
    assert bool(res.converged), float(res.relres)
    x = op.reconstruct(u, clov, res.x, b)
    # full-system check: M x = b with
    #   even rows: Atw x_e - k D_eo x_o;  odd rows: Atw x_o - k D_oe x_e
    from tpuqcd.ops.dslash_xla import dslash_eo_dev
    from tpuqcd.ops.clover import clover_apply as capply
    from tpuqcd.operators import gamma5_apply_dev
    t = 2.0 * KAPPA * MU

    def atw(par, v):
        return capply(clov.a_blocks[par], v) + (1j * t) * gamma5_apply_dev(v)

    re = atw(EVEN, x[0]) - KAPPA * dslash_eo_dev(u, x[1], ODD, LAT)
    ro = atw(ODD, x[1]) - KAPPA * dslash_eo_dev(u, x[0], EVEN, LAT)
    rel = float(jnp.sqrt((norm2(b[0] - re) + norm2(b[1] - ro)) /
                         (norm2(b[0]) + norm2(b[1]))))
    assert rel < 5e-6, rel


@pytest.mark.slow
def test_packed_clover_pallas_matches_complex():
    """Fused Pallas clover epilogues == the complex TM-clover operator
    (interpreter mode)."""
    from tpuqcd.operators import PackedTMCloverOperatorPC
    from tpuqcd.utils.packed import pack_gauge, pack_spinor, unpack_spinor
    u = _u()
    clov = CloverData.build(u, LAT, KAPPA, MU, CSW)
    op_ref = TMCloverOperatorPC(LAT, kappa=KAPPA, mu=MU, csw=CSW)
    psi = _psi(31)
    ref = op_ref.apply(u, clov, psi)
    refd = op_ref.apply_dagger(u, clov, psi)

    op = PackedTMCloverOperatorPC(LAT, kappa=KAPPA, mu=MU, csw=CSW,
                                  interpret=True)
    u_pk = pack_gauge(u)
    fields = op.make_fields(u_pk, clov)
    psi_pk = pack_spinor(psi)
    out = unpack_spinor(op.apply(fields, psi_pk))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)
    outd = unpack_spinor(op.apply_dagger(fields, psi_pk))
    np.testing.assert_allclose(np.asarray(outd), np.asarray(refd),
                               atol=3e-5)
    # the dtype-generic XLA backend (also the f64 hp operator) agrees
    op_x = PackedTMCloverOperatorPC(LAT, kappa=KAPPA, mu=MU, csw=CSW,
                                    backend="xla")
    out_x = unpack_spinor(op_x.apply(fields, psi_pk))
    np.testing.assert_allclose(np.asarray(out_x), np.asarray(ref),
                               atol=3e-5)
    # prepare/reconstruct against the complex operator
    b = jnp.stack([_psi(41), _psi(42)])
    b_pk = jnp.stack([pack_spinor(b[0]), pack_spinor(b[1])])
    bhat = op_x.prepare(fields, b_pk)
    want_bhat = op_ref.prepare(u, clov, b)
    np.testing.assert_allclose(np.asarray(unpack_spinor(bhat)),
                               np.asarray(want_bhat), atol=3e-5)
    x = op_x.reconstruct(fields, bhat, b_pk)
    want_x = op_ref.reconstruct(u, clov, unpack_spinor(bhat), b)
    np.testing.assert_allclose(np.asarray(unpack_spinor(x[1])),
                               np.asarray(want_x[1]), atol=3e-5)


@pytest.mark.slow
def test_solve_tm_clover_bicgstab_bf16():
    """BASELINE config 2: even-odd TM-clover, mixed fp32/bf16 BiCGStab
    to a certified 1e-10 residual through the high-level solve API."""
    from tpuqcd.solve import make_clover_fields, solve_tm
    from tpuqcd.utils.packed import pack_gauge, pack_spinor, unpack_spinor

    u = _u(11)
    u_pk = pack_gauge(u)
    clover = make_clover_fields(u_pk, LAT, kappa=KAPPA, mu=MU, csw=CSW)
    from tpuqcd.fields import random_spinor_dev
    b = random_spinor_dev(jax.random.PRNGKey(21), LAT)
    b_pk = jnp.stack([pack_spinor(b[0]), pack_spinor(b[1])])
    res = solve_tm(u_pk, b_pk, LAT, kappa=KAPPA, mu=MU, csw=CSW,
                   clover=clover, tol=1e-10, solver="bicgstab",
                   sloppy_dtype=jnp.bfloat16, backend="xla",
                   inner_tol=1e-4)
    assert float(res.relres) < 1e-10, float(res.relres)
    # independent check: the solution satisfies the COMPLEX-layout
    # TM-clover eo system
    clov = CloverData.build(u, LAT, KAPPA, MU, CSW)
    op = TMCloverOperatorPC(LAT, kappa=KAPPA, mu=MU, csw=CSW)
    from tpuqcd.utils.packed import unpack_spinor as unpk
    x = jnp.stack([unpk(res.x[0].astype(jnp.float32)),
                   unpk(res.x[1].astype(jnp.float32))])
    bhat = op.prepare(u, clov, b)
    r = bhat - op.apply(u, clov, x[0])
    rel = float(jnp.sqrt(norm2(r) / norm2(bhat)))
    assert rel < 5e-6, rel   # f32 cross-check floor
