"""Pallas Dslash kernel vs the XLA device-layout implementation.

Runs in Pallas interpreter mode on CPU (SURVEY.md §5: golden-reference
pattern, CI-runnable without a TPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuqcd import su3
from tpuqcd.fields import (EVEN, ODD, apply_boundary_phase_dev,
                           random_spinor_dev)
from tpuqcd.lattice import Lattice
from tpuqcd.operators import (DeviceTMOperatorPC, twist_apply_dev,
                              twist_inv_apply_dev)
from tpuqcd.ops.dslash_pallas import dslash_eo_pallas
from tpuqcd.ops.dslash_xla import dslash_eo_dev
from tpuqcd.utils.packed import pack_gauge, pack_spinor, unpack_spinor

LAT = Lattice((4, 6, 4, 8))
KAPPA, MU = 0.13, 0.06


def _setup():
    u = apply_boundary_phase_dev(
        su3.random_gauge_dev(jax.random.PRNGKey(0), LAT), LAT)
    psi = random_spinor_dev(jax.random.PRNGKey(1), LAT, parities=1)
    return u, psi


@pytest.mark.parametrize("parity", [EVEN, ODD])
@pytest.mark.parametrize("dagger", [False, True])
def test_pallas_matches_xla(parity, dagger):
    u, psi = _setup()
    ref = dslash_eo_dev(u, psi, parity, LAT, dagger=dagger)
    out = dslash_eo_pallas(pack_gauge(u), pack_spinor(psi), parity, LAT,
                           dagger=dagger, interpret=True)
    np.testing.assert_allclose(np.asarray(unpack_spinor(out)),
                               np.asarray(ref), atol=2e-5)


def test_pallas_twist_inv_epilogue():
    u, psi = _setup()
    ref = twist_inv_apply_dev(dslash_eo_dev(u, psi, EVEN, LAT), KAPPA, MU)
    out = dslash_eo_pallas(pack_gauge(u), pack_spinor(psi), EVEN, LAT,
                           epilogue="twist_inv", kappa=KAPPA, mu=MU,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(unpack_spinor(out)),
                               np.asarray(ref), atol=2e-5)


def test_pallas_xpay_epilogue_full_pc_apply():
    """Two fused kernel launches == the device PC operator apply."""
    u, psi = _setup()
    pc = DeviceTMOperatorPC(LAT, kappa=KAPPA, mu=MU)
    ref = pc.apply(u, psi)

    u_pk, psi_pk = pack_gauge(u), pack_spinor(psi)
    t1 = dslash_eo_pallas(u_pk, psi_pk, EVEN, LAT, epilogue="twist_inv",
                          kappa=KAPPA, mu=MU, interpret=True)
    out = dslash_eo_pallas(u_pk, t1, ODD, LAT, epilogue="xpay",
                           kappa=KAPPA, mu=MU, psi0_pk=psi_pk,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(unpack_spinor(out)),
                               np.asarray(ref), atol=3e-5)


def test_packed_operator_matches_device():
    """PackedTMOperatorPC (both backends) vs DeviceTMOperatorPC."""
    u, psi = _setup()
    pc_ref = DeviceTMOperatorPC(LAT, kappa=KAPPA, mu=MU)
    u_pk, psi_pk = pack_gauge(u), pack_spinor(psi)
    from tpuqcd.operators import PackedTMOperatorPC
    for backend in ("xla", "pallas"):
        pc = PackedTMOperatorPC(LAT, kappa=KAPPA, mu=MU, backend=backend,
                                interpret=True)
        out = unpack_spinor(pc.apply(u_pk, psi_pk))
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(pc_ref.apply(u, psi)),
                                   atol=3e-5, err_msg=backend)
        outd = unpack_spinor(pc.apply_dagger(u_pk, psi_pk))
        np.testing.assert_allclose(np.asarray(outd),
                                   np.asarray(pc_ref.apply_dagger(u, psi)),
                                   atol=3e-5, err_msg=backend)


def test_packed_cg_solve():
    """End-to-end: packed-field CG solve (xla backend on CPU), full-system
    residual check through prepare/reconstruct."""
    import jax.numpy as jnp
    from tpuqcd.operators import PackedTMOperatorPC
    from tpuqcd.solvers.cg import cg_normal
    from tpuqcd.solvers.reductions import norm2
    u, _ = _setup()
    b = random_spinor_dev(jax.random.PRNGKey(7), LAT)  # both parities
    u_pk = pack_gauge(u)
    b_pk = jnp.stack([pack_spinor(b[0]), pack_spinor(b[1])])
    pc = PackedTMOperatorPC(LAT, kappa=KAPPA, mu=MU, backend="xla")
    bhat = pc.prepare(u_pk, b_pk)
    res = cg_normal(lambda x: pc.apply(u_pk, x),
                    lambda x: pc.apply_dagger(u_pk, x),
                    bhat, tol=1e-6, maxiter=2000)
    assert bool(res.converged), float(res.relres)
    x = pc.reconstruct(u_pk, res.x, b_pk)
    # full-system residual via the complex device operator
    from tpuqcd.utils.packed import unpack_spinor
    pc_ref = DeviceTMOperatorPC(LAT, kappa=KAPPA, mu=MU)
    from tpuqcd.ops.dslash_xla import dslash_eo_dev
    from tpuqcd.operators import twist_apply_dev
    xe, xo = unpack_spinor(x[0]), unpack_spinor(x[1])
    # M x: even rows: A x_e - k D_eo x_o ; odd rows: A x_o - k D_oe x_e
    re = twist_apply_dev(xe, KAPPA, MU) - KAPPA * dslash_eo_dev(u, xo, 1, LAT)
    ro = twist_apply_dev(xo, KAPPA, MU) - KAPPA * dslash_eo_dev(u, xe, 0, LAT)
    from tpuqcd.solvers.reductions import norm2 as n2
    num = float(n2(b[0] - re) + n2(b[1] - ro))
    den = float(n2(b[0]) + n2(b[1]))
    assert (num / den) ** 0.5 < 5e-6


@pytest.mark.parametrize("block_z", [1, 2])
def test_pallas_z_blocking(block_z):
    """z-blocked grid with narrow halo refs matches the oracle."""
    u, psi = _setup()
    ref = dslash_eo_dev(u, psi, EVEN, LAT)
    out = dslash_eo_pallas(pack_gauge(u), pack_spinor(psi), EVEN, LAT,
                           block_z=block_z, interpret=True)
    np.testing.assert_allclose(np.asarray(unpack_spinor(out)),
                               np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("dagger", [False, True])
@pytest.mark.parametrize("block_z", [None, 2])
def test_pallas_recon12(dagger, block_z):
    """Compressed gauge (rows 0,1 + in-kernel third-row rebuild) matches
    the full-gauge kernel, including the antiperiodic T-boundary links."""
    from tpuqcd.utils.packed import pack_gauge12
    u, psi = _setup()
    ref = dslash_eo_dev(u, psi, EVEN, LAT, dagger=dagger)
    out = dslash_eo_pallas(pack_gauge12(u), pack_spinor(psi), EVEN, LAT,
                           dagger=dagger, block_z=block_z, interpret=True)
    np.testing.assert_allclose(np.asarray(unpack_spinor(out)),
                               np.asarray(ref), atol=2e-5)


def test_pallas_recon12_epilogues():
    from tpuqcd.utils.packed import pack_gauge12
    u, psi = _setup()
    pc = DeviceTMOperatorPC(LAT, kappa=KAPPA, mu=MU)
    ref = pc.apply(u, psi)
    u12, psi_pk = pack_gauge12(u), pack_spinor(psi)
    t1 = dslash_eo_pallas(u12, psi_pk, EVEN, LAT, epilogue="twist_inv",
                          kappa=KAPPA, mu=MU, interpret=True)
    out = dslash_eo_pallas(u12, t1, ODD, LAT, epilogue="xpay",
                           kappa=KAPPA, mu=MU, psi0_pk=psi_pk,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(unpack_spinor(out)),
                               np.asarray(ref), atol=3e-5)


def test_pallas_recon12_periodic_t():
    """t_boundary=+1 on an unphased gauge field (periodic fermions)."""
    from tpuqcd.utils.packed import pack_gauge12
    u = su3.random_gauge_dev(jax.random.PRNGKey(3), LAT)  # NO phases
    psi = random_spinor_dev(jax.random.PRNGKey(4), LAT, parities=1)
    ref = dslash_eo_dev(u, psi, ODD, LAT)
    out = dslash_eo_pallas(pack_gauge12(u), pack_spinor(psi), ODD, LAT,
                           t_boundary=1, interpret=True)
    np.testing.assert_allclose(np.asarray(unpack_spinor(out)),
                               np.asarray(ref), atol=2e-5)


def test_pallas_dirs_single_leg():
    """The dirs leg filter: each single-leg kernel call matches the XLA
    dirs path, and the legs sum to the full Dslash."""
    from tpuqcd.ops.dslash_xla import dslash_eo_dev_ri
    from tpuqcd.utils.packed import pack_gauge12
    u, psi = _setup()
    u_pk, u12, psi_pk = pack_gauge(u), pack_gauge12(u), pack_spinor(psi)
    total = None
    for mu in range(4):
        for sign in (+1, -1):
            got = dslash_eo_pallas(u12, psi_pk, EVEN, LAT,
                                   dirs=((mu, sign),), interpret=True)
            want = dslash_eo_dev_ri(u_pk, psi_pk, EVEN, LAT,
                                    dirs=((mu, sign),))
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=2e-5,
                                       err_msg=f"mu={mu} sign={sign}")
            total = got if total is None else total + got
    full = dslash_eo_pallas(u12, psi_pk, EVEN, LAT, interpret=True)
    np.testing.assert_allclose(np.asarray(total), np.asarray(full),
                               atol=5e-5)


def test_pallas_legs_out():
    """legs_out multi-leg mode: ONE kernel pass returns all 8 leg
    contributions separately (the MG Galerkin probing fast path) — each
    slot matches the dirs-filtered single-leg call, in the canonical
    mu-major +1-before--1 order, and the slots sum to the full Dslash."""
    from tpuqcd.ops.dslash_xla import dslash_eo_dev_ri
    u, psi = _setup()
    u_pk, psi_pk = pack_gauge(u), pack_spinor(psi)
    legs = dslash_eo_pallas(u_pk, psi_pk, EVEN, LAT, legs_out=True,
                            interpret=True)
    assert legs.shape[0] == 8
    idx = 0
    for mu in range(4):
        for sign in (+1, -1):
            want = dslash_eo_dev_ri(u_pk, psi_pk, EVEN, LAT,
                                    dirs=((mu, sign),))
            np.testing.assert_allclose(np.asarray(legs[idx]),
                                       np.asarray(want), atol=2e-5,
                                       err_msg=f"mu={mu} sign={sign}")
            idx += 1
    full = dslash_eo_pallas(u_pk, psi_pk, EVEN, LAT, interpret=True)
    np.testing.assert_allclose(np.asarray(legs.sum(axis=0)),
                               np.asarray(full), atol=5e-5)


def test_pack_gauge8_roundtrip():
    """unpack(pack8) reproduces the SU(3) links exactly (unphased gauge;
    boundary-phased links differ only in the rebuilt row2 phase, which
    the kernel fixes via t_phase)."""
    from tpuqcd.utils.packed import pack_gauge8, unpack_gauge8
    u = su3.random_gauge_dev(jax.random.PRNGKey(5), LAT)
    u8 = pack_gauge8(u)
    assert u8.shape[2:5] == (4, 1, 2)
    back = unpack_gauge8(u8)
    # f32 angle/trig roundtrip: ~1e-5 worst case at small-|u00| pivots
    np.testing.assert_allclose(np.asarray(back), np.asarray(u),
                               atol=2e-5)


@pytest.mark.parametrize("dagger", [False, True])
def test_pallas_recon8(dagger):
    """In-kernel reconstruct-8 == full-gauge oracle, with the
    antiperiodic-T boundary phase exercised."""
    from tpuqcd.utils.packed import pack_gauge8
    u, psi = _setup()                        # boundary-phased gauge
    ref = dslash_eo_dev(u, psi, EVEN, LAT, dagger=dagger)
    out = dslash_eo_pallas(pack_gauge8(u), pack_spinor(psi), EVEN, LAT,
                           dagger=dagger, interpret=True)
    np.testing.assert_allclose(np.asarray(unpack_spinor(out)),
                               np.asarray(ref), atol=5e-5)


def test_pallas_recon8_epilogue():
    from tpuqcd.utils.packed import pack_gauge8
    u, psi = _setup()
    ref = twist_inv_apply_dev(dslash_eo_dev(u, psi, EVEN, LAT), KAPPA, MU)
    out = dslash_eo_pallas(pack_gauge8(u), pack_spinor(psi), EVEN, LAT,
                           epilogue="twist_inv", kappa=KAPPA, mu=MU,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(unpack_spinor(out)),
                               np.asarray(ref), atol=5e-5)


def test_pallas_bf16_compute():
    """Full-bf16 VPU arithmetic (compute='bf16', the MG smoother mode):
    matches the f32 oracle to bf16 accumulation tolerance (~2%)."""
    u, psi = _setup()
    ref = np.asarray(dslash_eo_dev(u, psi, EVEN, LAT))
    u_bf = pack_gauge(u).astype(jnp.bfloat16)
    psi_bf = pack_spinor(psi).astype(jnp.bfloat16)
    out = dslash_eo_pallas(u_bf, psi_bf, EVEN, LAT, compute="bf16",
                           interpret=True)
    got = np.asarray(unpack_spinor(out.astype(jnp.float32)))
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, atol=0.05 * scale)
    # fused epilogue in bf16 too
    ref2 = np.asarray(twist_inv_apply_dev(
        dslash_eo_dev(u, psi, EVEN, LAT), KAPPA, MU))
    out2 = dslash_eo_pallas(u_bf, psi_bf, EVEN, LAT, epilogue="twist_inv",
                            kappa=KAPPA, mu=MU, compute="bf16",
                            interpret=True)
    got2 = np.asarray(unpack_spinor(out2.astype(jnp.float32)))
    np.testing.assert_allclose(got2, ref2, atol=0.05 * np.abs(ref2).max())


def test_packed_operator_recon12_periodic_boundary():
    """The production operators slice to reconstruct-12; with a PERIODIC
    gauge (t_boundary=+1, gauge.antiperiodic_t: false) the row-2 rebuild
    must not reintroduce the antiperiodic phase (code-review finding:
    the slice originally hardcoded t_boundary=-1)."""
    from tpuqcd.operators import PackedTMOperatorPC
    u = su3.random_gauge_dev(jax.random.PRNGKey(5), LAT)  # NO phase
    psi = random_spinor_dev(jax.random.PRNGKey(6), LAT, parities=1)
    u_pk, psi_pk = pack_gauge(u), pack_spinor(psi)
    want = PackedTMOperatorPC(LAT, kappa=KAPPA, mu=MU,
                              backend="xla").apply(u_pk, psi_pk)
    got = PackedTMOperatorPC(LAT, kappa=KAPPA, mu=MU, backend="pallas",
                             interpret=True,
                             t_boundary=+1).apply(u_pk, psi_pk)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5)
    # and the antiperiodic default still matches on a phased gauge
    u_bc, psi2 = _setup()
    u_bc_pk, psi2_pk = pack_gauge(u_bc), pack_spinor(psi2)
    want = PackedTMOperatorPC(LAT, kappa=KAPPA, mu=MU,
                              backend="xla").apply(u_bc_pk, psi2_pk)
    got = PackedTMOperatorPC(LAT, kappa=KAPPA, mu=MU, backend="pallas",
                             interpret=True).apply(u_bc_pk, psi2_pk)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5)
