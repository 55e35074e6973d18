"""Device-layout XLA Dslash vs the oracle (SURVEY.md §5 golden-reference
pattern), plus the device-layout PC operator."""
import jax
import jax.numpy as jnp
import numpy as np

from tpuqcd import su3
from tpuqcd.fields import (EVEN, ODD, apply_boundary_phase, full_to_eo,
                           gauge_full_to_eo, random_spinor)
from tpuqcd.lattice import Lattice
from tpuqcd.operators import DeviceTMOperatorPC, TMOperatorPC
from tpuqcd.ops.dslash_ref import dslash_eo
from tpuqcd.ops.dslash_xla import dslash_eo_dev
from tpuqcd.ops.layout import (gauge_from_device, gauge_to_device,
                               spinor_from_device, spinor_to_device)

LAT = Lattice((4, 6, 4, 8))  # deliberately anisotropic to catch axis mixups
KEY = jax.random.PRNGKey(42)


def _setup():
    ku, kp = jax.random.split(KEY)
    u = apply_boundary_phase(su3.random_gauge(ku, LAT), LAT)
    psi = random_spinor(kp, LAT)
    u_eo = gauge_full_to_eo(u, LAT)
    psi_eo = full_to_eo(psi, LAT)
    return u_eo, psi_eo


def test_layout_roundtrip():
    u_eo, psi_eo = _setup()
    pd = spinor_to_device(psi_eo, LAT)
    assert pd.shape == (2, 4, 3, LAT.Lt, LAT.Lz, LAT.Ly * LAT.Lx // 2)
    back = spinor_from_device(pd, LAT)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(psi_eo))
    ud = gauge_to_device(u_eo, LAT)
    back_u = gauge_from_device(ud, LAT)
    np.testing.assert_array_equal(np.asarray(back_u), np.asarray(u_eo))


def test_dslash_dev_matches_oracle():
    u_eo, psi_eo = _setup()
    ud = gauge_to_device(u_eo, LAT)
    for p in (EVEN, ODD):
        pd = spinor_to_device(psi_eo[p], LAT)
        d_dev = dslash_eo_dev(ud, pd, p, LAT)
        d_ref = dslash_eo(u_eo, psi_eo[p], p, LAT)
        np.testing.assert_allclose(
            np.asarray(spinor_from_device(d_dev, LAT)),
            np.asarray(d_ref), atol=2e-5)


def test_dslash_dev_dagger():
    """dagger=True must equal g5 D g5 (on the even<->odd pair)."""
    u_eo, psi_eo = _setup()
    ud = gauge_to_device(u_eo, LAT)
    from tpuqcd.operators import gamma5_apply_dev
    pd = spinor_to_device(psi_eo[EVEN], LAT)
    lhs = dslash_eo_dev(ud, pd, EVEN, LAT, dagger=True)
    rhs = gamma5_apply_dev(dslash_eo_dev(ud, gamma5_apply_dev(pd), EVEN, LAT))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=2e-5)


def test_device_pc_operator_matches_ref():
    u_eo, psi_eo = _setup()
    ud = gauge_to_device(u_eo, LAT)
    kappa, mu = 0.13, 0.04
    pc_ref = TMOperatorPC(LAT, kappa=kappa, mu=mu)
    pc_dev = DeviceTMOperatorPC(LAT, kappa=kappa, mu=mu)
    pd = spinor_to_device(psi_eo[EVEN], LAT)
    out_dev = pc_dev.apply(ud, pd)
    out_ref = pc_ref.apply(u_eo, psi_eo[EVEN])
    np.testing.assert_allclose(
        np.asarray(spinor_from_device(out_dev, LAT)),
        np.asarray(out_ref), atol=2e-5)
    # dagger too
    outd_dev = pc_dev.apply_dagger(ud, pd)
    outd_ref = pc_ref.apply_dagger(u_eo, psi_eo[EVEN])
    np.testing.assert_allclose(
        np.asarray(spinor_from_device(outd_dev, LAT)),
        np.asarray(outd_ref), atol=2e-5)


def test_device_pc_prepare_reconstruct():
    u_eo, psi_eo = _setup()
    ud = gauge_to_device(u_eo, LAT)
    kappa, mu = 0.13, 0.04
    pc_ref = TMOperatorPC(LAT, kappa=kappa, mu=mu)
    pc_dev = DeviceTMOperatorPC(LAT, kappa=kappa, mu=mu)
    b_dev = spinor_to_device(psi_eo, LAT)
    bhat_dev = pc_dev.prepare(ud, b_dev)
    bhat_ref = pc_ref.prepare(u_eo, psi_eo)
    np.testing.assert_allclose(
        np.asarray(spinor_from_device(bhat_dev, LAT)),
        np.asarray(bhat_ref), atol=2e-5)
    x_dev = pc_dev.reconstruct(ud, bhat_dev, b_dev)
    x_ref = pc_ref.reconstruct(u_eo, bhat_ref, psi_eo)
    np.testing.assert_allclose(
        np.asarray(spinor_from_device(x_dev, LAT)),
        np.asarray(x_ref), atol=2e-5)


def test_dslash_ri_matches_complex():
    """Packed-real XLA dslash == complex XLA dslash (f32 and f64)."""
    import jax.numpy as jnp
    from tpuqcd.ops.dslash_xla import dslash_eo_dev_ri
    from tpuqcd.utils.packed import pack_gauge, pack_spinor, unpack_spinor
    u_eo, psi_eo = _setup()
    ud = gauge_to_device(u_eo, LAT)
    pd = spinor_to_device(psi_eo[EVEN], LAT)
    ref = dslash_eo_dev(ud, pd, EVEN, LAT)
    for dt in (jnp.float32, jnp.float64):
        out = dslash_eo_dev_ri(pack_gauge(ud, dtype=dt),
                               pack_spinor(pd, dtype=dt), EVEN, LAT)
        assert out.dtype == dt
        np.testing.assert_allclose(np.asarray(unpack_spinor(out)),
                                   np.asarray(ref), atol=2e-5)
    # dagger too
    refd = dslash_eo_dev(ud, pd, EVEN, LAT, dagger=True)
    outd = dslash_eo_dev_ri(pack_gauge(ud), pack_spinor(pd), EVEN, LAT,
                            dagger=True)
    np.testing.assert_allclose(np.asarray(unpack_spinor(outd)),
                               np.asarray(refd), atol=2e-5)
