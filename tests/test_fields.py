"""Layout conversions and gauge utilities."""
import jax
import jax.numpy as jnp
import numpy as np

from tpuqcd import su3
from tpuqcd.fields import (apply_boundary_phase, eo_to_full, full_to_eo,
                           gauge_eo_to_full, gauge_full_to_eo, random_spinor)
from tpuqcd.lattice import Lattice

LAT = Lattice((4, 4, 4, 8))  # (Lx,Ly,Lz,Lt)


def test_eo_roundtrip_spinor():
    key = jax.random.PRNGKey(0)
    f = random_spinor(key, LAT)
    eo = full_to_eo(f, LAT)
    back = eo_to_full(eo, LAT)
    np.testing.assert_array_equal(np.asarray(f), np.asarray(back))


def test_eo_parity_correct():
    """Even part must contain exactly the sites with (t+z+y+x)%2==0."""
    key = jax.random.PRNGKey(1)
    f = random_spinor(key, LAT)
    eo = np.asarray(full_to_eo(f, LAT))
    fn = np.asarray(f)
    mask = LAT.parity_mask  # True on odd sites
    T, Z, Y, X = LAT.full_shape
    for t in range(T):
        for z in range(Z):
            for y in range(Y):
                for x in range(X):
                    p = int(mask[t, z, y, x])
                    xh = x // 2
                    np.testing.assert_array_equal(
                        eo[p, t, z, y, xh], fn[t, z, y, x])


def test_eo_roundtrip_gauge():
    key = jax.random.PRNGKey(2)
    u = su3.random_gauge(key, LAT)
    ue = gauge_full_to_eo(u, LAT)
    back = gauge_eo_to_full(ue, LAT)
    np.testing.assert_array_equal(np.asarray(u), np.asarray(back))


def test_su3_properties():
    key = jax.random.PRNGKey(3)
    u = su3.random_su3(key, (10,), dtype=jnp.complex64)
    un = np.asarray(u)
    # unitary
    np.testing.assert_allclose(un @ un.conj().transpose(0, 2, 1),
                               np.broadcast_to(np.eye(3), (10, 3, 3)),
                               atol=1e-5)
    # det 1
    np.testing.assert_allclose(np.linalg.det(un), np.ones(10), atol=1e-5)


def test_reconstruct12():
    key = jax.random.PRNGKey(4)
    u = su3.random_su3(key, (20,), dtype=jnp.complex64)
    u12 = su3.compress12(u)
    back = su3.reconstruct12(u12)
    np.testing.assert_allclose(np.asarray(back), np.asarray(u), atol=1e-5)


def test_boundary_phase():
    u = su3.unit_gauge(LAT)
    ub = np.asarray(apply_boundary_phase(u, LAT))
    # only mu=t, t=Lt-1 flipped
    def bc(m, shape):
        return np.broadcast_to(m.astype(np.complex64), shape)
    np.testing.assert_allclose(ub[3, LAT.Lt - 1],
                               bc(-np.eye(3), ub[3, 0].shape), atol=0)
    np.testing.assert_allclose(ub[3, 0], bc(np.eye(3), ub[3, 0].shape), atol=0)
    np.testing.assert_allclose(ub[0], bc(np.eye(3), ub[0].shape), atol=0)


def test_random_gauge_dev_su3():
    import jax
    from tpuqcd.su3 import random_gauge_dev
    from tpuqcd.ops.layout import gauge_from_device
    u_dev = random_gauge_dev(jax.random.PRNGKey(5), LAT)
    assert u_dev.shape == (4, 2, 3, 3, LAT.Lt, LAT.Lz, LAT.Ly * LAT.Lx // 2)
    u = np.asarray(gauge_from_device(u_dev, LAT))
    m = u.reshape(-1, 3, 3)
    np.testing.assert_allclose(m @ m.conj().transpose(0, 2, 1),
                               np.broadcast_to(np.eye(3), m.shape),
                               atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(m), np.ones(len(m)), atol=1e-5)
