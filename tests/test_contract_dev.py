"""Device contraction engine vs the host complex-einsum oracle."""
import jax
import jax.numpy as jnp
import numpy as np

from tpuqcd.gammas import GAMMA, GAMMA5
from tpuqcd.lattice import Lattice
from tpuqcd.phys import contract as host
from tpuqcd.phys.contract_dev import (density_to_full, meson_2pt_dev,
                                      meson_2pt_site_dev, prop_to_device,
                                      proton_2pt_dev, proton_2pt_site_dev)

LAT = Lattice((4, 4, 4, 6))


def _rand_prop(key):
    kr, ki = jax.random.split(key)
    shape = (LAT.Lt, LAT.Lz, LAT.Ly, LAT.Lx, 4, 3, 4, 3)
    return jax.lax.complex(jax.random.normal(kr, shape, jnp.float32),
                           jax.random.normal(ki, shape, jnp.float32))


def test_proton_density_matches_host():
    from tpuqcd.gammas import PROJECTORS
    su = _rand_prop(jax.random.PRNGKey(0))
    sd = _rand_prop(jax.random.PRNGKey(1))
    su_d, sd_d = prop_to_device(su, LAT), prop_to_device(sd, LAT)
    # full projector set incl. the complex polarized P5k matrices
    for pname, proj in PROJECTORS.items():
        want = np.asarray(host.proton_2pt_site(su, sd, proj))
        dens = proton_2pt_site_dev(su_d, sd_d, proj)
        got = density_to_full(dens, LAT)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-3,
                                   err_msg=pname)


def test_meson_density_matches_host():
    s1 = _rand_prop(jax.random.PRNGKey(2))
    s2 = _rand_prop(jax.random.PRNGKey(3))
    from tpuqcd.gammas import MESON_CHANNELS
    for name, g in MESON_CHANNELS.items():  # the ten-meson set
        want = np.asarray(host.meson_2pt_site(s1, s2, g))
        dens = meson_2pt_site_dev(prop_to_device(s1, LAT),
                                  prop_to_device(s2, LAT), g)
        got = density_to_full(dens, LAT)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-3,
                                   err_msg=name)


def test_projected_correlators_match_host():
    su = _rand_prop(jax.random.PRNGKey(4))
    sd = _rand_prop(jax.random.PRNGKey(5))
    moms = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 1]])
    src = (1, 2, 0, 3)
    want = np.asarray(host.proton_2pt(su, sd, LAT, moms, src_pos=src))
    got = np.asarray(proton_2pt_dev(prop_to_device(su, LAT),
                                    prop_to_device(sd, LAT), LAT, moms,
                                    src_pos=src))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-1)
    want = np.asarray(host.meson_2pt(su, sd, GAMMA5, LAT, moms,
                                     src_pos=src))
    got = np.asarray(meson_2pt_dev(prop_to_device(su, LAT),
                                   prop_to_device(sd, LAT), GAMMA5, LAT,
                                   moms, src_pos=src))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-1)


def test_assemble_propagator_pk():
    """Packed assembly path == full-layout assembly + prop_to_device."""
    from tpuqcd.phys.propagator import (assemble_propagator_pk,
                                        full_to_packed)
    key = jax.random.PRNGKey(8)
    cols_full, cols_pk = [], []
    for k in jax.random.split(key, 12):
        kr, ki = jax.random.split(k)
        shape = (*[LAT.Lt, LAT.Lz, LAT.Ly, LAT.Lx], 4, 3)
        f = jax.lax.complex(jax.random.normal(kr, shape, jnp.float32),
                            jax.random.normal(ki, shape, jnp.float32))
        cols_full.append(f)
        cols_pk.append(full_to_packed(f, LAT))
    got = assemble_propagator_pk(cols_pk)
    cols = jnp.stack(cols_full).reshape(4, 3, *cols_full[0].shape)
    prop_full = jnp.transpose(cols, (2, 3, 4, 5, 6, 7, 0, 1))
    want = prop_to_device(prop_full, LAT)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6)
