"""I/O: ILDG/LIME round-trip + plaquette check, HDF5 writers."""
import os

import jax
import numpy as np

from tpuqcd import su3
from tpuqcd.fields import gauge_full_to_eo
from tpuqcd.io.hdf5io import read_dataset, write_twop
from tpuqcd.io.lime import (LimeRecord, read_ildg_gauge, read_lime,
                            write_ildg_gauge, write_lime)
from tpuqcd.lattice import Lattice
from tpuqcd.ops.gauge_tools import plaquette
from tpuqcd.ops.layout import gauge_to_device

LAT = Lattice((4, 4, 4, 8))


def test_lime_roundtrip(tmp_path):
    p = str(tmp_path / "test.lime")
    recs = [LimeRecord("test-type-a", b"hello world"),
            LimeRecord("test-type-b", b"x" * 13)]  # unaligned length
    write_lime(p, recs)
    back = read_lime(p)
    assert [r.lime_type for r in back] == ["test-type-a", "test-type-b"]
    assert back[0].data == b"hello world"
    assert back[1].data == b"x" * 13


def test_ildg_gauge_roundtrip_and_plaquette(tmp_path):
    p = str(tmp_path / "conf.ildg")
    u = np.asarray(su3.random_gauge(jax.random.PRNGKey(3), LAT))
    write_ildg_gauge(p, u, LAT)
    u2, lat2 = read_ildg_gauge(p)
    assert lat2.dims == LAT.dims
    np.testing.assert_allclose(u2, u.astype(np.complex64), atol=1e-7)
    # plaquette check on load — the standard sanity protocol (SURVEY §4.1)
    import jax.numpy as jnp
    pl_orig = float(plaquette(gauge_to_device(
        gauge_full_to_eo(jnp.asarray(u), LAT), LAT), LAT))
    pl_read = float(plaquette(gauge_to_device(
        gauge_full_to_eo(jnp.asarray(u2), LAT), LAT), LAT))
    np.testing.assert_allclose(pl_read, pl_orig, rtol=1e-6)


def test_hdf5_twop(tmp_path):
    p = str(tmp_path / "out.h5")
    corr = (np.arange(12).reshape(2, 6) + 1j).astype(np.complex64)
    momenta = np.array([[0, 0, 0], [1, 0, 0]])
    write_twop(p, "twop/proton/src00", corr, momenta, (0, 0, 0, 0),
               meta={"kappa": 0.12})
    back = read_dataset(p, "twop/proton/src00/mom_1_0_0")
    np.testing.assert_array_equal(back, corr[1])
