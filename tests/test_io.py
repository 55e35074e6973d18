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


def test_native_ildg_ingest_matches_python(tmp_path):
    """Native one-pass ILDG->packed ingest == the Python chain
    (read + eo split + device layout + pack + boundary phase)."""
    from tpuqcd.io.native import get_lib, ildg_payload_to_packed
    if get_lib() is None:
        import pytest
        pytest.skip("no native toolchain")
    import jax.numpy as jnp
    from tpuqcd.fields import apply_boundary_phase
    from tpuqcd.io.lime import read_lime
    from tpuqcd.utils.packed import pack_gauge

    p = str(tmp_path / "conf.ildg")
    u = np.asarray(su3.random_gauge(jax.random.PRNGKey(7), LAT))
    write_ildg_gauge(p, u, LAT)
    payload = next(r for r in read_lime(p)
                   if r.lime_type == "ildg-binary-data").data
    got = ildg_payload_to_packed(payload, LAT, antiperiodic_t=True)
    assert got is not None

    u_bc = apply_boundary_phase(jnp.asarray(u), LAT)
    want = np.asarray(pack_gauge(gauge_to_device(
        gauge_full_to_eo(u_bc, LAT), LAT)))
    np.testing.assert_allclose(got, want, atol=2e-7)


def test_scidac_checksum_roundtrip_and_corruption(tmp_path):
    """Writer emits the QIO site-rank checksum; the reader verifies it
    and rejects a corrupted payload (reference QIO read discipline)."""
    import jax
    from tpuqcd import su3
    from tpuqcd.io.lime import (read_ildg_gauge, read_lime, write_lime,
                                write_ildg_gauge)
    from tpuqcd.lattice import Lattice
    lat = Lattice((2, 2, 2, 4))
    u = np.asarray(su3.random_gauge(jax.random.PRNGKey(5), lat))
    p = str(tmp_path / "cfg.lime")
    write_ildg_gauge(p, u, lat)
    recs = read_lime(p)
    assert any(r.lime_type == "scidac-checksum" for r in recs)
    u2, _ = read_ildg_gauge(p)          # verifies silently
    np.testing.assert_allclose(u2, u, atol=1e-7)
    # flip one byte of the binary payload -> reader must reject
    bad = [r for r in recs]
    for r in bad:
        if r.lime_type == "ildg-binary-data":
            d = bytearray(r.data)
            d[100] ^= 0xFF
            r.data = bytes(d)
    pbad = str(tmp_path / "bad.lime")
    write_lime(pbad, bad)
    import pytest
    with pytest.raises(ValueError, match="checksum mismatch"):
        read_ildg_gauge(pbad)
    # and loads fine when verification is explicitly disabled
    read_ildg_gauge(pbad, verify_checksum=False)
