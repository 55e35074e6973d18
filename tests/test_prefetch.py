"""Background gauge read-ahead (io/prefetch.py) — jax-free unit tests.

Round-trips a real ILDG file through the prefetch thread and checks the
idempotence / fall-through / error-surfacing contracts."""
import numpy as np
import pytest

from tpuqcd.io import prefetch as pf
from tpuqcd.io.lime import write_ildg_gauge
from tpuqcd.lattice import Lattice

LAT = Lattice((2, 2, 2, 4))


def _random_gauge_np(seed):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(4, *LAT.full_shape, 3, 3)) \
        + 1j * rng.normal(size=(4, *LAT.full_shape, 3, 3))
    # any complex matrix round-trips; unitarity is not required here
    return a.astype(np.complex128)


def test_prefetch_roundtrip(tmp_path):
    u = _random_gauge_np(0)
    p = str(tmp_path / "a.lime")
    write_ildg_gauge(p, u, LAT)
    pf.prefetch(p)
    pf.prefetch(p)          # idempotent while in flight
    got, lat = pf.take(p)
    np.testing.assert_allclose(np.asarray(got), u, atol=1e-12)
    assert lat.dims == LAT.dims
    # taken entries are consumed: a second take falls through to a
    # fresh synchronous read (still correct)
    got2, _ = pf.take(p)
    np.testing.assert_allclose(np.asarray(got2), u, atol=1e-12)


def test_take_without_prefetch_reads(tmp_path):
    u = _random_gauge_np(1)
    p = str(tmp_path / "b.lime")
    write_ildg_gauge(p, u, LAT)
    got, _ = pf.take(p)
    np.testing.assert_allclose(np.asarray(got), u, atol=1e-12)


def test_prefetch_error_surfaces_at_take(tmp_path):
    p = str(tmp_path / "missing.lime")
    pf.prefetch(p)
    with pytest.raises(Exception):
        pf.take(p)
