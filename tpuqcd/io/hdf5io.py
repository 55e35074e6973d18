"""HDF5 output for correlators and loops.

Replaces the reference's (parallel-)HDF5 writers ([U] plugin HDF5 utils;
SURVEY.md C29).  Results are gathered to host numpy and written with
h5py; datasets are indexed by momentum / projector / flavor / insertion
the way the QKXTM outputs are, and written per-source so a killed run
loses at most one source position (SURVEY.md §6.4).
"""
from __future__ import annotations

import numpy as np

try:
    import h5py
    HAVE_H5PY = True
except Exception:  # pragma: no cover
    HAVE_H5PY = False


def write_twop(path: str, group: str, corr: np.ndarray,
               momenta: np.ndarray, src_pos, meta: dict | None = None,
               mode: str = "a") -> None:
    """corr [n_mom, T] complex; one dataset per momentum."""
    assert HAVE_H5PY, "h5py unavailable"
    with h5py.File(path, mode) as f:
        g = f.require_group(group)
        g.attrs["src_pos"] = np.asarray(src_pos)
        for k, v in (meta or {}).items():
            g.attrs[k] = v
        for i, p in enumerate(np.asarray(momenta)):
            name = f"mom_{p[0]}_{p[1]}_{p[2]}"
            if name in g:
                del g[name]
            g.create_dataset(name, data=np.asarray(corr[i]))


def write_threep(path: str, group: str, corr: np.ndarray,
                 momenta: np.ndarray, insertions: list[str], src_pos,
                 t_sink: int, meta: dict | None = None,
                 mode: str = "a") -> None:
    """corr [n_insertion, n_mom, T] complex."""
    assert HAVE_H5PY, "h5py unavailable"
    with h5py.File(path, mode) as f:
        g = f.require_group(group)
        g.attrs["src_pos"] = np.asarray(src_pos)
        g.attrs["t_sink"] = t_sink
        for k, v in (meta or {}).items():
            g.attrs[k] = v
        for j, ins in enumerate(insertions):
            gi = g.require_group(ins)
            for i, p in enumerate(np.asarray(momenta)):
                name = f"mom_{p[0]}_{p[1]}_{p[2]}"
                if name in gi:
                    del gi[name]
                gi.create_dataset(name, data=np.asarray(corr[j, i]))


def write_loops(path: str, group: str, loops: np.ndarray,
                insertions: list[str], meta: dict | None = None,
                mode: str = "a") -> None:
    """loops [n_insertion, T] (or [n_insertion, n_mom, T]) complex."""
    assert HAVE_H5PY, "h5py unavailable"
    with h5py.File(path, mode) as f:
        g = f.require_group(group)
        for k, v in (meta or {}).items():
            g.attrs[k] = v
        for j, ins in enumerate(insertions):
            if ins in g:
                del g[ins]
            g.create_dataset(ins, data=np.asarray(loops[j]))


def read_dataset(path: str, name: str) -> np.ndarray:
    with h5py.File(path, "r") as f:
        return np.asarray(f[name])
