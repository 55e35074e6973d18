"""Dense-matrix oracle for tiny lattices.

Builds the full Dirac matrix (12V x 12V) by applying the operator to
every basis vector — brute-force exact inverses / all-to-all propagators
for validating contractions, sequential sources, loops, and deflation on
2^3 x 4-sized problems (SURVEY.md §5: self-validating oracles; the
reference had no such harness — this is one of the things we do better).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..lattice import Lattice


def operator_to_dense(apply_fn, lat: Lattice, n: int = 12) -> np.ndarray:
    """apply_fn acts on full-layout flattened fields [T,Z,Y,X,n]."""
    dims = lat.full_shape
    dim = int(np.prod(dims)) * n
    cols = []
    for k in range(dim):
        e = np.zeros(dim, dtype=np.complex128)
        e[k] = 1.0
        v = jnp.asarray(e.reshape(*dims, n))
        cols.append(np.asarray(apply_fn(v)).reshape(dim))
    return np.stack(cols, axis=1)


def all_to_all_propagator(apply_fn, lat: Lattice) -> np.ndarray:
    """S = M^{-1} as [T,Z,Y,X,4,3 (sink), T,Z,Y,X,4,3 (source)]."""
    m = operator_to_dense(apply_fn, lat)
    s = np.linalg.inv(m)
    dims = lat.full_shape
    return s.reshape(*dims, 4, 3, *dims, 4, 3)


def point_propagator_from_dense(s_all: np.ndarray, src=(0, 0, 0, 0)
                                ) -> np.ndarray:
    """[T,Z,Y,X, 4(snk s), 3(snk c), 4(src s), 3(src c)] from one source
    site (t, z, y, x)."""
    t, z, y, x = src
    return s_all[..., t, z, y, x, :, :].copy()
