"""Checkpointing of expensive setup state (SURVEY.md §6.4).

Three artifacts are worth persisting, mirroring the reference:
  - gauge configs themselves (ILDG files, tpuqcd.io.lime);
  - MG hierarchy (the vec_infile/outfile equivalent — we store the
    orthonormalized transfer matrices AND the coarse links, so reload
    skips both the null-vector solves and the Galerkin probing);
  - deflation eigenpairs.
Correlator outputs are already per-source in HDF5 (io/hdf5io.py).
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def save_mg(path: str, mg) -> None:
    """Dump an MG hierarchy built by tpuqcd.mg.vcycle.MG."""
    blobs = {}
    st = mg.root
    i = 0
    while st is not None and st.transfer is not None:
        tr = st.transfer
        blobs[f"l{i}_p"] = np.asarray(tr.p)
        blobs[f"l{i}_block"] = np.asarray(tr.block)
        blobs[f"l{i}_g5c"] = tr.g5vec_c
        nxt = st.next.level
        blobs[f"l{i}_fwd"] = np.asarray(nxt.links_fwd)
        blobs[f"l{i}_bwd"] = np.asarray(nxt.links_bwd)
        blobs[f"l{i}_diag"] = np.asarray(nxt.diag)
        st = st.next
        i += 1
    blobs["n_levels"] = np.asarray(i)
    np.savez_compressed(path, **blobs)


def load_mg(path: str, fine_level, params):
    """Rebuild an MG object from a dump (no setup solves)."""
    from ..mg.level import CoarseLevel
    from ..mg.transfer import Transfer
    from ..mg.vcycle import MG, MGLevelState

    z = np.load(path)
    n = int(z["n_levels"])
    mg = MG.__new__(MG)
    mg.params = params

    def build(level, i):
        if i >= n:
            return MGLevelState(level=level, transfer=None, next=None)
        p = jnp.asarray(z[f"l{i}_p"])
        block = tuple(int(b) for b in z[f"l{i}_block"])
        dims_c = p.shape[:4]
        n_c = p.shape[-1]
        tr = Transfer(dims_f=level.dims, dims_c=dims_c, block=block,
                      n_f=level.n, n_c=n_c, p=p, g5vec_c=z[f"l{i}_g5c"])
        coarse = CoarseLevel(dims=dims_c, n_=n_c,
                             links_fwd=jnp.asarray(z[f"l{i}_fwd"]),
                             links_bwd=jnp.asarray(z[f"l{i}_bwd"]),
                             diag=jnp.asarray(z[f"l{i}_diag"]),
                             g5vec_=z[f"l{i}_g5c"])
        nxt = build(coarse, i + 1)
        return MGLevelState(level=level, transfer=tr, next=nxt)

    mg.root = build(fine_level, 0)
    return mg


def save_eigenpairs(path: str, evals, evecs) -> None:
    np.savez_compressed(path, evals=np.asarray(evals),
                        evecs=np.stack([np.asarray(v) for v in evecs]))


def load_eigenpairs(path: str):
    z = np.load(path)
    evecs = [jnp.asarray(v) for v in z["evecs"]]
    return z["evals"], evecs
