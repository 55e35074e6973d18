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


def save_device_mg(path: str, mg) -> None:
    """Dump a device MG hierarchy (tpuqcd.mg.dsolve.DeviceMG): raw null
    vectors + Linv per transfer, links per coarse level — reload skips
    the null-vector solves, the block orthogonalization, AND the
    Galerkin probing (the reference's vec_infile/outfile role [U])."""
    blobs = {"n_transfers": np.asarray(len(mg.transfers))}
    for i, tr in enumerate(mg.transfers):
        blobs[f"t{i}_v"] = np.asarray(tr.v_pk)
        blobs[f"t{i}_linv"] = np.asarray(tr.linv)
        blobs[f"t{i}_block"] = np.asarray(tr.block)
    for i, lv in enumerate(mg.levels[1:]):
        blobs[f"c{i}_links"] = np.asarray(lv.links)
        blobs[f"c{i}_dims"] = np.asarray(lv.dims)
        blobs[f"c{i}_n"] = np.asarray(lv.n)
    np.savez_compressed(path, **blobs)


def load_device_mg(path: str, fine_level, params):
    """Rebuild a DeviceMG from a dump (no setup solves/probing)."""
    from ..mg.device import (DeviceCoarseLevel, DeviceCoarseTransfer,
                             DeviceFineTransfer)
    from ..mg.dsolve import DeviceMG

    z = np.load(path)
    n = int(z["n_transfers"])
    mg = DeviceMG.__new__(DeviceMG)
    mg.params = params
    mg.setup_seconds = {}
    mg.sloppy_fine = (fine_level.sloppy()
                      if getattr(params, "smoother_dtype", "float32")
                      == "bfloat16" else None)
    mg.levels = [fine_level]
    mg.transfers = []
    level = fine_level
    for i in range(n):
        block = tuple(int(b) for b in z[f"t{i}_block"])
        v = jnp.asarray(z[f"t{i}_v"])
        linv = jnp.asarray(z[f"t{i}_linv"])
        if i == 0:
            tr = DeviceFineTransfer(fine_level.lat, block, v, linv)
        else:
            tr = DeviceCoarseTransfer(level.dims, level.n, block, v, linv)
        links = z[f"c{i}_links"]
        if links.ndim != 5:
            raise ValueError(
                f"{path}: coarse links have rank {links.ndim}; this "
                "dump predates the lane-merged coarse layout "
                "([2, 9, N, N, Vc], round 5) — regenerate the MG "
                "checkpoint (drop vec_infile for one run)")
        coarse = DeviceCoarseLevel(
            dims=tuple(int(d) for d in z[f"c{i}_dims"]),
            n=int(z[f"c{i}_n"]), links=jnp.asarray(links))
        mg.transfers.append(tr)
        mg.levels.append(coarse)
        level = coarse
    return mg


def save_eigenpairs(path: str, evals, evecs, layout: str = "") -> None:
    """layout: "packed" (device packed-real [2ri, 2par, ...]) or "full"
    (host complex [T,Z,Y,X,4,3]) — recorded so a reload on the other
    path fails loudly instead of feeding the wrong layout downstream."""
    np.savez_compressed(path, evals=np.asarray(evals),
                        evecs=np.stack([np.asarray(v) for v in evecs]),
                        layout=np.asarray(layout))


def load_eigenpairs(path: str, expect_layout: str | None = None,
                    n_expect: int | None = None):
    z = np.load(path)
    if expect_layout and "layout" in z:
        got = str(z["layout"])
        if got and got != expect_layout:
            raise ValueError(
                f"{path} holds {got!r}-layout eigenvectors; this run "
                f"needs {expect_layout!r} (device and host deflation "
                f"bases are not interchangeable — regenerate on this "
                f"path or drop eig_infile)")
    evecs = [jnp.asarray(v) for v in z["evecs"]]
    if n_expect is not None:
        if len(evecs) < n_expect:
            raise ValueError(
                f"{path} holds {len(evecs)} eigenpairs but the config "
                f"asks n_deflate={n_expect}; regenerate with enough "
                f"modes or lower n_deflate")
        evecs = evecs[:n_expect]
        return z["evals"][:n_expect], evecs
    return z["evals"], evecs
