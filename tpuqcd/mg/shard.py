"""Multi-chip device MG: shard the hierarchy over a device mesh.

TPU-native multigrid domain decomposition (SURVEY.md §8.3 hard part #4;
the reference's MPI-decomposed MG levels in `multigrid.cpp` /
`transfer.cpp` [U]): instead of explicit halo packs per level, the fine
level's leaves (gauge, null vectors) and fields are annotated with a
NamedSharding over the lattice T axis and the whole V-cycle/GCR program
is jitted — XLA GSPMD auto-partitions every op, turning the T-hops into
collective-permutes over ICI and the block-sum restrictions into local
reductions (blocks never straddle shard boundaries when bt divides the
local T extent).  Coarse levels are tiny and deliberately REPLICATED:
each chip runs the identical coarsest solve (compute is trivial there),
which is the all_gather strategy the survey prescribes — the reference
pays MPI latency on the coarsest grid, we pay one gather.

Works unchanged with mg/dsolve.DeviceMG: its jitted cycle/residual
functions take the hierarchy as a pytree argument, so device_put-ing the
leaves with these shardings is the only multi-chip hook needed.  The
fine level must use ``backend="xla"`` (jnp rolls auto-partition; the
Pallas kernel is single-chip until the shard_map port).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .device import (DeviceCoarseLevel, DeviceCoarseTransfer,
                     DeviceFineCloverLevel, DeviceFineLevel,
                     DeviceFineTransfer)


def make_mg_mesh(n_t: int, devices=None) -> Mesh:
    """1-D mesh over the lattice T axis (MG decomposes T only: coarse
    T extents stay divisible longest, and T carries the largest halo
    surfaces onto ICI)."""
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= n_t, (len(devices), n_t)
    return Mesh(np.asarray(devices[:n_t]), ("t",))


def _shard_t(mesh: Mesh, arr: jax.Array, t_axis_from_end: int = 3):
    """Shard the T axis (counted from the end: [..., T, Z, S])."""
    spec = [None] * arr.ndim
    spec[arr.ndim - t_axis_from_end] = "t"
    return jax.device_put(arr, NamedSharding(mesh, P(*spec)))


def _replicate(mesh: Mesh, arr: jax.Array):
    return jax.device_put(arr, NamedSharding(mesh, P()))


def fine_field_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for fine packed fields [2, 2, 4, 3, T, Z, S]."""
    return NamedSharding(mesh, P(None, None, None, None, "t", None, None))


def shard_fine_field(mesh: Mesh, v: jax.Array) -> jax.Array:
    return jax.device_put(v, fine_field_sharding(mesh))


def shard_mg(mg, mesh: Mesh, verbose: bool = False):
    """Re-place a built DeviceMG hierarchy onto the mesh (in place).

    Fine-level leaves shard over T; everything coarse replicates.  The
    fine local T extent must be even (eo masks) and divisible by the
    first block's bt so aggregates stay shard-local.
    """
    n_t = mesh.shape["t"]
    fine = mg.levels[0]
    lt = fine.lat.Lt
    assert lt % n_t == 0 and (lt // n_t) % 2 == 0, (lt, n_t)
    bt = mg.params.block[0][0]
    assert (lt // n_t) % bt == 0, \
        f"local T {lt // n_t} must be a multiple of the t-block {bt}"

    mg.levels[0] = shard_level(fine, mesh)
    if mg.sloppy_fine is not None:
        mg.sloppy_fine = shard_level(mg.sloppy_fine, mesh)
    for i, tr in enumerate(mg.transfers):
        mg.transfers[i] = shard_transfer(tr, mesh, fine_level=(i == 0))
    for i, lv in enumerate(mg.levels[1:], start=1):
        mg.levels[i] = shard_level(lv, mesh)
    mg._jit_cache = None      # re-jit with the new arg shardings
    mg._hp_cache = None
    if verbose:
        print(f"[mg] hierarchy sharded over {n_t} devices (T axis)")
    return mg


def shard_level(level, mesh: Mesh):
    import dataclasses
    if isinstance(level, DeviceFineLevel):
        rep = {"u_pk": _shard_t(mesh, level.u_pk)}
        if level.u12_pk is not None:
            rep["u12_pk"] = _shard_t(mesh, level.u12_pk)
        return dataclasses.replace(level, **rep)
    if isinstance(level, DeviceFineCloverLevel):
        rep = {"u_pk": _shard_t(mesh, level.u_pk),
               "clover_pk": _shard_t(mesh, level.clover_pk)}
        if level.u12_pk is not None:
            rep["u12_pk"] = _shard_t(mesh, level.u12_pk)
        return dataclasses.replace(level, **rep)
    if isinstance(level, DeviceCoarseLevel):
        return dataclasses.replace(level,
                                   links=_replicate(mesh, level.links))
    raise TypeError(type(level))


def shard_transfer(tr, mesh: Mesh, fine_level: bool):
    import dataclasses
    if fine_level:
        assert isinstance(tr, DeviceFineTransfer)
        # v_pk [n, 2, 2par, 4, 3, T, Z, S]: shard T; linv lives on the
        # coarse geometry -> replicate (tiny)
        return dataclasses.replace(tr, v_pk=_shard_t(mesh, tr.v_pk),
                                   linv=_replicate(mesh, tr.linv))
    assert isinstance(tr, DeviceCoarseTransfer)
    return dataclasses.replace(tr, v_pk=_replicate(mesh, tr.v_pk),
                               linv=_replicate(mesh, tr.linv))
