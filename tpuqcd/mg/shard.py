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

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..lattice import Lattice
from .device import (DeviceCoarseLevel, DeviceCoarseTransfer,
                     DeviceFineCloverLevel, DeviceFineLevel,
                     DeviceFineTransfer)


@partial(jax.tree_util.register_dataclass,
         data_fields=["u_ext", "clover_pk"],
         meta_fields=["lat", "lmesh", "kappa", "mu", "flavor", "backend",
                      "block_z", "interpret", "csw"])
@dataclasses.dataclass
class ShardedFineLevel:
    """DeviceFineLevel twin whose applies run PER-SHARD kernels under
    shard_map (the production multi-chip fine level): the hop term goes
    through the interior/exterior overlap engine (parallel/overlap.py),
    so each chip runs the fused Pallas kernel on its local volume while
    the (t, z, y) halos ride ICI.  Drop-in fine level for
    mg/dsolve.DeviceMG —
    setup (null vectors, probing) and the V-cycle work unchanged; the
    coarse levels stay GSPMD/replicated (mg/shard.py header).

    u_ext: packed FULL-link gauge with the halo slabs of every sharded
    axis appended per-shard: a global array
    [4, 2, 3, 3, 2, T + nt·1, Z + (nz>1), S + (ny>1)·Xh]
    sharded over (t, z, y) — the T axis grows one slice per shard, Z
    gains a one-row slab for the overlap engine's backward-leg z
    repairs when Z is sharded, and S gains a U_y(y=-1) row (Xh wide)
    when Y is sharded.  Gauge halos are static per configuration,
    exchanged once here; consumers must slice [..., :Tl, :Zl, :S_loc]
    for the interior.
    """
    lat: Lattice
    lmesh: object                 # parallel.mesh.LatticeMesh (t, z, y)
    u_ext: jax.Array
    kappa: float
    mu: float = 0.0
    flavor: int = +1
    backend: str = "pallas"
    block_z: int | None = None
    interpret: bool = False
    #: packed clover A blocks [2par, 2ri, 2chir, 6, 6, T, Z, S] sharded
    #: over (t, z, y): site-local, so the twisted-CLOVER fine level needs
    #: no extra halo machinery — the hop term stays clover-free (the
    #: reference's dirac_twisted_clover full-operator split [U])
    clover_pk: jax.Array | None = None
    csw: float = 0.0

    @staticmethod
    def build(lat, lmesh, u_pk, kappa, mu=0.0, flavor=+1,
              backend="pallas", block_z=None, interpret=False,
              clover_pk=None, csw=0.0):
        """u_pk: packed full-link gauge [4,2,3,3,2,T,Z,S] (unsharded or
        sharded); exchanges the static gauge halo once (T slice; plus a
        one-row Z slab for the overlap engine's backward-leg z repairs
        when the mesh shards Z, and a U_y(y=-1) row on S when it shards
        Y — aggregates must then stay shard-local: the first block's by
        must divide the local Y extent, enforced by validate_config).
        clover_pk (packed A blocks, both parities) + csw give the
        twisted-clover fine level."""
        u_sh = lmesh.shard_gauge(u_pk)

        def fn(u_loc):
            from ..parallel.sharded import _exchange_gauge
            return _exchange_gauge(u_loc, lmesh.nt, lmesh.nz,
                                   1 if lmesh.nz > 1 else None,
                                   lmesh.ny, lat.Lx // 2)

        spec = lmesh.gauge_spec()
        u_ext = jax.jit(jax.shard_map(
            fn, mesh=lmesh.mesh, in_specs=(spec,), out_specs=spec,
            check_vma=False))(u_sh)
        if clover_pk is not None:
            clover_pk = jax.device_put(
                clover_pk, NamedSharding(lmesh.mesh, P(
                    None, None, None, None, None, "t", "z", "y")))
        return ShardedFineLevel(lat=lat, lmesh=lmesh, u_ext=u_ext,
                                kappa=kappa, mu=mu, flavor=flavor,
                                backend=backend, block_z=block_z,
                                interpret=interpret, clover_pk=clover_pk,
                                csw=csw)

    @property
    def n(self) -> int:
        return 12

    def _clover_spec(self):
        return P(None, None, None, None, None, "t", "z", "y")

    def _smap(self, fn, n_in):
        m = self.lmesh
        sp = P(None, *m.spinor_spec())          # [2ri, 2par, 4,3,T,Z,S]
        cl = ((self._clover_spec(),) if self.clover_pk is not None
              else ())
        return jax.shard_map(fn, mesh=m.mesh,
                             in_specs=(m.gauge_spec(),) + cl
                             + (sp,) * n_in,
                             out_specs=sp, check_vma=False)

    def _hops(self, u_ext_loc, v_loc, dagger, dirs=None):
        """D v over both parities on one shard (overlap engine)."""
        from ..parallel.overlap import dslash_overlap
        ve = v_loc[:, 0]
        vo = v_loc[:, 1]
        de = dslash_overlap(u_ext_loc, vo, 1, self.lat, self.lmesh,
                            dagger, block_z=self.block_z,
                            interpret=self.interpret,
                            backend=self.backend, dirs=dirs,
                            halo_half=True)
        do = dslash_overlap(u_ext_loc, ve, 0, self.lat, self.lmesh,
                            dagger, block_z=self.block_z,
                            interpret=self.interpret,
                            backend=self.backend, dirs=dirs,
                            halo_half=True)
        return jnp.stack([de, do], axis=1)

    def _site(self, cl_l, v_l):
        """Site term on a shard: (A +) 1 + i tw g5, both parities."""
        from ..mg.device import _itwg5_pk
        tw = 2.0 * self.kappa * self.mu * self.flavor
        if cl_l is None:
            return jnp.stack([v_l[:, par] + _itwg5_pk(v_l[:, par], tw)
                              for par in range(2)], axis=1)
        from ..ops.clover import clover_apply_pk
        return jnp.stack(
            [clover_apply_pk(cl_l[par].astype(v_l.dtype), v_l[:, par])
             + _itwg5_pk(v_l[:, par], tw) for par in range(2)], axis=1)

    def apply(self, v: jax.Array) -> jax.Array:
        """M v = (A + 2 i kappa mu f g5) v - kappa D v  (A = 1 plain TM,
        the clover blocks when clover_pk is set).

        Traced-only entry (like every DeviceMG level method): call it
        under jit — eager shard_map dispatches each unrolled op
        separately (see tests/test_overlap.py note)."""

        def fn(u_l, *rest):
            cl_l, v_l = (rest if self.clover_pk is not None
                         else (None, rest[0]))
            d = self._hops(u_l, v_l, dagger=False)
            k = jnp.asarray(self.kappa, v_l.dtype)
            return self._site(cl_l, v_l) - k * d

        ops = ((self.u_ext, self.clover_pk, v)
               if self.clover_pk is not None else (self.u_ext, v))
        return self._smap(fn, 1)(*ops)

    def apply_hop(self, v: jax.Array, mu_: int, sign: int) -> jax.Array:
        """Single hop term of M (including the -kappa), both parities
        (Galerkin probing path — clover-free, the clover term lands in
        the probed diagonal automatically)."""

        def fn(u_l, *rest):
            v_l = rest[-1]
            d = self._hops(u_l, v_l, dagger=False,
                           dirs=((mu_, sign),))
            return jnp.asarray(-self.kappa, v_l.dtype) * d

        ops = ((self.u_ext, self.clover_pk, v)
               if self.clover_pk is not None else (self.u_ext, v))
        return self._smap(fn, 1)(*ops)

    def as_hp(self) -> "object":
        """f64 defect-correction twin: the XLA stencil on the UNextended
        gauge under GSPMD (rolls auto-partition; no shard_map needed)."""
        from .device import DeviceFineCloverLevel, DeviceFineLevel
        Tl = self.lat.Lt // self.lmesh.nt
        Zl = self.lat.Lz // self.lmesh.nz
        Sl = self.lmesh.local_y * self.lat.Lx // 2
        m = self.lmesh

        def strip(u_l):
            # drop the per-shard gauge halo slices (T + 1[, Z + 1, S + Xh])
            return u_l[..., :Tl, :Zl, :Sl]

        u_pk = jax.jit(jax.shard_map(
            strip, mesh=m.mesh, in_specs=(m.gauge_spec(),),
            out_specs=m.gauge_spec(), check_vma=False))(self.u_ext)
        if self.clover_pk is not None:
            return DeviceFineCloverLevel(self.lat, u_pk, self.clover_pk,
                                         self.kappa, self.mu,
                                         csw=self.csw,
                                         flavor=self.flavor,
                                         backend="xla")
        return DeviceFineLevel(self.lat, u_pk, self.kappa, self.mu,
                               self.flavor, backend="xla")

    def sloppy(self, dtype=jnp.bfloat16) -> "ShardedFineLevel":
        import dataclasses as dc
        rep = {"u_ext": self.u_ext.astype(dtype)}
        if self.clover_pk is not None:
            rep["clover_pk"] = self.clover_pk.astype(dtype)
        return dc.replace(self, **rep)

    def random_field(self, key) -> jax.Array:
        shape = (2, 2, 4, 3, self.lat.Lt, self.lat.Lz,
                 self.lat.Ly * self.lat.Lx // 2)
        v = jax.random.normal(key, shape, dtype=jnp.float32)
        return jax.device_put(
            v, NamedSharding(self.lmesh.mesh,
                             P(None, *self.lmesh.spinor_spec())))


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
