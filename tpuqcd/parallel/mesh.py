"""Lattice device mesh: the TPU-native comm layer.

Replaces the reference's MPI Cartesian-grid communicator
(`lib/comm_mpi.cpp`, `comm_init`, `--gridsize` [U]; SURVEY.md C13, §6.8)
with a jax.sharding.Mesh over the lattice T, Z and Y axes.  Halo
exchange is lax.ppermute over these axes inside shard_map
(parallel/sharded.py); global reductions ride jnp.sum on sharded arrays
(XLA inserts the cross-shard psum) exactly where MPI_Allreduce sat.

Axis mapping: mesh axes ("t", "z", "y") shard the device-layout site
axes [T, Z, S] — the packed S axis is y-major (S = Y * X/2,
ops/layout.py), so sharding S into ny equal chunks is exactly a
y-decomposition.  X stays on-chip (lanes).  This mirrors the
reference's 4-D `--gridsize gx gy gz gt` decomposition with gx pinned
to 1 (the X axis is the vector axis on TPU; splitting it would break
lane streaming for zero scaling benefit at realistic chip counts).
On multi-slice systems put the slower DCN axis on "t" (largest
messages ride ICI).
"""
from __future__ import annotations

import dataclasses

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..lattice import Lattice


@dataclasses.dataclass(frozen=True)
class LatticeMesh:
    """A 3-D (t, z, y) device mesh bound to a lattice geometry
    (ny = 1 gives the common 2-D (t, z) decomposition)."""
    lat: Lattice
    mesh: Mesh

    @staticmethod
    def make(lat: Lattice, nt: int, nz: int = 1, ny: int = 1,
             devices=None) -> "LatticeMesh":
        devices = devices if devices is not None else jax.devices()
        assert len(devices) >= nt * nz * ny, (len(devices), nt, nz, ny)
        assert lat.Lt % nt == 0 and lat.Lz % nz == 0 and lat.Ly % ny == 0
        # even local extents keep the eo checkerboard identical on every
        # shard (dslash kernels use local t/z/y indices in the parity
        # masks)
        assert (lat.Lt // nt) % 2 == 0, "local T must be even"
        assert nz == 1 or (lat.Lz // nz) % 2 == 0, "local Z must be even"
        assert ny == 1 or (lat.Ly // ny) % 2 == 0, "local Y must be even"
        devs = np.asarray(devices[:nt * nz * ny]).reshape(nt, nz, ny)
        return LatticeMesh(lat=lat, mesh=Mesh(devs, ("t", "z", "y")))

    @property
    def nt(self) -> int:
        return self.mesh.shape["t"]

    @property
    def nz(self) -> int:
        return self.mesh.shape["z"]

    @property
    def ny(self) -> int:
        return self.mesh.shape.get("y", 1)

    @property
    def local_dims(self) -> tuple[int, int]:
        return (self.lat.Lt // self.nt, self.lat.Lz // self.nz)

    @property
    def local_y(self) -> int:
        return self.lat.Ly // self.ny

    # --- shardings for the packed device layout -------------------------
    def spinor_spec(self) -> P:
        """packed spinor [2, 4, 3, T, Z, S] (S is y-major, so "y" on S
        shards whole y-rows)"""
        return P(None, None, None, "t", "z", "y")

    def gauge_spec(self) -> P:
        """packed gauge [4, 2, 3, 3, 2, T, Z, S]"""
        return P(None, None, None, None, None, "t", "z", "y")

    def spinor_sharding(self) -> NamedSharding:
        return NamedSharding(self.mesh, self.spinor_spec())

    def gauge_sharding(self) -> NamedSharding:
        return NamedSharding(self.mesh, self.gauge_spec())

    def shard_spinor(self, psi_pk: jax.Array) -> jax.Array:
        from .dist import global_put
        return global_put(psi_pk, self.spinor_sharding())

    def shard_gauge(self, u_pk: jax.Array) -> jax.Array:
        from .dist import global_put
        return global_put(u_pk, self.gauge_sharding())
