"""Lattice device mesh: the TPU-native comm layer.

Replaces the reference's MPI Cartesian-grid communicator
(`lib/comm_mpi.cpp`, `comm_init`, `--gridsize` [U]; SURVEY.md C13, §6.8)
with a jax.sharding.Mesh over the lattice T and Z axes.  Halo exchange
is lax.ppermute over these axes inside shard_map
(parallel/sharded.py); global reductions ride jnp.sum on sharded arrays
(XLA inserts the cross-shard psum) exactly where MPI_Allreduce sat.

Axis mapping: mesh axes ("t", "z") shard the device-layout site axes
[T, Z, S].  Y/X stay on-chip (lanes).  On multi-slice systems put the
slower DCN axis on "t" (largest messages ride ICI).
"""
from __future__ import annotations

import dataclasses

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..lattice import Lattice


@dataclasses.dataclass(frozen=True)
class LatticeMesh:
    """A 2-D (t, z) device mesh bound to a lattice geometry."""
    lat: Lattice
    mesh: Mesh

    @staticmethod
    def make(lat: Lattice, nt: int, nz: int = 1,
             devices=None) -> "LatticeMesh":
        devices = devices if devices is not None else jax.devices()
        assert len(devices) >= nt * nz, (len(devices), nt, nz)
        assert lat.Lt % nt == 0 and lat.Lz % nz == 0
        # even local extents keep the eo checkerboard identical on every
        # shard (dslash kernels use local t/z indices in the parity masks)
        assert (lat.Lt // nt) % 2 == 0, "local T must be even"
        assert nz == 1 or (lat.Lz // nz) % 2 == 0, "local Z must be even"
        devs = np.asarray(devices[:nt * nz]).reshape(nt, nz)
        return LatticeMesh(lat=lat, mesh=Mesh(devs, ("t", "z")))

    @property
    def nt(self) -> int:
        return self.mesh.shape["t"]

    @property
    def nz(self) -> int:
        return self.mesh.shape["z"]

    @property
    def local_dims(self) -> tuple[int, int]:
        return (self.lat.Lt // self.nt, self.lat.Lz // self.nz)

    # --- shardings for the packed device layout -------------------------
    def spinor_spec(self) -> P:
        """packed spinor [2, 4, 3, T, Z, S]"""
        return P(None, None, None, "t", "z", None)

    def gauge_spec(self) -> P:
        """packed gauge [4, 2, 3, 3, 2, T, Z, S]"""
        return P(None, None, None, None, None, "t", "z", None)

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
