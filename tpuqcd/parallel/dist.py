"""Multi-process (multi-host) distribution layer.

The reference runs one MPI rank per GPU and boots the grid with
`comm_init(..., gridsize)` (`lib/comm_mpi.cpp` [U]; SURVEY.md §6.8).
The TPU-native equivalent is a multi-controller JAX program: one Python
process per host, `jax.distributed.initialize` to form the global
runtime, and the SAME `jax.sharding.Mesh`/`shard_map` code as the
single-process path — GSPMD sees the global device set, so nothing in
the operator / solver / MG stack changes.  ICI carries the intra-slice
halo traffic; the mesh's "t" axis should be laid over the slower DCN
axis on multi-slice systems (see LatticeMesh docstring).

Bootstrapping convention (mirrors the standard TPU pod launch): every
process runs the same CLI with

    TPUQCD_DIST=1 [TPUQCD_COORDINATOR=host:port TPUQCD_NUM_PROCS=N
    TPUQCD_PROC_ID=i] python -m tpuqcd.cli.run_... --config ...

On Cloud TPU the three optional variables are auto-detected by JAX from
the TPU metadata; on CPU/GPU clusters they (or the standard
JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID) are
required.
"""
from __future__ import annotations

import logging
import os

import jax
import numpy as np

log = logging.getLogger("tpuqcd")

_initialized = False


def is_enabled() -> bool:
    """True when the launch asked for multi-process mode."""
    return os.environ.get("TPUQCD_DIST", "0") == "1"


def init_distributed() -> None:
    """Form the global JAX runtime (idempotent; no-op unless enabled).

    Must run before any other JAX call in the process — parse_args calls
    it first thing, before gauge setup touches a device.
    """
    global _initialized
    if _initialized or not is_enabled():
        return
    kwargs = {}
    coord = os.environ.get("TPUQCD_COORDINATOR")
    if coord:
        kwargs["coordinator_address"] = coord
    npr = os.environ.get("TPUQCD_NUM_PROCS")
    if npr:
        kwargs["num_processes"] = int(npr)
    pid = os.environ.get("TPUQCD_PROC_ID")
    if pid:
        kwargs["process_id"] = int(pid)
    jax.distributed.initialize(**kwargs)
    _initialized = True
    log.info("distributed: process %d/%d, %d global / %d local devices",
             jax.process_index(), jax.process_count(),
             len(jax.devices()), len(jax.local_devices()))


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def global_put(arr, sharding) -> jax.Array:
    """device_put that also works across processes.

    Every process holds the SAME full host array (gauge configs and
    sources are tiny next to the solve state and are built from the
    shared seed / shared file); each process materializes only its
    addressable shards, and the result is one global jax.Array.
    """
    if not is_multiprocess():
        return jax.device_put(arr, sharding)
    arr = np.asarray(arr)
    return jax.make_array_from_callback(arr.shape, sharding,
                                        lambda idx: arr[idx],
                                        dtype=arr.dtype)


def all_processes_agree(value: float, tag: str = "") -> bool:
    """Cheap cross-process consistency check (replaces the reference's
    rank-0 broadcast-and-compare on input params).  Uses a tiny psum —
    every process contributes value/N and the sum must equal value."""
    if not is_multiprocess():
        return True
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    devs = np.asarray(jax.devices())
    n = len(devs)
    mesh = Mesh(devs, ("p",))
    x = global_put(np.full((n,), value / n, np.float32),
                   NamedSharding(mesh, P("p")))
    total = float(jax.jit(lambda v: jax.numpy.sum(v))(x))
    ok = abs(total - value) <= 1e-5 * max(1.0, abs(value))
    if not ok:
        log.error("process disagreement on %s: %r vs %r", tag, value,
                  total)
    return ok
