"""Kernel autotuner with persistent on-disk cache.

The reference brute-force tunes launch geometry per kernel+volume and
caches to tunecache.tsv under QUDA_RESOURCE_PATH ([U] lib/tune.cpp;
SURVEY.md C14/X1).  On TPU, XLA owns most scheduling; what remains
tunable is the Pallas block decomposition (block_z of the Dslash
kernel).  Candidates are timed once per (lattice, dtype, device) and the
winner is cached as JSON under $TPUQCD_RESOURCE_PATH (default
~/.cache/tpuqcd).
"""
from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

from ..lattice import Lattice


def _cache_path() -> str:
    d = os.environ.get("TPUQCD_RESOURCE_PATH",
                       os.path.expanduser("~/.cache/tpuqcd"))
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, "tunecache.json")


def _load() -> dict:
    try:
        with open(_cache_path()) as f:
            return json.load(f)
    except Exception:
        return {}


def _store(cache: dict) -> None:
    with open(_cache_path(), "w") as f:
        json.dump(cache, f, indent=1, sort_keys=True)


def tune_dslash_block_z(lat: Lattice, dtype=jnp.float32,
                        niter: int = 20, force: bool = False,
                        recon: int = 18) -> int:
    """Time the Dslash over the legal block_z candidates; cache the best.

    recon: 18 = full links, 12 = compressed (pack_gauge12)."""
    from .. import su3
    from ..fields import apply_boundary_phase_dev, random_spinor_dev
    from ..ops.dslash_pallas import _auto_block_z, dslash_eo_pallas
    from ..utils.packed import pack_gauge, pack_gauge12, pack_spinor

    dev = jax.devices()[0]
    key = (f"dslash_eo/{lat.dims}/{jnp.dtype(dtype).name}/r{recon}/"
           f"{dev.device_kind}")
    cache = _load()
    if key in cache and not force:
        return int(cache[key]["block_z"])

    S = lat.Ly * lat.Lx // 2
    zmax = _auto_block_z(lat.Lz, S, jnp.dtype(dtype).itemsize)
    cands = []
    zb = zmax
    while zb >= 8 or zb == lat.Lz:
        if lat.Lz % zb == 0:
            cands.append(zb)
        if zb == 1:
            break
        zb //= 2
    if not cands:
        cands = [zmax]

    u = apply_boundary_phase_dev(
        su3.random_gauge_dev(jax.random.PRNGKey(0), lat), lat)
    psi = random_spinor_dev(jax.random.PRNGKey(1), lat, parities=1)
    pack_u = pack_gauge12 if recon == 12 else pack_gauge
    u_pk = pack_u(u, dtype=dtype)
    psi_pk = pack_spinor(psi, dtype=dtype)

    results = {}
    for zb in cands:
        @jax.jit
        def chain(u_a, p, zb=zb):
            def body(i, x):
                return dslash_eo_pallas(u_a, x, 0, lat, block_z=zb)
            x = jax.lax.fori_loop(0, niter, body, p)
            return jnp.real(jnp.ravel(x)[0])
        try:
            float(chain(u_pk, psi_pk))  # compile + smoke
            best = 1e30
            for _ in range(2):
                t0 = time.perf_counter()
                float(chain(u_pk, psi_pk))
                best = min(best, time.perf_counter() - t0)
            results[zb] = best / niter
        except Exception:
            continue
    if not results:
        return zmax
    winner = min(results, key=results.get)
    cache[key] = {"block_z": winner,
                  "us_per_apply": {str(k): round(v * 1e6, 2)
                                   for k, v in results.items()}}
    _store(cache)
    return int(winner)


def tune_comm_policy(lat: Lattice, lmesh, apply_fns: dict,
                     b_sh, *, tag: str = "tm", niter: int = 10,
                     force: bool = False) -> str:
    """Pick the faster multi-chip Dslash communication policy.

    The reference's dslash_policy engine benchmarks its comm strategies
    per kernel+geometry and caches the winner ([U] dslash_policy.cuh;
    SURVEY.md C7); here the two candidates are the fused halo-exchange
    kernel and the interior/exterior overlap split (parallel/overlap.py
    — epilogues stay fused either way), timed on the PRODUCTION mesh
    with the production operands.  ``apply_fns`` maps policy name ->
    jit-able closure of one operator apply on ``b_sh``; the winner is
    cached under the (dims, mesh, tag, device) key.

    Which policy wins is genuinely geometry-dependent: overlap hides
    halo latency on real ICI meshes but pays 2/Tl + 2/Zl recompute and
    O(surface) repair passes, so thin local slabs favor the fused form.
    """
    dev = jax.devices()[0]
    key = (f"comm_policy/{lat.dims}/{lmesh.nt}x{lmesh.nz}"
           f"x{getattr(lmesh, 'ny', 1)}/{tag}/{dev.device_kind}")
    cache = _load()
    if key not in cache and getattr(lmesh, "ny", 1) == 1:
        # migrate pre-y-mesh cache entries ("NxM" key format)
        legacy = (f"comm_policy/{lat.dims}/{lmesh.nt}x{lmesh.nz}"
                  f"/{tag}/{dev.device_kind}")
        if legacy in cache:
            cache[key] = cache.pop(legacy)
            _store(cache)
    if key in cache and not force:
        w = cache[key]["policy"]
        if w in apply_fns:
            return w

    results = {}
    for name, fn in apply_fns.items():
        run = jax.jit(lambda b, fn=fn: jnp.real(jnp.ravel(fn(b))[0]))
        try:
            float(run(b_sh))  # compile + smoke
            best = 1e30
            for _ in range(2):
                t0 = time.perf_counter()
                for _ in range(niter):
                    r = run(b_sh)
                jax.block_until_ready(r)
                best = min(best, time.perf_counter() - t0)
            results[name] = best / niter
        except Exception:
            continue
    if not results:
        return next(iter(apply_fns))
    winner = min(results, key=results.get)
    cache[key] = {"policy": winner,
                  "us_per_apply": {k: round(v * 1e6, 2)
                                   for k, v in results.items()}}
    _store(cache)
    return winner
