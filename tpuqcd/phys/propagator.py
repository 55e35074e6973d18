"""Quark propagators: 12 spin-color solves -> per-site 12x12 tensor.

The QKXTM_Propagator equivalent ([U] plugin propagator classes;
SURVEY.md C21): S_{(alpha a),(beta b)}(x; x0) from 12 right-hand sides
(one per source spin-color), each solved with the mixed-precision eo
solver (tpuqcd.solve).  Sources can be point or Gaussian-smeared
(phys/smear.py); sinks optionally smeared the same way.

Layout notes: solves run in the packed eo device layout; the assembled
propagator is returned in full site layout
[T, Z, Y, X, 4(snk s), 3(snk c), 4(src s), 3(src c)] for the
contraction layer.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import eo_to_full, full_to_eo
from ..lattice import Lattice
from ..ops.layout import spinor_from_device, spinor_to_device
from ..solve import solve_tm
from ..utils.packed import pack_spinor, unpack_spinor


def full_to_packed(psi_full: jax.Array, lat: Lattice) -> jax.Array:
    """[T,Z,Y,X,4,3] -> packed [2(par), 2(ri), 4, 3, T, Z, S]."""
    eo = full_to_eo(psi_full, lat)
    dev = spinor_to_device(eo, lat)          # [2, 4, 3, T, Z, S]
    return jnp.stack([pack_spinor(dev[0]), pack_spinor(dev[1])])


def packed_to_full(psi_pk: jax.Array, lat: Lattice) -> jax.Array:
    dev = jnp.stack([unpack_spinor(psi_pk[0]), unpack_spinor(psi_pk[1])])
    return eo_to_full(spinor_from_device(dev, lat), lat)


def point_sources(lat: Lattice, pos: tuple[int, int, int, int],
                  dtype=jnp.complex64) -> jax.Array:
    """12 delta sources: [4(src s), 3(src c), T, Z, Y, X, 4, 3]."""
    t, z, y, x = pos
    src = np.zeros((4, 3, *lat.full_shape, 4, 3), dtype=np.complex64)
    for s in range(4):
        for c in range(3):
            src[s, c, t, z, y, x, s, c] = 1.0
    return jnp.asarray(src, dtype=dtype)


def packed_sources(sources: jax.Array, lat: Lattice) -> jax.Array:
    """12 full-layout sources [4, 3, T, Z, Y, X, 4, 3] -> stacked packed
    batch [12, 2(par), 2(ri), 4, 3, T, Z, S] (source-major s*3+c order;
    the multi-RHS solver input)."""
    return jnp.stack([full_to_packed(sources[s, c], lat)
                      for s in range(4) for c in range(3)])


def smear_sources(u_smear_pk_or_dev, sources: jax.Array, lat: Lattice,
                  alpha: float, n_steps: int) -> jax.Array:
    """Gaussian-smear each of the 12 sources (u = APE-smeared gauge in
    complex device layout [4,2,3,3,T,Z,S])."""
    from .smear import gaussian_smear
    out = []
    for s in range(4):
        for c in range(3):
            dev = spinor_to_device(full_to_eo(sources[s, c], lat), lat)
            sm = gaussian_smear(u_smear_pk_or_dev, dev, lat, alpha, n_steps)
            out.append(eo_to_full(spinor_from_device(sm, lat), lat))
    out = jnp.stack(out)
    return out.reshape(4, 3, *out.shape[1:])


def compute_propagator(u_pk: jax.Array, sources: jax.Array, lat: Lattice, *,
                       kappa: float, mu: float, flavor: int = +1,
                       tol: float = 1e-8, solver: str = "cg",
                       backend: str = "pallas", maxiter: int = 5000,
                       verbose: bool = False) -> jax.Array:
    """Solve M x = b for the 12 sources.

    sources: [4, 3, T, Z, Y, X, 4, 3] (full layout per source component).
    Returns S [T, Z, Y, X, 4, 3, 4, 3] (sink spin/color, source
    spin/color), in complex64.
    """
    from ..solve import solve_tm_batch
    b_pks = jnp.stack([full_to_packed(sources[s, c], lat)
                       for s in range(4) for c in range(3)])
    # ONE vmapped iteration stream drives all 12 columns (SURVEY.md
    # §8.4 — the reference solved them sequentially)
    res = solve_tm_batch(u_pk, b_pks, lat, kappa=kappa, mu=mu,
                         flavor=flavor, tol=tol, solver=solver,
                         backend=backend, maxiter=maxiter)
    if verbose:
        for i in range(12):
            print(f"  prop col ({i // 3},{i % 3}): "
                  f"relres={float(res.relres[i]):.2e} "
                  f"iters={int(res.iters[i])}")
    cols = jnp.stack([packed_to_full(res.x[i].astype(jnp.float32), lat)
                      for i in range(12)])  # [12, T,Z,Y,X,4,3]
    prop = cols.reshape(4, 3, *cols.shape[1:])
    # -> [T,Z,Y,X, snk_s, snk_c, src_s, src_c]
    return jnp.transpose(prop, (2, 3, 4, 5, 6, 7, 0, 1))


def sink_smear_propagator(u_smear_dev, prop: jax.Array, lat: Lattice,
                          alpha: float, n_steps: int) -> jax.Array:
    """Gaussian-smear the sink index of a propagator."""
    from .smear import gaussian_smear
    cols = []
    for s in range(4):
        for c in range(3):
            psi = prop[..., s, c]
            dev = spinor_to_device(full_to_eo(psi, lat), lat)
            sm = gaussian_smear(u_smear_dev, dev, lat, alpha, n_steps)
            cols.append(eo_to_full(spinor_from_device(sm, lat), lat))
    cols = jnp.stack(cols).reshape(4, 3, *prop.shape[:4], 4, 3)
    return jnp.transpose(cols, (2, 3, 4, 5, 6, 7, 0, 1))


def assemble_propagator_pk(cols_pk) -> jax.Array:
    """12 packed solutions [2(par), 2(ri), 4, 3, T, Z, S] (source-major
    s*3+c order) -> packed device propagator
    [2(ri), 2(par), 4(snk s), 3, 4(src s), 3, T, Z, S]
    (phys.contract_dev layout — the device contraction input)."""
    p = jnp.stack(list(cols_pk))        # [12, 2par, 2ri, 4, 3, T, Z, S]
    p = p.reshape(4, 3, *p.shape[1:])
    return jnp.transpose(p, (3, 2, 4, 5, 0, 1, 6, 7, 8))


def sink_smear_packed(u_smear_pk, x_pk: jax.Array, lat: Lattice,
                      alpha: float, n_steps: int) -> jax.Array:
    """Gaussian-smear one packed solution [2(par), 2(ri), 4, 3, T, Z, S]
    entirely on packed-real planes (stays on the accelerator — complex
    arrays can neither transfer to nor roll on the axon TPU backend).

    u_smear_pk: PACKED APE-smeared gauge (utils/packed.pack_gauge)."""
    from .smear import gaussian_smear_pk
    return gaussian_smear_pk(u_smear_pk, x_pk, lat, alpha, n_steps)


def sink_smear_prop_pk(u_smear_pk, prop_pk: jax.Array, lat: Lattice,
                       alpha: float, n_steps: int) -> jax.Array:
    """Gaussian-smear the SINK index of a packed device propagator
    [2(ri), 2(par), 4(snk s), 3(snk c), 4(src s), 3(src c), T, Z, S]
    (phys/contract_dev layout).  Smearing is spin-diagonal and acts on
    (sink color x space) only, so each of the 12 source columns smears
    independently.  Also applies to packed sequential sources (same
    layout with (beta, b) as the trailing open indices) — the reference
    seqSourceFixSink smears the sequential source before the backward
    inversion ([U] QKXTM_Propagator3D/seqSourceFixSink; SURVEY.md C24)."""
    from .smear import gaussian_smear_pk
    # [2ri,2par,4,3,4,3,T,Z,S] -> [12(src), 2par, 2ri, 4, 3, T, Z, S]
    cols = jnp.moveaxis(prop_pk, (4, 5), (0, 1))
    cols = cols.reshape(12, *cols.shape[2:])
    cols = jnp.swapaxes(cols, 1, 2)
    # ONE vmapped smearing dispatch for all 12 source columns (the
    # column loop would issue 12 separate jitted streams)
    sm = jax.vmap(lambda x: gaussian_smear_pk(u_smear_pk, x, lat,
                                              alpha, n_steps))(cols)
    return assemble_propagator_pk(list(sm))
