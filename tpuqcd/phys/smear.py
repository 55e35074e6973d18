"""Gaussian (Wuppertal) source/sink smearing on APE-smeared links.

TPU-native equivalent of the reference's QKXTM smearing kernels
(`QKXTM_Vector::gaussianSmearing`-style code [U]; SURVEY.md C22):

    psi -> [ (1 + alpha H) / (1 + 6 alpha) ]^n psi,
    H psi(x) = sum_{i in x,y,z} [ U_i(x) psi(x+i) + U_i(x-i)^dag psi(x-i) ]

with U the (typically APE-smeared, ops/gauge_tools.py) gauge field.
Device layout throughout: psi [2(par), 4, 3, T, Z, S]; smearing is
spatial-only so it never mixes timeslices (safe on sequential sources).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..lattice import Lattice
from ..ops.shifts import neighbor


def cov_laplace_3d(u_dev: jax.Array, psi_eo: jax.Array,
                   lat: Lattice) -> jax.Array:
    """H psi for both parities; psi_eo [2, 4, 3, T, Z, S] (batch axes may
    lead: [..., 2, 4, 3, T, Z, S])."""
    out = []
    for p in (0, 1):
        acc = None
        for i in range(3):  # spatial directions
            fwd_val = neighbor(psi_eo[..., 1 - p, :, :, :, :, :], i, +1,
                               1 - p, lat)
            # spin is a spectator: vmap the color matvec over spin axis
            fwd = _su3_spin_mv(u_dev[i, p], fwd_val)
            g = _su3_spin_mv_dag(u_dev[i, 1 - p], psi_eo[..., 1 - p, :, :, :, :, :])
            bwd = neighbor(g, i, -1, 1 - p, lat)
            t = fwd + bwd
            acc = t if acc is None else acc + t
        out.append(acc)
    return jnp.stack(out, axis=psi_eo.ndim - 6)


def _su3_spin_mv(u, psi):
    """u [3,3,T,Z,S] x psi [..., 4, 3, T, Z, S] over color."""
    cols = []
    for i in range(3):
        acc = None
        for j in range(3):
            t = u[i, j] * psi[..., :, j, :, :, :]
            acc = t if acc is None else acc + t
        cols.append(acc)
    return jnp.stack(cols, axis=psi.ndim - 5 + 1)


def _su3_spin_mv_dag(u, psi):
    cols = []
    for i in range(3):
        acc = None
        for j in range(3):
            t = jnp.conj(u[j, i]) * psi[..., :, j, :, :, :]
            acc = t if acc is None else acc + t
        cols.append(acc)
    return jnp.stack(cols, axis=psi.ndim - 5 + 1)


def gaussian_smear(u_dev: jax.Array, psi_eo: jax.Array, lat: Lattice,
                   alpha: float = 4.0, n_steps: int = 50) -> jax.Array:
    """n_steps Wuppertal iterations (jit-friendly fori_loop)."""
    norm = 1.0 / (1.0 + 6.0 * alpha)

    def body(_, v):
        return (norm * (v + alpha * cov_laplace_3d(u_dev, v, lat))).astype(
            v.dtype)

    return jax.lax.fori_loop(0, n_steps, body, psi_eo)


# --- packed-real path (the TPU production form) -----------------------------
# The axon backend cannot device_put complex gauge arrays at all, and
# cannot roll/gather complex on-device — so the accelerator-side smearing
# runs entirely on packed-real planes (same discipline as
# parallel/overlap.py, whose SU(3) slab multiply is reused here).

def cov_laplace_3d_pk(u_pk: jax.Array, psi_pk: jax.Array,
                      lat: Lattice) -> jax.Array:
    """H psi on packed fields: u_pk [4, 2, 3, 3, 2ri, T, Z, S]
    (utils/packed.pack_gauge), psi_pk [2par, 2ri, 4, 3, T, Z, S]."""
    from ..parallel.overlap import _su3_slab
    out = []
    for p in (0, 1):
        src = psi_pk[1 - p]                       # [2ri, 4, 3, T, Z, S]
        acc = None
        for i in range(3):                        # spatial directions
            fwd_val = neighbor(src, i, +1, 1 - p, lat)
            fwd = _su3_slab(u_pk[i, p], fwd_val, dagger=False)
            g = _su3_slab(u_pk[i, 1 - p], src, dagger=True)
            bwd = neighbor(g, i, -1, 1 - p, lat)
            t = fwd + bwd
            acc = t if acc is None else acc + t
        out.append(acc)
    return jnp.stack(out)


@partial(jax.jit, static_argnames=("lat", "n_steps"))
def gaussian_smear_pk(u_pk: jax.Array, psi_pk: jax.Array, lat: Lattice,
                      alpha: float = 4.0, n_steps: int = 50) -> jax.Array:
    """Packed-real Wuppertal smearing (matches gaussian_smear on the
    complex layout; jitted — eager packed ops are dispatch-bound)."""
    norm = 1.0 / (1.0 + 6.0 * alpha)

    def body(_, v):
        return (norm * (v + alpha * cov_laplace_3d_pk(u_pk, v, lat))
                ).astype(v.dtype)

    return jax.lax.fori_loop(0, n_steps, body, psi_pk)
