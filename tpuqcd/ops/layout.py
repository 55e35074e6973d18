"""Device (TPU-tiled) field layout and conversions.

Why this exists: XLA:TPU tiles the last two axes of every array to
(sublane, lane) = (8, 128) for f32 / (4, 128) for c64.  The physics layout
``[T, Z, Y, X, spin, color]`` puts (4, 3) minor — a 43x--57x padding
blowup (measured: the 32^3x64 gauge field "grew" from 0.6 GB to 34 GB).
The device layout therefore keeps the *small* tensor axes leading and a
large flattened site axis minor:

    spinor (one parity): ``[4(spin), 3(color), T, Z, S]``,  S = Y * X//2
    gauge  (eo)        : ``[4(mu), 2(parity), 3, 3, T, Z, S]``

(Z, S) are the tiled axes: S is a multiple of 128 for production sizes
(e.g. 32^3x64: S = 32*16 = 512) and Z a multiple of 8.  This is also the
layout the Pallas Dslash kernel consumes (ops/dslash_pallas.py), so XLA
and Pallas paths interchange with no relayout.

Shift algebra on the flattened S axis (y inner-major, xh minor):
  - y-shift +-1  == roll by -+Xh on S (the y-wraparound is automatic and
    correct because rolling past a (t,z) row's end wraps to the same row).
  - xh-shift +-1 == roll by -+1 on S *plus* a fixup at the x-row boundary
    (sites with xh==Xh-1 / xh==0 must wrap within their own y row); the
    fixup columns are selected with an iota mask and a roll by +-Xh the
    other way.  See dslash_xla.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..lattice import Lattice


def spinor_to_device(psi_eo: jax.Array, lat: Lattice) -> jax.Array:
    """[..., 2, T, Z, Y, Xh, 4, 3] -> [..., 2, 4, 3, T, Z, S] (also accepts
    single-parity input without the leading 2)."""
    *b, T, Z, Y, Xh, s, c = psi_eo.shape
    nb = len(b)
    out = jnp.moveaxis(psi_eo, (nb + 4, nb + 5), (nb, nb + 1))
    return out.reshape(*b, s, c, T, Z, Y * Xh)


def spinor_from_device(psi_dev: jax.Array, lat: Lattice) -> jax.Array:
    """[..., 4, 3, T, Z, S] -> [..., T, Z, Y, Xh, 4, 3]."""
    *b, s, c, T, Z, S = psi_dev.shape
    nb = len(b)
    Y = lat.Ly
    Xh = lat.Lx // 2
    out = psi_dev.reshape(*b, s, c, T, Z, Y, Xh)
    return jnp.moveaxis(out, (nb, nb + 1), (nb + 4, nb + 5))


def gauge_to_device(u_eo: jax.Array, lat: Lattice) -> jax.Array:
    """[4, 2, T, Z, Y, Xh, 3, 3] -> [4, 2, 3, 3, T, Z, S]."""
    mu, p, T, Z, Y, Xh, i, j = u_eo.shape
    out = jnp.moveaxis(u_eo, (6, 7), (2, 3))
    return out.reshape(mu, p, i, j, T, Z, Y * Xh)


def gauge_from_device(u_dev: jax.Array, lat: Lattice) -> jax.Array:
    mu, p, i, j, T, Z, S = u_dev.shape
    Y, Xh = lat.Ly, lat.Lx // 2
    out = u_dev.reshape(mu, p, i, j, T, Z, Y, Xh)
    return jnp.moveaxis(out, (2, 3), (6, 7))
