"""Packed real (split re/im) field representation for kernels.

Pallas TPU has no complex dtypes, and bf16 sloppy fields have no complex
form at all, so the production solver path stores fields as packed real
arrays with a leading ri axis:

    spinor: [2(ri), 4(spin), 3(color), T, Z, S]   (S = Y * X//2)
    gauge : [4(mu), 2(parity), 3, 3, 2(ri), T, Z, S]

Linear algebra stays trivially correct on packed arrays: complex axpy
with *real* scalars, norms, and Re<x,y> are exactly the corresponding
real operations on the packed array (CG on the normal equations uses
only real scalars).  Complex-scalar helpers for BiCGStab live here too.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def pack_spinor(psi_dev: jax.Array, dtype=jnp.float32) -> jax.Array:
    """device-layout complex spinor [..., 4, 3, T, Z, S] -> packed
    [..., 2, 4, 3, T, Z, S]."""
    nb = psi_dev.ndim - 5
    return jnp.stack([jnp.real(psi_dev), jnp.imag(psi_dev)],
                     axis=nb).astype(dtype)


def unpack_spinor(psi_pk: jax.Array) -> jax.Array:
    nb = psi_pk.ndim - 6
    re = jnp.take(psi_pk, 0, axis=nb).astype(jnp.float32)
    im = jnp.take(psi_pk, 1, axis=nb).astype(jnp.float32)
    return jax.lax.complex(re, im)


def pack_gauge(u_dev: jax.Array, dtype=jnp.float32) -> jax.Array:
    """device-layout complex gauge [4, 2, 3, 3, T, Z, S] -> packed
    [4, 2, 3, 3, 2, T, Z, S]."""
    return jnp.stack([jnp.real(u_dev), jnp.imag(u_dev)], axis=4).astype(dtype)


def pack_gauge12(u_dev: jax.Array, dtype=jnp.float32) -> jax.Array:
    """Reconstruct-12 compressed packed gauge: rows 0,1 only ->
    [4, 2, 2(row), 3, 2(ri), T, Z, S] (SURVEY.md C3 "gauge-link
    compression"; the Pallas kernel rebuilds the third row in VMEM)."""
    return pack_gauge(u_dev, dtype)[:, :, :2]


def unpack_gauge(u_pk: jax.Array) -> jax.Array:
    return jax.lax.complex(u_pk[:, :, :, :, 0].astype(jnp.float32),
                           u_pk[:, :, :, :, 1].astype(jnp.float32))


def caxpy(ar: jax.Array, ai: jax.Array, x_pk: jax.Array,
          y_pk: jax.Array) -> jax.Array:
    """(ar + i ai) * x + y on packed spinors (leading ri axis)."""
    nb = x_pk.ndim - 6
    xr = jnp.take(x_pk, 0, axis=nb)
    xi = jnp.take(x_pk, 1, axis=nb)
    a_r = ar.astype(x_pk.dtype)
    a_i = ai.astype(x_pk.dtype)
    zr = a_r * xr - a_i * xi
    zi = a_r * xi + a_i * xr
    return y_pk + jnp.stack([zr, zi], axis=nb)


def cdot_packed(x_pk: jax.Array, y_pk: jax.Array):
    """<x, y> on packed spinors -> (re, im) f64 pair."""
    nb = x_pk.ndim - 6
    xr = jnp.take(x_pk, 0, axis=nb).astype(jnp.float64)
    xi = jnp.take(x_pk, 1, axis=nb).astype(jnp.float64)
    yr = jnp.take(y_pk, 0, axis=nb).astype(jnp.float64)
    yi = jnp.take(y_pk, 1, axis=nb).astype(jnp.float64)
    re = jnp.sum(xr * yr) + jnp.sum(xi * yi)
    im = jnp.sum(xr * yi) - jnp.sum(xi * yr)
    return re, im


def pack_clover(blocks: jax.Array, dtype=jnp.float32) -> jax.Array:
    """chiral clover blocks [2(chir), 6, 6, T, Z, S] complex ->
    packed [2(ri), 2, 6, 6, T, Z, S]."""
    return jnp.stack([jnp.real(blocks), jnp.imag(blocks)]).astype(dtype)
