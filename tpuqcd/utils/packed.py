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


def pack_gauge8(u_dev: jax.Array, dtype=jnp.float32) -> jax.Array:
    """Reconstruct-8 compressed packed gauge (SURVEY.md C3
    "reconstruct-12/-8"; the role of the reference's
    gauge_field_order.h Reconstruct<8> [U], with a TPU-friendly
    parametrization):

        [4, 2, 4(pair), 1, 2(ri), T, Z, S]   — 8 reals per link

    pairs: (u01, u02, (theta00, alpha), (beta, gamma)) where row0 =
    (|u00| e^{i theta00}, u01, u02) with |u00| from the unit norm, and
    row1 = cos(a) e^{i b} v1 + sin(a) e^{i g} v2 in the canonical
    orthonormal basis {v1, v2} of row0's complement (v1 pivots on the
    better-conditioned of u01/u02 — the same branch is recomputable
    from the stored magnitudes at reconstruction); row2 =
    conj(row0 x row1).  Exactly representable for any U(3) row pair of
    a (possibly t-boundary-phased) SU(3) link; only the rebuilt row2
    needs the boundary-phase fix, as for reconstruct-12.
    """
    u00 = u_dev[:, :, 0, 0]
    u01 = u_dev[:, :, 0, 1]
    u02 = u_dev[:, :, 0, 2]
    r1 = u_dev[:, :, 1]                      # [4, 2, 3, T, Z, S]
    th00 = jnp.angle(u00)
    a00 = jnp.abs(u00)
    n1 = jnp.sqrt(jnp.maximum(a00 ** 2 + jnp.abs(u01) ** 2, 1e-30))
    n2 = jnp.sqrt(jnp.maximum(a00 ** 2 + jnp.abs(u02) ** 2, 1e-30))
    use1 = n1 >= n2
    inv = jnp.where(use1, 1.0 / n1, 1.0 / n2).astype(u00.dtype)
    v1 = jnp.stack([jnp.where(use1, -jnp.conj(u01), jnp.conj(u02)),
                    jnp.where(use1, jnp.conj(u00), 0.0),
                    jnp.where(use1, 0.0, -jnp.conj(u00))],
                   axis=2) * inv[:, :, None]
    r0 = u_dev[:, :, 0]
    # v2 = conj(r0 x v1)
    v2 = jnp.conj(jnp.cross(jnp.moveaxis(r0, 2, -1),
                            jnp.moveaxis(v1, 2, -1), axis=-1))
    v2 = jnp.moveaxis(v2, -1, 2)
    c1 = jnp.sum(jnp.conj(v1) * r1, axis=2)   # <v1, row1>
    c2 = jnp.sum(jnp.conj(v2) * r1, axis=2)
    alpha = jnp.arctan2(jnp.abs(c2), jnp.abs(c1))
    beta = jnp.angle(c1)
    gamma = jnp.angle(c2)
    pairs = jnp.stack([
        jnp.stack([jnp.real(u01), jnp.imag(u01)], axis=2),
        jnp.stack([jnp.real(u02), jnp.imag(u02)], axis=2),
        jnp.stack([th00, alpha], axis=2),
        jnp.stack([beta, gamma], axis=2),
    ], axis=2)                               # [4, 2, 4, 2(ri), T, Z, S]
    return pairs[:, :, :, None].astype(dtype)  # [4, 2, 4, 1, 2, T, Z, S]


def unpack_gauge8(u8: jax.Array) -> jax.Array:
    """Host/test-side exact inverse of pack_gauge8 -> complex device
    gauge [4, 2, 3, 3, T, Z, S] (oracle for the in-kernel recon8)."""
    x = u8[:, :, :, 0].astype(jnp.float32)   # [4, 2, 4, 2, T, Z, S]
    u01 = jax.lax.complex(x[:, :, 0, 0], x[:, :, 0, 1])
    u02 = jax.lax.complex(x[:, :, 1, 0], x[:, :, 1, 1])
    th00, alpha = x[:, :, 2, 0], x[:, :, 2, 1]
    beta, gamma = x[:, :, 3, 0], x[:, :, 3, 1]
    a00 = jnp.sqrt(jnp.maximum(
        1.0 - jnp.abs(u01) ** 2 - jnp.abs(u02) ** 2, 0.0))
    u00 = jax.lax.complex(a00 * jnp.cos(th00), a00 * jnp.sin(th00))
    n1 = jnp.sqrt(jnp.maximum(a00 ** 2 + jnp.abs(u01) ** 2, 1e-30))
    n2 = jnp.sqrt(jnp.maximum(a00 ** 2 + jnp.abs(u02) ** 2, 1e-30))
    use1 = n1 >= n2
    inv = jnp.where(use1, 1.0 / n1, 1.0 / n2)
    zero = jnp.zeros_like(u00)
    v1 = jnp.stack([jnp.where(use1, -jnp.conj(u01), jnp.conj(u02)),
                    jnp.where(use1, jnp.conj(u00), zero),
                    jnp.where(use1, zero, -jnp.conj(u00))],
                   axis=2) * inv[:, :, None].astype(u00.dtype)
    r0 = jnp.stack([u00, u01, u02], axis=2)
    v2 = jnp.conj(jnp.cross(jnp.moveaxis(r0, 2, -1),
                            jnp.moveaxis(v1, 2, -1), axis=-1))
    v2 = jnp.moveaxis(v2, -1, 2)
    c1 = jax.lax.complex(jnp.cos(alpha) * jnp.cos(beta),
                         jnp.cos(alpha) * jnp.sin(beta))
    c2 = jax.lax.complex(jnp.sin(alpha) * jnp.cos(gamma),
                         jnp.sin(alpha) * jnp.sin(gamma))
    r1 = c1[:, :, None] * v1 + c2[:, :, None] * v2
    r2 = jnp.conj(jnp.cross(jnp.moveaxis(r0, 2, -1),
                            jnp.moveaxis(r1, 2, -1), axis=-1))
    r2 = jnp.moveaxis(r2, -1, 2)
    return jnp.stack([r0, r1, r2], axis=2)


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
