"""SU(3) group utilities: random links, reunitarization, link compression.

Replaces the reference's gauge-field order/reconstruct machinery
(`include/gauge_field_order.h`, `lib/cuda_gauge_field.cu` [U]; SURVEY.md C3).
Compression here is *storage-format only*: fields are compressed to 12 reals
(two rows) on the way into kernels and the third row is rebuilt in-kernel as
``row2 = conj(row0 x row1)`` (SURVEY.md Appendix A #5).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def random_su3(key: jax.Array, shape: tuple[int, ...],
               dtype=jnp.complex64) -> jax.Array:
    """iid random SU(3) matrices of shape ``shape + (3, 3)``.

    Row-wise Gram-Schmidt + reconstruct-12 (see random_su3_leading) —
    works on the TPU backend, which has no complex QR.  Good enough for
    tests and pseudo-gauge ensembles; not a lattice HMC.
    """
    m = random_su3_leading(key, shape, dtype=dtype)   # [3, 3, *shape]
    return jnp.moveaxis(m, (0, 1), (-2, -1))


def unit_gauge(lat, eo: bool = False, dtype=jnp.complex64) -> jax.Array:
    """Free-field (identity) gauge configuration."""
    shape = lat.gauge_shape(eo=eo)
    eye = jnp.eye(3, dtype=dtype)
    return jnp.broadcast_to(eye, shape)


def random_gauge(key: jax.Array, lat, eo: bool = False,
                 dtype=jnp.complex64) -> jax.Array:
    shape = lat.gauge_shape(eo=eo)[:-2]
    return random_su3(key, shape, dtype=dtype)


def reunitarize(u: jax.Array) -> jax.Array:
    """Project ``[..., 3, 3]`` matrices back onto SU(3) (Newton polar
    projection — TPU-safe, no complex QR on that backend)."""
    from .ops import mat3
    m = jnp.moveaxis(u, (-2, -1), (0, 1))
    return jnp.moveaxis(mat3.project_su3(m), (0, 1), (-2, -1))


# --- reconstruct-12 compression -------------------------------------------

def compress12(u: jax.Array) -> jax.Array:
    """SU(3) ``[..., 3, 3]`` -> first two rows ``[..., 2, 3]`` (12 reals)."""
    return u[..., :2, :]


def reconstruct12(u12: jax.Array) -> jax.Array:
    """Rebuild the third row: row2 = conj(row0 x row1).

    Unitarity + det=1 imply the third row of an SU(3) matrix is the complex
    conjugate of the cross product of the first two (reference
    `gauge_field_order.h` Reconstruct<12> [U]).
    """
    r0 = u12[..., 0, :]
    r1 = u12[..., 1, :]
    r2 = jnp.conj(jnp.cross(r0, r1))
    return jnp.concatenate([u12, r2[..., None, :]], axis=-2)


def dagger(u: jax.Array) -> jax.Array:
    """Hermitian conjugate on the last two axes."""
    return jnp.conj(jnp.swapaxes(u, -1, -2))


# --- device-layout generation ---------------------------------------------
# TPU layouts pad the last two array axes to (sublane, lane) tiles, so
# matrices must live on *leading* axes on device (see ops/layout.py).  These
# generators build SU(3) fields directly as [..., 3, 3, *site_dims] with
# row-wise Gram-Schmidt + reconstruct-12 (no jnp.linalg on device).

def _normalize_rows(v: jax.Array) -> jax.Array:
    # v: [3(color), *sites] complex; normalize over the leading color axis
    n = jnp.sqrt(jnp.sum(jnp.abs(v) ** 2, axis=0, keepdims=True))
    return v / n


def _cross_conj(a: jax.Array, b: jax.Array) -> jax.Array:
    """conj(a x b) over the leading color axis."""
    def g(i):
        return a[(i + 1) % 3] * b[(i + 2) % 3] - a[(i + 2) % 3] * b[(i + 1) % 3]
    return jnp.conj(jnp.stack([g(0), g(1), g(2)], axis=0))


def random_su3_leading(key: jax.Array, site_shape: tuple[int, ...],
                       dtype=jnp.complex64) -> jax.Array:
    """Random SU(3) as [3, 3, *site_shape] (rows on the two leading axes)."""
    ks = jax.random.split(key, 4)
    shape = (3, *site_shape)
    def cnormal(k1, k2):
        return jax.lax.complex(
            jax.random.normal(k1, shape, dtype=jnp.float32),
            jax.random.normal(k2, shape, dtype=jnp.float32)).astype(dtype)
    r0 = _normalize_rows(cnormal(ks[0], ks[1]))
    r1 = cnormal(ks[2], ks[3])
    r1 = r1 - jnp.sum(jnp.conj(r0) * r1, axis=0, keepdims=True) * r0
    r1 = _normalize_rows(r1)
    r2 = _cross_conj(r0, r1)
    return jnp.stack([r0, r1, r2], axis=0)  # [3(row), 3(col), *sites]


def random_gauge_dev(key: jax.Array, lat, dtype=jnp.complex64) -> jax.Array:
    """Random eo gauge directly in device layout [4, 2, 3, 3, T, Z, S]."""
    T, Z, Y, Xh = (*lat.full_shape[:3], lat.Lx // 2)
    u = random_su3_leading(key, (4, 2, T, Z, Y * Xh), dtype=dtype)
    # [3, 3, 4, 2, T, Z, S] -> [4, 2, 3, 3, T, Z, S]
    return jnp.moveaxis(u, (0, 1), (2, 3))


def unit_gauge_dev(lat, dtype=jnp.complex64) -> jax.Array:
    T, Z, Y, Xh = (*lat.full_shape[:3], lat.Lx // 2)
    eye = jnp.eye(3, dtype=dtype).reshape(3, 3, 1, 1, 1)
    return jnp.broadcast_to(eye, (4, 2, 3, 3, T, Z, Y * Xh)).copy()
