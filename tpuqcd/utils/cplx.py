"""Complex contractions as real einsums.

The axon TPU backend has NO complex dot_general at all (any contracting
einsum / vdot / matmul on complex64 fails UNIMPLEMENTED; elementwise
complex ops are fine).  These helpers run every complex contraction as
four real einsums, which is also exactly what a TPU *should* execute.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


_PREC = jax.lax.Precision.HIGHEST  # TPU f32 dots default to bf16 passes


def ceinsum(subscripts: str, a: jax.Array, b: jax.Array) -> jax.Array:
    """einsum for two complex operands via real parts (TPU-safe)."""
    if not (jnp.iscomplexobj(a) or jnp.iscomplexobj(b)):
        return jnp.einsum(subscripts, a, b, optimize=True,
                          precision=_PREC)
    ar, ai = jnp.real(a), jnp.imag(a)
    br, bi = jnp.real(b), jnp.imag(b)
    re = jnp.einsum(subscripts, ar, br, optimize=True, precision=_PREC) - \
        jnp.einsum(subscripts, ai, bi, optimize=True, precision=_PREC)
    im = jnp.einsum(subscripts, ar, bi, optimize=True, precision=_PREC) + \
        jnp.einsum(subscripts, ai, br, optimize=True, precision=_PREC)
    return jax.lax.complex(re, im)


def cvdot(a: jax.Array, b: jax.Array) -> jax.Array:
    """<a, b> = sum conj(a) b as a complex64 scalar (f64 accumulation)."""
    ar = jnp.real(a).astype(jnp.float64)
    ai = jnp.imag(a).astype(jnp.float64)
    br = jnp.real(b).astype(jnp.float64)
    bi = jnp.imag(b).astype(jnp.float64)
    re = jnp.sum(ar * br) + jnp.sum(ai * bi)
    im = jnp.sum(ar * bi) - jnp.sum(ai * br)
    return jax.lax.complex(re.astype(jnp.float32), im.astype(jnp.float32))
