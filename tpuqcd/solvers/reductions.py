"""High-accuracy global reductions for Krylov solvers.

Replaces the reference's fp64-accumulating device reductions
(`lib/reduce_quda.cu`, `reduce_core.cuh` [U]; SURVEY.md C9).  The TPU has
no fast fp64 and no complex128 at all, so (SURVEY.md §8.3 hard part #1):

- dot products / norms accumulate in *emulated* f64 over split re/im f32
  parts (XLA lowers f64 on TPU; reductions are cheap relative to Dslash);
- complex scalars are returned as an (re, im) pair of f64 0-d arrays to
  avoid complex128 tensors anywhere near the device;
- results are combined across devices with psum by the shard_map wrappers
  in tpuqcd.parallel (single-chip here).

Requires jax_enable_x64 (enabled at tpuqcd import).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _f64(x: jax.Array) -> jax.Array:
    return x.astype(jnp.float64)


def norm2(x: jax.Array) -> jax.Array:
    """sum |x|^2 as f64 scalar (x complex64 or real)."""
    if jnp.iscomplexobj(x):
        return jnp.sum(_f64(jnp.real(x)) ** 2) + jnp.sum(_f64(jnp.imag(x)) ** 2)
    return jnp.sum(_f64(x) ** 2)


def redot(x: jax.Array, y: jax.Array) -> jax.Array:
    """Re <x, y> = Re sum conj(x) y as f64 scalar."""
    if jnp.iscomplexobj(x):
        return (jnp.sum(_f64(jnp.real(x)) * _f64(jnp.real(y))) +
                jnp.sum(_f64(jnp.imag(x)) * _f64(jnp.imag(y))))
    return jnp.sum(_f64(x) * _f64(y))


def cdot(x: jax.Array, y: jax.Array) -> tuple[jax.Array, jax.Array]:
    """<x, y> = sum conj(x) y as (re, im) f64 pair."""
    xr, xi = _f64(jnp.real(x)), _f64(jnp.imag(x))
    yr, yi = _f64(jnp.real(y)), _f64(jnp.imag(y))
    re = jnp.sum(xr * yr) + jnp.sum(xi * yi)
    im = jnp.sum(xr * yi) - jnp.sum(xi * yr)
    return re, im


def cscale(alpha_re: jax.Array, alpha_im: jax.Array, x: jax.Array) -> jax.Array:
    """(alpha_re + i alpha_im) * x with f64 scalars applied to a c64 field."""
    a = (alpha_re.astype(jnp.float32) + 1j * alpha_im.astype(jnp.float32))
    return a.astype(x.dtype) * x
