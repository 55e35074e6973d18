"""Flexible GCR (right-preconditioned) and the MR smoother.

TPU-native equivalents of the reference's MG outer solver and smoother
(`lib/inv_gcr_quda.cpp`, `inv_mr_quda.cpp` [U]; SURVEY.md C11): GCR
tolerates a *changing* preconditioner (the MG V-cycle with its own inner
iterations), MR is the cheap stationary smoother inside the V-cycle.

Generic over complex field pytrees (any shape); scalars in f64 via the
complex-pair trick (no complex128 on TPU).
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from .reductions import norm2


def _cdot(x, y):
    """<x, y> as (re, im) f64 for complex fields of any shape."""
    xr = jnp.real(x).astype(jnp.float64)
    xi = jnp.imag(x).astype(jnp.float64)
    yr = jnp.real(y).astype(jnp.float64)
    yi = jnp.imag(y).astype(jnp.float64)
    return (jnp.sum(xr * yr) + jnp.sum(xi * yi),
            jnp.sum(xr * yi) - jnp.sum(xi * yr))


def _caxpy(ar, ai, x, y):
    a = (ar.astype(jnp.float32) + 1j * ai.astype(jnp.float32)).astype(x.dtype)
    return y + a * x


def mr_smoother(matvec: Callable, b: jax.Array, x0: jax.Array | None = None,
                iters: int = 4, omega: float = 0.85) -> jax.Array:
    """Minimal-residual relaxation: x += omega <Ar, r>/|Ar|^2 r."""
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - matvec(x) if x0 is not None else b

    def body(_, st):
        x, r = st
        ar = matvec(r)
        nr, ni = _cdot(ar, r)
        den = jnp.maximum(norm2(ar), 1e-60)
        al_r = omega * nr / den
        al_i = omega * ni / den
        x = _caxpy(al_r, al_i, r, x)
        r = _caxpy(-al_r, -al_i, ar, r)
        return (x, r)

    x, _ = jax.lax.fori_loop(0, iters, body, (x, r))
    return x


class GCRResult(NamedTuple):
    x: jax.Array
    relres: jax.Array
    iters: jax.Array
    converged: jax.Array


def gcr(matvec: Callable, b: jax.Array, *, precond: Callable | None = None,
        tol: float = 1e-8, maxiter: int = 200, restart: int = 16,
        x0: jax.Array | None = None) -> GCRResult:
    """Right-preconditioned flexible GCR(restart).

    Python-level restart loop (restart counts are small); the inner
    orthogonalization runs unrolled over the restart window, keeping the
    per-window bases as stacked arrays.
    """
    if precond is None:
        def precond(r):
            return r
    x = jnp.zeros_like(b) if x0 is None else x0
    bsq = float(norm2(b))
    tol2 = (tol * tol) * bsq

    r = b - matvec(x)
    total = 0
    converged = False
    while total < maxiter and not converged:
        # one restart cycle (unrolled, Python loop — sizes are static)
        zs, vs = [], []
        for j in range(restart):
            z = precond(r)
            v = matvec(z)
            # orthogonalize v against previous vs (modified Gram-Schmidt)
            for zk, vk in zip(zs, vs):
                br, bi = _cdot(vk, v)
                z = _caxpy(-br, -bi, zk, z)
                v = _caxpy(-br, -bi, vk, v)
            nv = jnp.sqrt(norm2(v))
            inv = (1.0 / jnp.maximum(nv, 1e-60))
            z = inv.astype(jnp.float32) * z
            v = inv.astype(jnp.float32) * v
            ar, ai = _cdot(v, r)
            x = _caxpy(ar, ai, z, x)
            r = _caxpy(-ar, -ai, v, r)
            zs.append(z)
            vs.append(v)
            total += 1
            if float(norm2(r)) <= tol2:
                converged = True
                break
        # recompute true residual at restart
        r = b - matvec(x)
        if float(norm2(r)) <= tol2:
            converged = True
    rsq = norm2(r)
    return GCRResult(x=x, relres=jnp.sqrt(rsq / max(bsq, 1e-300)),
                     iters=jnp.int32(total), converged=jnp.bool_(converged))
