"""Generic packed-complex algebra for device-resident solvers.

All MG/solver device fields use a *leading* re/im axis: ``x[0] = Re,
x[1] = Im`` with arbitrary trailing shape (fine spinors
[2, 2(par), 4, 3, T, Z, S], coarse fields [2, N, Tc, Zc, Sc], ...).
This module provides the complex linear algebra on that representation —
the TPU-native replacement for the reference's complex blas/reduce layer
(`lib/blas_quda.cu`, `reduce_quda.cu` [U]; SURVEY.md C8/C9) on a backend
with no complex dot support.

Scalars are (re, im) pairs of f32 traced values.  A tiny unrolled
batched complex Cholesky (n <= ~16, sites on trailing axes) supports the
on-device block orthonormalization of the MG setup (SURVEY.md C12b)
without complex jnp.linalg (unavailable on the axon TPU backend).
"""
from __future__ import annotations

import jax.numpy as jnp


def cdot(x, y, dtype=jnp.float32):
    """<x, y> = sum conj(x) y -> (re, im) scalars (ri axis 0)."""
    xr, xi = x[0].astype(dtype), x[1].astype(dtype)
    yr, yi = y[0].astype(dtype), y[1].astype(dtype)
    return (jnp.sum(xr * yr) + jnp.sum(xi * yi),
            jnp.sum(xr * yi) - jnp.sum(xi * yr))


def norm2(x, dtype=jnp.float32):
    return jnp.sum(jnp.square(x.astype(dtype)))


def caxpy(ar, ai, x, y):
    """y + (ar + i ai) x on ri-leading packed arrays; scalars traced f32."""
    ar = jnp.asarray(ar, x.dtype)
    ai = jnp.asarray(ai, x.dtype)
    return jnp.stack([y[0] + ar * x[0] - ai * x[1],
                      y[1] + ar * x[1] + ai * x[0]])


def cscale(ar, ai, x):
    ar = jnp.asarray(ar, x.dtype)
    ai = jnp.asarray(ai, x.dtype)
    return jnp.stack([ar * x[0] - ai * x[1], ar * x[1] + ai * x[0]])


# --- traced complex scalar helpers (pairs of f32) --------------------------

def smul(a, b):
    ar, ai = a
    br, bi = b
    return (ar * br - ai * bi, ar * bi + ai * br)


def sdiv(a, b, eps=1e-30):
    ar, ai = a
    br, bi = b
    den = jnp.maximum(br * br + bi * bi, eps)
    return ((ar * br + ai * bi) / den, (ai * br - ar * bi) / den)


def sconj(a):
    return (a[0], -a[1])


# --- small batched complex Cholesky (unrolled, site axes trailing) ---------

def cholesky_pk(g, n: int, eps: float = 1e-12):
    """Cholesky L L^dag = G of Hermitian PD ``g`` [2(ri), n, n, *sites].

    Unrolled over the (static, small) n; pure vector ops over the site
    axes.  Returns L in the same layout (strictly lower + real diagonal).
    """
    gr, gi = g[0], g[1]
    L_r = [[None] * n for _ in range(n)]
    L_i = [[None] * n for _ in range(n)]
    for k in range(n):
        s = gr[k, k]
        for j in range(k):
            s = s - (L_r[k][j] ** 2 + L_i[k][j] ** 2)
        dkk = jnp.sqrt(jnp.maximum(s, eps))
        L_r[k][k] = dkk
        L_i[k][k] = jnp.zeros_like(dkk)
        inv = 1.0 / dkk
        for i in range(k + 1, n):
            sr, si = gr[i, k], gi[i, k]
            for j in range(k):
                # G[i,k] - L[i,j] conj(L[k,j])
                sr = sr - (L_r[i][j] * L_r[k][j] + L_i[i][j] * L_i[k][j])
                si = si - (L_i[i][j] * L_r[k][j] - L_r[i][j] * L_i[k][j])
            L_r[i][k] = sr * inv
            L_i[i][k] = si * inv
        for i in range(k):        # zero the upper triangle of column k
            L_r[i][k] = jnp.zeros_like(dkk)
            L_i[i][k] = jnp.zeros_like(dkk)
    Lr = jnp.stack([jnp.stack(row) for row in L_r])
    Li = jnp.stack([jnp.stack(row) for row in L_i])
    return jnp.stack([Lr, Li])


def tril_inverse_pk(L, n: int):
    """Inverse of a lower-triangular complex ``L`` [2, n, n, *sites]
    (unrolled forward substitution per column)."""
    Lr, Li = L[0], L[1]
    M_r = [[None] * n for _ in range(n)]
    M_i = [[None] * n for _ in range(n)]
    for j in range(n):
        for i in range(n):
            if i < j:
                M_r[i][j] = jnp.zeros_like(Lr[0, 0])
                M_i[i][j] = jnp.zeros_like(Lr[0, 0])
                continue
            if i == j:
                M_r[i][j] = 1.0 / Lr[i, i]
                M_i[i][j] = jnp.zeros_like(Lr[i, i])
                continue
            # M[i,j] = -(1/L[i,i]) sum_{k=j..i-1} L[i,k] M[k,j]
            sr = None
            si = None
            for k in range(j, i):
                tr = Lr[i, k] * M_r[k][j] - Li[i, k] * M_i[k][j]
                ti = Lr[i, k] * M_i[k][j] + Li[i, k] * M_r[k][j]
                sr = tr if sr is None else sr + tr
                si = ti if si is None else si + ti
            inv = 1.0 / Lr[i, i]
            M_r[i][j] = -sr * inv
            M_i[i][j] = -si * inv
    Mr = jnp.stack([jnp.stack(row) for row in M_r])
    Mi = jnp.stack([jnp.stack(row) for row in M_i])
    return jnp.stack([Mr, Mi])
