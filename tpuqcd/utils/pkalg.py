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

import jax
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

    Returns L in the same layout (strictly lower + real diagonal).
    n <= 8 uses the fully unrolled form (smallest runtime); larger n
    takes the masked fori_loop form whose traced graph is O(1) in n —
    the unrolled O(n^3) graph made MG-setup compiles superlinear in the
    coarse-space size (measured: n=32 Linv+probing RAP 656 s vs ~25 s
    at n=16 on the remote-compile TPU backend).
    """
    if n > 8:
        return _cholesky_pk_loop(g, n, eps)
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


def _cholesky_pk_loop(g, n: int, eps: float):
    """Right-looking (rank-1 update) Cholesky as a lax.fori_loop over
    columns with one-hot masks — O(1) traced graph, n trips."""
    dt = g.dtype
    idx = jnp.arange(n)
    extra = g.ndim - 3                     # number of site axes

    def ex(mask):                          # [n] -> [n, 1, ..., 1]
        return mask.astype(dt).reshape((n,) + (1,) * extra)

    def body(k, st):
        A, L = st                          # [2, n, n, *sites] each
        ek = idx == k
        col = (A * ex(ek)[None, None]).sum(axis=2)      # [2, n, *S]
        akk = (col[0] * ex(ek)).sum(axis=0)             # [*S]
        dkk = jnp.sqrt(jnp.maximum(akk, eps))
        lr = jnp.where(ex(idx >= k) > 0, col[0], 0.0) / dkk
        li = jnp.where(ex(idx > k) > 0, col[1], 0.0) / dkk
        # trailing-block rank-1 update A -= lcol conj(lcol)^T (i,j > k)
        m = ex(idx > k)
        o_r = (lr[:, None] * lr[None, :] + li[:, None] * li[None, :])
        o_i = (li[:, None] * lr[None, :] - lr[:, None] * li[None, :])
        upd = jnp.stack([o_r, o_i]) * (m[:, None] * m[None, :])[None]
        A = A - upd
        L = L + jnp.stack([lr, li])[:, :, None] * ex(ek)[None, None]
        return (A, L)

    _, L = jax.lax.fori_loop(0, n, body, (g, jnp.zeros_like(g)))
    return L


def tril_inverse_pk(L, n: int):
    """Inverse of a lower-triangular complex ``L`` [2, n, n, *sites]
    (forward substitution; unrolled for n <= 8, masked fori_loop with
    an O(1) traced graph above — see cholesky_pk)."""
    if n > 8:
        return _tril_inverse_pk_loop(L, n)
    return _tril_inverse_pk_unrolled(L, n)


def _tril_inverse_pk_loop(L, n: int):
    dt = L.dtype
    idx = jnp.arange(n)
    extra = L.ndim - 3

    def ex(mask):
        return mask.astype(dt).reshape((n,) + (1,) * extra)

    def body(i, M):
        ei = idx == i
        row = (L * ex(ei)[None, :, None]).sum(axis=1)   # [2, n(k), *S]
        lii = (row[0] * ex(ei)).sum(axis=0)             # [*S]
        below = ex(idx < i)
        br = row[0] * below
        bi = row[1] * below
        # s[j] = sum_k L[i,k] M[k,j]   (k < i)
        s_r = (br[:, None] * M[0] - bi[:, None] * M[1]).sum(axis=0)
        s_i = (br[:, None] * M[1] + bi[:, None] * M[0]).sum(axis=0)
        r_r = (ex(ei) - s_r) / lii                      # [n(cols), *S]
        r_i = -s_i / lii
        return M + jnp.stack([r_r, r_i])[:, None] * ex(ei)[None, :, None]

    return jax.lax.fori_loop(0, n, body, jnp.zeros_like(L))


def _tril_inverse_pk_unrolled(L, n: int):
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
