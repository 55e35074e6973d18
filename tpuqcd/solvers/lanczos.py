"""Lanczos eigensolver (low modes) with Chebyshev filtering.

TPU-native replacement of the reference's (P)ARPACK deflation eigensolver
([U] QKXTM_Deflation::eigenSolver, reverse-communication IRAM around
Dslash applies; SURVEY.md C27, §4.5): a plain Lanczos with full
reorthogonalization on a Chebyshev-filtered operator — the standard
ARPACK-free recipe for lattice low-mode deflation, and a much better fit
for jit (fixed iteration structure, no reverse communication).

For a Hermitian PD operator A with spectrum in [0, lmax], the filter
p(A) = T_d( (2A - (a+b)) / (b-a) ) with [a, b] = [cut, lmax] maps the
low modes of A to the *dominant* modes of p(A), which Lanczos finds in
O(10) iterations; eigenvalues of A are recovered by Rayleigh quotients.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.cplx import cvdot


def chebyshev_filter(apply_a: Callable, lo: float, hi: float,
                     degree: int) -> Callable:
    """p(A) with T_degree mapped so [lo, hi] -> [-1, 1] (suppressed) and
    modes below `lo` amplified."""
    c = 0.5 * (hi + lo)
    e = 0.5 * (hi - lo)

    def apply_p(v):
        tkm1 = v
        tk = (apply_a(v) - c * v) / e
        for _ in range(degree - 1):
            tkp1 = 2.0 * (apply_a(tk) - c * tk) / e - tkm1
            tkm1, tk = tk, tkp1
        return tk

    return apply_p


def lanczos_lowest(apply_a: Callable, v0: jax.Array, n_ev: int, *,
                   n_iter: int = 60, filter_degree: int = 0,
                   filter_window: tuple[float, float] | None = None):
    """Lowest n_ev eigenpairs of Hermitian A.

    apply_a acts on complex fields shaped like v0.  With
    filter_degree > 0 and filter_window = (cut, lmax), Lanczos runs on
    the Chebyshev-filtered operator and Ritz pairs are re-evaluated on A
    (Rayleigh quotients) — far fewer iterations for interior-clustered
    low modes.  Full reorthogonalization (numerically robust; n_iter is
    small for deflation workloads).

    Returns (evals [n_ev] f64 ascending, evecs list of n_ev fields).
    """
    op = apply_a
    if filter_degree > 0:
        assert filter_window is not None
        op = chebyshev_filter(apply_a, *filter_window, filter_degree)

    def dot(a, b):
        return complex(cvdot(a, b))

    def nrm(a):
        return float(jnp.sqrt(cvdot(a, a).real))

    vs = []
    alpha = []
    beta = []
    v = v0 / nrm(v0)
    vprev = None
    for j in range(n_iter):
        vs.append(v)
        w = op(v)
        a = dot(v, w).real
        alpha.append(a)
        w = w - a * v
        if vprev is not None:
            w = w - beta[-1] * vprev
        # full reorthogonalization
        for u in vs:
            w = w - dot(u, w) * u
        b = nrm(w)
        if b < 1e-12:
            break
        beta.append(b)
        vprev = v
        v = w / b

    k = len(alpha)
    tmat = np.diag(np.asarray(alpha)) + \
        np.diag(np.asarray(beta[:k - 1]), 1) + \
        np.diag(np.asarray(beta[:k - 1]), -1)
    w_t, s_t = np.linalg.eigh(tmat)

    # Ritz vectors; rank by Rayleigh quotient on the *unfiltered* A
    ritz = []
    for i in range(k):
        x = None
        for j in range(k):
            t = s_t[j, i] * vs[j]
            x = t if x is None else x + t
        x = x / nrm(x)
        lam = dot(x, apply_a(x)).real
        ritz.append((lam, x))
    ritz.sort(key=lambda p: p[0])
    evals = np.asarray([r[0] for r in ritz[:n_ev]])
    evecs = [r[1] for r in ritz[:n_ev]]
    return evals, evecs


def lanczos_lowest_pk(apply_a: Callable, v0_pk: jax.Array, n_ev: int, *,
                      n_iter: int = 60, filter_degree: int = 0,
                      filter_window: tuple[float, float] | None = None,
                      reorth_passes: int = 2):
    """Packed-real Lanczos: lowest n_ev eigenpairs of Hermitian PD A on
    TPU-resident packed fields (the deflation workhorse of the loops
    program; reference QKXTM_Deflation::eigenSolver around even-odd
    Dslash applies [U], SURVEY.md C27, §4.5).

    apply_a acts on a packed field ``v[0]=Re, v[1]=Im`` of v0_pk's shape
    (any trailing layout — full-operator [2ri, 2par, 4, 3, T, Z, S] or
    eo [2ri, 4, 3, T, Z, S]).  Unlike the complex-layout
    ``lanczos_lowest`` this never materializes complex arrays, so it
    runs on the axon TPU backend, and the full reorthogonalization is
    TWO dense [k, N] matmuls per iteration (MXU work) instead of k
    device round-trips.

    The Krylov basis is re-orthonormalized to f32 machine precision, so
    downstream EXACT deflation corrections (which only need an
    orthonormal projector + exact solves, not exact eigenpairs) stay
    unbiased even though single precision limits the eigen-residuals.

    Returns (evals [n_ev] f64 ascending Rayleigh quotients,
    evecs_pk [n_ev, *v0_pk.shape] f32).
    """
    op = apply_a
    if filter_degree > 0:
        assert filter_window is not None
        c = 0.5 * (filter_window[1] + filter_window[0])
        e = 0.5 * (filter_window[1] - filter_window[0])

        def op(v):
            # rolled Chebyshev recurrence: ONE apply_a instance in the
            # trace regardless of degree (an unrolled degree-24 filter
            # took ~6 min to compile on CPU; this compiles in seconds)
            t0 = v
            t1 = (apply_a(v) - c * v) / e

            def body(_, carry):
                tkm1, tk = carry
                return (tk, 2.0 * (apply_a(tk) - c * tk) / e - tkm1)

            _, tk = jax.lax.fori_loop(0, filter_degree - 1, body,
                                      (t0, t1))
            return tk

    shape = v0_pk.shape
    n_flat = v0_pk.size // 2

    def flat(v):
        return v.reshape(2, n_flat)

    @jax.jit
    def _step(V, v):
        """One Lanczos step with full reorthogonalization against the
        (zero-padded) stacked basis V [m, 2, N]: the two matmuls
        C = V conj . w  and  w -= C^T V."""
        w = flat(op(v.reshape(shape)))
        vr, vi = v[0], v[1]
        a = jnp.sum(vr * w[0] + vi * w[1])        # Re<v, Av>, A Hermitian
        w = w - a * v
        for _ in range(reorth_passes):
            # complex coeffs c_j = <V_j, w> over the whole basis at once
            cr = V[:, 0] @ w[0] + V[:, 1] @ w[1]          # [m]
            ci = V[:, 0] @ w[1] - V[:, 1] @ w[0]
            w = w - jnp.stack([cr @ V[:, 0] - ci @ V[:, 1],
                               cr @ V[:, 1] + ci @ V[:, 0]])
        b = jnp.sqrt(jnp.sum(jnp.square(w)))
        return a, b, w / jnp.maximum(b, 1e-30)

    v = flat(v0_pk.astype(jnp.float32))
    v = v / jnp.sqrt(jnp.sum(jnp.square(v)))
    V = jnp.zeros((n_iter, 2, n_flat), jnp.float32)
    alpha, beta = [], []
    k = 0
    for j in range(n_iter):
        V = V.at[j].set(v)
        k = j + 1
        a, b, v = _step(V, v)
        alpha.append(float(a))
        if float(b) < 1e-7:
            break
        beta.append(float(b))

    tmat = np.diag(np.asarray(alpha[:k])) + \
        np.diag(np.asarray(beta[:k - 1]), 1) + \
        np.diag(np.asarray(beta[:k - 1]), -1)
    w_t, s_t = np.linalg.eigh(tmat)

    # Ritz vectors for the n_ev lowest (w.r.t. the filtered op they are
    # ranked by Rayleigh quotient on the UNfiltered A below)
    n_take = min(k, 2 * n_ev)
    order = (np.argsort(w_t)[::-1] if filter_degree > 0
             else np.argsort(w_t))
    sel = np.asarray(s_t[:, order[:n_take]], np.float32)   # [k, n_take]

    @jax.jit
    def _ritz(V, s):
        X = jnp.einsum("kc,kin->cin", s, V[:k])            # [n_take, 2, N]
        nrm = jnp.sqrt(jnp.sum(jnp.square(X), axis=(1, 2), keepdims=True))
        return X / jnp.maximum(nrm, 1e-30)

    X = _ritz(V, jnp.asarray(sel))

    @jax.jit
    def _rayleigh(x):
        ax = flat(apply_a(x.reshape(shape)))
        return jnp.sum(x[0] * ax[0] + x[1] * ax[1])

    pairs = sorted(((float(_rayleigh(X[i])), i) for i in range(n_take)),
                   key=lambda p: p[0])
    idx = [i for _, i in pairs[:n_ev]]
    evals = np.asarray([lam for lam, _ in pairs[:n_ev]], np.float64)
    evecs = jnp.stack([X[i].reshape(shape) for i in idx])
    # final orthonormalization of the RETURNED set (Gram-Schmidt via QR
    # on the [n_ev, 2N] real-imag-interleaved matrix would mix re/im;
    # do complex Gram-Schmidt with the packed dots)
    evecs = _orthonormalize_pk(evecs)
    return evals, evecs


@jax.jit
def _orthonormalize_pk(vs: jax.Array) -> jax.Array:
    """Complex modified Gram-Schmidt on a stack of packed fields
    [n, 2(ri), ...] (f32): returns an orthonormal stack (deflation
    projectors need V^dag V = I to machine precision)."""
    n = vs.shape[0]
    flatv = vs.reshape(n, 2, -1)

    def body(i, F):
        v = F[i]

        def inner(j, v):
            u = F[j]
            cr = jnp.sum(u[0] * v[0] + u[1] * v[1])
            ci = jnp.sum(u[0] * v[1] - u[1] * v[0])
            return v - jnp.stack([cr * u[0] - ci * u[1],
                                  cr * u[1] + ci * u[0]])

        v = jax.lax.fori_loop(0, i, inner, v)
        v = jax.lax.fori_loop(0, i, inner, v)    # second pass (stability)
        v = v / jnp.maximum(jnp.sqrt(jnp.sum(jnp.square(v))), 1e-30)
        return F.at[i].set(v)

    out = jax.lax.fori_loop(0, n, body, flatv)
    return out.reshape(vs.shape)


def deflated_initial_guess(evals, evecs, b):
    """x0 = sum_i v_i <v_i, b> / lambda_i (exact on the deflated space)."""
    x0 = jnp.zeros_like(b)
    for lam, v in zip(np.asarray(evals), evecs):
        x0 = x0 + (cvdot(v, b) / lam) * v
    return x0
