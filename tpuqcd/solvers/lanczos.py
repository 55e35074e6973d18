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


def deflated_initial_guess(evals, evecs, b):
    """x0 = sum_i v_i <v_i, b> / lambda_i (exact on the deflated space)."""
    x0 = jnp.zeros_like(b)
    for lam, v in zip(np.asarray(evals), evecs):
        x0 = x0 + (cvdot(v, b) / lam) * v
    return x0
