"""Incremental eigCG: deflated CG for propagator RHS sequences.

TPU-native equivalent of the reference's eigCG path ([U] QUDA
`inv_eig_cg.cpp`, `QUDA_INC_EIGCG_INVERTER`; SURVEY.md C11/C27 —
Stathopoulos & Orginos, arXiv:0707.0131): while CG solves A x = b for a
Hermitian PD A (here the even-odd normal operator M^dag M), the CG
coefficients already generate a Lanczos tridiagonal T for free; eigCG
harvests approximate low eigenpairs from a windowed subspace of
normalized residuals and re-uses them to DEFLATE the next right-hand
side (init-CG: x0 = U diag(1/lambda) U^dag b).  Over a 12-RHS
propagator solve the iteration count drops steadily — the same
amortization story as the reference's incremental eigCG.

Restart scheme: the Stathopoulos-Orginos two-basis restart — when the
window V fills (m vectors), the nev lowest Ritz vectors of BOTH T_m and
T_{m-1} are combined, orthonormalized, and compressed into a 2*nev
window head with the dense projected block Q^T T_m Q; plain thick
restart (T_m alone) stagnates because CG residuals turn orthogonal to
converged Ritz directions — the second basis is what keeps the Ritz
pairs improving (arXiv:0707.0131 §3).

Device discipline: fields stay packed/complex on the accelerator; only
the O(m^2) T matrix and Ritz coefficients live on the host (numpy eigh
on an m x m matrix, m ~ 16-32).
"""
from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import pkalg as pk
from ..utils.cplx import cvdot

# Fields are either complex arrays or packed-real pairs [2(ri), ...]
# (the TPU production representation — full-layout complex cannot live
# on the axon backend).  CG's alpha/beta and all Ritz coefficients are
# REAL, so the field updates below work verbatim on both; only the
# dots and the (complex-coefficient) deflation axpys branch.


def _is_packed(a) -> bool:
    return not jnp.iscomplexobj(a)


def _dot(a, b):
    if _is_packed(a):
        re, im = pk.cdot(a, b, dtype=jnp.float64)
        return complex(float(re), float(im))
    return complex(cvdot(a, b))


def _nrm2(a) -> float:
    if _is_packed(a):
        return float(pk.norm2(a, dtype=jnp.float64))
    return float(cvdot(a, a).real)


def _caxpy(alpha: complex, x, y):
    """y + alpha x for complex alpha on either representation."""
    if _is_packed(x):
        return pk.caxpy(alpha.real, alpha.imag, x, y)
    return y + alpha * x


@dataclasses.dataclass
class EigCGSpace:
    """Accumulated deflation space (grows across right-hand sides)."""
    evecs: list
    evals: list

    @staticmethod
    def empty() -> "EigCGSpace":
        return EigCGSpace(evecs=[], evals=[])

    @property
    def k(self) -> int:
        return len(self.evecs)

    def deflate(self, b: jax.Array) -> jax.Array:
        """x0 = U diag(1/lambda) U^dag b (exact on the captured space)."""
        x0 = jnp.zeros_like(b)
        for lam, v in zip(self.evals, self.evecs):
            x0 = _caxpy(_dot(v, b) / lam, v, x0)
        return x0

    def absorb(self, apply_a: Callable, ritz_pairs, max_k: int = 256):
        """Orthogonalize new Ritz vectors against U and append (with
        their Rayleigh quotients on A)."""
        for _, v in ritz_pairs:
            if self.k >= max_k:
                break
            w = v
            for u in self.evecs:
                w = _caxpy(-_dot(u, w), u, w)
            nw = _nrm2(w) ** 0.5
            if nw < 1e-4:        # already captured
                continue
            w = w / nw
            lam = _dot(w, apply_a(w)).real
            if lam <= 0:
                continue
            self.evecs.append(w)
            self.evals.append(lam)


@dataclasses.dataclass
class EigCGResult:
    x: jax.Array
    relres: float
    iters: int
    converged: bool
    ritz: list            # [(lambda, vec)] harvested this solve


def eigcg(apply_a: Callable, b: jax.Array, *, nev: int = 4, m: int = 16,
          tol: float = 1e-8, maxiter: int = 1000,
          space: EigCGSpace | None = None,
          x0: jax.Array | None = None) -> EigCGResult:
    """One eigCG solve of A x = b; harvests ~nev low Ritz pairs.

    ``space`` (if given) supplies the deflated initial guess; pass the
    harvest back through space.absorb for the incremental scheme (or use
    :func:`solve_sequence`).
    """
    assert m > 2 * nev, (m, nev)
    if x0 is None and space is not None and space.k > 0:
        x0 = space.deflate(b)
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - apply_a(x) if x0 is not None else b
    bsq = _nrm2(b)
    tol2 = tol * tol * bsq

    p = r
    rsq = _nrm2(r)
    # Lanczos window: normalized residuals v_j = r_j / |r_j| satisfy the
    # three-term recurrence with T entries built from CG's alpha/beta
    V: list = []
    Tm = np.zeros((m, m))
    j = 0                 # window fill
    alpha_prev = None
    beta_prev = 0.0
    ritz_pairs: list = []

    def window_rr():
        """Ritz pairs of the current window (lowest first)."""
        k = j
        w_t, s_t = np.linalg.eigh(Tm[:k, :k])
        return w_t, s_t

    def compress_so():
        """Stathopoulos-Orginos restart: combine the nev lowest Ritz
        coefficient vectors of T_m AND T_{m-1}, orthonormalize, project
        T_m into the combined basis, and rotate to its eigenbasis."""
        nonlocal V, Tm, j
        _, s_m = np.linalg.eigh(Tm[:m, :m])
        _, s_m1 = np.linalg.eigh(Tm[:m - 1, :m - 1])
        y2 = np.zeros((m, nev))
        y2[:m - 1] = s_m1[:, :nev]
        q, _ = np.linalg.qr(np.concatenate([s_m[:, :nev], y2], axis=1))
        h = q.T @ Tm[:m, :m] @ q                  # 2nev x 2nev
        w_h, s_h = np.linalg.eigh(h)
        coef = q @ s_h                            # m x 2nev
        keep = coef.shape[1]
        newV = []
        for i in range(keep):
            y = None
            for l in range(m):
                t = float(coef[l, i]) * V[l]
                y = t if y is None else y + t
            newV.append(y / (_nrm2(y) ** 0.5))
        Tm = np.zeros((m, m))
        Tm[:keep, :keep] = np.diag(w_h)
        V = newV
        j = keep

    it = 0
    while it < maxiter and rsq > tol2:
        v = r / (rsq ** 0.5)
        if j == m:        # window full -> two-basis restart
            compress_so()
            # restarted T couples to the incoming vector through the
            # projected residual row; recompute it exactly via explicit
            # dots against ONE extra apply (once per restart, i.e. every
            # m - nev iterations — the restart breaks the pure recurrence)
            av = apply_a(v)
            for i in range(j):
                Tm[i, j] = Tm[j, i] = _dot(V[i], av).real
        V.append(v)
        ap = apply_a(p)
        pap = _dot(p, ap).real
        alpha = rsq / pap
        # T entries from the CG recurrence (Saad: Lanczos-CG relation)
        diag = 1.0 / alpha + (beta_prev / alpha_prev
                              if alpha_prev is not None else 0.0)
        Tm[j, j] = diag
        x = x + alpha * p
        r_new = r - alpha * ap
        rsq_new = _nrm2(r_new)
        beta = rsq_new / rsq
        if j + 1 < m:
            Tm[j, j + 1] = Tm[j + 1, j] = -np.sqrt(beta) / alpha
        alpha_prev, beta_prev = alpha, beta
        r, rsq = r_new, rsq_new
        p = r + beta * p
        j += 1
        it += 1

    # final harvest: Ritz pairs of the last window
    if j > nev:
        w_t, s_t = window_rr()
        for i in range(min(nev, j)):
            y = None
            for l in range(j):
                t = float(s_t[l, i]) * V[l]
                y = t if y is None else y + t
            y = y / (_nrm2(y) ** 0.5)
            ritz_pairs.append((float(w_t[i]), y))

    relres = (rsq / max(bsq, 1e-300)) ** 0.5
    return EigCGResult(x=x, relres=relres, iters=it,
                       converged=rsq <= tol2, ritz=ritz_pairs)


def solve_sequence(apply_a: Callable, bs, *, nev: int = 4, m: int = 16,
                   tol: float = 1e-8, maxiter: int = 1000,
                   max_space: int = 64):
    """Incremental eigCG over a sequence of right-hand sides (the
    propagator use case): each solve deflates with everything harvested
    so far and contributes ~nev new approximate eigenpairs.

    Returns (results list, final EigCGSpace).
    """
    space = EigCGSpace.empty()
    results = []
    for b in bs:
        res = eigcg(apply_a, b, nev=nev, m=m, tol=tol, maxiter=maxiter,
                    space=space)
        space.absorb(apply_a, res.ritz, max_k=max_space)
        results.append(res)
    return results, space
