"""Adaptive multigrid: null-vector setup, recursive levels, V-cycle.

The reference's MG class (`lib/multigrid.cpp` [U]; SURVEY.md C12, §4.3):

  setup (per level):
    1. near-null vectors: solve A x = v (random v) with a loose BiCGStab
       — the solution is dominated by the near-kernel (the reference's
       generateNullVectors recipe);
    2. chirality-split block orthogonalization -> Transfer (transfer.py);
    3. Galerkin coarse links by colored probing (coarse.py);
    4. recurse; the coarsest level gets the twisted-mass mu-boost
       (mu_factor, arXiv:1710.06198) for stability.

  solve: V-cycle used as a (flexible) preconditioner inside GCR
  (solvers/gcr.py): pre-smooth (MR) -> restrict residual -> recurse /
  coarsest GCR solve -> prolong + correct -> post-smooth (MR).
"""
from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from ..solvers.gcr import gcr, mr_smoother
from ..utils.cplx import cvdot
from .coarse import build_coarse
from .level import CoarseLevel
from .transfer import Transfer, setup_transfer


@dataclasses.dataclass
class MGParams:
    n_vec: tuple[int, ...] = (8, 8)           # per coarsening step
    block: tuple = ((4, 4, 4, 4), (2, 2, 2, 2))
    setup_iters: int = 60                     # BiCGStab iters per null vec
    smoother_iters: int = 4
    coarse_tol: float = 0.25
    coarse_maxiter: int = 32
    mu_factor: float = 6.0                    # coarsest-level mu boost
    seed: int = 7


@dataclasses.dataclass
class MGLevelState:
    level: object                  # FineTMLevel | CoarseLevel
    transfer: Transfer | None      # None on the coarsest level
    next: "MGLevelState | None"


def _random_field(key, dims, n, dtype=jnp.complex64):
    kr, ki = jax.random.split(key)
    return jax.lax.complex(
        jax.random.normal(kr, (*dims, n), dtype=jnp.float32),
        jax.random.normal(ki, (*dims, n), dtype=jnp.float32)).astype(dtype)


def _gen_null_vectors(level, n_vec, iters, key):
    """Loose inverse iterations: x ~ A^{-1} v for random v."""
    from ..solvers.gcr import mr_smoother  # noqa: F401

    vecs = []
    apply_flat = jax.jit(lambda v: level.apply(v))
    for k in range(n_vec):
        key, sub = jax.random.split(key)
        v = _random_field(sub, level.dims, level.n)
        x = _bicgstab_fixed(apply_flat, v, iters)
        # normalize
        x = x / jnp.sqrt(jnp.sum(jnp.abs(x) ** 2)).astype(x.dtype)
        vecs.append(x)
    return jnp.stack(vecs)


def _bicgstab_fixed(matvec, b, iters):
    """Fixed-iteration BiCGStab on complex fields (setup smoothing)."""
    x = jnp.zeros_like(b)
    r = b
    rhat = r
    rho = alpha = omega = jnp.complex64(1.0)
    p = jnp.zeros_like(b)
    v = jnp.zeros_like(b)

    def body(_, st):
        x, r, p, v, rho, alpha, omega = st
        rho_new = cvdot(rhat, r)
        beta = (rho_new / rho) * (alpha / omega)
        p = r + beta * (p - omega * v)
        v = matvec(p)
        alpha = rho_new / cvdot(rhat, v)
        s = r - alpha * v
        t = matvec(s)
        omega = cvdot(t, s) / jnp.maximum(
            cvdot(t, t).real, 1e-30).astype(jnp.complex64)
        x = x + alpha * p + omega * s
        r = s - omega * t
        return (x, r, p, v, rho_new, alpha, omega)

    st = (x, r, p, v, rho, alpha, omega)
    x = jax.lax.fori_loop(0, iters, body, st)[0]
    return x


class MG:
    """Multigrid preconditioner for a FineTMLevel (or any level object)."""

    def __init__(self, fine_level, params: MGParams):
        self.params = params
        self.root = self._setup(fine_level, 0, jax.random.PRNGKey(params.seed))

    def _setup(self, level, depth, key) -> MGLevelState:
        p = self.params
        if depth >= len(p.n_vec):
            # coarsest level: apply the twisted-mass mu boost
            if isinstance(level, CoarseLevel) and p.mu_factor != 1.0:
                mu = getattr(self, "_fine_mu", 0.0)
                kappa = getattr(self, "_fine_kappa", 0.0)
                delta = 2.0 * kappa * mu * (p.mu_factor - 1.0)
                level = level.boosted(delta)
            return MGLevelState(level=level, transfer=None, next=None)
        if depth == 0:
            self._fine_mu = getattr(level, "mu", 0.0)
            self._fine_kappa = getattr(level, "kappa", 0.0)
        key, sub = jax.random.split(key)
        nv = _gen_null_vectors(level, p.n_vec[depth], p.setup_iters, sub)
        tr = setup_transfer(nv, level.g5vec, p.block[depth])
        coarse = build_coarse(level, tr)
        nxt = self._setup(coarse, depth + 1, key)
        return MGLevelState(level=level, transfer=tr, next=nxt)

    # --- solve cycle ------------------------------------------------------
    def _vcycle(self, state: MGLevelState, b):
        p = self.params
        lv = state.level
        if state.transfer is None:
            res = gcr(lambda v: lv.apply(v), b, tol=p.coarse_tol,
                      maxiter=p.coarse_maxiter, restart=8)
            return res.x
        matvec = lambda v: lv.apply(v)  # noqa: E731
        x = mr_smoother(matvec, b, iters=p.smoother_iters)
        r = b - matvec(x)
        rc = state.transfer.restrict(r)
        xc = self._vcycle(state.next, rc)
        x = x + state.transfer.prolong(xc)
        # post-smooth on the residual equation
        r = b - matvec(x)
        dx = mr_smoother(matvec, r, iters=p.smoother_iters)
        return x + dx

    def precondition(self, r):
        """One V-cycle: approximate A^{-1} r (use inside flexible GCR)."""
        return self._vcycle(self.root, r)

    def solve(self, b, tol=1e-8, maxiter=200):
        """MG-preconditioned GCR on the fine system A x = b."""
        lv = self.root.level
        return gcr(lambda v: lv.apply(v), b, precond=self.precondition,
                   tol=tol, maxiter=maxiter)

    def solve_certified(self, b, apply_hp: Callable, *, tol=1e-10,
                        inner_tol=1e-5, max_refine=12):
        """Defect-correction outer loop around MG-GCR: true residuals from
        ``apply_hp`` (a high-precision fine-operator apply — complex128 on
        CPU, f64 packed on TPU), reaching tol below the fp32 floor
        (SURVEY.md §8.3 hard part #1; the contract's "MG solve to 1e-10").
        """
        import numpy as np  # noqa: F401
        from ..solvers.reductions import norm2
        b_hp = b.astype(jnp.complex128) if b.dtype == jnp.complex64 else b
        x = jnp.zeros_like(b_hp)
        bsq = float(norm2(b_hp))
        total = 0
        for _ in range(max_refine):
            r_hp = b_hp - apply_hp(x)
            rsq = float(norm2(r_hp))
            if rsq <= tol * tol * bsq:
                break
            res = self.solve(r_hp.astype(b.dtype), tol=inner_tol,
                             maxiter=200)
            total += int(res.iters)
            x = x + res.x.astype(x.dtype)
        r_hp = b_hp - apply_hp(x)
        rel = float(norm2(r_hp) / max(bsq, 1e-300)) ** 0.5
        return x, rel, total
