"""Krylov solvers on packed-real (ri-leading) fields — device-resident.

The TPU-resident counterparts of solvers/gcr.py + mg smoothing loops for
the axon backend, where complex fields may exist only as jit-internal
values: every routine here takes/returns packed arrays ``x[0]=Re,
x[1]=Im`` (utils/pkalg.py) and traces completely (lax loops / static
unrolls), so whole MG cycles run as single XLA programs on the chip.

Reference counterparts: `inv_mr_quda.cpp` (smoother), `inv_gcr_quda.cpp`
(flexible outer), `inv_bicgstab_quda.cpp` (null-vector setup smoothing)
[U]; SURVEY.md C11.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..utils import pkalg as pk


def mr_smoother_pk(matvec: Callable, b: jax.Array, iters: int = 4,
                   omega: float = 0.85) -> jax.Array:
    """Minimal-residual relaxation from x0 = 0 (traced fori_loop)."""

    def body(_, st):
        x, r = st
        ar = matvec(r)
        nr, ni = pk.cdot(ar, r)
        den = jnp.maximum(pk.norm2(ar), 1e-30)
        al_r, al_i = omega * nr / den, omega * ni / den
        return (pk.caxpy(al_r, al_i, r, x), pk.caxpy(-al_r, -al_i, ar, r))

    x, _ = jax.lax.fori_loop(0, iters, body, (jnp.zeros_like(b), b))
    return x


def cg_fixed_pk(matvec: Callable, b: jax.Array, iters: int) -> jax.Array:
    """Fixed-iteration CG from x0 = 0 on an SPD (normal) operator —
    MG null-vector setup by inverse iteration on M^dag M (the
    reference's CG-NE setup mode for twisted mass [U] multigrid.cpp;
    near kappa_c BiCGStab on the nearly singular non-Hermitian M
    stagnates erratically, while CG on the normal operator enriches
    monotonically toward the smallest singular vectors)."""

    def body(_, st):
        x, r, p, rsq = st
        ap = matvec(p)
        den = jnp.maximum(pk.cdot(p, ap)[0], 1e-30)
        al = rsq / den
        x = pk.caxpy(al, 0.0, p, x)
        r = pk.caxpy(-al, 0.0, ap, r)
        rsq_new = pk.norm2(r)
        beta = rsq_new / jnp.maximum(rsq, 1e-30)
        p = pk.caxpy(beta, 0.0, p, r)
        return (x, r, p, rsq_new)

    st = (jnp.zeros_like(b), b, b, pk.norm2(b))
    return jax.lax.fori_loop(0, iters, body, st)[0]


def _gcr_cycle(matvec: Callable, precond: Callable, x, r, m: int,
               basis_dtype=None):
    """One flexible-GCR restart cycle of m iterations, fully traced with
    lax loops and stacked (Z, V) direction buffers — the graph contains
    ONE matvec/precond instance regardless of m (essential when the
    preconditioner is a whole MG V-cycle).

    basis_dtype: storage dtype of the (Z, V) direction buffers —
    "bfloat16" halves the dominant solver workspace (2 * m fields; at
    32^3x64 restart 24 that is 19.3 GB in f32, over a v5e's HBM by
    itself).  Arithmetic stays f32 (mixed-dtype ops promote); the basis
    truncation only perturbs the *preconditioned search directions*,
    which flexible GCR + the outer defect correction absorb — the same
    argument as the bf16 smoother/coarse links (mg/dsolve)."""
    bdt = basis_dtype or x.dtype
    Z = jnp.zeros((m, *x.shape), bdt)
    V = jnp.zeros_like(Z)

    def body(i, st):
        x, r, Z, V = st
        z = precond(r)
        v = matvec(z)

        def ortho(j, zv):
            z, v = zv
            br, bi = pk.cdot(V[j].astype(v.dtype), v)
            return (pk.caxpy(-br, -bi, Z[j].astype(z.dtype), z),
                    pk.caxpy(-br, -bi, V[j].astype(v.dtype), v))

        z, v = jax.lax.fori_loop(0, i, ortho, (z, v))
        inv = 1.0 / jnp.sqrt(jnp.maximum(pk.norm2(v), 1e-30))
        z, v = inv * z, inv * v
        ar, ai = pk.cdot(v, r)
        x = pk.caxpy(ar, ai, z, x)
        r = pk.caxpy(-ar, -ai, v, r)
        return (x, r, Z.at[i].set(z.astype(bdt)),
                V.at[i].set(v.astype(bdt)))

    x, r, _, _ = jax.lax.fori_loop(0, m, body, (x, r, Z, V))
    return x, r


def gcr_fixed_pk(matvec: Callable, b: jax.Array, *, iters: int,
                 restart: int = 8,
                 precond: Callable | None = None) -> jax.Array:
    """Fixed-work flexible GCR (no convergence exit — coarsest-level MG
    solve; the V-cycle is a preconditioner, fixed work is fine and keeps
    the trace static)."""
    if precond is None:
        def precond(r):
            return r
    x = jnp.zeros_like(b)
    r = b
    done = 0
    while done < iters:
        m = min(restart, iters - done)
        x, r = _gcr_cycle(matvec, precond, x, r, m)
        done += m
        if done < iters:
            r = pk.caxpy(-1.0, 0.0, matvec(x), b)  # true residual
    return x


class GCRResultPk(NamedTuple):
    x: jax.Array
    relres: float
    iters: int
    converged: bool


def gcr_pk(matvec: Callable, b: jax.Array, *,
           precond: Callable | None = None, tol: float = 1e-8,
           maxiter: int = 200, restart: int = 8,
           x0: jax.Array | None = None, operand=None) -> GCRResultPk:
    """Right-preconditioned flexible GCR with per-cycle host sync.

    One jitted function runs a whole `restart` cycle (unrolled inner
    orthogonalization), so through the remote-TPU tunnel there is a
    single host round-trip per `restart` iterations.

    `operand`: optional pytree threaded explicitly through the jit
    boundary; when given, matvec/precond are called as fn(operand, x).
    Large state (gauge fields, MG hierarchies) MUST travel this way —
    arrays captured by closures are embedded as HLO constants, which the
    remote-compile service rejects for production sizes.
    """
    if precond is None:
        def precond(op, r):
            return r
    elif operand is None:
        _precond = precond

        def precond(op, r):
            return _precond(r)
    if operand is None:
        _matvec = matvec

        def matvec(op, x):
            return _matvec(x)

    @jax.jit
    def cycle(op, x, r):
        x, r = _gcr_cycle(lambda v: matvec(op, v),
                          lambda v: precond(op, v), x, r, restart)
        return x, r, pk.norm2(r)

    @jax.jit
    def true_residual(op, x, b):
        r = pk.caxpy(-1.0, 0.0, matvec(op, x), b)
        return r, pk.norm2(r)

    x = jnp.zeros_like(b) if x0 is None else x0
    bsq = float(pk.norm2(b))
    tol2 = tol * tol * bsq
    r, rsq = true_residual(operand, x, b)
    total = 0
    while total < maxiter and float(rsq) > tol2:
        x, _, _ = cycle(operand, x, r)
        r, rsq = true_residual(operand, x, b)  # truth once per cycle
        total += restart
    relres = (float(rsq) / max(bsq, 1e-300)) ** 0.5
    return GCRResultPk(x=x, relres=relres, iters=total,
                       converged=float(rsq) <= tol2)


def bicgstab_fixed_pk(matvec: Callable, b: jax.Array,
                      iters: int) -> jax.Array:
    """Fixed-iteration BiCGStab from x0=0 (MG null-vector setup smoothing;
    reference generateNullVectors recipe [U], SURVEY.md §4.3)."""
    x = jnp.zeros_like(b)
    r = b
    p = jnp.zeros_like(b)
    v = jnp.zeros_like(b)
    one = (jnp.float32(1.0), jnp.float32(0.0))

    def body(_, st):
        x, r, p, v, rho, alpha, omega = st
        rho_new = pk.cdot(b, r)          # rhat = b
        beta = pk.smul(pk.sdiv(rho_new, rho), pk.sdiv(alpha, omega))
        t1 = pk.caxpy(-omega[0], -omega[1], v, p)
        p = pk.caxpy(beta[0], beta[1], t1, r)
        v = matvec(p)
        alpha = pk.sdiv(rho_new, pk.cdot(b, v))
        s = pk.caxpy(-alpha[0], -alpha[1], v, r)
        t = matvec(s)
        om_den = jnp.maximum(pk.norm2(t), 1e-30)
        tsr, tsi = pk.cdot(t, s)
        omega = (tsr / om_den, tsi / om_den)
        x = pk.caxpy(alpha[0], alpha[1], p, x)
        x = pk.caxpy(omega[0], omega[1], s, x)
        r = pk.caxpy(-omega[0], -omega[1], t, s)
        return (x, r, p, v, rho_new, alpha, omega)

    st = (x, r, p, v, one, one, one)
    return jax.lax.fori_loop(0, iters, body, st)[0]
