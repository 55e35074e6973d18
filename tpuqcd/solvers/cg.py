"""Conjugate gradient on the normal equations (CGNE/CGNR).

TPU-native replacement of the reference CG (`lib/inv_cg_quda.cpp` [U];
SURVEY.md C11): `lax.while_loop` Krylov iteration, f64 scalar bookkeeping
(reductions.py), and a *defect-correction restart* outer loop playing the
role of QUDA's reliable updates — the true residual b - A x is recomputed
from scratch every restart, so accumulated fp32 drift cannot fake
convergence, and restarting on the error equation pushes the true residual
to 1e-10 even though the fields are fp32 (iterative refinement; SURVEY.md
§8.3 hard part #1).

The operator is a pure function ``A(x) -> Ax`` over one spinor-like pytree
leaf (any shape); CG never inspects layout.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from .reductions import norm2, redot


class CGResult(NamedTuple):
    x: jax.Array
    relres: jax.Array       # final true |r| / |b|, f64
    iters: jax.Array        # total matvec count, i32
    converged: jax.Array    # bool


def _cg_cycle(matvec: Callable, b: jax.Array, x0: jax.Array,
              tol2_abs: jax.Array, maxiter: int):
    """One plain CG cycle: minimize over Krylov space until the *iterated*
    residual norm^2 drops below tol2_abs (absolute, f64) or maxiter."""
    r0 = b - matvec(x0)
    rsq0 = norm2(r0)

    def cond(st):
        x, r, p, rsq, k = st
        return jnp.logical_and(rsq > tol2_abs, k < maxiter)

    def body(st):
        x, r, p, rsq, k = st
        ap = matvec(p)
        pap = redot(p, ap)
        # guard against breakdown (pap <= 0 in fp noise)
        alpha = jnp.where(pap > 0, rsq / pap, 0.0)
        a32 = alpha.astype(jnp.float32).astype(x.dtype)
        x = x + a32 * p
        r = r - a32 * ap
        rsq_new = norm2(r)
        beta = (rsq_new / rsq).astype(jnp.float32).astype(x.dtype)
        p = r + beta * p
        return (x, r, p, rsq_new, k + 1)

    x, r, p, rsq, k = jax.lax.while_loop(
        cond, body, (x0, r0, r0, rsq0, jnp.int32(0)))
    return x, rsq, k


def cg(matvec: Callable, b: jax.Array, *, tol: float = 1e-10,
       maxiter: int = 1000, x0: jax.Array | None = None,
       restart_every: int = 250) -> CGResult:
    """Solve A x = b (A Hermitian positive definite) to |r|/|b| <= tol.

    Defect-correction restarts: run CG cycles of at most ``restart_every``
    matvecs; between cycles recompute the true residual and solve for the
    correction. ``matvec`` may be a sloppy (lower-precision) operator as
    long as it is the same linear map each call.
    """
    if x0 is None:
        x0 = jnp.zeros_like(b)
    bsq = norm2(b)
    tol2_abs = (tol * tol) * bsq
    n_restarts = -(-maxiter // restart_every)

    def outer_body(st):
        x, total_k, rsq = st
        dx, rsq_c, k = _cg_cycle(matvec, b - matvec(x),
                                 jnp.zeros_like(b), tol2_abs,
                                 restart_every)
        x = x + dx
        r_true = b - matvec(x)
        return (x, total_k + k + 2, norm2(r_true))

    def outer_cond(st):
        x, total_k, rsq = st
        return jnp.logical_and(rsq > tol2_abs, total_k < maxiter)

    x, total_k, rsq = jax.lax.while_loop(
        outer_cond, outer_body, (x0, jnp.int32(0), bsq * jnp.float64(4.0)))

    relres = jnp.sqrt(rsq / jnp.maximum(bsq, 1e-300))
    return CGResult(x=x, relres=relres, iters=total_k,
                    converged=rsq <= tol2_abs)


def cg_normal(apply_fn: Callable, apply_dagger_fn: Callable, b: jax.Array,
              **kw) -> CGResult:
    """Solve M x = b via the normal equations M^dag M x = M^dag b."""
    def nrm(x):
        return apply_dagger_fn(apply_fn(x))
    bn = apply_dagger_fn(b)
    res = cg(nrm, bn, **kw)
    # report the true residual of the *original* system
    r = b - apply_fn(res.x)
    relres = jnp.sqrt(norm2(r) / jnp.maximum(norm2(b), 1e-300))
    return CGResult(x=res.x, relres=relres, iters=res.iters,
                    converged=res.converged)


def cg_batched(matvec: Callable, b: jax.Array, *, tol: float = 1e-6,
               maxiter: int = 1000) -> CGResult:
    """Batched multi-RHS CG: b [n_rhs, *field]; ONE jitted iteration
    stream drives all right-hand sides together (per-RHS scalars), the
    genuine TPU win over the reference's sequential 12 solves
    (SURVEY.md §8.4).  Iterates until every RHS meets tol.

    matvec acts on a single field; it is vmapped internally.
    """
    mv = jax.vmap(matvec)
    n = b.shape[0]
    axes = tuple(range(1, b.ndim))

    def bnorm2(x):
        if jnp.iscomplexobj(x):
            return (jnp.sum(jnp.real(x).astype(jnp.float64) ** 2, axes) +
                    jnp.sum(jnp.imag(x).astype(jnp.float64) ** 2, axes))
        return jnp.sum(x.astype(jnp.float64) ** 2, axes)

    def bredot(x, y):
        if jnp.iscomplexobj(x):
            return (jnp.sum(jnp.real(x).astype(jnp.float64) *
                            jnp.real(y).astype(jnp.float64), axes) +
                    jnp.sum(jnp.imag(x).astype(jnp.float64) *
                            jnp.imag(y).astype(jnp.float64), axes))
        return jnp.sum(x.astype(jnp.float64) * y.astype(jnp.float64), axes)

    def bc(s):  # per-RHS scalar -> broadcastable
        return s.astype(jnp.float32).astype(b.dtype).reshape(
            n, *([1] * (b.ndim - 1)))

    bsq = bnorm2(b)
    tol2 = (tol * tol) * bsq

    def cond(st):
        x, r, p, rsq, k = st
        return jnp.logical_and(jnp.any(rsq > tol2), k < maxiter)

    def body(st):
        x, r, p, rsq, k = st
        ap = mv(p)
        pap = bredot(p, ap)
        active = rsq > tol2
        alpha = jnp.where(jnp.logical_and(pap > 0, active), rsq / pap, 0.0)
        x = x + bc(alpha) * p
        r = r - bc(alpha) * ap
        rsq_new = bnorm2(r)
        beta = jnp.where(active, rsq_new / jnp.maximum(rsq, 1e-300), 0.0)
        p = r + bc(beta) * p
        return (x, r, p, rsq_new, k + 1)

    x0 = jnp.zeros_like(b)
    x, r, p, rsq, k = jax.lax.while_loop(
        cond, body, (x0, b, b, bsq, jnp.int32(0)))
    relres = jnp.sqrt(rsq / jnp.maximum(bsq, 1e-300))
    return CGResult(x=x, relres=relres, iters=k,
                    converged=jnp.all(rsq <= tol2))


def cg_refined(matvec_sloppy: Callable, matvec_hp: Callable, b_hp: jax.Array,
               *, tol: float = 1e-10, inner_tol: float = 1e-6,
               maxiter: int = 2000, max_refine: int = 30,
               to_sloppy: Callable | None = None,
               to_hp: Callable | None = None) -> CGResult:
    """Mixed-precision CG by iterative refinement (defect correction).

    Plays the role of the reference's reliable-update mixed-precision CG
    (`lib/inv_cg_quda.cpp`, `solver.cpp` [U]; SURVEY.md §8.3 hard part #1):
    the true residual r = b - A x is formed with the *high-precision*
    operator (f64 split-complex on TPU, complex128 on CPU); the error
    equation A dx = r is then solved with the cheap sloppy operator to a
    modest ``inner_tol``.  Each refinement multiplies the true residual by
    ~inner_tol, so a handful of refinements reach 1e-10 even with fp32/bf16
    fields.  A must be Hermitian positive definite (use the normal
    equations for Dirac solves).
    """
    if to_sloppy is None:
        def to_sloppy(x):
            return x.astype(jnp.complex64)
    if to_hp is None:
        def to_hp(x, like=b_hp):
            return x.astype(like.dtype)
    bsq = norm2(b_hp)
    tol2_abs = (tol * tol) * bsq

    def refine_cond(st):
        x, rsq, total_k, n_ref = st
        return jnp.logical_and(
            jnp.logical_and(rsq > tol2_abs, total_k < maxiter),
            n_ref < max_refine)

    def refine_body(st):
        x, rsq, total_k, n_ref = st
        r_hp = b_hp - matvec_hp(x)
        r_s = to_sloppy(r_hp)
        rs_sq = norm2(r_s)
        inner_tol2 = (inner_tol * inner_tol) * rs_sq
        dx, _, k = _cg_cycle(matvec_sloppy, r_s, jnp.zeros_like(r_s),
                             inner_tol2, maxiter - total_k)
        x = x + to_hp(dx)
        r_new = b_hp - matvec_hp(x)
        return (x, norm2(r_new), total_k + k + 3, n_ref + 1)

    x0 = jnp.zeros_like(b_hp)
    st = (x0, bsq * jnp.float64(4.0), jnp.int32(0), jnp.int32(0))
    x, rsq, total_k, n_ref = jax.lax.while_loop(refine_cond, refine_body, st)
    relres = jnp.sqrt(rsq / jnp.maximum(bsq, 1e-300))
    return CGResult(x=x, relres=relres, iters=total_k,
                    converged=rsq <= tol2_abs)
