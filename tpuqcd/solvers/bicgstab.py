"""BiCGStab on packed-real spinor fields.

TPU-native replacement of the reference BiCGStab
(`lib/inv_bicgstab_quda.cpp` [U]; SURVEY.md C11): solves the
*non-Hermitian* even-odd operator Mhat x = b directly (half the matvecs
of CG-on-normal-equations per iteration), with f64 complex scalar
bookkeeping carried as (re, im) pairs (no complex128 on TPU).

Fields are packed arrays [2(ri), ...] (utils/packed.py); complex axpys
use utils.packed.caxpy.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..utils.packed import caxpy, cdot_packed
from .reductions import norm2


class BiCGStabResult(NamedTuple):
    x: jax.Array
    relres: jax.Array
    iters: jax.Array      # matvec count
    converged: jax.Array


def _cdiv(ar, ai, br, bi):
    d = br * br + bi * bi
    return (ar * br + ai * bi) / d, (ai * br - ar * bi) / d


def _cmul(ar, ai, br, bi):
    return ar * br - ai * bi, ar * bi + ai * br


def bicgstab(matvec: Callable, b: jax.Array, *, tol: float = 1e-6,
             maxiter: int = 1000,
             x0: jax.Array | None = None) -> BiCGStabResult:
    """Solve M x = b for non-Hermitian M to |r|/|b| <= tol (iterated
    residual; wrap in solve.py's refinement loop for certified residuals)."""
    if x0 is None:
        x0 = jnp.zeros_like(b)
    bsq = norm2(b)
    tol2 = (tol * tol) * bsq

    r0 = b - matvec(x0)
    # shadow residual: rhat = r0 (standard choice)
    state = dict(
        x=x0, r=r0, p=r0,
        v=jnp.zeros_like(b),
        rho_r=jnp.float64(1.0), rho_i=jnp.float64(0.0),
        alpha_r=jnp.float64(1.0), alpha_i=jnp.float64(0.0),
        omega_r=jnp.float64(1.0), omega_i=jnp.float64(0.0),
        rsq=norm2(r0), k=jnp.int32(0), breakdown=jnp.bool_(False))
    rhat = r0

    def cond(st):
        return jnp.logical_and(
            jnp.logical_and(st["rsq"] > tol2, st["k"] < maxiter),
            jnp.logical_not(st["breakdown"]))

    def body(st):
        rho_new_r, rho_new_i = cdot_packed(rhat, st["r"])
        rho_sq = rho_new_r ** 2 + rho_new_i ** 2
        # beta = (rho_new / rho_old) * (alpha / omega)
        t1r, t1i = _cdiv(rho_new_r, rho_new_i, st["rho_r"], st["rho_i"])
        t2r, t2i = _cdiv(st["alpha_r"], st["alpha_i"],
                         st["omega_r"], st["omega_i"])
        beta_r, beta_i = _cmul(t1r, t1i, t2r, t2i)
        # p = r + beta (p - omega v)
        pmov = caxpy(-st["omega_r"], -st["omega_i"], st["v"], st["p"])
        p = caxpy(beta_r, beta_i, pmov, st["r"])
        v = matvec(p)
        den_r, den_i = cdot_packed(rhat, v)
        alpha_r, alpha_i = _cdiv(rho_new_r, rho_new_i, den_r, den_i)
        s = caxpy(-alpha_r, -alpha_i, v, st["r"])
        t = matvec(s)
        ts_r, ts_i = cdot_packed(t, s)
        tt = norm2(t)
        omega_r = ts_r / tt
        omega_i = ts_i / tt
        x = caxpy(alpha_r, alpha_i, p, st["x"])
        x = caxpy(omega_r, omega_i, s, x)
        r = caxpy(-omega_r, -omega_i, t, s)
        breakdown = jnp.logical_or(rho_sq < 1e-60, tt < 1e-60)
        return dict(x=x, r=r, p=p, v=v,
                    rho_r=rho_new_r, rho_i=rho_new_i,
                    alpha_r=alpha_r, alpha_i=alpha_i,
                    omega_r=omega_r, omega_i=omega_i,
                    rsq=norm2(r), k=st["k"] + 2, breakdown=breakdown)

    st = jax.lax.while_loop(cond, body, state)
    relres = jnp.sqrt(st["rsq"] / jnp.maximum(bsq, 1e-300))
    return BiCGStabResult(x=st["x"], relres=relres, iters=st["k"],
                          converged=st["rsq"] <= tol2)
