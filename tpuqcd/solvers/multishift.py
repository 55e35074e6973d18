"""Multi-shift CG: solve (A + sigma_i) x_i = b for all shifts at once.

TPU-native equivalent of the reference's multi-shift solver
(`lib/inv_multi_cg_quda.cpp` [U]; SURVEY.md C11) — used for rational
approximations and twisted-mass mass-tuning sweeps.  One Krylov space,
one matvec per iteration for any number of shifts.

Derivation used here (residual-polynomial form): CG residuals satisfy
r_k = P_k(A) b with P_0 = 1 and the three-term recurrence
    P_{k+1}(l) = (g_k - a_k l) P_k(l) - (g_k - 1) P_{k-1}(l),
    g_k = 1 + b_{k-1} a_k / a_{k-1}.
Shifted residuals stay collinear, r_k^s = r_k / pi_k with
pi_k = P_k(-s), giving
    pi_{k+1} = (g_k + a_k s) pi_k - (g_k - 1) pi_{k-1},
    a_k^s = a_k pi_k / pi_{k+1},     b_k^s = b_k (pi_k / pi_{k+1})^2,
    p_{k+1}^s = r_{k+1} / pi_{k+1} + b_k^s p_k^s.
The seed system is the smallest shift (absorbed into the matvec) so all
shifted systems converge at least as fast as the seed.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from .reductions import norm2, redot


class MultiShiftResult(NamedTuple):
    xs: jax.Array          # [n_shift, *field]
    relres: jax.Array      # [n_shift] f64 (iterated residuals)
    iters: jax.Array


def multishift_cg(matvec: Callable, b: jax.Array, shifts,
                  *, tol: float = 1e-8, maxiter: int = 1000
                  ) -> MultiShiftResult:
    """A Hermitian PD; shifts ascending (seed = shifts[0])."""
    shifts = jnp.asarray(shifts, dtype=jnp.float64)
    ns = shifts.shape[0]
    sigma0 = shifts[0]
    rel = shifts - sigma0

    def mv(x):
        return matvec(x) + sigma0.astype(jnp.float32).astype(x.dtype) * x

    bsq = norm2(b)
    tol2 = (tol * tol) * bsq
    bshape = (ns, *([1] * b.ndim))

    def bc(v):  # broadcast per-shift scalars over field dims
        return v.astype(jnp.float32).astype(b.dtype).reshape(bshape)

    st = dict(
        x_seed=jnp.zeros_like(b), r=b, p=b, rsq=bsq,
        xs=jnp.zeros((ns, *b.shape), b.dtype),
        ps=jnp.broadcast_to(b, (ns, *b.shape)).astype(b.dtype) + 0,
        pi_k=jnp.ones((ns,), jnp.float64),
        pi_km1=jnp.ones((ns,), jnp.float64),
        alpha_km1=jnp.float64(1.0), beta_km1=jnp.float64(0.0),
        k=jnp.int32(0))

    def cond(s):
        return jnp.logical_and(s["rsq"] > tol2, s["k"] < maxiter)

    def body(s):
        ap = mv(s["p"])
        pap = redot(s["p"], ap)
        alpha = s["rsq"] / pap
        a32 = alpha.astype(jnp.float32).astype(b.dtype)
        x_seed = s["x_seed"] + a32 * s["p"]
        r = s["r"] - a32 * ap
        rsq_new = norm2(r)
        beta = rsq_new / s["rsq"]
        gamma = 1.0 + s["beta_km1"] * alpha / s["alpha_km1"]
        pi_kp1 = (gamma + alpha * rel) * s["pi_k"] - \
            (gamma - 1.0) * s["pi_km1"]
        ratio = s["pi_k"] / pi_kp1
        alpha_s = alpha * ratio
        beta_s = beta * ratio * ratio
        xs = s["xs"] + bc(alpha_s) * s["ps"]
        ps = bc(1.0 / pi_kp1) * r[None] + bc(beta_s) * s["ps"]
        b32 = beta.astype(jnp.float32).astype(b.dtype)
        p = r + b32 * s["p"]
        return dict(x_seed=x_seed, r=r, p=p, rsq=rsq_new, xs=xs, ps=ps,
                    pi_k=pi_kp1, pi_km1=s["pi_k"], alpha_km1=alpha,
                    beta_km1=beta, k=s["k"] + 1)

    st = jax.lax.while_loop(cond, body, st)
    rels = jnp.sqrt(st["rsq"] / jnp.maximum(bsq, 1e-300)) / \
        jnp.abs(st["pi_k"])
    return MultiShiftResult(xs=st["xs"], relres=rels, iters=st["k"])
