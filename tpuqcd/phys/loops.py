"""Stochastic disconnected quark loops: noise, one-end trick, TSM,
low-mode (deflated) contributions.

TPU-native equivalent of the QKXTM loop machinery
([U] `calcMG_loops_w_One_Der_TSM_*`; SURVEY.md C26, §4.5).

Estimators (full layout [T,Z,Y,X,4,3] fields, solves injected as
functions so any solver backend plugs in):

  plain:    L(q, O) = sum_x e^{-iq.x} Tr[O S_f(x, x)]
            ~ E_eta[ sum_x e^{-iq.x} eta^dag(x) O (M_f^{-1} eta)(x) ]
  one-end (isovector d-u combination, the TM variance trick):
            sum_x e^{-iq.x} Tr[O (S_d - S_u)(x,x)]
            = 4 i kappa mu E_eta[ sum_x e^{-iq.x}
                                  psi^dag(x) O g5 psi(x) ],
            psi = (M_d^dag)^{-1} eta = g5 M_u^{-1} g5 eta
            (one inversion per noise; exact identity
             S_d - S_u = 4 i kappa mu S_u g5 S_d tested vs dense).
  TSM:      E[full] = E[trunc] + E[full - trunc]: many cheap truncated
            solves + few bias-correction solves (SURVEY.md C26).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..gammas import GAMMA5
from ..lattice import Lattice
from .contract import momentum_phases

_G5D = np.real(np.diag(GAMMA5))


def z4_noise(key: jax.Array, lat: Lattice, dtype=jnp.complex64) -> jax.Array:
    """Z4 volume noise: entries in {1, i, -1, -i} (E[eta eta^dag] = 1)."""
    k = jax.random.randint(key, (*lat.full_shape, 4, 3), 0, 4)
    table = jnp.asarray([1 + 0j, 1j, -1 + 0j, -1j], dtype=dtype)
    return table[k]


def dilute_time(eta: jax.Array, t_class: int, n_classes: int) -> jax.Array:
    """Time dilution: zero all timeslices with t % n_classes != t_class."""
    T = eta.shape[0]
    mask = (jnp.arange(T) % n_classes) == t_class
    return eta * mask[:, None, None, None, None, None].astype(eta.dtype)


def dilute_spin_color(eta: jax.Array, s: int, c: int) -> jax.Array:
    out = jnp.zeros_like(eta)
    return out.at[..., s, c].set(eta[..., s, c])


def loop_plain(eta: jax.Array, psi: jax.Array, gammas: dict,
               lat: Lattice, momenta: np.ndarray) -> dict:
    """Single-noise estimate: {name: [n_mom, T]}; psi = M^{-1} eta."""
    ph = jnp.asarray(momentum_phases(lat, momenta), dtype=psi.dtype)
    out = {}
    for name, g in gammas.items():
        gm = jnp.asarray(g, dtype=psi.dtype)
        dens = jnp.einsum("tzyxsc,su,tzyxuc->tzyx", jnp.conj(eta), gm, psi,
                          optimize=True)
        out[name] = jnp.einsum("nzyx,tzyx->nt", ph, dens)
    return out


def loop_one_end(psi: jax.Array, gammas: dict, lat: Lattice,
                 momenta: np.ndarray, kappa: float, mu: float) -> dict:
    """One-end single-noise estimate of the d-u loop:
    psi = g5 M_u^{-1} g5 eta.  Returns {name: [n_mom, T]} already
    including the 4 i kappa mu prefactor."""
    ph = jnp.asarray(momentum_phases(lat, momenta), dtype=psi.dtype)
    pref = jnp.asarray(4j * kappa * mu, dtype=psi.dtype)
    g5 = jnp.asarray(_G5D, dtype=jnp.float32)
    out = {}
    for name, g in gammas.items():
        gm = jnp.asarray(g, dtype=psi.dtype)
        dens = jnp.einsum("tzyxsc,su,u,tzyxuc->tzyx", jnp.conj(psi), gm,
                          g5, psi, optimize=True)
        out[name] = pref * jnp.einsum("nzyx,tzyx->nt", ph, dens)
    return out


def loop_plain_der(eta: jax.Array, psi: jax.Array, u_full: jax.Array,
                   gammas: dict, nu: int, lat: Lattice,
                   momenta: np.ndarray) -> dict:
    """One-derivative loop insertions (the `_One_Der_` in the reference
    program names [U]; SURVEY.md C26): single-noise estimate of
    Tr[Gamma D_nu S] via sum_x e^{-iq.x} eta^dag(x) Gamma (D_nu psi)(x)
    with the symmetric covariant derivative of phys/threep.cov_shift."""
    from .threep import cov_shift
    fw = cov_shift(u_full, psi, nu, +1)
    bw = cov_shift(u_full, psi, nu, -1)
    dpsi = 0.5 * (fw - bw)
    return loop_plain(eta, dpsi, gammas, lat, momenta)


def loop_one_end_der(psi: jax.Array, u_full: jax.Array, gammas: dict,
                     nu: int, lat: Lattice, momenta: np.ndarray,
                     kappa: float, mu: float) -> dict:
    """One-end one-derivative d-u loop estimate:
    4 i kappa mu psi^dag Gamma g5 (D_nu psi), psi = g5 M_u^{-1} g5 eta."""
    from .threep import cov_shift
    ph = jnp.asarray(momentum_phases(lat, momenta), dtype=psi.dtype)
    fw = cov_shift(u_full, psi, nu, +1)
    bw = cov_shift(u_full, psi, nu, -1)
    dpsi = 0.5 * (fw - bw)
    pref = jnp.asarray(4j * kappa * mu, dtype=psi.dtype)
    g5 = jnp.asarray(_G5D, dtype=jnp.float32)
    out = {}
    for name, g in gammas.items():
        gm = jnp.asarray(g, dtype=psi.dtype)
        dens = jnp.einsum("tzyxsc,su,u,tzyxuc->tzyx", jnp.conj(psi), gm,
                          g5, dpsi, optimize=True)
        out[name] = pref * jnp.einsum("nzyx,tzyx->nt", ph, dens)
    return out


def loops_stochastic(solve_fn: Callable, keys, gammas: dict, lat: Lattice,
                     momenta: np.ndarray, *, one_end: bool = False,
                     kappa: float = 0.0, mu: float = 0.0,
                     solve_fn_dag: Callable | None = None) -> dict:
    """Average the single-noise estimators over noises.

    solve_fn(b) = M^{-1} b; for one_end pass solve_fn_dag(b) =
    (M_d^dag)^{-1} b = g5 M_u^{-1} g5 b.
    """
    acc = None
    for key in keys:
        eta = z4_noise(key, lat)
        if one_end:
            psi = solve_fn_dag(eta)
            est = loop_one_end(psi, gammas, lat, momenta, kappa, mu)
        else:
            psi = solve_fn(eta)
            est = loop_plain(eta, psi, gammas, lat, momenta)
        if acc is None:
            acc = est
        else:
            acc = {k: acc[k] + est[k] for k in acc}
    n = len(keys)
    return {k: v / n for k, v in acc.items()}


def loops_tsm(solve_cheap: Callable, solve_full: Callable, keys_cheap,
              keys_corr, gammas: dict, lat: Lattice,
              momenta: np.ndarray) -> dict:
    """Truncated-solver-method estimate:
    E[full] ~= mean_cheap[trunc] + mean_corr[full - trunc]
    (keys_corr must be disjoint from keys_cheap for unbiasedness of the
    correction term)."""
    cheap = loops_stochastic(solve_cheap, keys_cheap, gammas, lat, momenta)
    corr_full = loops_stochastic(solve_full, keys_corr, gammas, lat,
                                 momenta)
    corr_cheap = loops_stochastic(solve_cheap, keys_corr, gammas, lat,
                                  momenta)
    return {k: cheap[k] + (corr_full[k] - corr_cheap[k]) for k in cheap}


def _acc(tot, est):
    if est is None:
        return tot
    if tot is None:
        return dict(est)
    return {k: tot[k] + est[k] for k in tot}


def diluted_sources(eta: jax.Array, dilute_t: int = 1,
                    dilute_sc: bool = False) -> list:
    """Complete dilution partition of one full-layout noise vector
    (host oracle of loops_dev.diluted_sources_pk; SURVEY.md C26)."""
    parts = ([dilute_time(eta, tc, dilute_t) for tc in range(dilute_t)]
             if dilute_t > 1 else [eta])
    if not dilute_sc:
        return parts
    return [dilute_spin_color(e, s, c)
            for e in parts for s in range(4) for c in range(3)]


def make_deflate(evecs) -> Callable:
    """Q = 1 - V V^dag on full-layout complex fields ({v_i} orthonormal;
    host oracle of loops_dev.make_deflate_pk)."""
    from ..utils.cplx import cvdot

    def deflate(eta):
        for v in evecs:
            eta = eta - cvdot(v, eta) * v
        return eta

    return deflate


def _oneend_single(psi, gammas, lat, momenta, kappa, mu, u_full, derivs):
    est = loop_one_end(psi, gammas, lat, momenta, kappa, mu)
    der = None
    if derivs:
        der = {}
        for nu in range(4):
            d = loop_one_end_der(psi, u_full, gammas, nu, lat, momenta,
                                 kappa, mu)
            der.update({f"{k}_D{nu}": v for k, v in d.items()})
    return est, der


def oneend_estimate_for_noise(eta, solve_ddag: Callable, gammas: dict,
                              lat: Lattice, momenta: np.ndarray,
                              kappa: float, mu: float, *, u_full=None,
                              derivs: bool = False, dilute_t: int = 1,
                              dilute_sc: bool = False,
                              deflate_fn: Callable | None = None):
    """One-end (+ one-derivative) estimate for ONE explicit noise
    vector: dilution partition -> optional deflation -> solves ->
    per-class estimates summed.  The injectable core of
    stochastic_oneend (tests drive exact basis vectors through it)."""
    srcs = diluted_sources(eta, dilute_t, dilute_sc)
    if deflate_fn is not None:
        srcs = [deflate_fn(s) for s in srcs]
    est = der = None
    for s in srcs:
        psi = solve_ddag(s)
        e, d = _oneend_single(psi, gammas, lat, momenta, kappa, mu,
                              u_full, derivs)
        est, der = _acc(est, e), _acc(der, d)
    return est, der


def stochastic_oneend(keys, solve_ddag: Callable, gammas: dict,
                      lat: Lattice, momenta: np.ndarray, kappa: float,
                      mu: float, *, u_full=None, derivs: bool = False,
                      dilute_t: int = 1, dilute_sc: bool = False,
                      deflate_fn: Callable | None = None):
    """Host oracle of loops_dev.stochastic_oneend_pk: diluted,
    optionally deflated one-end (+ one-derivative) estimates, summed
    over dilution classes and averaged over noises."""
    acc = acc_der = None
    for key in keys:
        est, der = oneend_estimate_for_noise(
            z4_noise(key, lat), solve_ddag, gammas, lat, momenta, kappa,
            mu, u_full=u_full, derivs=derivs, dilute_t=dilute_t,
            dilute_sc=dilute_sc, deflate_fn=deflate_fn)
        acc, acc_der = _acc(acc, est), _acc(acc_der, der)
    n = len(keys)
    avg = {k: v / n for k, v in acc.items()}
    avg_der = ({k: v / n for k, v in acc_der.items()}
               if acc_der is not None else None)
    return avg, avg_der


def oneend_lowmode_exact(evecs, solve_ddag: Callable, gammas: dict,
                         lat: Lattice, momenta: np.ndarray, kappa: float,
                         mu: float, *, u_full=None,
                         derivs: bool = False):
    """Host oracle of loops_dev.oneend_lowmode_exact_pk: the exact
    low-mode one-end part sum_i 4 i kappa mu w_i^dag O g5 w_i with
    w_i = (M_d^dag)^{-1} v_i (see the _pk docstring for the unbiasedness
    argument)."""
    est = der = None
    for v in evecs:
        w = solve_ddag(v)
        e, d = _oneend_single(w, gammas, lat, momenta, kappa, mu,
                              u_full, derivs)
        est, der = _acc(est, e), _acc(der, d)
    return est, der


def loop_lowmode(evals: np.ndarray, evecs: jax.Array, apply_dag: Callable,
                 gammas: dict, lat: Lattice, momenta: np.ndarray) -> dict:
    """Exact low-mode loop part from eigenpairs of (M M^dag):

    S(x,x) = [M^dag (M M^dag)^{-1}](x,x)
           ~= sum_i (1/lambda_i) (M^dag v_i)(x) v_i(x)^dag
    (deflation C27: the stochastic estimators then run on the deflated
    operator and this piece is added back exactly)."""
    ph = None
    out = {name: 0.0 for name in gammas}
    for lam, v in zip(np.asarray(evals), evecs):
        w = apply_dag(v)     # M^dag v_i
        for name, g in gammas.items():
            gm = jnp.asarray(g, dtype=w.dtype)
            dens = jnp.einsum("tzyxsc,su,tzyxuc->tzyx", jnp.conj(v), gm, w,
                              optimize=True) / lam
            if ph is None:
                ph = jnp.asarray(momentum_phases(lat, momenta),
                                 dtype=w.dtype)
            out[name] = out[name] + jnp.einsum("nzyx,tzyx->nt", ph, dens)
    return out
