"""Device-resident stochastic loops (packed-real layout).

TPU-native port of the QKXTM loop contraction kernels ([U]
`calcMG_loops_w_One_Der_TSM_*` contraction stage; SURVEY.md C26):
noise generation, the loop bilinears for all 16 ultra-local insertions,
and the momentum projection all stream on the accelerator; only the
tiny [n_mom, T] estimates cross to the host.  Host oracle:
phys/loops.py (tested against the exact one-end identity and dense
inverses).

Packed spinor layout (the solver layout, phys/propagator.py):
    ``[2(par), 2(ri), 4(spin), 3(color), T, Z, S]``

The shared engine: every insertion needs only the open-spin bilinear

    D[s, u](x) = sum_c  conj(a)(x)_{s c}  b(x)_{u c}

computed once per (a, b) pair; each gamma structure is then a per-site
weighted sum of D's 16 spin entries (phys/threep_dev._gamma_weighted),
momentum-projected on device (phys/threep_dev.project_momenta_pk).
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..gammas import GAMMA5
from ..lattice import Lattice

_PREC = jax.lax.Precision.HIGHEST
_G5D = np.real(np.diag(GAMMA5))


def z4_noise_pk(key: jax.Array, lat: Lattice,
                dtype=jnp.float32) -> jax.Array:
    """Z4 volume noise directly in the packed layout (C15): entries in
    {1, i, -1, -i}; re/im planes from a 4-entry table lookup."""
    S = lat.Ly * lat.Lx // 2
    k = jax.random.randint(key, (2, 4, 3, lat.Lt, lat.Lz, S), 0, 4)
    re = jnp.asarray([1.0, 0.0, -1.0, 0.0], dtype=dtype)
    im = jnp.asarray([0.0, 1.0, 0.0, -1.0], dtype=dtype)
    return jnp.stack([re[k], im[k]], axis=1)   # [2par, 2ri, 4, 3, T, Z, S]


def dilute_time_pk(eta_pk: jax.Array, t_class: int,
                   n_classes: int) -> jax.Array:
    """Time dilution: zero timeslices with t % n_classes != t_class."""
    T = eta_pk.shape[4]
    mask = ((jnp.arange(T) % n_classes) == t_class).astype(eta_pk.dtype)
    return eta_pk * mask[:, None, None]


def dilute_spin_color_pk(eta_pk: jax.Array, s: int, c: int) -> jax.Array:
    out = jnp.zeros_like(eta_pk)
    return out.at[:, :, s, c].set(eta_pk[:, :, s, c])


def loop_bilinear_pk(a_pk: jax.Array, b_pk: jax.Array) -> jax.Array:
    """D[s,u](x) = sum_c conj(a)_{s c} b_{u c}:
    packed [2ri, 2par, 4(s), 4(u), T, Z, S]."""
    ar, ai = a_pk[:, 0], a_pk[:, 1]          # [2par, 4, 3, T, Z, S]
    br, bi = b_pk[:, 0], b_pk[:, 1]
    sub = "pactzx,pbctzx->pabtzx"
    re = (jnp.einsum(sub, ar, br, precision=_PREC)
          + jnp.einsum(sub, ai, bi, precision=_PREC))
    im = (jnp.einsum(sub, ar, bi, precision=_PREC)
          - jnp.einsum(sub, ai, br, precision=_PREC))
    return jnp.stack([re, im])


@jax.jit
def _loop_kernel(a_pk, b_pk, gr, gi, ph):
    """bilinear -> all gamma weights -> projection, one fused jit:
    [G, 2ri, n, T] (the eager-dot_general workaround + fusion, see
    phys/threep_dev.py)."""
    from .threep_dev import _weighted_project_all
    return _weighted_project_all(loop_bilinear_pk(a_pk, b_pk), gr, gi, ph)


@partial(jax.jit, static_argnames=("lat",))
def _loop_fft_kernel(a_pk, b_pk, gr, gi, iz, iy, ix, *, lat):
    from .threep_dev import _weighted_fft_project_all
    return _weighted_fft_project_all(
        loop_bilinear_pk(a_pk, b_pk), gr, gi, iz, iy, ix, lat=lat,
        shift=(0, 0, 0))


def _loop_all(a_pk, b_pk, mats: dict, lat, momenta) -> dict:
    from .threep_dev import (_fetch_complex, _gamma_stack, _mom_indices,
                             _note_fft_failure, _use_fft,
                             momentum_phases_pk)
    gr, gi = _gamma_stack(mats)
    out = None
    if _use_fft(momenta):
        # dense momentum sets (physics.mom_max_sq) take one on-device
        # FFT per gamma instead of an n x V phase einsum (C25 cuFFT)
        iz, iy, ix = _mom_indices(lat, momenta)
        try:
            out = np.asarray(_loop_fft_kernel(a_pk, b_pk, gr, gi,
                                              iz, iy, ix, lat=lat))
        except Exception as e:            # pragma: no cover - TPU only
            _note_fft_failure(e)
    if out is None:
        ph = jnp.asarray(momentum_phases_pk(lat, momenta),
                         dtype=a_pk.dtype)
        out = _loop_kernel(a_pk, b_pk, gr, gi, ph)
    return {name: _fetch_complex(out[i]) for i, name in enumerate(mats)}


def loop_plain_pk(eta_pk: jax.Array, psi_pk: jax.Array, gammas: dict,
                  lat: Lattice, momenta: np.ndarray) -> dict:
    """Single-noise estimate sum_x e^{-iq.x} eta^dag O psi:
    {name: complex [n_mom, T]} (loops.loop_plain, device layout)."""
    return _loop_all(eta_pk, psi_pk, gammas, lat, momenta)


def loop_one_end_pk(psi_pk: jax.Array, gammas: dict, lat: Lattice,
                    momenta: np.ndarray, kappa: float, mu: float) -> dict:
    """One-end d-u loop estimate: 4 i kappa mu psi^dag O g5 psi with
    psi = g5 M_u^{-1} g5 eta (loops.loop_one_end, device layout)."""
    pref = 4j * kappa * mu
    mats = {name: pref * (np.asarray(g, dtype=np.complex64)
                          * _G5D[None, :])   # O g5, diag g5 right-mult
            for name, g in gammas.items()}
    return _loop_all(psi_pk, psi_pk, mats, lat, momenta)


def cov_deriv_sym_spinor_pk(u_pk: jax.Array, psi_pk: jax.Array, nu: int,
                            lat: Lattice) -> jax.Array:
    """Symmetric covariant derivative of a packed SPINOR
    [2par, 2ri, 4, 3, T, Z, S] (solver layout): reuses the propagator
    engine of phys/threep_dev via degenerate source axes."""
    from .threep_dev import cov_deriv_sym_pk
    # -> [2ri, 2par, 4, 3, 1, 1, T, Z, S] (the engine broadcasts the
    # spectator source axes)
    f = jnp.swapaxes(psi_pk, 0, 1)[:, :, :, :, None, None]
    d = cov_deriv_sym_pk(u_pk, f, nu, lat)
    return jnp.swapaxes(d[:, :, :, :, 0, 0], 0, 1)


@partial(jax.jit, static_argnames=("nu", "lat"))
def _deriv_jit(u_pk, psi_pk, *, nu, lat):
    return cov_deriv_sym_spinor_pk(u_pk, psi_pk, nu, lat)


def loop_plain_der_pk(eta_pk: jax.Array, psi_pk: jax.Array,
                      u_pk: jax.Array, gammas: dict, nu: int,
                      lat: Lattice, momenta: np.ndarray) -> dict:
    """Device one-derivative loop insertions (loops.loop_plain_der):
    eta^dag Gamma (D_nu psi), everything packed/streaming."""
    dpsi = _deriv_jit(u_pk, psi_pk, nu=int(nu), lat=lat)
    return _loop_all(eta_pk, dpsi, gammas, lat, momenta)


def loop_one_end_der_pk(psi_pk: jax.Array, u_pk: jax.Array, gammas: dict,
                        nu: int, lat: Lattice, momenta: np.ndarray,
                        kappa: float, mu: float) -> dict:
    """Device one-end one-derivative loop (loops.loop_one_end_der)."""
    dpsi = _deriv_jit(u_pk, psi_pk, nu=int(nu), lat=lat)
    pref = 4j * kappa * mu
    mats = {name: pref * (np.asarray(g, dtype=np.complex64)
                          * _G5D[None, :])
            for name, g in gammas.items()}
    return _loop_all(psi_pk, dpsi, mats, lat, momenta)


def loops_stochastic_pk(solve_fn_pk: Callable, keys, gammas: dict,
                        lat: Lattice, momenta: np.ndarray, *,
                        one_end: bool = False, kappa: float = 0.0,
                        mu: float = 0.0,
                        solve_fn_dag_pk: Callable | None = None) -> dict:
    """Average the single-noise estimators over noises, all on device.

    solve_fn_pk(b_pk) = M^{-1} b in the packed layout; for one_end pass
    solve_fn_dag_pk(b_pk) = (M_d^dag)^{-1} b = g5 M_u^{-1} g5 b.
    """
    acc = None
    for key in keys:
        eta = z4_noise_pk(key, lat)
        if one_end:
            psi = solve_fn_dag_pk(eta)
            est = loop_one_end_pk(psi, gammas, lat, momenta, kappa, mu)
        else:
            psi = solve_fn_pk(eta)
            est = loop_plain_pk(eta, psi, gammas, lat, momenta)
        acc = est if acc is None else {k: acc[k] + est[k] for k in acc}
    n = len(keys)
    return {k: v / n for k, v in acc.items()}


def _acc(tot, est):
    if est is None:
        return tot
    if tot is None:
        return dict(est)
    return {k: tot[k] + est[k] for k in tot}


def diluted_sources_pk(eta_pk: jax.Array, dilute_t: int = 1,
                       dilute_sc: bool = False) -> list:
    """Complete dilution partition of one noise vector (the reference's
    time/spin/color dilution, SURVEY.md C26 / §4.5): dilute_t time
    classes x optional full spin-color dilution (12 classes).  The
    projectors P_a satisfy sum_a P_a = 1, so summing the per-class
    estimates keeps the estimator unbiased while killing the
    off-diagonal noise within each class."""
    parts = ([dilute_time_pk(eta_pk, tc, dilute_t)
              for tc in range(dilute_t)] if dilute_t > 1 else [eta_pk])
    if not dilute_sc:
        return parts
    return [dilute_spin_color_pk(e, s, c)
            for e in parts for s in range(4) for c in range(3)]


def make_deflate_pk(evecs: jax.Array) -> Callable:
    """Deflation projector Q = 1 - V V^dag on packed solver-layout
    fields [2(par), 2(ri), 4, 3, T, Z, S] (reference §4.5 "deflate:
    project out low modes from source").  evecs: orthonormal stack
    [n, 2par, 2ri, ...] (solvers/lanczos.lanczos_lowest_pk output,
    par/ri axes swapped into the solver layout)."""
    n = evecs.shape[0]
    Vr = evecs[:, :, 0].reshape(n, -1)
    Vi = evecs[:, :, 1].reshape(n, -1)

    @jax.jit
    def deflate(eta_pk):
        er = eta_pk[:, 0].reshape(-1)
        ei = eta_pk[:, 1].reshape(-1)
        cr = Vr @ er + Vi @ ei                      # Re<v_i, eta>
        ci = Vr @ ei - Vi @ er
        dr = (cr @ Vr - ci @ Vi).reshape(eta_pk[:, 0].shape)
        di = (cr @ Vi + ci @ Vr).reshape(eta_pk[:, 0].shape)
        return eta_pk - jnp.stack([dr, di], axis=1)

    return deflate


def _oneend_single_pk(psi_pk, gammas, lat, momenta, kappa, mu, u_pk,
                      derivs):
    """(est, der) of one psi = (M_d^dag)^{-1} source: ultra-local
    one-end + optional all-4-direction one-derivative insertions."""
    est = loop_one_end_pk(psi_pk, gammas, lat, momenta, kappa, mu)
    der = None
    if derivs:
        der = {}
        for nu in range(4):
            d = loop_one_end_der_pk(psi_pk, u_pk, gammas, nu, lat,
                                    momenta, kappa, mu)
            der.update({f"{k}_D{nu}": v for k, v in d.items()})
    return est, der


def oneend_estimate_for_noise_pk(eta_pk, solve_ddag_batch: Callable,
                                 gammas: dict, lat: Lattice,
                                 momenta: np.ndarray, kappa: float,
                                 mu: float, *, u_pk=None,
                                 derivs: bool = False, dilute_t: int = 1,
                                 dilute_sc: bool = False,
                                 deflate_fn: Callable | None = None):
    """One-end (+ one-derivative) estimate for ONE explicit packed
    noise: dilution partition -> optional deflation -> one multi-RHS
    batch solve -> per-class estimates summed (the injectable core of
    stochastic_oneend_pk)."""
    srcs = diluted_sources_pk(eta_pk, dilute_t, dilute_sc)
    if deflate_fn is not None:
        srcs = [deflate_fn(s) for s in srcs]
    psis = solve_ddag_batch(jnp.stack(srcs))
    est = der = None
    for i in range(psis.shape[0]):
        e, d = _oneend_single_pk(psis[i], gammas, lat, momenta, kappa,
                                 mu, u_pk, derivs)
        est, der = _acc(est, e), _acc(der, d)
    return est, der


def stochastic_oneend_pk(keys, solve_ddag_batch: Callable, gammas: dict,
                         lat: Lattice, momenta: np.ndarray, kappa: float,
                         mu: float, *, u_pk=None, derivs: bool = False,
                         dilute_t: int = 1, dilute_sc: bool = False,
                         deflate_fn: Callable | None = None):
    """Unified stochastic one-end driver (the estimator core of the
    reference `calcMG_loops_w_oneD_TSM` [U], SURVEY.md §4.5): for each
    noise, the complete dilution partition is (optionally) deflated and
    solved as ONE multi-RHS batch; per-class one-end (+ one-derivative)
    estimates are summed over classes and averaged over noises.

    solve_ddag_batch(b_pks [n, 2par, 2ri, 4, 3, T, Z, S]) must return
    psi = (M_d^dag)^{-1} b per row (= g5 M_u^{-1} g5 b).
    Returns (est, der_or_None): {name: complex [n_mom, T]}.
    """
    acc = acc_der = None
    for key in keys:
        est, der = oneend_estimate_for_noise_pk(
            z4_noise_pk(key, lat), solve_ddag_batch, gammas, lat,
            momenta, kappa, mu, u_pk=u_pk, derivs=derivs,
            dilute_t=dilute_t, dilute_sc=dilute_sc,
            deflate_fn=deflate_fn)
        acc, acc_der = _acc(acc, est), _acc(acc_der, der)
    n = len(keys)
    avg = {k: v / n for k, v in acc.items()}
    avg_der = ({k: v / n for k, v in acc_der.items()}
               if acc_der is not None else None)
    return avg, avg_der


def oneend_lowmode_exact_pk(evecs: jax.Array,
                            solve_ddag_batch: Callable, gammas: dict,
                            lat: Lattice, momenta: np.ndarray,
                            kappa: float, mu: float, *, u_pk=None,
                            derivs: bool = False):
    """EXACT low-mode part of the ONE-END estimator for the deflation
    basis {v_i} (ADVICE r1 fix): with w_i = (M_d^dag)^{-1} v_i solved to
    production tolerance, the piece removed from the deflated stochastic
    estimator is exactly

        sum_i 4 i kappa mu sum_x e^{-iq.x} w_i^dag(x) O g5 w_i(x)

    so stochastic + exact parts sum to the unbiased full loop.  This
    holds for ANY orthonormal {v_i} (only orthonormality and solver
    tolerance enter — not eigen-exactness: E[eta eta^dag] = 1 and
    Q = 1 - V V^dag give
    tr(W (M^dag)^{-1} Q M^{-1}) = tr(W (M M^dag)^{-1}) - sum_i w_i^dag
    W w_i).  evecs: [n, 2par, 2ri, ...] solver layout, orthonormal.
    Returns (est, der_or_None) — a SUM over modes, not an average.
    """
    ws = solve_ddag_batch(evecs)
    est = der = None
    for i in range(ws.shape[0]):
        e, d = _oneend_single_pk(ws[i], gammas, lat, momenta, kappa, mu,
                                 u_pk, derivs)
        est, der = _acc(est, e), _acc(der, d)
    return est, der


def loop_lowmode_pk(evals: np.ndarray, evecs_pk, apply_dag_pk: Callable,
                    gammas: dict, lat: Lattice,
                    momenta: np.ndarray) -> dict:
    """Exact low-mode loop part from packed eigenpairs of (M M^dag):
    S(x,x) ~= sum_i (1/lambda_i) (M^dag v_i)(x) v_i(x)^dag (C27)."""
    out = {name: 0.0 for name in gammas}
    for lam, v in zip(np.asarray(evals), evecs_pk):
        w = apply_dag_pk(v)
        est = _loop_all(v, w, gammas, lat, momenta)
        for name in gammas:
            out[name] = out[name] + est[name] / float(lam)
    return out
