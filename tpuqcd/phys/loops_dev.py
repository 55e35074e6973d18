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


def _loop_all(a_pk, b_pk, mats: dict, lat, momenta) -> dict:
    from .threep_dev import _fetch_complex, _gamma_stack, momentum_phases_pk
    gr, gi = _gamma_stack(mats)
    ph = jnp.asarray(momentum_phases_pk(lat, momenta), dtype=a_pk.dtype)
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
