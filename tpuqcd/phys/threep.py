"""Three-point functions: fixed-sink sequential sources + insertions.

TPU-native equivalent of the QKXTM sequential-source / 3pt machinery
([U] `seqSourceFixSink`-style kernels, 3pt contraction kernels;
SURVEY.md C24, C17).

Method (fixed sink, SURVEY.md §4.1): the projected 2pt correlator at the
sink timeslice is linear in each propagator leg, C2 = L[S_f].  The
sequential source for flavor f is A_f(x) = dC2/dS_f(x) — computed
*mechanically* with jax.grad(holomorphic=True) on the Wick-contraction
code (no hand-derived spin algebra; for the doubly-represented u quark
the gradient automatically sums both Wick pairings).  The backward
propagator is

    B_{(beta b)} = conj( g5 M_{f'}^{-1} g5 conj(A_{(beta b)}) ),

(f' = flavor-flipped partner, from M^T = conj(g5 M_{f'} g5)), i.e. 12
solves with sources supported on t_sink.  Then

    C3_f(t_i, O, q) = sum_{x_i} e^{-iq.x_i}
        B(x_i)_{(g c),(beta b)} O_{g g'} S_f(x_i, 0)_{(g' c),(beta b)}.

Ultra-local insertions O = any gamma structure; one-derivative insertions
use the symmetric covariant derivative (cov_deriv below).

Everything is validated against the dense all-to-all oracle on tiny
lattices (tests/test_threep.py) — exact to solver tolerance.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..gammas import GAMMA, GAMMA5, PARITY_PLUS
from ..lattice import AXIS_OF_MU, Lattice
from .contract import momentum_phases, proton_2pt_site

_G5D = np.real(np.diag(GAMMA5))


def proton_seq_source(su: jax.Array, sd: jax.Array, t_sink: int,
                      flavor_leg: str, lat: Lattice,
                      proj: np.ndarray = PARITY_PLUS,
                      snk_mom: np.ndarray | None = None) -> jax.Array:
    """A_f(x) = dC2(t_sink)/dS_f(x): [T,Z,Y,X,4,3,4,3], supported on
    t_sink only.  flavor_leg: "u" or "d" (which propagator the current
    couples to).  snk_mom: optional integer sink momentum (zero default).
    """
    ph = jnp.ones((lat.Lz, lat.Ly, lat.Lx), dtype=su.dtype)
    if snk_mom is not None:
        ph = jnp.asarray(momentum_phases(lat, np.asarray([snk_mom]))[0],
                         dtype=su.dtype)

    def c2_of(s_var):
        if flavor_leg == "u":
            dens = proton_2pt_site(s_var, sd, proj)
        else:
            dens = proton_2pt_site(su, s_var, proj)
        return jnp.sum(dens[t_sink] * ph)

    s_in = su if flavor_leg == "u" else sd
    grad = jax.grad(c2_of, holomorphic=True)(s_in.astype(jnp.complex64))
    # dC2/dS has support only on t_sink (dens[t] depends on S[t] only)
    return grad


def backward_prop(seq_src: jax.Array, solve_fn_flip) -> jax.Array:
    """B from A: 12 flavor-flipped solves on g5 conj(A) columns.

    seq_src: [T,Z,Y,X, 4(a snk s),3(a snk c), 4(beta),3(b)] = A.
    solve_fn_flip(b_full [T,Z,Y,X,4,3]) -> M_{f'}^{-1} b.
    Returns B [T,Z,Y,X, 4(gamma),3(c), 4(beta),3(b)].
    """
    g5 = jnp.asarray(_G5D, dtype=seq_src.dtype)
    cols = []
    for beta in range(4):
        for b in range(3):
            src = jnp.conj(seq_src[..., beta, b])      # [T,Z,Y,X,4,3]
            src = src * g5[:, None]                    # g5 conj(A)
            x = solve_fn_flip(src)                     # M_{f'}^{-1} ...
            x = x * g5[:, None]                        # g5 ...
            cols.append(jnp.conj(x))
    cols = jnp.stack(cols)                             # [12, T,Z,Y,X,4,3]
    cols = cols.reshape(4, 3, *cols.shape[1:])
    return jnp.transpose(cols, (2, 3, 4, 5, 6, 7, 0, 1))


def threep_ultralocal(bwd: jax.Array, fwd: jax.Array, gammas: dict,
                      lat: Lattice, momenta: np.ndarray,
                      src_pos=(0, 0, 0, 0)) -> dict:
    """C3 for a dict of gamma-structure insertions.

    bwd: B [T,Z,Y,X,4,3,4,3]; fwd: S_f [T,Z,Y,X,4,3,4,3].
    Returns {name: [n_mom, T]}.
    """
    ph = jnp.asarray(momentum_phases(
        lat, momenta, (src_pos[3], src_pos[2], src_pos[1])),
        dtype=fwd.dtype)
    out = {}
    for name, g in gammas.items():
        gm = jnp.asarray(g, dtype=fwd.dtype)
        dens = jnp.einsum("tzyxgcqb,gh,tzyxhcqb->tzyx", bwd, gm, fwd,
                          optimize=True)
        out[name] = jnp.einsum("nzyx,tzyx->nt", ph, dens)
    return out


def cov_shift(u_full: jax.Array, psi: jax.Array, nu: int,
              sign: int) -> jax.Array:
    """U_nu(x) psi(x+nu) (sign=+1) or U_nu(x-nu)^dag psi(x-nu) (sign=-1);
    psi [T,Z,Y,X,4,3(,R)] in full layout, optional trailing spectator
    axis R (C17 equivalent)."""
    ax = AXIS_OF_MU[nu]
    lbl = "tzyxsjr" if psi.ndim == 7 else "tzyxsj"
    out = lbl.replace("j", "i")
    if sign == +1:
        nb = jnp.roll(psi, -1, axis=ax)
        return jnp.einsum(f"tzyxij,{lbl}->{out}", u_full[nu], nb)
    g = jnp.einsum(f"tzyxji,{lbl}->{out}", jnp.conj(u_full[nu]), psi)
    return jnp.roll(g, +1, axis=ax)


def cov_deriv_sym(u_full: jax.Array, prop: jax.Array, nu: int) -> jax.Array:
    """Symmetric covariant derivative on the sink index of a propagator:
    (D_nu S)(x) = [U_nu(x) S(x+nu) - U_nu(x-nu)^dag S(x-nu)] / 2."""
    s = prop.reshape(*prop.shape[:4], 4, 3, 12)
    fw = cov_shift(u_full, s, nu, +1)
    bw = cov_shift(u_full, s, nu, -1)
    return (0.5 * (fw - bw)).reshape(prop.shape)


def threep_one_derivative(bwd: jax.Array, fwd: jax.Array,
                          u_full: jax.Array, mu: int, nu: int,
                          lat: Lattice, momenta: np.ndarray,
                          src_pos=(0, 0, 0, 0)) -> jax.Array:
    """One-derivative insertion gamma_mu D<->_nu:
    (1/2)[ B gamma_mu (D_nu S) - (D_nu^T B) gamma_mu S ], the lattice
    discretization of qbar gamma_mu D<->_nu q; D^T acts on the backward
    function through its sink index with daggered links."""
    gm = jnp.asarray(GAMMA[mu], dtype=fwd.dtype)
    ph = jnp.asarray(momentum_phases(
        lat, momenta, (src_pos[3], src_pos[2], src_pos[1])),
        dtype=fwd.dtype)
    ds = cov_deriv_sym(u_full, fwd, nu)
    # D acting leftward (on the source-side index of S, i.e. on B's site
    # and color index): psi-bar transforms with the conjugate links, so
    # the same symmetric-derivative code applies with U -> conj(U)
    db = cov_deriv_sym(jnp.conj(u_full), bwd, nu)
    dens = 0.5 * (
        jnp.einsum("tzyxgcqb,gh,tzyxhcqb->tzyx", bwd, gm, ds, optimize=True)
        - jnp.einsum("tzyxgcqb,gh,tzyxhcqb->tzyx", db, gm, fwd,
                     optimize=True))
    return jnp.einsum("nzyx,tzyx->nt", ph, dens)
