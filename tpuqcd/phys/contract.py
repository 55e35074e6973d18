"""Hadron two-point contractions and momentum projection.

TPU-native equivalent of the QKXTM contraction kernels ([U] plugin
Contraction classes; SURVEY.md C23/C25).  Operates on per-site propagator
tensors S[T, Z, Y, X, 4(snk s), 3(snk c), 4(src s), 3(src c)].

Proton (uud) interpolator J_alpha = eps_abc u^a_alpha (u^bT C g5 d^c).
With G = C g5 and Gt = g4 G^dag g4, the Wick contractions give (derived
from the Grassmann pairings; two u-contractions, relative minus sign):

  <J_alpha(x) Jbar_beta(0)> = eps_abc eps_def (G Sd^{cf} Gt)_{rho rho'} *
      [ Su^{ad}_{alpha beta} Su^{be}_{rho rho'}
        - Su^{ae}_{alpha rho'} Su^{bd}_{rho beta} ]

  C2(t, p) = sum_x e^{-i p.(x-x0)} Proj_{beta alpha} <J Jbar>_{alpha beta}.

Meson O = qbar1 Gamma q2:
  C_M(x) = - Tr[ Gamma S2(x,0) Gammabar g5 S1(x,0)^dag g5 ],
  Gammabar = g4 Gamma^dag g4  (the fermion-loop minus sign included, so
  the pion (Gamma = g5, S1 = S2) comes out positive = sum |S|^2).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..gammas import CGAMMA5, GAMMA5, GAMMA_T, PARITY_PLUS, EPS3
from ..lattice import Lattice

_G5D = np.real(np.diag(GAMMA5))


def _gbar(g: np.ndarray) -> np.ndarray:
    return GAMMA_T @ g.conj().T @ GAMMA_T


def momentum_phases(lat: Lattice, momenta: np.ndarray,
                    src_pos=(0, 0, 0)) -> np.ndarray:
    """e^{-i p.(x - x0)} for integer momenta [n, 3] (units 2 pi / L);
    returns [n, Z, Y, X].  src_pos = (x0, y0, z0)."""
    Z, Y, X = lat.Lz, lat.Ly, lat.Lx
    z, y, x = np.meshgrid(np.arange(Z), np.arange(Y), np.arange(X),
                          indexing="ij")
    x0, y0, z0 = src_pos
    out = []
    for n in momenta:
        phase = np.exp(-2j * np.pi * (
            n[0] * (x - x0) / X + n[1] * (y - y0) / Y + n[2] * (z - z0) / Z))
        out.append(phase)
    return np.stack(out)


def project_momenta(corr_site: jax.Array, lat: Lattice,
                    momenta: np.ndarray, src_pos=(0, 0, 0)) -> jax.Array:
    """[T, Z, Y, X] -> [n_mom, T] phase-sum projection (C25)."""
    ph = jnp.asarray(momentum_phases(lat, momenta, src_pos),
                     dtype=corr_site.dtype)
    return jnp.einsum("nzyx,tzyx->nt", ph, corr_site)


def project_all_momenta_fft(corr_site: jax.Array) -> jax.Array:
    """Full momentum grid via spatial FFT (e^{-ip.x} convention):
    [T, Z, Y, X] -> [T, pz, py, px]."""
    return jnp.fft.fftn(corr_site, axes=(1, 2, 3))


def proton_2pt_site(su: jax.Array, sd: jax.Array,
                    proj: np.ndarray = PARITY_PLUS) -> jax.Array:
    """Projected proton correlator density: [T, Z, Y, X] complex."""
    g = jnp.asarray(CGAMMA5, dtype=su.dtype)
    gt = jnp.asarray(_gbar(CGAMMA5), dtype=su.dtype)
    eps = jnp.asarray(EPS3, dtype=su.dtype)
    pr = jnp.asarray(proj, dtype=su.dtype)

    # W_{r c v f} = (G Sd^{cf} Gt)_{r v}
    w = jnp.einsum("rs,tzyxscuf,uv->tzyxrcvf", g, sd, gt,
                   optimize=True)
    ta = jnp.einsum("abc,def,nm,tzyxmand,tzyxrbve,tzyxrcvf->tzyx",
                    eps, eps, pr, su, su, w, optimize=True)
    tb = jnp.einsum("abc,def,nm,tzyxmave,tzyxrbnd,tzyxrcvf->tzyx",
                    eps, eps, pr, su, su, w, optimize=True)
    return ta - tb


def meson_2pt_site(s1: jax.Array, s2: jax.Array,
                   gamma: np.ndarray) -> jax.Array:
    """- Tr[Gamma S2 Gammabar g5 S1^dag g5] per site: [T, Z, Y, X]."""
    gm = jnp.asarray(gamma, dtype=s2.dtype)
    gb = jnp.asarray(_gbar(gamma), dtype=s2.dtype)
    g5 = jnp.asarray(_G5D, dtype=jnp.float32)
    # [g5 S1^dag g5]_{(n d),(m a)} = g5[n] conj(S1_{(m a),(n d)}) g5[m]
    return -jnp.einsum("mr,tzyxravd,vn,n,tzyxmand,m->tzyx",
                       gm, s2, gb, g5, jnp.conj(s1), g5, optimize=True)


def proton_2pt(su: jax.Array, sd: jax.Array, lat: Lattice,
               momenta: np.ndarray, src_pos=(0, 0, 0, 0),
               proj: np.ndarray = PARITY_PLUS) -> jax.Array:
    """[n_mom, T] projected proton two-point function.  src_pos =
    (t0, z0, y0, x0) full source coordinate (used for the phase origin;
    time ordering is left to the analysis layer)."""
    dens = proton_2pt_site(su, sd, proj)
    return project_momenta(dens, lat, momenta,
                           src_pos=(src_pos[3], src_pos[2], src_pos[1]))


def neutron_2pt(su: jax.Array, sd: jax.Array, lat: Lattice,
                momenta: np.ndarray, src_pos=(0, 0, 0, 0),
                proj: np.ndarray = PARITY_PLUS) -> jax.Array:
    """Neutron (ddu) two-point function: the isospin mirror of the
    proton interpolator — swap the u and d propagators (C23; exact
    at the Wick-contraction level for the eps (d^T C g5 u) d operator).
    """
    return proton_2pt(sd, su, lat, momenta, src_pos=src_pos, proj=proj)


def meson_2pt(s1: jax.Array, s2: jax.Array, gamma: np.ndarray,
              lat: Lattice, momenta: np.ndarray,
              src_pos=(0, 0, 0, 0)) -> jax.Array:
    dens = meson_2pt_site(s1, s2, gamma)
    return project_momenta(dens, lat, momenta,
                           src_pos=(src_pos[3], src_pos[2], src_pos[1]))
