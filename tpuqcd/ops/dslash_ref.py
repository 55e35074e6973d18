"""Reference (oracle) Dslash: jnp.roll + einsum, full and even-odd layouts.

This is the in-repo golden reference playing the role of the reference
repo's CPU host implementations (`tests/host_reference/
wilson_dslash_reference.cpp`, `twisted_mass_dslash_reference` [U];
SURVEY.md §5).  It is deliberately written for obviousness, not speed —
the Pallas kernels (ops/dslash_pallas.py) are validated against it
site-by-site.  XLA still compiles this to a reasonable fused stencil, so
it doubles as the portable fallback path on CPU.

Operator convention (SURVEY.md Appendix A #2, QUDA kappa-normalization):

    D psi(x) = sum_mu [ (1 - g_mu) U_mu(x)       psi(x + mu)
                      + (1 + g_mu) U_mu(x-mu)^dag psi(x - mu) ]

    M = A - kappa * D,   A = 1 + 2 i kappa mu g5 (+ clover)

Direction mu = 0..3 = (x,y,z,t); full-layout site axes are [T,Z,Y,X] so the
array axis of direction mu is 3-mu (lattice.AXIS_OF_MU).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..gammas import PROJ_MINUS, PROJ_PLUS
from ..utils.cplx import ceinsum
from ..lattice import AXIS_OF_MU, Lattice


def _cplx(tab: np.ndarray, dtype) -> jax.Array:
    return jnp.asarray(tab, dtype=dtype)


def dslash_full(u: jax.Array, psi: jax.Array) -> jax.Array:
    """Full-lattice hopping term D (no mass/twist).

    u:   [4, T, Z, Y, X, 3, 3]
    psi: [..., T, Z, Y, X, 4, 3]  (leading batch axes allowed)
    """
    dtype = psi.dtype
    out = jnp.zeros_like(psi)
    nb = psi.ndim - 6  # leading batch axes
    for mu in range(4):
        ax = nb + AXIS_OF_MU[mu]
        pm = _cplx(PROJ_MINUS[mu], dtype)
        pp = _cplx(PROJ_PLUS[mu], dtype)
        # forward: (1 - g_mu) U_mu(x) psi(x+mu)
        fwd = jnp.roll(psi, -1, axis=ax)
        fwd = ceinsum("tzyxij,...tzyxbj->...tzyxbi", u[mu], fwd)
        fwd = ceinsum("ab,...tzyxbi->...tzyxai", pm, fwd)
        # backward: (1 + g_mu) U_mu(y)^dag psi(y) at y = x-mu, shifted to x
        bwd = ceinsum("tzyxji,...tzyxbj->...tzyxbi", jnp.conj(u[mu]), psi)
        bwd = ceinsum("ab,...tzyxbi->...tzyxai", pp, bwd)
        bwd = jnp.roll(bwd, +1, axis=ax)
        out = out + fwd + bwd
    return out


def _shift_tzy(f: jax.Array, mu: int, sign: int, nb: int) -> jax.Array:
    """roll along t/z/y site axis; sign=-1 fetches the +mu neighbor."""
    return jnp.roll(f, sign, axis=nb + AXIS_OF_MU[mu])


def _gather_x_plus(f: jax.Array, o_p: jax.Array, nb: int) -> jax.Array:
    """Value at the +x neighbor of each result site, in eo layout.

    o_p[T,Z,Y,1(,1...)]: x-offset of the *source-parity* storage rows.
    xh_nb = xh + 1 - o_p  ->  unshifted where o_p==1, roll(-1) where o_p==0.
    """
    ax = nb + 3  # xh axis
    return jnp.where(o_p, f, jnp.roll(f, -1, axis=ax))


def _gather_x_minus(f: jax.Array, o_p: jax.Array, nb: int) -> jax.Array:
    """Value at the -x neighbor: xh_nb = xh - o_p."""
    ax = nb + 3
    return jnp.where(o_p, jnp.roll(f, +1, axis=ax), f)


def dslash_eo(u_eo: jax.Array, psi_p: jax.Array, src_parity: int,
              lat: Lattice) -> jax.Array:
    """Parity-restricted hopping term: D_{q<-p} psi, q = 1 - src_parity.

    u_eo:  [4, 2, T, Z, Y, X//2, 3, 3]  (even-odd gauge)
    psi_p: [..., T, Z, Y, X//2, 4, 3]   one-parity spinor at parity p
    returns result on parity q = 1 - p, same shape as psi_p.

    Even-odd index algebra (see tpuqcd.lattice docstring): t/z/y neighbor
    shifts leave xh unchanged; x shifts depend on the checkerboard
    o_p(t,z,y) = (s + p) % 2 of the source parity.
    """
    p = src_parity
    q = 1 - p
    dtype = psi_p.dtype
    nb = psi_p.ndim - 6
    s = lat.eo_sub_parity  # [T,Z,Y]
    o_p = jnp.asarray(((s + p) % 2) == 1)
    o_p_spinor = o_p.reshape((1,) * nb + s.shape + (1, 1, 1))
    o_p_gauge = o_p.reshape(s.shape + (1, 1, 1))

    out = jnp.zeros_like(psi_p)
    for mu in range(4):
        pm = _cplx(PROJ_MINUS[mu], dtype)
        pp = _cplx(PROJ_PLUS[mu], dtype)
        u_q = u_eo[mu, q]  # links based at result sites (forward hop)
        u_p = u_eo[mu, p]  # links based at source sites (backward hop)
        def pupsi(tab, umat, dagger_u, f):
            lbl = "tzyxji" if dagger_u else "tzyxij"
            t = ceinsum(f"{lbl},...tzyxbj->...tzyxbi",
                        jnp.conj(umat) if dagger_u else umat, f)
            return ceinsum("ab,...tzyxbi->...tzyxai", tab, t)

        if mu == 3 or mu == 2 or mu == 1:
            fwd_nb = _shift_tzy(psi_p, mu, -1, nb)
            bwd = pupsi(pp, u_p, True, psi_p)
            bwd = _shift_tzy(bwd, mu, +1, nb)
        else:  # mu == 0: x direction
            fwd_nb = _gather_x_plus(psi_p, o_p_spinor, nb)
            bwd = pupsi(pp, u_p, True, psi_p)
            bwd = _gather_x_minus(bwd, o_p_spinor, nb)
        fwd = pupsi(pm, u_q, False, fwd_nb)
        out = out + fwd + bwd
    return out
