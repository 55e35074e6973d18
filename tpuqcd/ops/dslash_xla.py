"""Production even-odd Dslash in device layout, pure XLA (rolls + unrolled
spin/color arithmetic).

TPU-native equivalent of the reference's dslash kernels
(`lib/dslash_twisted_mass.cu`, generated `lib/dslash_core/*.h` [U];
SURVEY.md C5): the spin-projection trick (project to two half-spinors per
direction before the SU(3) multiply — halves flops and shift traffic),
even-odd layout, and unrolled 3x3 color / 2x4 spin algebra.

Why unrolled instead of einsum: XLA:TPU's layout assignment makes the
*contracted* axes of a dot minor, and minor axes are tile-padded to
(sublane, lane) = (4, 128) for c64 — a 3-dim color axis in minor position
blows the gauge field up 50x in HBM (measured).  Unrolling over the spin
and color indices keeps every operation elementwise over the [T, Z, S]
site axes, so the site-minor layout (ops/layout.py) is preserved and the
whole stencil compiles to pure VPU streaming — the right shape for a
bandwidth-bound kernel (BASELINE.md Tier 2: AI ~= 1 flop/byte).

The Pallas kernel (ops/dslash_pallas.py) is a drop-in replacement
consuming the same device layout.

All functions take single-parity spinors [4, 3, T, Z, S] and eo gauge
[4(mu), 2, 3, 3, T, Z, S].
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..gammas import (HALF_PROJ_MINUS, HALF_PROJ_PLUS, HALF_RECON_MINUS,
                      HALF_RECON_PLUS)
from ..lattice import Lattice


@lru_cache(maxsize=None)
def _masks(lat: Lattice, parity: int):
    """Static (numpy) masks on the [T, Z, S] site grid for source parity p:
    o_p (x-offset checkerboard), first/last-xh column masks."""
    T, Z, Y, Xh = (*lat.full_shape[:3], lat.Lx // 2)
    s3 = lat.eo_sub_parity  # [T, Z, Y]
    o_p = ((s3 + parity) % 2 == 1)
    o_p = np.repeat(o_p[..., None], Xh, axis=-1).reshape(T, Z, Y * Xh)
    xh = np.tile(np.arange(Xh), Y)
    is_first = np.broadcast_to(xh == 0, (T, Z, Y * Xh))
    is_last = np.broadcast_to(xh == Xh - 1, (T, Z, Y * Xh))
    return o_p, is_first, is_last


def _cmul(coef: complex, x: jax.Array) -> jax.Array:
    """coef * x for coef in {1,-1,i,-i,...} without generic multiplies."""
    if coef == 1:
        return x
    if coef == -1:
        return -x
    if coef == 1j:
        return jax.lax.complex(-jnp.imag(x), jnp.real(x))
    if coef == -1j:
        return jax.lax.complex(jnp.imag(x), -jnp.real(x))
    return jnp.asarray(coef, dtype=x.dtype) * x


def _spin_combine(tab: np.ndarray, comps: list[jax.Array]) -> list[jax.Array]:
    """rows of tab (n_out x n_in, entries 0/+-1/+-i) applied to a list of
    [3, T, Z, S] spinor components."""
    out = []
    for row in tab:
        acc = None
        for b, coef in enumerate(row):
            if coef == 0:
                continue
            term = _cmul(complex(coef), comps[b])
            acc = term if acc is None else acc + term
        out.append(acc)
    return out


def _su3_mv(u: jax.Array, h: jax.Array, dag: bool) -> jax.Array:
    """Unrolled SU(3) mat-vec on the leading color axes.

    u: [3, 3, T, Z, S]; h: [3, T, Z, S] -> [3, T, Z, S].
    dag=True computes u^dag h.
    """
    rows = []
    for i in range(3):
        acc = None
        for j in range(3):
            m = jnp.conj(u[j, i]) if dag else u[i, j]
            term = m * h[j]
            acc = term if acc is None else acc + term
        rows.append(acc)
    return jnp.stack(rows, axis=0)


def dslash_eo_dev(u_dev: jax.Array, psi_p: jax.Array, src_parity: int,
                  lat: Lattice, dagger: bool = False) -> jax.Array:
    """D_{q<-p} psi in device layout; q = 1 - src_parity.

    dagger=True applies the daggered hopping term (projector signs
    swapped) — used by gamma5-free normal-operator builds.
    """
    p = src_parity
    q = 1 - p
    Xh = lat.Lx // 2
    o_p, is_first, is_last = _masks(lat, p)
    o_p = jnp.asarray(o_p)
    is_first = jnp.asarray(is_first)
    is_last = jnp.asarray(is_last)

    hpm, hrm = HALF_PROJ_MINUS, HALF_RECON_MINUS
    hpp, hrp = HALF_PROJ_PLUS, HALF_RECON_PLUS
    if dagger:  # (1 -+ g) -> (1 +- g)
        hpm, hrm, hpp, hrp = hpp, hrp, hpm, hrm

    def sroll(f, k):
        return jnp.roll(f, k, axis=-1)

    def shift_fwd(f):
        # value at the +mu neighbor of each result site
        if mu == 3:
            return jnp.roll(f, -1, axis=-3)
        if mu == 2:
            return jnp.roll(f, -1, axis=-2)
        if mu == 1:
            return sroll(f, -Xh)
        # x: xh_nb = xh + 1 - o_p
        return jnp.where(o_p, f,
                         jnp.where(is_last, sroll(f, Xh - 1), sroll(f, -1)))

    def shift_bwd(f):
        # value at the -mu neighbor of each result site
        if mu == 3:
            return jnp.roll(f, +1, axis=-3)
        if mu == 2:
            return jnp.roll(f, +1, axis=-2)
        if mu == 1:
            return sroll(f, +Xh)
        # x: xh_nb = xh - o_p
        return jnp.where(o_p,
                         jnp.where(is_first, sroll(f, -(Xh - 1)), sroll(f, 1)),
                         f)

    psi_c = [psi_p[a] for a in range(4)]  # each [3, T, Z, S]
    out = [None] * 4
    for mu in range(4):  # noqa: B007  (mu read via closures below)
        u_q = u_dev[mu, q]  # [3,3,T,Z,S] links based at result sites
        u_p = u_dev[mu, p]  # links based at source sites

        # ---- forward hop: (1-g_mu) U_mu(x) psi(x+mu) ----
        h = _spin_combine(hpm[mu], psi_c)          # 2 x [3,T,Z,S]
        h = [shift_fwd(c) for c in h]
        uh = [_su3_mv(u_q, c, dag=False) for c in h]
        rec = _spin_combine(hrm[mu], uh)           # 4 x [3,T,Z,S]
        for a in range(4):
            out[a] = rec[a] if out[a] is None else out[a] + rec[a]

        # ---- backward hop: (1+g_mu) U_mu(x-mu)^dag psi(x-mu) ----
        h = _spin_combine(hpp[mu], psi_c)
        uh = [_su3_mv(u_p, c, dag=True) for c in h]
        rec = _spin_combine(hrp[mu], uh)
        for a in range(4):
            out[a] = out[a] + shift_bwd(rec[a])
    return jnp.stack(out, axis=0)


# ---------------------------------------------------------------------------
# packed-real variant: same stencil on (re, im)-split fields of any float
# dtype.  This is the high-precision operator on TPU (f64 pairs — TPU has no
# complex128, and Mosaic has no f64, so this XLA path computes the exact
# residuals for the reliable-update/iterative-refinement solvers; SURVEY.md
# §8.3 hard part #1) and doubles as a bf16 reference path.

def _cplx_mul_ri(ar, ai, br, bi, conj_a=False):
    if conj_a:
        return ar * br + ai * bi, ar * bi - ai * br
    return ar * br - ai * bi, ar * bi + ai * br


def dslash_eo_dev_ri(u_pk: jax.Array, psi_pk: jax.Array, src_parity: int,
                     lat: Lattice, dagger: bool = False,
                     dirs: tuple = None) -> jax.Array:
    """D_{q<-p} on packed-real fields (utils/packed.py layout).

    u_pk [4, 2, 3, 3, 2, T, Z, S]; psi_pk [2, 4, 3, T, Z, S]; any float
    dtype (f64 for the precise operator, f32/bf16 otherwise).

    dirs: optional tuple of (mu, sign) legs to accumulate (sign=+1 the
    forward (1-g_mu) U psi(x+mu) term, -1 the backward one); None = all
    8 legs.  Single-leg applies drive the colored-probing Galerkin coarse
    construction (mg/coarse.py; SURVEY.md C12c).
    """
    from ..gammas import (HALF_PROJ_MINUS, HALF_PROJ_PLUS,
                          HALF_RECON_MINUS, HALF_RECON_PLUS)
    p = src_parity
    q = 1 - p
    Xh = lat.Lx // 2
    o_p, is_first, is_last = _masks(lat, p)
    o_p = jnp.asarray(o_p)
    is_first = jnp.asarray(is_first)
    is_last = jnp.asarray(is_last)

    hpm, hrm = HALF_PROJ_MINUS, HALF_RECON_MINUS
    hpp, hrp = HALF_PROJ_PLUS, HALF_RECON_PLUS
    if dagger:
        hpm, hrm, hpp, hrp = hpp, hrp, hpm, hrm

    def sroll(f, k):
        return jnp.roll(f, k, axis=-1)

    def shift_fwd(f, mu):
        if mu == 3:
            return jnp.roll(f, -1, axis=-3)
        if mu == 2:
            return jnp.roll(f, -1, axis=-2)
        if mu == 1:
            return sroll(f, -Xh)
        return jnp.where(o_p, f,
                         jnp.where(is_last, sroll(f, Xh - 1), sroll(f, -1)))

    def shift_bwd(f, mu):
        if mu == 3:
            return jnp.roll(f, +1, axis=-3)
        if mu == 2:
            return jnp.roll(f, +1, axis=-2)
        if mu == 1:
            return sroll(f, +Xh)
        return jnp.where(o_p,
                         jnp.where(is_first, sroll(f, -(Xh - 1)), sroll(f, 1)),
                         f)

    def combine(tab, comps):
        """comps[b] = (re, im) pair of [3, T, Z, S]; entries 0/+-1/+-i."""
        out = []
        for row in tab:
            acc_r, acc_i = None, None
            for b, coef in enumerate(row):
                c = complex(coef)
                if c == 0:
                    continue
                r_, i_ = comps[b]
                if c == 1:
                    tr, ti = r_, i_
                elif c == -1:
                    tr, ti = -r_, -i_
                elif c == 1j:
                    tr, ti = -i_, r_
                else:
                    tr, ti = i_, -r_
                acc_r = tr if acc_r is None else acc_r + tr
                acc_i = ti if acc_i is None else acc_i + ti
            out.append((acc_r, acc_i))
        return out

    def su3_mv_ri(u_mu_par, h, dag):
        """u [3,3,2,T,Z,S]; h[j] = (re, im) of [T,Z,S] color comps list."""
        res = []
        for i in range(3):
            ar, ai = None, None
            for j in range(3):
                ur = u_mu_par[j, i, 0] if dag else u_mu_par[i, j, 0]
                ui = u_mu_par[j, i, 1] if dag else u_mu_par[i, j, 1]
                hr, hi = h[j]
                tr, ti = _cplx_mul_ri(ur, ui, hr, hi, conj_a=dag)
                ar = tr if ar is None else ar + tr
                ai = ti if ai is None else ai + ti
            res.append((ar, ai))
        return res

    psi_c = [(psi_pk[0, a], psi_pk[1, a]) for a in range(4)]  # [3,T,Z,S] pairs
    out = [None] * 4

    def accum(rec):
        for a in range(4):
            r_, i_ = rec[a]
            if out[a] is None:
                out[a] = (r_, i_)
            else:
                out[a] = (out[a][0] + r_, out[a][1] + i_)

    legs = dirs if dirs is not None else tuple(
        (mu, s) for mu in range(4) for s in (+1, -1))
    for mu in range(4):
        if (mu, +1) in legs:
            # forward
            h = combine(hpm[mu], psi_c)  # 2 half-spinors, (re,im) [3,T,Z,S]
            h = [(shift_fwd(r_, mu), shift_fwd(i_, mu)) for r_, i_ in h]
            h = [[(hr[j], hi[j]) for j in range(3)] for hr, hi in h]
            uh = [su3_mv_ri(u_pk[mu, q], hj, dag=False) for hj in h]
            uh = [(jnp.stack([c[0] for c in comp]),
                   jnp.stack([c[1] for c in comp]))
                  for comp in uh]
            accum(combine(hrm[mu], uh))
        if (mu, -1) in legs:
            # backward
            h = combine(hpp[mu], psi_c)
            h = [[(hr[j], hi[j]) for j in range(3)] for hr, hi in h]
            uh = [su3_mv_ri(u_pk[mu, p], hj, dag=True) for hj in h]
            uh = [(shift_bwd(jnp.stack([c[0] for c in comp]), mu),
                   shift_bwd(jnp.stack([c[1] for c in comp]), mu))
                  for comp in uh]
            accum(combine(hrp[mu], uh))

    re = jnp.stack([out[a][0] for a in range(4)])
    im = jnp.stack([out[a][1] for a in range(4)])
    return jnp.stack([re, im])
