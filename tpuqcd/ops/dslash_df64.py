"""Even-odd TM Dslash / Schur operator in df64 (double-single) precision.

The on-chip high-precision operator for defect-correction certification
at volumes where XLA's emulated-f64 path does not fit HBM (SURVEY.md
§8.3 hard part #1; BASELINE.md round 4 measured the f64 operator at
15.8-16.2 GiB alone at 48^3x96 vs 15.75 GiB on a v5e).  Structure
mirrors ops/dslash_xla.dslash_eo_dev_ri — the spin-projection stencil
on packed-real fields (reference `lib/dslash_twisted_mass.cu` +
generated cores [U]; SURVEY.md C5) — with every spinor value carried as
an (hi, lo) f32 pair (utils/df64.py) and the gauge kept in native f32:
f32 link entries enter the error-free products exactly, so the operator
applied here agrees with the exact-f64 one to ~2^-48 relative
(tests/test_df64.py verifies against the f64 XLA path on CPU).

A df64 packed spinor is a tuple ``(hi, lo)`` of [2(ri), 4, 3, T, Z, S]
f32 arrays; the gauge is the ordinary packed f32 [4, 2, 3, 3, 2, T, Z,
S] (full 18-real links — certification is off the hot path, no
reconstruct-12 needed).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..gammas import (HALF_PROJ_MINUS, HALF_PROJ_PLUS, HALF_RECON_MINUS,
                      HALF_RECON_PLUS)
from ..lattice import Lattice
from ..utils import df64 as df
from .dslash_xla import _masks

EVEN, ODD = 0, 1

# --- complex-df64 helpers: a value is ((re_hi, re_lo), (im_hi, im_lo)) ----


def _c_add(x, y):
    return df.add(x[0], y[0]), df.add(x[1], y[1])


def _c_coef(c: complex, x):
    """Multiply by a coefficient in {1, -1, i, -i} (exact)."""
    re, im = x
    if c == 1:
        return x
    if c == -1:
        return df.neg(re), df.neg(im)
    if c == 1j:
        return df.neg(im), re
    return im, df.neg(re)          # c == -1j


def _c_mul_f(ur, ui, h, conj: bool):
    """(ur + i ui) * h with (ur, ui) f32 arrays and h complex-df64;
    conj=True uses (ur - i ui).  Error-free f32xdf64 products."""
    hr, hi_ = h
    a = df.mul_f(hr, ur)
    b = df.mul_f(hi_, ui)
    c = df.mul_f(hi_, ur)
    d = df.mul_f(hr, ui)
    if conj:
        return df.add(a, b), df.sub(c, d)
    return df.sub(a, b), df.add(c, d)


def _map4(fn, x):
    """Apply fn to all four arrays of a complex-df64 value."""
    (rh, rl), (ih, il) = x
    return (fn(rh), fn(rl)), (fn(ih), fn(il))


def _stack_c(cs):
    """list of 3 complex-df64 [T,Z,S] -> complex-df64 [3,T,Z,S]."""
    re = (jnp.stack([c[0][0] for c in cs]),
          jnp.stack([c[0][1] for c in cs]))
    im = (jnp.stack([c[1][0] for c in cs]),
          jnp.stack([c[1][1] for c in cs]))
    return re, im


def _unstack_c(x):
    re, im = x
    return [((re[0][j], re[1][j]), (im[0][j], im[1][j]))
            for j in range(3)]


def _su3_mv_df(u_mu_par, h, dag: bool):
    """u [3,3,2,T,Z,S] f32; h = list of 3 complex-df64 [T,Z,S]."""
    rows = []
    for i in range(3):
        acc = None
        for j in range(3):
            ur = u_mu_par[j, i, 0] if dag else u_mu_par[i, j, 0]
            ui = u_mu_par[j, i, 1] if dag else u_mu_par[i, j, 1]
            t = _c_mul_f(ur, ui, h[j], conj=dag)
            acc = t if acc is None else _c_add(acc, t)
        rows.append(acc)
    return rows


def dslash_eo_dev_df(u_pk, psi_df, src_parity: int, lat: Lattice,
                     dagger: bool = False, dirs: tuple = None):
    """D_{q<-p} on a df64 packed spinor; returns a df64 packed spinor.

    u_pk: f32 [4, 2, 3, 3, 2, T, Z, S]; psi_df: (hi, lo) pair of
    [2, 4, 3, T, Z, S] f32 arrays.  dirs: optional tuple of (mu, sign)
    legs to accumulate (as dslash_eo_dev_ri) — the staged large-volume
    path jits a few legs per program to bound transient HBM.
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
                         jnp.where(is_last, sroll(f, Xh - 1),
                                   sroll(f, -1)))

    def shift_bwd(f, mu):
        if mu == 3:
            return jnp.roll(f, +1, axis=-3)
        if mu == 2:
            return jnp.roll(f, +1, axis=-2)
        if mu == 1:
            return sroll(f, +Xh)
        return jnp.where(o_p,
                         jnp.where(is_first, sroll(f, -(Xh - 1)),
                                   sroll(f, 1)),
                         f)

    def combine(tab, comps):
        out = []
        for row in tab:
            acc = None
            for b, coef in enumerate(row):
                c = complex(coef)
                if c == 0:
                    continue
                t = _c_coef(c, comps[b])
                acc = t if acc is None else _c_add(acc, t)
            out.append(acc)
        return out

    hi_a, lo_a = psi_df
    psi_c = [((hi_a[0, a], lo_a[0, a]), (hi_a[1, a], lo_a[1, a]))
             for a in range(4)]              # complex-df64 [3,T,Z,S]
    out = [None] * 4

    def accum(rec):
        for a in range(4):
            out[a] = rec[a] if out[a] is None else _c_add(out[a], rec[a])

    legs = dirs if dirs is not None else tuple(
        (mu, s) for mu in range(4) for s in (+1, -1))
    for mu in range(4):
        if (mu, +1) in legs:
            # forward hop: (1 -+ g_mu) U_mu(x) psi(x + mu)
            h = combine(hpm[mu], psi_c)          # 2 half-spinor comps
            h = [_map4(lambda f, m=mu: shift_fwd(f, m), c) for c in h]
            uh = [_stack_c(_su3_mv_df(u_pk[mu, q], _unstack_c(c),
                                      dag=False))
                  for c in h]
            accum(combine(hrm[mu], uh))
        if (mu, -1) in legs:
            # backward hop: (1 +- g_mu) U_mu(x - mu)^dag psi(x - mu)
            h = combine(hpp[mu], psi_c)
            uh = [_stack_c(_su3_mv_df(u_pk[mu, p], _unstack_c(c),
                                      dag=True))
                  for c in h]
            uh = [_map4(lambda f, m=mu: shift_bwd(f, m), c) for c in uh]
            accum(combine(hrp[mu], uh))

    hi_o = jnp.stack([jnp.stack([out[a][0][0] for a in range(4)]),
                      jnp.stack([out[a][1][0] for a in range(4)])])
    lo_o = jnp.stack([jnp.stack([out[a][0][1] for a in range(4)]),
                      jnp.stack([out[a][1][1] for a in range(4)])])
    return hi_o, lo_o


# --- site terms ------------------------------------------------------------

def _g5_signs(dtype=jnp.float32):
    from ..operators import _G5_DIAG
    return jnp.asarray(_G5_DIAG, dtype).reshape(1, 4, 1, 1, 1, 1)


def _ri_parts(x_df):
    """(hi, lo) of [2,4,3,T,Z,S] -> (re_df, im_df) of [4,3,T,Z,S]."""
    hi_a, lo_a = x_df
    return (hi_a[0], lo_a[0]), (hi_a[1], lo_a[1])


def _join_ri(re, im):
    return (jnp.stack([re[0], im[0]]), jnp.stack([re[1], im[1]]))


def twist_apply_df(psi_df, kappa: float, mu: float, flavor: int = +1):
    """(1 + 2 i kappa mu f g5) psi in df64."""
    t = df.scalar(2.0 * kappa * mu * flavor)
    g5 = _g5_signs()[0]                       # [4,1,1,1,1] of +-1
    re, im = _ri_parts(psi_df)
    im_g = (im[0] * g5, im[1] * g5)           # exact sign flips
    re_g = (re[0] * g5, re[1] * g5)
    re_o = df.sub(re, df.mul_s(im_g, t))
    im_o = df.add(im, df.mul_s(re_g, t))
    return _join_ri(re_o, im_o)


def twist_inv_apply_df(psi_df, kappa: float, mu: float, flavor: int = +1):
    """(1 - 2 i kappa mu f g5) psi / (1 + (2 kappa mu)^2) in df64."""
    tval = 2.0 * kappa * mu * flavor
    t = df.scalar(tval)
    d = df.scalar(1.0 / (1.0 + np.float64(tval) * np.float64(tval)))
    g5 = _g5_signs()[0]
    re, im = _ri_parts(psi_df)
    im_g = (im[0] * g5, im[1] * g5)
    re_g = (re[0] * g5, re[1] * g5)
    re_o = df.mul_s(df.add(re, df.mul_s(im_g, t)), d)
    im_o = df.mul_s(df.sub(im, df.mul_s(re_g, t)), d)
    return _join_ri(re_o, im_o)


@dataclasses.dataclass(frozen=True)
class TMOperatorPCDF64:
    """Even-odd preconditioned TM operator in df64 precision.

    The df64 twin of operators.PackedTMOperatorPC's "xla"/f64 path
    (same asymmetric even-even Schur form, SURVEY.md Appendix A #4):
    Mhat x = A x - k^2 D_eo A^{-1} D_oe x.  Gauge stays f32; spinors
    are (hi, lo) pairs; coefficients are df64 scalars so k^2 and the
    twist denominators carry their full f64 values.
    """
    lat: Lattice
    kappa: float
    mu: float = 0.0
    flavor: int = +1

    def _apply(self, u_pk, x_df, dagger: bool):
        f = self.flavor if not dagger else -self.flavor
        k2 = df.scalar(np.float64(self.kappa) * np.float64(self.kappa))
        t = dslash_eo_dev_df(u_pk, x_df, EVEN, self.lat, dagger=dagger)
        t = twist_inv_apply_df(t, self.kappa, self.mu, f)
        t = dslash_eo_dev_df(u_pk, t, ODD, self.lat, dagger=dagger)
        a = twist_apply_df(x_df, self.kappa, self.mu, f)
        return df.sub(a, df.mul_s(t, k2))

    def apply(self, u_pk, x_df):
        return self._apply(u_pk, x_df, dagger=False)

    def apply_dagger(self, u_pk, x_df):
        return self._apply(u_pk, x_df, dagger=True)

    def prepare(self, u_pk, b_df):
        """b_df: (hi, lo) of [2(par), 2(ri), 4, 3, T, Z, S] ->
        bhat_e = b_e + k D_eo A^{-1} b_o (df64)."""
        k = df.scalar(self.kappa)
        hi_a, lo_a = b_df
        b_e = (hi_a[0], lo_a[0])
        b_o = (hi_a[1], lo_a[1])
        t = twist_inv_apply_df(b_o, self.kappa, self.mu, self.flavor)
        d = dslash_eo_dev_df(u_pk, t, ODD, self.lat)
        return df.add(b_e, df.mul_s(d, k))

    def reconstruct(self, u_pk, x_df, b_df):
        """x_o = A^{-1} (b_o + k D_oe x_e); returns (hi, lo) of
        [2(par), ...]."""
        k = df.scalar(self.kappa)
        hi_a, lo_a = b_df
        b_o = (hi_a[1], lo_a[1])
        d = dslash_eo_dev_df(u_pk, x_df, EVEN, self.lat)
        t = df.add(b_o, df.mul_s(d, k))
        x_o = twist_inv_apply_df(t, self.kappa, self.mu, self.flavor)
        return (jnp.stack([x_df[0], x_o[0]]),
                jnp.stack([x_df[1], x_o[1]]))

    def residual(self, u_pk, x_df, bhat_df):
        """r = bhat - Mhat x in df64; returns (r_df, |r|^2 as f64)."""
        r = df.sub(bhat_df, self.apply(u_pk, x_df))
        return r, df.norm2_f64(r)

    # --- staged (large-volume) path ------------------------------------
    # At 48^3x96 the monolithic jit of apply() OOMs: the fully unrolled
    # 8-leg df64 stencil's transients exceed the ~10 GiB HBM left beside
    # the persistent solver set (measured RESOURCE_EXHAUSTED on v5e,
    # round 5).  Staged, each XLA execution covers a few legs (one
    # compiled program per (dirs, parity, dagger) signature, reused
    # across refines via jit caching), and XLA frees each program's
    # transients at exit.  Certification runs once per refine — the
    # extra psi re-reads are noise.

    def apply_staged(self, u_pk, x_df, dagger: bool = False,
                     legs_per_call: int = 2):
        f = self.flavor if not dagger else -self.flavor
        t = _dslash_df_staged(u_pk, x_df, EVEN, self.lat, dagger,
                              legs_per_call)
        t = _twist_inv_jit(t, self.kappa, self.mu, f)
        t = _dslash_df_staged(u_pk, t, ODD, self.lat, dagger,
                              legs_per_call)
        return _site_finish_jit(x_df, t, self.kappa, self.mu, f)

    def residual_staged(self, u_pk, x_df, bhat_df,
                        legs_per_call: int = 2):
        mx = self.apply_staged(u_pk, x_df, legs_per_call=legs_per_call)
        return _sub_norm_jit(bhat_df, mx)

    def prepare_staged(self, u_pk, b_df, legs_per_call: int = 2):
        k = df.scalar(self.kappa)
        hi_a, lo_a = b_df
        b_e = (hi_a[0], lo_a[0])
        b_o = (hi_a[1], lo_a[1])
        t = _twist_inv_jit(b_o, self.kappa, self.mu, self.flavor)
        d = _dslash_df_staged(u_pk, t, ODD, self.lat, False,
                              legs_per_call)
        return _axpy_jit(b_e, d, k)


@dataclasses.dataclass(frozen=True)
class FullTMOperatorDF64:
    """FULL-lattice (two-parity) TM operator M = (1 + 2 i kappa mu f
    g5) - kappa D in df64 — the certification twin of
    mg/device.DeviceFineLevel (fields [2(ri), 2(par), 4, 3, T, Z, S]
    as (hi, lo) pairs).  Used by the MG defect-correction loop at
    volumes where the emulated-f64 fine operator does not fit HBM
    (mg/dsolve.solve_certified hp="df64")."""
    lat: Lattice
    kappa: float
    mu: float = 0.0
    flavor: int = +1

    @staticmethod
    def _split(v_df):
        hi_a, lo_a = v_df
        return ((hi_a[:, 0], lo_a[:, 0]), (hi_a[:, 1], lo_a[:, 1]))

    def apply_staged(self, u_pk, v_df, legs_per_call: int = 2):
        # Liveness-ordered for HBM-bound volumes: the parity slices of
        # v_df happen INSIDE each leg program (no materialized
        # one-parity copies in the persistent set), each parity's site
        # term finishes (donating the hop result into it) before the
        # other parity's hops start — at 48^3x96 the naive ordering
        # held both hop results + both slices simultaneously (measured
        # OOM, BASELINE.md round 5).
        kmf = dict(kappa=self.kappa, mu=self.mu, flavor=self.flavor)
        de = _dslash_df_staged_full(u_pk, v_df, 1, self.lat,
                                    legs_per_call)    # even result
        oe = _full_site_par_jit(v_df, de, par=0, **kmf)
        del de                                        # donated into oe
        do = _dslash_df_staged_full(u_pk, v_df, 0, self.lat,
                                    legs_per_call)    # odd result
        oo = _full_site_par_jit(v_df, do, par=1, **kmf)
        del do
        return (jnp.stack([oe[0], oo[0]], axis=1),
                jnp.stack([oe[1], oo[1]], axis=1))

    def residual_staged(self, u_pk, x_df, b_df, legs_per_call: int = 2):
        mx = self.apply_staged(u_pk, x_df, legs_per_call=legs_per_call)
        return _sub_norm_jit(b_df, mx)

    def residual_staged_hi(self, u_pk, x_df, b_hi,
                           legs_per_call: int = 2):
        """Residual against a source whose df64 lo is EXACTLY zero
        (power-of-2 normalization): b travels as ONE f32 field and the
        zero lo is a program constant — one fine field of HBM back."""
        mx = self.apply_staged(u_pk, x_df, legs_per_call=legs_per_call)
        return _sub_norm_hi_jit(b_hi, mx)


from functools import partial as _partial  # noqa: E402


@_partial(jax.jit, static_argnames=("kappa", "mu", "flavor"),
          donate_argnums=1)
def _full_site_jit(v_df, d_df, kappa, mu, flavor):
    """twist(v) - kappa * d in df64 (one parity); d_df donated."""
    return df.sub(twist_apply_df(v_df, kappa, mu, flavor),
                  df.mul_s(d_df, df.scalar(kappa)))


@_partial(jax.jit, static_argnames=("par", "kappa", "mu", "flavor"),
          donate_argnums=1)
def _full_site_par_jit(v_df, d_df, *, par, kappa, mu, flavor):
    """twist(v[par]) - kappa * d with the parity slice INSIDE the
    program (v_df both-parity pair); d_df donated."""
    v = (v_df[0][:, par], v_df[1][:, par])
    return df.sub(twist_apply_df(v, kappa, mu, flavor),
                  df.mul_s(d_df, df.scalar(kappa)))


@_partial(jax.jit, static_argnames=("parity", "lat", "dirs"))
def _leg_par_jit(u_pk, v_df, *, parity, lat, dirs):
    """One staged leg of the FULL operator: source-parity slice of the
    both-parity pair inside the program (no persistent copy)."""
    psi = (v_df[0][:, parity], v_df[1][:, parity])
    return dslash_eo_dev_df(u_pk, psi, parity, lat, dagger=False,
                            dirs=dirs)


def _dslash_df_staged_full(u_pk, v_df, parity, lat, legs_per_call):
    all_legs = tuple((mu, s) for mu in range(4) for s in (+1, -1))
    acc = None
    for i in range(0, 8, legs_per_call):
        t = _leg_par_jit(u_pk, v_df, parity=parity, lat=lat,
                         dirs=all_legs[i:i + legs_per_call])
        acc = t if acc is None else _add_df_jit(acc, t)
    return acc


@_partial(jax.jit, donate_argnums=1)
def _sub_norm_hi_jit(b_hi, mx_df):
    # the zero lo of b materializes only as a fused program constant
    r = df.sub((b_hi, jnp.zeros_like(b_hi)), mx_df)
    return r, df.norm2_f64(r)


@_partial(jax.jit, static_argnames=("parity", "lat", "dirs", "dagger"))
def _leg_jit(u_pk, psi_df, *, parity, lat, dirs, dagger):
    return dslash_eo_dev_df(u_pk, psi_df, parity, lat, dagger=dagger,
                            dirs=dirs)


@_partial(jax.jit, donate_argnums=0)
def _add_df_jit(a, b):
    # a (the staged-leg accumulator) is DONATED: at HBM-bound volumes
    # the certified-solve peak is live-set + one leg + this add; without
    # donation the add holds acc + t + out = 3 df64 fields.
    return df.add(a, b)


@_partial(jax.jit, static_argnames=("kappa", "mu", "flavor"))
def _twist_inv_jit(t, kappa, mu, flavor):
    return twist_inv_apply_df(t, kappa, mu, flavor)


@_partial(jax.jit, static_argnames=("kappa", "mu", "flavor"))
def _site_finish_jit(x_df, t, kappa, mu, flavor):
    k2 = df.scalar(np.float64(kappa) * np.float64(kappa))
    return df.sub(twist_apply_df(x_df, kappa, mu, flavor),
                  df.mul_s(t, k2))


@_partial(jax.jit, donate_argnums=1)
def _sub_norm_jit(b_df, mx_df):
    # mx_df (the staged apply result) is DONATED into the residual
    r = df.sub(b_df, mx_df)
    return r, df.norm2_f64(r)


@jax.jit
def _axpy_jit(b_e, d, k):
    return df.add(b_e, df.mul_s(d, k))


def _dslash_df_staged(u_pk, psi_df, parity, lat, dagger, legs_per_call):
    all_legs = tuple((mu, s) for mu in range(4) for s in (+1, -1))
    acc = None
    for i in range(0, 8, legs_per_call):
        t = _leg_jit(u_pk, psi_df, parity=parity, lat=lat,
                     dirs=all_legs[i:i + legs_per_call], dagger=dagger)
        acc = t if acc is None else _add_df_jit(acc, t)
    return acc
