"""Pallas TPU Dslash kernel (even-odd, twisted-mass, fused site terms).

The hot kernel of the framework — TPU-native equivalent of the reference's
CUDA dslash cores (`lib/dslash_twisted_mass.cu`, `dslash_core/*.h`,
`dslash_pack.cu` [U]; SURVEY.md C5, §4.4, §8.3 hard parts #2-3).

Design (v1, single chip):
  - operands in packed-real device layout (utils/packed.py):
    psi [2(ri), 4, 3, T, Z, S] f32/bf16, gauge [4, 2, 3, 3, 2, T, Z, S].
  - grid over T; each step computes one full [Z, S] spatial slice.  The
    temporal stencil reads the t-1/t/t+1 slices via three BlockSpecs over
    the same array (Mosaic pipelines the DMAs); all spatial neighbors come
    from VMEM rolls: lane-rolls on S (x within eo rows, y = roll by Xh)
    and sublane-rolls on Z.
  - spin-projection trick with the exact DeGrand-Rossi half-spinor tables
    (gammas.py): project -> 12 [Z,S] component rolls -> unrolled SU(3)
    mat-vec -> reconstruct.  All arithmetic is explicit (re, im) pairs on
    the VPU.
  - fused epilogues (the reference's dslash_twist_xpay-family fusions):
      "none":      out = D psi
      "twist_inv": out = (1 + 2 i kappa mu g5 f)^{-1} (D psi)
      "xpay":      out = A psi0 - kappa^2 (D psi), A = 1 + 2 i kappa mu g5 f
    so one even-odd normal-operator apply is exactly two kernel launches.

Correctness oracle: ops/dslash_xla.dslash_eo_dev (tests/test_dslash_pallas).
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..gammas import (HALF_PROJ_MINUS, HALF_PROJ_PLUS, HALF_RECON_MINUS,
                      HALF_RECON_PLUS)
from ..lattice import Lattice
from ..operators import _G5_DIAG

# ---------------------------------------------------------------------------
# complex-pair helpers (each operand is a (re, im) tuple of [Z, S] arrays)

def _cmulc(coef: complex, x):
    """coef * x for coef in {0, +-1, +-i} (exact table entries)."""
    re, im = x
    if coef == 1:
        return (re, im)
    if coef == -1:
        return (-re, -im)
    if coef == 1j:
        return (-im, re)
    if coef == -1j:
        return (im, -re)
    raise ValueError(coef)


def _spin_combine(tab: np.ndarray, comps):
    """tab [n_out, n_in] with entries 0/+-1/+-i applied to a list of
    color-vectors of pairs: comps[b][j] = (re, im)."""
    out = []
    for row in tab:
        acc = None
        for b, coef in enumerate(row):
            if coef == 0:
                continue
            term = [_cmulc(complex(coef), comps[b][j]) for j in range(3)]
            if acc is None:
                acc = term
            else:
                acc = [(a[0] + t[0], a[1] + t[1])
                       for a, t in zip(acc, term)]
        out.append(acc)
    return out  # [n_out][3] of pairs


def _su3_mv(u_load, h, dag: bool):
    """Unrolled SU(3) mat-vec: u_load(i, j) -> (re, im); h[j] = (re, im)."""
    out = []
    for i in range(3):
        acc_r = None
        acc_i = None
        for j in range(3):
            ur, ui = u_load(j, i) if dag else u_load(i, j)
            hr, hi = h[j]
            if dag:  # conj(u[j,i]) * h[j]
                tr = ur * hr + ui * hi
                ti = ur * hi - ui * hr
            else:
                tr = ur * hr - ui * hi
                ti = ur * hi + ui * hr
            acc_r = tr if acc_r is None else acc_r + tr
            acc_i = ti if acc_i is None else acc_i + ti
        out.append((acc_r, acc_i))
    return out


# ---------------------------------------------------------------------------

def _kernel(psi_c_ref, psi_p1_ref, psi_m1_ref, u_ref, u_tm1_ref, psi0_ref,
            out_ref, *, lat: Lattice, parity: int, dagger: bool,
            epilogue: str, kappa: float, mu: float, flavor: int,
            compute_dtype):
    """One [Z, S] spatial slice.

    VPU-utilization note: all hot arithmetic runs on *stacked* component
    arrays — spin projection on [3, Z, S] color-vector planes, shifts and
    SU(3) on [2(half), 3, Z, S] / [2, Z, S] stacks — rather than on 48
    individual [Z, S] planes, because on small slices a [Z, S] op is only
    a couple of vregs and instruction-issue overhead dominates (measured
    4x below the HBM roofline when fully unrolled per component).
    """
    T, Z, Y = lat.Lt, lat.Lz, lat.Ly
    Xh = lat.Lx // 2
    S = Y * Xh
    p, q = parity, 1 - parity
    t = pl.program_id(0)
    f32 = compute_dtype

    # site masks for the eo x-shift (see ops/layout.py):
    zi = jax.lax.broadcasted_iota(jnp.int32, (Z, S), 0)
    si = jax.lax.broadcasted_iota(jnp.int32, (Z, S), 1)
    yi = si // Xh
    xh = si % Xh
    o_p = ((zi + yi + t + p) % 2) == 1     # x-offset of source-parity rows
    is_first = xh == 0
    is_last = xh == Xh - 1

    def roll_s(x, k):
        return pltpu.roll(x, k % S, axis=x.ndim - 1)

    def roll_z(x, k):
        return pltpu.roll(x, k % Z, axis=x.ndim - 2)

    def shift_fwd(x, mu_):
        """value at the +mu neighbor; x [..., Z, S] (in-slice dirs only)."""
        if mu_ == 2:                       # z
            return roll_z(x, -1)
        if mu_ == 1:                       # y
            return roll_s(x, -Xh)
        # x: xh_nb = xh + 1 - o_p
        return jnp.where(o_p, x,
                         jnp.where(is_last, roll_s(x, Xh - 1),
                                   roll_s(x, -1)))

    def shift_bwd(x, mu_):
        if mu_ == 2:
            return roll_z(x, +1)
        if mu_ == 1:
            return roll_s(x, +Xh)
        return jnp.where(o_p,
                         jnp.where(is_first, roll_s(x, -(Xh - 1)),
                                   roll_s(x, 1)),
                         x)

    hpm, hrm = HALF_PROJ_MINUS, HALF_RECON_MINUS
    hpp, hrp = HALF_PROJ_PLUS, HALF_RECON_PLUS
    if dagger:
        hpm, hrm, hpp, hrp = hpp, hrp, hpm, hrm

    def load_psi(ref):
        """-> (re, im) each [4(spin), 3(color), Z, S]."""
        blk = ref[...]  # [2,4,3,1,Z,S]
        blk = blk.reshape(2, 4, 3, Z, S).astype(f32)
        return blk[0], blk[1]

    def proj(tab, pr, pi):
        """half-spinor projection: -> (re, im) each [2(h), 3, Z, S].

        tab rows have exactly two entries: +1 at s0 and c in {+-1, +-i}
        at s1 (DeGrand-Rossi tables).
        """
        rows_r, rows_i = [], []
        for row in tab:
            (s0, c0), (s1, c1) = [(b, complex(v)) for b, v in
                                  enumerate(row) if v != 0]
            assert c0 == 1
            if c1 == 1:
                rr, ri = pr[s0] + pr[s1], pi[s0] + pi[s1]
            elif c1 == -1:
                rr, ri = pr[s0] - pr[s1], pi[s0] - pi[s1]
            elif c1 == 1j:
                rr, ri = pr[s0] - pi[s1], pi[s0] + pr[s1]
            else:  # -1j
                rr, ri = pr[s0] + pi[s1], pi[s0] - pr[s1]
            rows_r.append(rr)
            rows_i.append(ri)
        return jnp.stack(rows_r), jnp.stack(rows_i)

    def su3_mv(u_re, u_im, hr, hi, dag):
        """u[3,3,Z,S] (re,im) times h[2,3,Z,S] -> [2,3,Z,S]."""
        out_r, out_i = [], []
        for i in range(3):
            ar = None
            ai = None
            for j in range(3):
                ur = u_re[j, i] if dag else u_re[i, j]
                ui = u_im[j, i] if dag else u_im[i, j]
                r_, i_ = hr[:, j], hi[:, j]      # [2, Z, S]
                if dag:
                    tr = ur * r_ + ui * i_
                    ti = ur * i_ - ui * r_
                else:
                    tr = ur * r_ - ui * i_
                    ti = ur * i_ + ui * r_
                ar = tr if ar is None else ar + tr
                ai = ti if ai is None else ai + ti
            out_r.append(ar)
            out_i.append(ai)
        # [3, 2, Z, S] -> [2, 3, Z, S]
        return (jnp.stack(out_r, axis=1), jnp.stack(out_i, axis=1))

    def recon_accum(tab, hr, hi, acc):
        """reconstruct 4-spinor from halves and accumulate.

        tab [4, 2]: row a has a single nonzero c at column h.
        acc: (re, im) each [4, 3, Z, S] or None.
        """
        rows_r, rows_i = [], []
        for row in tab:
            (h, c) = [(hh, complex(v)) for hh, v in enumerate(row)
                      if v != 0][0]
            if c == 1:
                rr, ri = hr[h], hi[h]
            elif c == -1:
                rr, ri = -hr[h], -hi[h]
            elif c == 1j:
                rr, ri = -hi[h], hr[h]
            else:
                rr, ri = hi[h], -hr[h]
            rows_r.append(rr)
            rows_i.append(ri)
        rec = (jnp.stack(rows_r), jnp.stack(rows_i))
        if acc is None:
            return rec
        return (acc[0] + rec[0], acc[1] + rec[1])

    def load_u(muu, par):
        blk = u_ref[muu, par]  # [3,3,2,1,Z,S]
        blk = blk.reshape(3, 3, 2, Z, S).astype(f32)
        return blk[:, :, 0], blk[:, :, 1]

    pr, pi = load_psi(psi_c_ref)
    acc = None

    # ---- spatial directions (x, y, z): all in-slice --------------------
    for mu_ in range(3):
        # forward: (1-g) U_mu(x)|q psi(x+mu)
        hr, hi = proj(hpm[mu_], pr, pi)
        hr, hi = shift_fwd(hr, mu_), shift_fwd(hi, mu_)
        u_re, u_im = load_u(mu_, q)
        hr, hi = su3_mv(u_re, u_im, hr, hi, dag=False)
        acc = recon_accum(hrm[mu_], hr, hi, acc)
        # backward: (1+g) U_mu(x-mu)|p^dag psi(x-mu): multiply at source,
        # then shift the half-spinor result
        hr, hi = proj(hpp[mu_], pr, pi)
        u_re, u_im = load_u(mu_, p)
        hr, hi = su3_mv(u_re, u_im, hr, hi, dag=True)
        hr, hi = shift_bwd(hr, mu_), shift_bwd(hi, mu_)
        acc = recon_accum(hrp[mu_], hr, hi, acc)

    # ---- temporal direction ------------------------------------------
    pr1, pi1 = load_psi(psi_p1_ref)
    hr, hi = proj(hpm[3], pr1, pi1)
    u_re, u_im = load_u(3, q)
    hr, hi = su3_mv(u_re, u_im, hr, hi, dag=False)
    acc = recon_accum(hrm[3], hr, hi, acc)

    prm, pim = load_psi(psi_m1_ref)
    hr, hi = proj(hpp[3], prm, pim)
    um = u_tm1_ref[...].reshape(3, 3, 2, Z, S).astype(f32)
    hr, hi = su3_mv(um[:, :, 0], um[:, :, 1], hr, hi, dag=True)
    acc = recon_accum(hrp[3], hr, hi, acc)

    dr, di = acc  # [4, 3, Z, S] each

    # ---- epilogue ------------------------------------------------------
    tw = 2.0 * kappa * mu * flavor

    def g5_mul(x):
        # g5 is diagonal (+-1 per spin): static unroll, no captured consts
        return jnp.stack([x[a] * float(_G5_DIAG[a]) for a in range(4)])

    if epilogue == "none":
        rr, ri = dr, di
    elif epilogue == "twist_inv":
        # (1 - i tw g5)/(1 + tw^2) * D
        den = 1.0 / (1.0 + tw * tw)
        rr = den * dr + (tw * den) * g5_mul(di)
        ri = den * di - (tw * den) * g5_mul(dr)
    elif epilogue == "xpay":
        # (1 + i tw g5) psi0 - kappa^2 D
        blk = psi0_ref[...].reshape(2, 4, 3, Z, S).astype(f32)
        p0r, p0i = blk[0], blk[1]
        k2 = kappa * kappa
        rr = p0r - tw * g5_mul(p0i) - k2 * dr
        ri = p0i + tw * g5_mul(p0r) - k2 * di
    else:
        raise ValueError(epilogue)
    out = jnp.stack([rr, ri]).reshape(2, 4, 3, 1, Z, S)
    out_ref[...] = out.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("src_parity", "lat", "dagger", "epilogue", "kappa",
                     "mu", "flavor", "interpret"))
def dslash_eo_pallas(u_pk: jax.Array, psi_pk: jax.Array, src_parity: int,
                     lat: Lattice, dagger: bool = False,
                     epilogue: str = "none", kappa: float = 0.0,
                     mu: float = 0.0, flavor: int = 1,
                     psi0_pk: jax.Array | None = None,
                     interpret: bool = False) -> jax.Array:
    """Packed-real even-odd Dslash with fused site-term epilogues.

    u_pk [4,2,3,3,2,T,Z,S]; psi_pk [2,4,3,T,Z,S] at src_parity; returns
    the same shape at parity 1-src_parity (epilogues apply site terms of
    the result parity).
    """
    T, Z, Y = lat.Lt, lat.Lz, lat.Ly
    Xh = lat.Lx // 2
    S = Y * Xh
    p = src_parity

    if psi0_pk is None:
        psi0_pk = psi_pk  # placeholder operand (unused unless xpay)

    spinor_block = (2, 4, 3, 1, Z, S)

    def spin_spec(tmap):
        return pl.BlockSpec(spinor_block,
                            lambda t: (0, 0, 0, tmap(t), 0, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [
        spin_spec(lambda t: t),
        spin_spec(lambda t: (t + 1) % T),
        spin_spec(lambda t: (t - 1) % T),
        pl.BlockSpec((4, 2, 3, 3, 2, 1, Z, S),
                     lambda t: (0, 0, 0, 0, 0, t, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 3, 3, 2, 1, Z, S),
                     lambda t: (3, p, 0, 0, 0, (t - 1) % T, 0, 0),
                     memory_space=pltpu.VMEM),
        spin_spec(lambda t: t),
    ]
    out_spec = pl.BlockSpec(spinor_block, lambda t: (0, 0, 0, t, 0, 0),
                            memory_space=pltpu.VMEM)

    kern = functools.partial(
        _kernel, lat=lat, parity=p, dagger=dagger, epilogue=epilogue,
        kappa=kappa, mu=mu, flavor=flavor, compute_dtype=jnp.float32)

    flops = 1320 * (Z * S) * T
    bytes_acc = psi_pk.size * psi_pk.dtype.itemsize * 4 + \
        u_pk.size * u_pk.dtype.itemsize

    # Mosaic lowering recurses fatally on 64-bit scalars that leak in under
    # jax_enable_x64; trace the kernel with x64 semantics off (operands are
    # concrete f32/bf16, so nothing observable changes).
    with jax.enable_x64(False):
        return pl.pallas_call(
            kern,
            grid=(T,),
            in_specs=in_specs,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct(psi_pk.shape, psi_pk.dtype),
            cost_estimate=pl.CostEstimate(flops=flops,
                                          bytes_accessed=bytes_acc,
                                          transcendentals=0),
            interpret=interpret,
        )(psi_pk, psi_pk, psi_pk, u_pk, u_pk, psi0_pk)
