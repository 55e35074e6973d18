"""Dirac operators: Wilson / twisted-mass / twisted-clover, full and even-odd.

TPU-native replacement of the reference's `Dirac` class hierarchy
(`lib/dirac.cpp`, `dirac_twisted_mass.cpp`, `dirac_twisted_clover.cpp`,
`include/dirac_quda.h` [U]; SURVEY.md C10).  Operators are lightweight
frozen dataclasses closing over (gauge, clover, kappa, mu); `apply` is a
pure function suitable for jit/vmap.  Sign conventions in
ops/dslash_ref.py docstring.

Even-odd preconditioning (SURVEY.md Appendix A #4): asymmetric Schur
complement on the EVEN parity (QUDA_MATPC_EVEN_EVEN-style):

    M = [[A_ee, -k D_eo], [-k D_oe, A_oo]]
    Mhat x_e = A_ee x_e - k^2 D_eo A_oo^{-1} D_oe x_e
    prepare:     bhat_e = b_e + k D_eo A_oo^{-1} b_o
    reconstruct: x_o    = A_oo^{-1} (b_o + k D_oe x_e)

where A = 1 + 2 i kappa mu g5 (+ clover).  D_eo means "D restricted to
odd sources, even results".
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .gammas import GAMMA5
from .lattice import Lattice
from .fields import EVEN, ODD
from .ops.dslash_ref import dslash_full, dslash_eo

#: g5 is diagonal in the DeGrand-Rossi basis; keep just the diagonal.
_G5_DIAG = np.real(np.diag(GAMMA5)).astype(np.float32)  # (+-1 per spin)


def twist_apply(psi: jax.Array, kappa: float, mu: float,
                flavor: int = +1) -> jax.Array:
    """A psi = (1 + 2 i kappa mu g5) psi, flavor = +-1 flips the mu sign.

    g5 diagonal => site-local diagonal per spin (reference fuses this into
    the dslash kernels, `dslash_twisted_mass.cu` [U]).
    """
    t = 2.0 * kappa * mu * flavor
    fac = (1.0 + 1j * t * _G5_DIAG).astype(psi.dtype)  # [4]
    return psi * fac[:, None]


def twist_inv_apply(psi: jax.Array, kappa: float, mu: float,
                    flavor: int = +1) -> jax.Array:
    """A^{-1} psi = (1 - 2 i kappa mu g5) psi / (1 + (2 kappa mu)^2)."""
    t = 2.0 * kappa * mu * flavor
    fac = ((1.0 - 1j * t * _G5_DIAG) / (1.0 + t * t)).astype(psi.dtype)
    return psi * fac[:, None]


def gamma5_apply(psi: jax.Array) -> jax.Array:
    return psi * jnp.asarray(_G5_DIAG, dtype=psi.dtype)[:, None]


# --- device-layout (spin-leading) variants: psi [..., 4, 3, T, Z, S] -------

def _spin_fac_dev(fac: np.ndarray, psi: jax.Array) -> jax.Array:
    return psi * jnp.asarray(fac, dtype=psi.dtype).reshape(4, 1, 1, 1, 1)


def twist_apply_dev(psi: jax.Array, kappa: float, mu: float,
                    flavor: int = +1) -> jax.Array:
    t = 2.0 * kappa * mu * flavor
    return _spin_fac_dev(1.0 + 1j * t * _G5_DIAG, psi)


def twist_inv_apply_dev(psi: jax.Array, kappa: float, mu: float,
                        flavor: int = +1) -> jax.Array:
    t = 2.0 * kappa * mu * flavor
    return _spin_fac_dev((1.0 - 1j * t * _G5_DIAG) / (1.0 + t * t), psi)


def gamma5_apply_dev(psi: jax.Array) -> jax.Array:
    return _spin_fac_dev(_G5_DIAG, psi)


@dataclasses.dataclass(frozen=True)
class TMOperator:
    """Full-lattice twisted-mass Wilson operator M = A - kappa D.

    mu=0 gives plain Wilson.  Fields in *full* layout.  With a clover term,
    pass ``clover`` ([T,Z,Y,X,4,3,4,3] site matrix A including the 1 and
    twist — see ops/clover.py); then A psi is a site-local matvec.
    """
    lat: Lattice
    kappa: float
    mu: float = 0.0
    flavor: int = +1

    def apply(self, u: jax.Array, psi: jax.Array) -> jax.Array:
        a = twist_apply(psi, self.kappa, self.mu, self.flavor)
        return a - self.kappa * dslash_full(u, psi)

    def apply_dagger(self, u: jax.Array, psi: jax.Array) -> jax.Array:
        # g5-Hermiticity: M(mu)^dag = g5 M(-mu) g5
        g = gamma5_apply(psi)
        m = TMOperator(self.lat, self.kappa, self.mu, -self.flavor)
        return gamma5_apply(m.apply(u, g))

    def normal(self, u: jax.Array, psi: jax.Array) -> jax.Array:
        """M^dag M psi."""
        return self.apply_dagger(u, self.apply(u, psi))


@dataclasses.dataclass(frozen=True)
class TMOperatorPC:
    """Even-odd preconditioned twisted-mass operator (asymmetric, even-even).

    Fields in eo layout; `apply` acts on a single-parity (even) spinor
    [..., T, Z, Y, X//2, 4, 3].  Gauge in eo layout [4,2,T,Z,Y,X//2,3,3].
    """
    lat: Lattice
    kappa: float
    mu: float = 0.0
    flavor: int = +1

    def _ainv(self, psi: jax.Array) -> jax.Array:
        return twist_inv_apply(psi, self.kappa, self.mu, self.flavor)

    def _a(self, psi: jax.Array) -> jax.Array:
        return twist_apply(psi, self.kappa, self.mu, self.flavor)

    def apply(self, u_eo: jax.Array, psi_e: jax.Array) -> jax.Array:
        """Mhat psi_e = A psi_e - k^2 D_eo A^{-1} D_oe psi_e."""
        k = self.kappa
        t = dslash_eo(u_eo, psi_e, EVEN, self.lat)      # odd result
        t = self._ainv(t)
        t = dslash_eo(u_eo, t, ODD, self.lat)           # even result
        return self._a(psi_e) - (k * k) * t

    def apply_dagger(self, u_eo: jax.Array, psi_e: jax.Array) -> jax.Array:
        g = gamma5_apply(psi_e)
        m = dataclasses.replace(self, flavor=-self.flavor)
        return gamma5_apply(m.apply(u_eo, g))

    def normal(self, u_eo: jax.Array, psi_e: jax.Array) -> jax.Array:
        return self.apply_dagger(u_eo, self.apply(u_eo, psi_e))

    # --- even-odd source prep / solution reconstruction -------------------
    def prepare(self, u_eo: jax.Array, b_eo: jax.Array) -> jax.Array:
        """b (eo layout, both parities) -> preconditioned even source."""
        b_e = jnp.take(b_eo, EVEN, axis=b_eo.ndim - 7)
        b_o = jnp.take(b_eo, ODD, axis=b_eo.ndim - 7)
        t = dslash_eo(u_eo, self._ainv(b_o), ODD, self.lat)  # even result
        return b_e + self.kappa * t

    def reconstruct(self, u_eo: jax.Array, x_e: jax.Array,
                    b_eo: jax.Array) -> jax.Array:
        """(x_e, b) -> full eo-layout solution [2, ...]."""
        b_o = jnp.take(b_eo, ODD, axis=b_eo.ndim - 7)
        t = dslash_eo(u_eo, x_e, EVEN, self.lat)  # odd result
        x_o = self._ainv(b_o + self.kappa * t)
        ax = b_eo.ndim - 7
        return jnp.stack([x_e, x_o], axis=ax)


@dataclasses.dataclass(frozen=True)
class DeviceTMOperatorPC:
    """Even-odd preconditioned TM operator in *device* layout.

    The production operator: spinors [4, 3, T, Z, S], eo gauge
    [4, 2, 3, 3, T, Z, S] (ops/layout.py).  Same math as TMOperatorPC;
    backend selects the Dslash implementation ("xla" rolls/einsum or
    "pallas" kernels once available).
    """
    lat: Lattice
    kappa: float
    mu: float = 0.0
    flavor: int = +1
    backend: str = "xla"

    def _dslash(self, u_dev, psi, parity, dagger=False):
        if self.backend == "pallas":
            from .ops.dslash_pallas import dslash_eo_pallas
            return dslash_eo_pallas(u_dev, psi, parity, self.lat,
                                    dagger=dagger)
        from .ops.dslash_xla import dslash_eo_dev
        return dslash_eo_dev(u_dev, psi, parity, self.lat, dagger=dagger)

    def apply(self, u_dev: jax.Array, psi_e: jax.Array) -> jax.Array:
        k = self.kappa
        t = self._dslash(u_dev, psi_e, EVEN)
        t = twist_inv_apply_dev(t, k, self.mu, self.flavor)
        t = self._dslash(u_dev, t, ODD)
        return (twist_apply_dev(psi_e, k, self.mu, self.flavor)
                - (k * k) * t)

    def apply_dagger(self, u_dev: jax.Array, psi_e: jax.Array) -> jax.Array:
        g = gamma5_apply_dev(psi_e)
        m = dataclasses.replace(self, flavor=-self.flavor)
        return gamma5_apply_dev(m.apply(u_dev, g))

    def normal(self, u_dev: jax.Array, psi_e: jax.Array) -> jax.Array:
        return self.apply_dagger(u_dev, self.apply(u_dev, psi_e))

    def prepare(self, u_dev: jax.Array, b_dev: jax.Array) -> jax.Array:
        """b_dev [2, 4, 3, T, Z, S] -> preconditioned even source."""
        b_e, b_o = b_dev[0], b_dev[1]
        t = twist_inv_apply_dev(b_o, self.kappa, self.mu, self.flavor)
        t = self._dslash(u_dev, t, ODD)
        return b_e + self.kappa * t

    def reconstruct(self, u_dev: jax.Array, x_e: jax.Array,
                    b_dev: jax.Array) -> jax.Array:
        b_o = b_dev[1]
        t = self._dslash(u_dev, x_e, EVEN)
        x_o = twist_inv_apply_dev(b_o + self.kappa * t, self.kappa, self.mu,
                                  self.flavor)
        return jnp.stack([x_e, x_o], axis=0)


@dataclasses.dataclass(frozen=True)
class CloverData:
    """Precomputed clover-term arrays for a gauge configuration.

    a_blocks: [2(par), 2(chir), 6, 6, T, Z, S] Hermitian site matrices A(x)
    ainv_odd_plus/minus: [2(chir), 6, 6, T, Z, S] = (A_oo +- 2 i k mu g5)^-1
    (ops/clover.py; reference CloverField + cloverInvert [U], SURVEY.md C4).
    """
    a_blocks: jax.Array
    ainv_odd_plus: jax.Array
    ainv_odd_minus: jax.Array

    @staticmethod
    def build(u_dev: jax.Array, lat: Lattice, kappa: float, mu: float,
              csw: float) -> "CloverData":
        from .ops.clover import clover_blocks, clover_twist_inverse
        a = clover_blocks(u_dev, lat, kappa, csw)
        return CloverData(
            a_blocks=a,
            ainv_odd_plus=clover_twist_inverse(a, kappa, mu, +1, ODD),
            ainv_odd_minus=clover_twist_inverse(a, kappa, mu, -1, ODD))


@dataclasses.dataclass(frozen=True)
class TMCloverOperatorPC:
    """Even-odd preconditioned twisted-clover operator (complex device
    layout, XLA backend).

    Mhat = Atw_ee - k^2 D_eo Atw_oo^{-1} D_oe,  Atw = A_clover + 2 i k mu
    f gamma5.  Reference `dirac_twisted_clover.cpp` (*PC classes) [U];
    SURVEY.md C10.  The dagger uses Mhat^dag = Atw_ee(-f) - k^2
    Ddag_eo Atw_oo(-f)^{-1} Ddag_oe (A Hermitian).
    """
    lat: Lattice
    kappa: float
    mu: float = 0.0
    csw: float = 1.0
    flavor: int = +1

    def _site_e(self, clover: CloverData, psi, flavor):
        from .ops.clover import clover_apply
        a = clover_apply(clover.a_blocks[EVEN], psi)
        t = 2.0 * self.kappa * self.mu * flavor
        return a + (1j * t) * gamma5_apply_dev(psi)

    def _ainv_o(self, clover: CloverData, psi, flavor):
        from .ops.clover import clover_apply
        ainv = (clover.ainv_odd_plus if flavor == +1
                else clover.ainv_odd_minus)
        return clover_apply(ainv, psi)

    def _apply(self, u_dev, clover, psi_e, dagger: bool):
        from .ops.dslash_xla import dslash_eo_dev
        f = self.flavor if not dagger else -self.flavor
        k = self.kappa
        t = dslash_eo_dev(u_dev, psi_e, EVEN, self.lat, dagger=dagger)
        t = self._ainv_o(clover, t, f)
        t = dslash_eo_dev(u_dev, t, ODD, self.lat, dagger=dagger)
        return self._site_e(clover, psi_e, f) - (k * k) * t

    def apply(self, u_dev, clover: CloverData, psi_e):
        return self._apply(u_dev, clover, psi_e, dagger=False)

    def apply_dagger(self, u_dev, clover: CloverData, psi_e):
        return self._apply(u_dev, clover, psi_e, dagger=True)

    def normal(self, u_dev, clover: CloverData, psi_e):
        return self.apply_dagger(u_dev, clover,
                                 self.apply(u_dev, clover, psi_e))

    def prepare(self, u_dev, clover: CloverData, b_eo):
        from .ops.dslash_xla import dslash_eo_dev
        b_e, b_o = b_eo[0], b_eo[1]
        t = self._ainv_o(clover, b_o, self.flavor)
        return b_e + self.kappa * dslash_eo_dev(u_dev, t, ODD, self.lat)

    def reconstruct(self, u_dev, clover: CloverData, x_e, b_eo):
        from .ops.dslash_xla import dslash_eo_dev
        t = b_eo[1] + self.kappa * dslash_eo_dev(u_dev, x_e, EVEN, self.lat)
        x_o = self._ainv_o(clover, t, self.flavor)
        return jnp.stack([x_e, x_o], axis=0)


@dataclasses.dataclass(frozen=True)
class NdegTMOperator:
    """Non-degenerate twisted-mass doublet (heavy s/c pair).

    The reference's dslash_ndeg_twisted_mass ([U]; SURVEY.md C5): on a
    flavor doublet chi = (chi_1, chi_2) (fields [2(flavor), T,Z,Y,X,4,3]),

        M_nd = 1 + 2 i kappa mubar g5 tau3 + 2 kappa epsbar tau1 - kappa D

    with tau acting on flavor.  gamma5 tau1-Hermiticity:
    (g5 tau1) M_nd (g5 tau1) = M_nd^dag (tested).
    """
    lat: Lattice
    kappa: float
    mubar: float
    epsbar: float

    def apply(self, u: jax.Array, chi: jax.Array) -> jax.Array:
        k = self.kappa
        t1 = twist_apply(chi[0], k, self.mubar, +1) \
            + (2.0 * k * self.epsbar) * chi[1] \
            - k * dslash_full(u, chi[0])
        t2 = twist_apply(chi[1], k, self.mubar, -1) \
            + (2.0 * k * self.epsbar) * chi[0] \
            - k * dslash_full(u, chi[1])
        return jnp.stack([t1, t2])

    def apply_dagger(self, u: jax.Array, chi: jax.Array) -> jax.Array:
        # M^dag = (g5 tau1) M (g5 tau1)
        g = jnp.stack([gamma5_apply(chi[1]), gamma5_apply(chi[0])])
        mg = self.apply(u, g)
        return jnp.stack([gamma5_apply(mg[1]), gamma5_apply(mg[0])])

    def normal(self, u: jax.Array, chi: jax.Array) -> jax.Array:
        return self.apply_dagger(u, self.apply(u, chi))


# --- packed-real (ri-leading) twist helpers: psi [2, 4, 3, T, Z, S] --------

def twist_apply_pk(psi_pk: jax.Array, kappa: float, mu: float,
                   flavor: int = +1) -> jax.Array:
    """(1 + 2 i kappa mu g5 f) on packed fields."""
    t = 2.0 * kappa * mu * flavor
    g5 = jnp.asarray(_G5_DIAG, dtype=psi_pk.dtype).reshape(1, 4, 1, 1, 1, 1)
    re, im = psi_pk[0], psi_pk[1]
    tg = jnp.asarray(t, psi_pk.dtype) * g5[0]
    return jnp.stack([re - tg * im, im + tg * re])


def twist_inv_apply_pk(psi_pk: jax.Array, kappa: float, mu: float,
                       flavor: int = +1) -> jax.Array:
    t = 2.0 * kappa * mu * flavor
    den = 1.0 / (1.0 + t * t)
    g5 = jnp.asarray(_G5_DIAG, dtype=psi_pk.dtype).reshape(4, 1, 1, 1, 1)
    re, im = psi_pk[0], psi_pk[1]
    tg = jnp.asarray(t, psi_pk.dtype) * g5
    d = jnp.asarray(den, psi_pk.dtype)
    return jnp.stack([d * (re + tg * im), d * (im - tg * re)])


def gamma5_apply_pk(psi_pk: jax.Array) -> jax.Array:
    g5 = jnp.asarray(_G5_DIAG, dtype=psi_pk.dtype).reshape(1, 4, 1, 1, 1, 1)
    return psi_pk * g5


@dataclasses.dataclass(frozen=True)
class PackedTMOperatorPC:
    """Production even-odd TM operator on packed-real fields.

    Fields in packed layout (utils/packed.py): spinor [2(ri), 4, 3, T, Z,
    S], gauge [4, 2, 3, 3, 2, T, Z, S], f32 or bf16.  backend="pallas"
    uses the fused Pallas kernels (2 launches per apply, the reference's
    dslash_twist_xpay fusion structure); backend="xla" unpacks to complex
    around the XLA dslash (CPU-testable fallback).

    The dagger apply uses the identity
        Mhat^dag = A(-mu) - k^2 Ddag_eo A(-mu)^{-1} Ddag_oe
    (daggered hopping + flavor flip) so no extra gamma5 passes over HBM
    are needed.
    """
    lat: Lattice
    kappa: float
    mu: float = 0.0
    flavor: int = +1
    backend: str = "pallas"
    interpret: bool = False
    #: fermion T-boundary phase baked into the stored links (-1
    #: antiperiodic, the production convention; +1 periodic).  The
    #: reconstruct-12 row rebuild must restore exactly this phase.
    t_boundary: int = -1

    def _pallas(self, u_pk, psi_pk, parity, dagger, epilogue, flavor,
                psi0=None):
        from .ops.dslash_pallas import dslash_eo_pallas
        if u_pk.shape[2] == 3:
            # reconstruct-12: the kernel rebuilds row2 in VMEM; slicing
            # here cuts gauge HBM traffic 1/3 on every production apply
            # (the MG fine level does the same; 878 -> 909 GF/s f32)
            u_pk = u_pk[:, :, :2]
        return dslash_eo_pallas(u_pk, psi_pk, parity, self.lat,
                                dagger=dagger, epilogue=epilogue,
                                kappa=self.kappa, mu=self.mu, flavor=flavor,
                                psi0_pk=psi0, interpret=self.interpret,
                                t_boundary=self.t_boundary)

    def _apply(self, u_pk, psi_pk, dagger: bool):
        f = self.flavor if not dagger else -self.flavor
        if self.backend == "pallas":
            t1 = self._pallas(u_pk, psi_pk, EVEN, dagger, "twist_inv", f)
            return self._pallas(u_pk, t1, ODD, dagger, "xpay", f,
                                psi0=psi_pk)
        # xla: packed-real path, dtype-generic (this is also the f64
        # high-precision operator on TPU)
        from .ops.dslash_xla import dslash_eo_dev_ri
        k = self.kappa
        t = dslash_eo_dev_ri(u_pk, psi_pk, EVEN, self.lat, dagger=dagger)
        t = twist_inv_apply_pk(t, k, self.mu, f)
        t = dslash_eo_dev_ri(u_pk, t, ODD, self.lat, dagger=dagger)
        return (twist_apply_pk(psi_pk, k, self.mu, f) -
                jnp.asarray(k * k, psi_pk.dtype) * t)

    def apply(self, u_pk: jax.Array, psi_pk: jax.Array) -> jax.Array:
        return self._apply(u_pk, psi_pk, dagger=False)

    def apply_dagger(self, u_pk: jax.Array, psi_pk: jax.Array) -> jax.Array:
        return self._apply(u_pk, psi_pk, dagger=True)

    def normal(self, u_pk: jax.Array, psi_pk: jax.Array) -> jax.Array:
        return self.apply_dagger(u_pk, self.apply(u_pk, psi_pk))

    def prepare(self, u_pk: jax.Array, b_pk: jax.Array) -> jax.Array:
        """b_pk [2(par), 2(ri), 4, 3, T, Z, S] -> even source.

        bhat_e = b_e + k D_eo A^{-1} b_o; built from one twist_inv pass
        and one plain dslash + axpy (not yet a fused kernel — prepare runs
        once per solve, off the hot path).
        """
        b_e, b_o = b_pk[0], b_pk[1]
        t = twist_inv_apply_pk(b_o, self.kappa, self.mu, self.flavor)
        if self.backend == "pallas":
            d = self._pallas(u_pk, t, ODD, False, "none", self.flavor)
        else:
            from .ops.dslash_xla import dslash_eo_dev_ri
            d = dslash_eo_dev_ri(u_pk, t, ODD, self.lat)
        return b_e + jnp.asarray(self.kappa, b_pk.dtype) * d

    def reconstruct(self, u_pk: jax.Array, x_e: jax.Array,
                    b_pk: jax.Array) -> jax.Array:
        """x_o = A^{-1} (b_o + k D_oe x_e); returns [2(par), ...]."""
        if self.backend == "pallas":
            d = self._pallas(u_pk, x_e, EVEN, False, "none", self.flavor)
        else:
            from .ops.dslash_xla import dslash_eo_dev_ri
            d = dslash_eo_dev_ri(u_pk, x_e, EVEN, self.lat)
        t = b_pk[1] + jnp.asarray(self.kappa, x_e.dtype) * d
        x_o = twist_inv_apply_pk(t, self.kappa, self.mu, self.flavor)
        return jnp.stack([x_e, x_o], axis=0)


@dataclasses.dataclass(frozen=True)
class PackedTMCloverOperatorPC:
    """Production even-odd twisted-CLOVER operator on packed fields
    (the mixed-precision BiCGStab/CG workhorse of BASELINE config 2;
    reference `dirac_twisted_clover.cpp` *PC classes [U], SURVEY.md
    C4/C10).

    Mhat = Atw_ee - k^2 D_eo Atw_oo^{-1} D_oe,
    Atw = A_clover + 2 i kappa mu f gamma5.

    Clover data travels as an explicit operand tuple (never closure-
    captured — production-size blocks would become HLO constants):

        fields = (u_pk,             [4, 2, 3, 3, 2, T, Z, S]
                  cl_pk,            [2par, 2ri, 2chir, 6, 6, T, Z, S]
                  clinv_o_plus,     [2ri, 2chir, 6, 6, T, Z, S]
                  clinv_o_minus)    (twisted odd inverses per flavor)

    backend="pallas" runs each apply as two fused kernel launches
    (clover_inv + clover_xpay epilogues); "xla" is the dtype-generic
    packed stencil (also the f64 defect-correction operator).
    """
    lat: Lattice
    kappa: float
    mu: float = 0.0
    csw: float = 1.0
    flavor: int = +1
    backend: str = "pallas"
    interpret: bool = False
    t_boundary: int = -1     # see PackedTMOperatorPC

    @staticmethod
    def make_fields(u_pk: jax.Array, clover: "CloverData"):
        """Operand tuple from a CloverData (tests / complex-layout
        interop); production solves build it with
        solve.make_clover_fields."""
        from .utils.packed import pack_clover
        cl_pk = jnp.stack([pack_clover(clover.a_blocks[EVEN]),
                           pack_clover(clover.a_blocks[ODD])])
        return (u_pk, cl_pk, pack_clover(clover.ainv_odd_plus),
                pack_clover(clover.ainv_odd_minus))

    def _dslash(self, u_pk, psi, parity, dagger, epilogue, f,
                clover_pk=None, psi0=None):
        from .ops.dslash_pallas import dslash_eo_pallas
        if u_pk.shape[2] == 3:
            u_pk = u_pk[:, :, :2]    # reconstruct-12 (see TM operator)
        return dslash_eo_pallas(u_pk, psi, parity, self.lat,
                                dagger=dagger, epilogue=epilogue,
                                kappa=self.kappa, mu=self.mu, flavor=f,
                                clover_pk=clover_pk, psi0_pk=psi0,
                                interpret=self.interpret,
                                t_boundary=self.t_boundary)

    def _clinv(self, fields, f):
        return fields[2] if f == +1 else fields[3]

    def _apply(self, fields, psi_e, dagger: bool):
        from .ops.clover import clover_apply_pk
        u_pk, cl_pk = fields[0], fields[1]
        f = self.flavor if not dagger else -self.flavor
        clinv = self._clinv(fields, f)
        k = self.kappa
        if self.backend == "pallas":
            t = self._dslash(u_pk, psi_e, EVEN, dagger, "clover_inv", f,
                             clover_pk=clinv)
            return self._dslash(u_pk, t, ODD, dagger, "clover_xpay", f,
                                clover_pk=cl_pk[EVEN], psi0=psi_e)
        from .ops.dslash_xla import dslash_eo_dev_ri
        t = dslash_eo_dev_ri(u_pk, psi_e, EVEN, self.lat, dagger=dagger)
        t = clover_apply_pk(clinv.astype(t.dtype), t)
        t = dslash_eo_dev_ri(u_pk, t, ODD, self.lat, dagger=dagger)
        tw = 2.0 * k * self.mu * f
        site = clover_apply_pk(cl_pk[EVEN].astype(psi_e.dtype), psi_e) \
            + _itwg5_packed(psi_e, tw)
        return site - jnp.asarray(k * k, psi_e.dtype) * t

    def apply(self, fields, psi_e):
        return self._apply(fields, psi_e, dagger=False)

    def apply_dagger(self, fields, psi_e):
        return self._apply(fields, psi_e, dagger=True)

    def normal(self, fields, psi_e):
        return self.apply_dagger(fields, self.apply(fields, psi_e))

    def prepare(self, fields, b_pk):
        """bhat_e = b_e + k D_eo Atw_oo^{-1} b_o."""
        from .ops.clover import clover_apply_pk
        u_pk = fields[0]
        t = clover_apply_pk(self._clinv(fields, self.flavor)
                            .astype(b_pk.dtype), b_pk[1])
        if self.backend == "pallas":
            d = self._dslash(u_pk, t, ODD, False, "none", self.flavor)
        else:
            from .ops.dslash_xla import dslash_eo_dev_ri
            d = dslash_eo_dev_ri(u_pk, t, ODD, self.lat)
        return b_pk[0] + jnp.asarray(self.kappa, b_pk.dtype) * d

    def reconstruct(self, fields, x_e, b_pk):
        """x_o = Atw_oo^{-1} (b_o + k D_oe x_e)."""
        from .ops.clover import clover_apply_pk
        u_pk = fields[0]
        if self.backend == "pallas":
            d = self._dslash(u_pk, x_e, EVEN, False, "none", self.flavor)
        else:
            from .ops.dslash_xla import dslash_eo_dev_ri
            d = dslash_eo_dev_ri(u_pk, x_e, EVEN, self.lat)
        t = b_pk[1] + jnp.asarray(self.kappa, x_e.dtype) * d
        x_o = clover_apply_pk(self._clinv(fields, self.flavor)
                              .astype(t.dtype), t)
        return jnp.stack([x_e, x_o], axis=0)


def _itwg5_packed(v_pk: jax.Array, tw: float) -> jax.Array:
    """i * tw * g5 * v on a packed [2ri, 4, 3, T, Z, S] spinor."""
    g5 = jnp.asarray(_G5_DIAG, dtype=v_pk.dtype).reshape(4, 1, 1, 1, 1)
    t = jnp.asarray(tw, v_pk.dtype)
    return jnp.stack([-t * g5 * v_pk[1], t * g5 * v_pk[0]])


@dataclasses.dataclass(frozen=True)
class PackedNdegTMOperatorPC:
    """Even-odd preconditioned NON-DEGENERATE twisted-mass doublet on
    packed fields (the heavy s/c solver operator; reference
    `dslash_ndeg_twisted_mass.cu` + its *PC Dirac class [U]; SURVEY.md
    C5/C10).

    chi [2(flavor), 2(par)?...]: `apply` acts on the even-parity doublet
    [2(fl), 2(ri), 4, 3, T, Z, S].  Site term (flavor-mixing)

        A = 1 + i t g5 tau3 + e tau1,  t = 2 kappa mubar, e = 2 kappa
        epsbar,

    whose inverse is closed-form because g5 is diagonal and
    det_flavor(A) = 1 + t^2 - e^2 is a SCALAR:

        A^{-1} = [(1 - i t g5) chi_0 - e chi_1,
                  (1 + i t g5) chi_1 - e chi_0] / (1 + t^2 - e^2).

    Mhat = A_ee - k^2 D_eo A_oo^{-1} D_oe (D flavor-diagonal).
    gamma5 tau1-Hermiticity: Mhat^dag = (g5 tau1) Mhat (g5 tau1),
    implemented directly as daggered hops + mubar sign flip.
    Requires 1 + t^2 - e^2 > 0 (physical s/c doublets satisfy this).
    """
    lat: Lattice
    kappa: float
    mubar: float
    epsbar: float
    backend: str = "pallas"
    interpret: bool = False
    t_boundary: int = -1     # see PackedTMOperatorPC

    def _t_e(self, flip):
        t = 2.0 * self.kappa * self.mubar * (1 if not flip else -1)
        e = 2.0 * self.kappa * self.epsbar
        return t, e

    def _site(self, chi, flip):
        t, e = self._t_e(flip)
        ee = jnp.asarray(e, chi.dtype)
        a0 = chi[0] + _itwg5_packed(chi[0], t) + ee * chi[1]
        a1 = chi[1] + _itwg5_packed(chi[1], -t) + ee * chi[0]
        return jnp.stack([a0, a1])

    def _site_inv(self, chi, flip):
        t, e = self._t_e(flip)
        den = 1.0 / (1.0 + t * t - e * e)
        ee = jnp.asarray(e, chi.dtype)
        d = jnp.asarray(den, chi.dtype)
        x0 = d * (chi[0] - _itwg5_packed(chi[0], t) - ee * chi[1])
        x1 = d * (chi[1] - _itwg5_packed(chi[1], -t) - ee * chi[0])
        return jnp.stack([x0, x1])

    def _dslash(self, u_pk, chi, parity, dagger):
        """Flavor-diagonal hop on the doublet."""
        def one(psi):
            if self.backend == "pallas":
                from .ops.dslash_pallas import dslash_eo_pallas
                u12 = u_pk[:, :, :2] if u_pk.shape[2] == 3 else u_pk
                return dslash_eo_pallas(u12, psi, parity, self.lat,
                                        dagger=dagger,
                                        interpret=self.interpret,
                                        t_boundary=self.t_boundary)
            from .ops.dslash_xla import dslash_eo_dev_ri
            return dslash_eo_dev_ri(u_pk, psi, parity, self.lat,
                                    dagger=dagger)
        return jnp.stack([one(chi[0]), one(chi[1])])

    def _apply(self, u_pk, chi_e, dagger):
        k = self.kappa
        d = self._dslash(u_pk, chi_e, EVEN, dagger)
        w = self._site_inv(d, dagger)
        d2 = self._dslash(u_pk, w, ODD, dagger)
        return self._site(chi_e, dagger) - jnp.asarray(k * k,
                                                      chi_e.dtype) * d2

    def apply(self, u_pk, chi_e):
        return self._apply(u_pk, chi_e, dagger=False)

    def apply_dagger(self, u_pk, chi_e):
        return self._apply(u_pk, chi_e, dagger=True)

    def normal(self, u_pk, chi_e):
        return self.apply_dagger(u_pk, self.apply(u_pk, chi_e))

    def prepare(self, u_pk, b_pk):
        """b [2fl, 2par, 2ri, 4, 3, T, Z, S] -> even doublet source."""
        b_e, b_o = b_pk[:, 0], b_pk[:, 1]
        t = self._site_inv(b_o, False)
        d = self._dslash(u_pk, t, ODD, False)
        return b_e + jnp.asarray(self.kappa, b_pk.dtype) * d

    def reconstruct(self, u_pk, x_e, b_pk):
        """x_o = A_oo^{-1} (b_o + k D_oe x_e) -> [2fl, 2par, ...]."""
        d = self._dslash(u_pk, x_e, EVEN, False)
        t = b_pk[:, 1] + jnp.asarray(self.kappa, x_e.dtype) * d
        x_o = self._site_inv(t, False)
        return jnp.stack([x_e, x_o], axis=1)


@partial(jax.tree_util.register_dataclass,
         data_fields=["lv_p", "lv_m"], meta_fields=["kappa", "epsbar"])
@dataclasses.dataclass
class PackedNdegTMOperator:
    """Production non-degenerate TM doublet on packed fields.

    chi [2(flavor), 2(ri), 2(par), 4, 3, T, Z, S];
    M_nd = 1 + 2 i kappa mubar g5 tau3 + 2 kappa epsbar tau1 - kappa D
    (reference dslash_ndeg_twisted_mass [U]; SURVEY.md C5).  The
    flavor-diagonal part runs as the fused full-M Pallas launches
    (mg.device.DeviceFineLevel, reconstruct-12 links); the epsbar tau1
    mixing is one axpy.  Use .create() to build (slices the compressed
    gauge once).
    """
    lv_p: object      # DeviceFineLevel flavor +1 (mu = mubar)
    lv_m: object      # DeviceFineLevel flavor -1
    kappa: float
    epsbar: float

    @classmethod
    def create(cls, lat: Lattice, u_pk: jax.Array, kappa: float,
               mubar: float, epsbar: float, backend: str = "pallas",
               interpret: bool = False) -> "PackedNdegTMOperator":
        from .mg.device import DeviceFineLevel
        lv_p = DeviceFineLevel(lat, u_pk, kappa, mubar, +1,
                               backend=backend, interpret=interpret)
        lv_m = dataclasses.replace(lv_p, flavor=-1)
        return cls(lv_p=lv_p, lv_m=lv_m, kappa=kappa, epsbar=epsbar)

    def apply(self, chi: jax.Array) -> jax.Array:
        e = jnp.asarray(2.0 * self.kappa * self.epsbar, chi.dtype)
        return jnp.stack([self.lv_p.apply(chi[0]) + e * chi[1],
                          self.lv_m.apply(chi[1]) + e * chi[0]])

    @staticmethod
    def _g5_tau1(chi):
        g5 = jnp.asarray(_G5_DIAG, chi.dtype).reshape(1, 1, 1, 4, 1, 1, 1, 1)
        return jnp.flip(chi, axis=0) * g5

    def apply_dagger(self, chi: jax.Array) -> jax.Array:
        # gamma5 tau1 Hermiticity: M^dag = (g5 tau1) M (g5 tau1)
        return self._g5_tau1(self.apply(self._g5_tau1(chi)))

    def normal(self, chi: jax.Array) -> jax.Array:
        return self.apply_dagger(self.apply(chi))
