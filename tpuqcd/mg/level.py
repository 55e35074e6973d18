"""Generic MG level: lattice fields [T, Z, Y, X, N] + operator interface.

The adaptive-MG machinery (transfer.py, coarse.py, vcycle.py) is written
once against this interface and applied recursively — the TPU-native
restructuring of the reference's Dirac/DiracCoarse split
(`lib/multigrid.cpp`, `dirac_coarse.cpp` [U]; SURVEY.md C12):

  - a *level* owns fields shaped [T, Z, Y, X, N] (N = internal dof: 12 =
    4 spin x 3 color on the fine level, 2 * n_vec on coarse levels),
  - a diagonal gamma5 signature ``g5vec`` [N] of +-1 (chirality is exact
    block structure at every level because the prolongator preserves it),
  - the operator exposes ``apply`` (full M), per-direction hops
    ``apply_hop(mu, sign)`` and the local term ``apply_diag`` — the split
    needed by the colored-probing Galerkin construction in coarse.py.

The fine level wraps the twisted-mass(-clover) operator by flattening
(spin, color) -> N=12; coarse levels are explicit nearest-neighbor
stencils with dense links (coarse.py).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..utils.cplx import ceinsum
import numpy as np

from ..gammas import GAMMA5, PROJ_MINUS, PROJ_PLUS
from ..lattice import Lattice


@dataclasses.dataclass(frozen=True)
class FineTMLevel:
    """Level-0 wrapper around the full twisted-mass operator.

    Fields [T, Z, Y, X, 12] complex (12 = spin-major, color-minor), full
    (unpreconditioned) operator M = 1 + 2 i kappa mu g5 - kappa D on the
    *full* lattice — QUDA-MG coarsens the full operator and solves the
    full system with MG-preconditioned GCR ([U] interface_quda.cpp
    direct-solve path; SURVEY.md §4.3).
    """
    lat: Lattice
    u: jax.Array              # full-layout gauge [4, T, Z, Y, X, 3, 3]
    kappa: float
    mu: float = 0.0
    flavor: int = +1

    @property
    def dims(self):
        return self.lat.full_shape

    @property
    def n(self) -> int:
        return 12

    @property
    def g5vec(self) -> np.ndarray:
        return np.repeat(np.real(np.diag(GAMMA5)), 3).astype(np.float32)

    def _to_sc(self, v):
        return v.reshape(*self.dims, 4, 3)

    def _from_sc(self, v):
        return v.reshape(*self.dims, 12)

    def apply(self, v: jax.Array) -> jax.Array:
        from ..ops.dslash_ref import dslash_full
        from ..operators import twist_apply
        psi = self._to_sc(v)
        out = twist_apply(psi, self.kappa, self.mu, self.flavor) \
            - self.kappa * dslash_full(self.u, psi)
        return self._from_sc(out)

    def apply_diag(self, v: jax.Array) -> jax.Array:
        from ..operators import twist_apply
        return self._from_sc(twist_apply(self._to_sc(v), self.kappa,
                                         self.mu, self.flavor))

    def apply_hop(self, v: jax.Array, mu: int, sign: int) -> jax.Array:
        """The single-direction hop term of M (including the -kappa):

        sign=+1: -kappa (1 - g_mu) U_mu(x) psi(x + mu)
        sign=-1: -kappa (1 + g_mu) U_mu(x - mu)^dag psi(x - mu)
        """
        from ..lattice import AXIS_OF_MU
        psi = self._to_sc(v)
        ax = AXIS_OF_MU[mu]
        if sign == +1:
            pm = jnp.asarray(PROJ_MINUS[mu], dtype=psi.dtype)
            nb = jnp.roll(psi, -1, axis=ax)
            upsi = ceinsum("tzyxij,tzyxbj->tzyxbi", self.u[mu], nb)
            out = ceinsum("ab,tzyxbi->tzyxai", jnp.asarray(pm), upsi)
        else:
            pp = jnp.asarray(PROJ_PLUS[mu], dtype=psi.dtype)
            upsi = ceinsum("tzyxji,tzyxbj->tzyxbi",
                           jnp.conj(self.u[mu]), psi)
            g = ceinsum("ab,tzyxbi->tzyxai", jnp.asarray(pp), upsi)
            out = jnp.roll(g, +1, axis=ax)
        return self._from_sc(-self.kappa * out)

    def with_mu(self, mu: float) -> "FineTMLevel":
        return dataclasses.replace(self, mu=mu)


@dataclasses.dataclass(frozen=True)
class CoarseLevel:
    """Nearest-neighbor operator with dense links on a coarse grid.

    links_fwd/bwd: [4(mu), T, Z, Y, X, N, N]; diag: [T, Z, Y, X, N, N].
    (A psi)(y) = diag[y] psi(y) + sum_mu fwd[mu][y] psi(y+mu)
                 + bwd[mu][y] psi(y-mu).
    The coarse "Dslash" is a batched dense mat-vec — MXU work
    (SURVEY.md C12 TPU equiv).
    """
    dims: tuple[int, int, int, int]
    n_: int
    links_fwd: jax.Array
    links_bwd: jax.Array
    diag: jax.Array
    g5vec_: np.ndarray

    @property
    def n(self) -> int:
        return self.n_

    @property
    def g5vec(self) -> np.ndarray:
        return self.g5vec_

    def apply(self, v: jax.Array) -> jax.Array:
        out = self.apply_diag(v)
        for mu in range(4):
            out = out + self.apply_hop(v, mu, +1) + self.apply_hop(v, mu, -1)
        return out

    def apply_diag(self, v: jax.Array) -> jax.Array:
        return ceinsum("tzyxab,tzyxb->tzyxa", self.diag, v)

    def apply_hop(self, v: jax.Array, mu: int, sign: int) -> jax.Array:
        from ..lattice import AXIS_OF_MU
        ax = AXIS_OF_MU[mu]
        if sign == +1:
            nb = jnp.roll(v, -1, axis=ax)
            return ceinsum("tzyxab,tzyxb->tzyxa", self.links_fwd[mu], nb)
        nb = jnp.roll(v, +1, axis=ax)
        return ceinsum("tzyxab,tzyxb->tzyxa", self.links_bwd[mu], nb)

    def boosted(self, delta_mu_term: float) -> "CoarseLevel":
        """mu-boost (SURVEY.md §4.3): add i * delta * g5_c to the diagonal
        — the twisted-mass coarse-grid stabilization of
        arXiv:1710.06198."""
        g5 = jnp.asarray(self.g5vec_, dtype=self.diag.dtype)
        eye = jnp.eye(self.n_, dtype=self.diag.dtype)
        boost = (1j * delta_mu_term) * (eye * g5[None, :])
        return dataclasses.replace(self, diag=self.diag + boost)
