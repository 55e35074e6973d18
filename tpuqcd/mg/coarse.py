"""Galerkin coarse-operator construction: A_c = R A P as explicit links.

TPU-native replacement of the reference's CoarseOp / coarse link
computation (`lib/coarse_op.cu(h)`, `coarsecoarse_op.cu` [U]; SURVEY.md
C12c), built by *colored probing* instead of hand-written UV-product
kernels: the coarse operator is exactly nearest-neighbor, so

  - forward links Y^+_mu: apply the level's single-direction forward hop
    to P e_k restricted to coarse sites of even/odd mu-coordinate, then
    restrict; contributions land cleanly on the opposite color class
    (intra-block terms land on the same class and are masked off).
  - backward links Y^-_mu: same with the backward hop.
  - diagonal X: R A P e_k on all sites minus the already-known link
    contributions (one full apply per coarse color).

Cost: (16 hop + 1 full) x n_c level applies — pure existing operator
code, no new stencils; runs under jit.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..lattice import AXIS_OF_MU
from .level import CoarseLevel
from .transfer import Transfer


def _coarse_coord_masks(dims_c):
    """per-direction mu-coordinate parity masks on the coarse grid."""
    t, z, y, x = np.ix_(*[np.arange(n) for n in dims_c])
    coords = (x, y, z, t)  # mu = 0..3 = x..t
    return [np.broadcast_to(coords[mu] % 2, dims_c) for mu in range(4)]


def build_coarse(level, transfer: Transfer) -> CoarseLevel:
    dims_c = transfer.dims_c
    n_c = transfer.n_c
    dtype = transfer.p.dtype

    mu_par = [jnp.asarray(m) for m in _coarse_coord_masks(dims_c)]

    def unit_coarse(k, mask=None):
        """coarse field = e_k on (masked) coarse sites."""
        v = jnp.zeros((*dims_c, n_c), dtype=dtype).at[..., k].set(1.0)
        if mask is not None:
            v = v * mask[..., None].astype(dtype)
        return v

    fwd = [[None] * n_c for _ in range(4)]
    bwd = [[None] * n_c for _ in range(4)]
    diag = [None] * n_c

    from functools import partial

    @partial(jax.jit, static_argnums=(0, 1))
    def probe_hop(mu, sign, k_onehot_masked):
        vf = transfer.prolong(k_onehot_masked)
        w = level.apply_hop(vf, mu, sign)
        return transfer.restrict(w)

    @jax.jit
    def probe_full(k_onehot):
        vf = transfer.prolong(k_onehot)
        return transfer.restrict(level.apply(vf))

    for k in range(n_c):
        for mu in range(4):
            cols_f = jnp.zeros((*dims_c, n_c), dtype=dtype)
            cols_b = jnp.zeros((*dims_c, n_c), dtype=dtype)
            for par in (0, 1):
                src = unit_coarse(k, mask=(mu_par[mu] == par))
                dst_mask = (mu_par[mu] == 1 - par)[..., None].astype(dtype)
                # forward hop: result site y receives from y+mu
                w = probe_hop(mu, +1, src)
                cols_f = cols_f + w * dst_mask
                w = probe_hop(mu, -1, src)
                cols_b = cols_b + w * dst_mask
            fwd[mu][k] = cols_f
            bwd[mu][k] = cols_b
        diag[k] = probe_full(unit_coarse(k))

    # assemble: links[mu][y][a, k]; diag currently contains X + sum of link
    # contributions (probe_full used unmasked e_k everywhere)
    links_fwd = jnp.stack(
        [jnp.stack(fwd[mu], axis=-1) for mu in range(4)])   # [4,*dims_c,n,n]
    links_bwd = jnp.stack(
        [jnp.stack(bwd[mu], axis=-1) for mu in range(4)])
    diag_m = jnp.stack(diag, axis=-1)
    for mu in range(4):
        diag_m = diag_m - links_fwd[mu] - links_bwd[mu]

    return CoarseLevel(dims=dims_c, n_=n_c, links_fwd=links_fwd,
                       links_bwd=links_bwd, diag=diag_m,
                       g5vec_=transfer.g5vec_c)
