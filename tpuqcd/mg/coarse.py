"""Galerkin coarse-operator construction: A_c = R A P as explicit links.

TPU-native replacement of the reference's CoarseOp / coarse link
computation (`lib/coarse_op.cu(h)`, `coarsecoarse_op.cu` [U]; SURVEY.md
C12c), built by *colored probing* instead of hand-written UV-product
kernels: the coarse operator is exactly nearest-neighbor, so

  - forward links Y^+_mu: apply the level's single-direction forward hop
    to P e_k restricted to one distance-1 color class of the coarse
    grid, then restrict; contributions land cleanly on other color
    classes (intra-block terms land on the same class and are masked
    off) — valid in all four directions at once, including across the
    periodic wrap at odd coarse extents (see _coarse_colors).
  - backward links Y^-_mu: same with the backward hop.
  - diagonal X: R A P e_k on all sites minus the already-known link
    contributions (one full apply per coarse color).

Cost: (n_colors x 8 hop + 1 full) x n_c level applies — pure existing
operator code, no new stencils; runs under jit.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..lattice import AXIS_OF_MU
from .level import CoarseLevel
from .transfer import Transfer


def _coarse_colors(dims_c):
    """Distance-1 coloring of the periodic coarse grid (host twin of
    mg/device._coarse_colors — see its docstring for the derivation).

    Per-dim colors alternate 0/1 with the LAST site of an odd extent
    (> 1) recolored 2 — plain coordinate parity is INVALID across the
    periodic wrap at odd extents (first/last sites share parity but are
    neighbors), which silently dropped the wrap-link columns into the
    diagonal.  Global color = per-dim sum mod 3 (mod 2 when no dim is
    odd); extent-1 dims contribute 0, folding their self-wrap hop into
    the diagonal, where a self-coupling belongs.
    """
    def dim_color(n):
        c = np.arange(n) % 2
        if n % 2 and n > 1:
            c[n - 1] = 2
        return c

    n_col = 3 if any(n % 2 and n > 1 for n in dims_c) else 2
    t, z, y, x = np.ix_(*[dim_color(n) for n in dims_c])
    return (t + z + y + x) % n_col, n_col


def build_coarse(level, transfer: Transfer) -> CoarseLevel:
    dims_c = transfer.dims_c
    n_c = transfer.n_c
    dtype = transfer.p.dtype

    colors_np, n_col = _coarse_colors(dims_c)
    colors = jnp.asarray(colors_np)

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
        cols_f = [jnp.zeros((*dims_c, n_c), dtype=dtype) for _ in range(4)]
        cols_b = [jnp.zeros((*dims_c, n_c), dtype=dtype) for _ in range(4)]
        for c in range(n_col):
            # one color-masked source feeds all 8 legs: every hop from a
            # color-c block lands on a differently-colored block, so the
            # dst mask separates link from intra-block (diagonal) terms
            # in ANY direction simultaneously
            src = unit_coarse(k, mask=(colors == c))
            dst_mask = (colors != c)[..., None].astype(dtype)
            for mu in range(4):
                # forward hop: result site y receives from y+mu
                w = probe_hop(mu, +1, src)
                cols_f[mu] = cols_f[mu] + w * dst_mask
                w = probe_hop(mu, -1, src)
                cols_b[mu] = cols_b[mu] + w * dst_mask
        for mu in range(4):
            fwd[mu][k] = cols_f[mu]
            bwd[mu][k] = cols_b[mu]
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
