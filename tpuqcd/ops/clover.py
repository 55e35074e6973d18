"""Clover term: field strength, chiral-block assembly, apply, inverse.

TPU-native equivalent of reference `lib/clover_field.cpp`,
`clover_quda.cu`, `clover_invert.cu` [U]; SURVEY.md C4.

Conventions (documented per SURVEY.md Appendix A):
  F_mu_nu(x) = (Q_mu_nu - Q_mu_nu^dag) / (8 i)   (Hermitian, antisym in
  mu<->nu), where Q is the sum of the four plaquette leaves around x.
  Clover site matrix A(x) = 1 + c_sw kappa Sum_{mu<nu} sigma_mu_nu (x)
  F_mu_nu(x), Hermitian, block-diagonal in chirality (sigma commutes
  with the diagonal gamma5), stored as two 6x6 blocks per site:

      A_blocks [2(parity), 2(chirality), 6, 6, T, Z, S] complex,
      row/col index = 2*color + ... no: index = spin_in_block * 3 + color.

  TM-clover even-odd needs (A + 2 i kappa mu f gamma5)^{-1} on the odd
  parity: per chirality block that is (A_chir +- 2 i kappa mu f)^{-1},
  computed once per gauge load (host numpy batch inverse).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..gammas import SIGMA_MUNU, GAMMA5
from ..lattice import Lattice
from . import mat3
from .shifts import link_at

#: chirality spin groups from the diagonal gamma5
_G5D = np.real(np.diag(GAMMA5))
CHIR_SPINS = (tuple(int(s) for s in np.where(_G5D > 0)[0]),
              tuple(int(s) for s in np.where(_G5D < 0)[0]))
#: gamma5 eigenvalue per chirality block
CHIR_SIGN = (+1.0, -1.0)


def field_strength(u_dev: jax.Array, mu: int, nu: int, p: int,
                   lat: Lattice) -> jax.Array:
    """Hermitian clover-leaf F_mu_nu at parity-p sites: [3, 3, T, Z, S]."""
    # leaf 1: U_mu(x) U_nu(x+mu) U_mu(x+nu)^dag U_nu(x)^dag
    q1 = mat3.mul(u_dev[mu, p], link_at(u_dev, nu, p, [(mu, +1)], lat))
    q1 = mat3.mul(q1, link_at(u_dev, mu, p, [(nu, +1)], lat), bdag=True)
    q1 = mat3.mul(q1, u_dev[nu, p], bdag=True)
    # leaf 2: U_nu(x) U_mu(x+nu-mu)^dag U_nu(x-mu)^dag U_mu(x-mu)
    q2 = mat3.mul(u_dev[nu, p],
                  mat3.dag(link_at(u_dev, mu, p, [(nu, +1), (mu, -1)], lat)))
    q2 = mat3.mul(q2, link_at(u_dev, nu, p, [(mu, -1)], lat), bdag=True)
    q2 = mat3.mul(q2, link_at(u_dev, mu, p, [(mu, -1)], lat))
    # leaf 3: U_mu(x-mu)^dag U_nu(x-mu-nu)^dag U_mu(x-mu-nu) U_nu(x-nu)
    q3 = mat3.mul(mat3.dag(link_at(u_dev, mu, p, [(mu, -1)], lat)),
                  mat3.dag(link_at(u_dev, nu, p, [(mu, -1), (nu, -1)], lat)))
    q3 = mat3.mul(q3, link_at(u_dev, mu, p, [(mu, -1), (nu, -1)], lat))
    q3 = mat3.mul(q3, link_at(u_dev, nu, p, [(nu, -1)], lat))
    # leaf 4: U_nu(x-nu)^dag U_mu(x-nu) U_nu(x-nu+mu) U_mu(x)^dag
    q4 = mat3.mul(mat3.dag(link_at(u_dev, nu, p, [(nu, -1)], lat)),
                  link_at(u_dev, mu, p, [(nu, -1)], lat))
    q4 = mat3.mul(q4, link_at(u_dev, nu, p, [(nu, -1), (mu, +1)], lat))
    q4 = mat3.mul(q4, u_dev[mu, p], bdag=True)
    q = q1 + q2 + q3 + q4
    return (q - mat3.dag(q)) / 8j


def clover_blocks(u_dev: jax.Array, lat: Lattice, kappa: float,
                  csw: float) -> jax.Array:
    """A(x) as chiral blocks: [2(par), 2(chir), 6, 6, T, Z, S] complex."""
    shape_site = u_dev.shape[-3:]
    dtype = u_dev.dtype
    blocks = [[None, None], [None, None]]
    for p in (0, 1):
        # accumulate sigma x F over mu<nu
        acc = [jnp.zeros((6, 6, *shape_site), dtype=dtype) for _ in range(2)]
        for mu in range(4):
            for nu in range(mu + 1, 4):
                f = field_strength(u_dev, mu, nu, p, lat)
                sig = SIGMA_MUNU[mu, nu]
                for c, spins in enumerate(CHIR_SPINS):
                    for a_i, sa in enumerate(spins):
                        for b_i, sb in enumerate(spins):
                            coef = sig[sa, sb]
                            if coef == 0:
                                continue
                            cc = jnp.asarray(coef, dtype=dtype)
                            blk = acc[c]
                            upd = cc * f  # [3,3,site]
                            blk = blk.at[3 * a_i:3 * a_i + 3,
                                         3 * b_i:3 * b_i + 3].add(upd)
                            acc[c] = blk
        for c in range(2):
            eye = jnp.eye(6, dtype=dtype).reshape(
                6, 6, *([1] * len(shape_site)))
            blocks[p][c] = eye + (csw * kappa) * acc[c]
    return jnp.stack([jnp.stack(bp) for bp in blocks])


def clover_twist_inverse(a_blocks: jax.Array, kappa: float, mu: float,
                         flavor: int, parity: int) -> jax.Array:
    """(A + 2 i kappa mu f gamma5)^{-1} on one parity.

    a_blocks: output of clover_blocks.  Returns [2(chir), 6, 6, T, Z, S].
    One-time setup cost: batch-inverted on the host (numpy) — the 6x6
    trailing layout never touches the TPU (tile-padding trap).
    """
    t = 2.0 * kappa * mu * flavor
    out = []
    for c in range(2):
        blk = np.asarray(a_blocks[parity, c])          # [6,6,T,Z,S]
        site_shape = blk.shape[2:]
        m = blk.reshape(6, 6, -1).transpose(2, 0, 1)   # [N,6,6]
        m = m + 1j * t * CHIR_SIGN[c] * np.eye(6)
        minv = np.linalg.inv(m)
        minv = minv.transpose(1, 2, 0).reshape(6, 6, *site_shape)
        out.append(jnp.asarray(minv, dtype=a_blocks.dtype))
    return jnp.stack(out)


def clover_apply(blocks_p: jax.Array, psi: jax.Array) -> jax.Array:
    """Apply site-local chiral blocks to a device-layout spinor.

    blocks_p: [2(chir), 6, 6, T, Z, S]; psi: [4, 3, T, Z, S].
    Unrolled 6x6 mat-vec per chirality on leading axes.
    """
    out = [[None] * 3 for _ in range(4)]
    for c, spins in enumerate(CHIR_SPINS):
        comps = [psi[s, j] for s in spins for j in range(3)]  # 6 of [T,Z,S]
        for i in range(6):
            acc = None
            for k in range(6):
                t = blocks_p[c, i, k] * comps[k]
                acc = t if acc is None else acc + t
            out[spins[i // 3]][i % 3] = acc
    return jnp.stack([jnp.stack(row) for row in out])


def clover_apply_pk(cl_pk: jax.Array, psi_pk: jax.Array) -> jax.Array:
    """Apply packed chiral clover blocks to a packed-real spinor.

    cl_pk: [2(ri), 2(chir), 6, 6, T, Z, S] (utils.packed.pack_clover);
    psi_pk: [2(ri), 4, 3, T, Z, S] any float dtype (f64 for the
    high-precision defect-correction operator — f32 block entries promote
    exactly).  Unrolled 6x6 complex mat-vec per chirality.
    """
    out_r = [[None] * 3 for _ in range(4)]
    out_i = [[None] * 3 for _ in range(4)]
    for c, spins in enumerate(CHIR_SPINS):
        comps = [(psi_pk[0, s, j], psi_pk[1, s, j])
                 for s in spins for j in range(3)]
        for i in range(6):
            ar = None
            ai = None
            for k in range(6):
                br, bi = comps[k]
                mr = cl_pk[0, c, i, k]
                mi = cl_pk[1, c, i, k]
                tr = mr * br - mi * bi
                ti = mr * bi + mi * br
                ar = tr if ar is None else ar + tr
                ai = ti if ai is None else ai + ti
            out_r[spins[i // 3]][i % 3] = ar
            out_i[spins[i // 3]][i % 3] = ai
    return jnp.stack([jnp.stack([jnp.stack(row) for row in out_r]),
                      jnp.stack([jnp.stack(row) for row in out_i])])
