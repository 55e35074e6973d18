"""Aggregation transfer operators: chirality-split block orthonormalization.

The TPU-native form of the reference's Transfer / BlockOrthogonalize /
prolongator / restrictor (`lib/transfer.cpp`, `block_orthogonalize.cu`,
`prolongator.cu`, `restrictor.cu` [U]; SURVEY.md C12b):

  - aggregates = geometric blocks (bt, bz, by, bx) of the level grid;
  - each of the n_vec near-null vectors is split into its two chirality
    components (doubling: 2 * n_vec coarse dof per aggregate — exact
    because g5 is diagonal at every level, level.py);
  - per (aggregate, chirality): orthonormalize the n_vec restricted
    vectors (QR) -> the prolongator P; R = P^dag.  R P = I by
    construction (tested).

P storage: [Tc, Zc, Yc, Xc, Bt*Bz*By*Bx*N, 2 * n_vec] — the dense
per-aggregate matrix (chirality sparsity kept as explicit zeros for
simple, MXU-friendly batched GEMM transfers).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.cplx import ceinsum


@dataclasses.dataclass(frozen=True)
class Transfer:
    dims_f: tuple[int, int, int, int]
    dims_c: tuple[int, int, int, int]
    block: tuple[int, int, int, int]
    n_f: int
    n_c: int                       # = 2 * n_vec
    p: jax.Array                   # [*dims_c, B*n_f, n_c]
    g5vec_c: np.ndarray            # coarse chirality signature [n_c]

    def _blockize(self, v: jax.Array) -> jax.Array:
        """[T,Z,Y,X,N] -> [Tc,Zc,Yc,Xc, B*N]"""
        T, Z, Y, X = self.dims_f
        bt, bz, by, bx = self.block
        Tc, Zc, Yc, Xc = self.dims_c
        v = v.reshape(Tc, bt, Zc, bz, Yc, by, Xc, bx, self.n_f)
        v = jnp.transpose(v, (0, 2, 4, 6, 1, 3, 5, 7, 8))
        return v.reshape(Tc, Zc, Yc, Xc, -1)

    def _unblockize(self, v: jax.Array) -> jax.Array:
        T, Z, Y, X = self.dims_f
        bt, bz, by, bx = self.block
        Tc, Zc, Yc, Xc = self.dims_c
        v = v.reshape(Tc, Zc, Yc, Xc, bt, bz, by, bx, self.n_f)
        v = jnp.transpose(v, (0, 4, 1, 5, 2, 6, 3, 7, 8))
        return v.reshape(T, Z, Y, X, self.n_f)

    def restrict(self, v: jax.Array) -> jax.Array:
        """fine [*dims_f, n_f] -> coarse [*dims_c, n_c]"""
        vb = self._blockize(v)
        return ceinsum("tzyxfc,tzyxf->tzyxc", jnp.conj(self.p), vb)

    def prolong(self, vc: jax.Array) -> jax.Array:
        vb = ceinsum("tzyxfc,tzyxc->tzyxf", self.p, vc)
        return self._unblockize(vb)


def setup_transfer(null_vecs: jax.Array, g5vec: np.ndarray,
                   block: tuple[int, int, int, int]) -> Transfer:
    """Build the transfer from near-null vectors.

    null_vecs: [n_vec, T, Z, Y, X, N].  Chirality doubling + per-aggregate
    QR (host-side numpy — setup path; complex QR is unavailable on the
    TPU backend).
    """
    n_vec, T, Z, Y, X, N = null_vecs.shape
    bt, bz, by, bx = block
    assert T % bt == 0 and Z % bz == 0 and Y % by == 0 and X % bx == 0
    dims_c = (T // bt, Z // bz, Y // by, X // bx)
    Bvol = bt * bz * by * bx
    n_c = 2 * n_vec

    # blockize all null vectors: [n_vec, *dims_c, B, N]
    v = np.asarray(null_vecs).reshape(n_vec, dims_c[0], bt, dims_c[1], bz,
                                      dims_c[2], by, dims_c[3], bx, N)
    v = v.transpose(0, 1, 3, 5, 7, 2, 4, 6, 8, 9)
    v = v.reshape(n_vec, *dims_c, Bvol, N)

    chir_masks = [(np.asarray(g5vec) > 0), (np.asarray(g5vec) < 0)]
    p = np.zeros((*dims_c, Bvol * N, n_c), dtype=v.dtype)
    for c, mask in enumerate(chir_masks):
        cols = v * mask[None, None, None, None, None, None, :]
        # [n_vec, *dims_c, Bvol*N] -> [*dims_c, Bvol*N, n_vec]
        cols = cols.reshape(n_vec, *dims_c, Bvol * N)
        cols = np.moveaxis(cols, 0, -1)
        q, _ = np.linalg.qr(cols)       # batched QR over aggregates
        p[..., c * n_vec:(c + 1) * n_vec] = q

    g5vec_c = np.concatenate([np.full(n_vec, +1.0, np.float32),
                              np.full(n_vec, -1.0, np.float32)])
    return Transfer(dims_f=(T, Z, Y, X), dims_c=dims_c, block=block,
                    n_f=N, n_c=n_c, p=jnp.asarray(p), g5vec_c=g5vec_c)
