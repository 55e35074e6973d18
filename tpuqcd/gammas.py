"""Euclidean gamma-matrix algebra in the DeGrand-Rossi basis.

This pins down convention risk #1 of SURVEY.md Appendix A. We use the
DeGrand-Rossi basis (the QUDA-internal basis; cf. reference
`include/quda_matrix.h` / `lib/dslash_core` conventions [U]): Hermitian
Euclidean gammas with {gamma_mu, gamma_nu} = 2 delta_{mu,nu}, and

    gamma5 := gamma_x gamma_y gamma_z gamma_t = diag(-1, -1, +1, +1)

(verified numerically in tests/test_gammas.py). Axis order throughout the
package is mu = (x, y, z, t) = (0, 1, 2, 3); array axis order of fields is
[t, z, y, x] (t slowest) but *direction* indices always use mu=0..3 = x..t.

All constants here are plain numpy (complex128) — they are tiny tables baked
into jitted code as literals; precision of the tables themselves is free.
"""
from __future__ import annotations

import numpy as np

_i = 1j

# DeGrand-Rossi gamma matrices, rows/cols are spin indices 0..3.
GAMMA_X = np.array(
    [[0, 0, 0, _i],
     [0, 0, _i, 0],
     [0, -_i, 0, 0],
     [-_i, 0, 0, 0]], dtype=np.complex128)

GAMMA_Y = np.array(
    [[0, 0, 0, -1],
     [0, 0, 1, 0],
     [0, 1, 0, 0],
     [-1, 0, 0, 0]], dtype=np.complex128)

GAMMA_Z = np.array(
    [[0, 0, _i, 0],
     [0, 0, 0, -_i],
     [-_i, 0, 0, 0],
     [0, _i, 0, 0]], dtype=np.complex128)

GAMMA_T = np.array(
    [[0, 0, 1, 0],
     [0, 0, 0, 1],
     [1, 0, 0, 0],
     [0, 1, 0, 0]], dtype=np.complex128)

#: gamma[mu] for mu = 0..3 = (x, y, z, t)
GAMMA = np.stack([GAMMA_X, GAMMA_Y, GAMMA_Z, GAMMA_T])

#: gamma5 = gx gy gz gt  (diagonal in this basis)
GAMMA5 = GAMMA_X @ GAMMA_Y @ GAMMA_Z @ GAMMA_T

ID4 = np.eye(4, dtype=np.complex128)

#: Wilson projectors P^-_mu = (1 - gamma_mu), P^+_mu = (1 + gamma_mu).
#: NOTE: *not* halved — the conventional Dslash uses (1 -+ gamma_mu) directly
#: and the factor 1/2 is absorbed into kappa. Rank-2 each.
PROJ_MINUS = np.stack([ID4 - GAMMA[mu] for mu in range(4)])
PROJ_PLUS = np.stack([ID4 + GAMMA[mu] for mu in range(4)])

#: sigma_{mu,nu} = (i/2)[gamma_mu, gamma_nu] — used by the clover term.
SIGMA_MUNU = np.zeros((4, 4, 4, 4), dtype=np.complex128)
for _mu in range(4):
    for _nu in range(4):
        SIGMA_MUNU[_mu, _nu] = (0.5j) * (
            GAMMA[_mu] @ GAMMA[_nu] - GAMMA[_nu] @ GAMMA[_mu])

# --- half-spinor factorizations -------------------------------------------
# Each projector (1 +- gamma_mu) has rank 2 and factors as
# (1 +- gamma_mu) = recon[4,2] @ proj[2,4] ("spin projection trick",
# reference lib/dslash_core/* [U]): project 4-spinor -> 2-spinor, one SU(3)
# multiply per half-spinor, then reconstruct.  The tables below are the
# exact DeGrand-Rossi forms — every coefficient is 0, +-1 or +-i, so
# unrolled kernels pay no general complex multiplies for the spin algebra.
# Verified against (1 +- gamma) in tests/test_gammas.py.

def _hp(rows):
    return np.array(rows, dtype=np.complex128)


HALF_PROJ_MINUS = np.stack([  # proj for (1 - gamma_mu)
    _hp([[1, 0, 0, -_i], [0, 1, -_i, 0]]),      # x: h=(p0-i p3, p1-i p2)
    _hp([[1, 0, 0, 1], [0, 1, -1, 0]]),         # y
    _hp([[1, 0, -_i, 0], [0, 1, 0, _i]]),       # z
    _hp([[1, 0, -1, 0], [0, 1, 0, -1]]),        # t
])
HALF_RECON_MINUS = np.stack([  # recon: rows 2,3 from h
    _hp([[1, 0], [0, 1], [0, _i], [_i, 0]]),    # x
    _hp([[1, 0], [0, 1], [0, -1], [1, 0]]),     # y
    _hp([[1, 0], [0, 1], [_i, 0], [0, -_i]]),   # z
    _hp([[1, 0], [0, 1], [-1, 0], [0, -1]]),    # t
])
HALF_PROJ_PLUS = np.stack([  # proj for (1 + gamma_mu)
    _hp([[1, 0, 0, _i], [0, 1, _i, 0]]),
    _hp([[1, 0, 0, -1], [0, 1, 1, 0]]),
    _hp([[1, 0, _i, 0], [0, 1, 0, -_i]]),
    _hp([[1, 0, 1, 0], [0, 1, 0, 1]]),
])
HALF_RECON_PLUS = np.stack([
    _hp([[1, 0], [0, 1], [0, -_i], [-_i, 0]]),
    _hp([[1, 0], [0, 1], [0, 1], [-1, 0]]),
    _hp([[1, 0], [0, 1], [-_i, 0], [0, _i]]),
    _hp([[1, 0], [0, 1], [1, 0], [0, 1]]),
])

# --- contraction tables ----------------------------------------------------
#: charge conjugation C = gamma_y gamma_t (DeGrand-Rossi); C gamma5 appears in
#: the standard nucleon interpolating operator.
CMAT = GAMMA_Y @ GAMMA_T
CGAMMA5 = CMAT @ GAMMA5

#: positive/negative parity projectors (1 +- gamma_t)/2 for baryon 2pt.
PARITY_PLUS = 0.5 * (ID4 + GAMMA_T)
PARITY_MINUS = 0.5 * (ID4 - GAMMA_T)

#: baryon spin projectors for the 2pt/3pt programs (reference QKXTM
#: projector set [U] WhatProjector: G4 unpolarized, G5G1/G5G2/G5G3
#: polarized — the polarized ones feed the axial/tensor form-factor
#: channels): P5k = (1 + gamma_t)/2 . i gamma_5 gamma_k (the two
#: factors commute).
PROJECTORS = {
    "P+": PARITY_PLUS,
    "P-": PARITY_MINUS,
    "P5x": PARITY_PLUS @ (1j * GAMMA5 @ GAMMA_X),
    "P5y": PARITY_PLUS @ (1j * GAMMA5 @ GAMMA_Y),
    "P5z": PARITY_PLUS @ (1j * GAMMA5 @ GAMMA_Z),
}

#: Levi-Civita epsilon_{abc} for color contractions.
EPS3 = np.zeros((3, 3, 3))
for _a, _b, _c, _s in ((0, 1, 2, 1), (1, 2, 0, 1), (2, 0, 1, 1),
                       (0, 2, 1, -1), (2, 1, 0, -1), (1, 0, 2, -1)):
    EPS3[_a, _b, _c] = _s

#: the 16 ultra-local insertion gamma structures for loops / 3pt:
#: S=1, P=g5, V=g_mu, A=g5 g_mu, T=sigma_{mu<nu}
INSERTION_GAMMAS = {
    "1": ID4,
    "g5": GAMMA5,
    "gx": GAMMA_X, "gy": GAMMA_Y, "gz": GAMMA_Z, "gt": GAMMA_T,
    "g5gx": GAMMA5 @ GAMMA_X, "g5gy": GAMMA5 @ GAMMA_Y,
    "g5gz": GAMMA5 @ GAMMA_Z, "g5gt": GAMMA5 @ GAMMA_T,
    "sxy": SIGMA_MUNU[0, 1], "sxz": SIGMA_MUNU[0, 2],
    "sxt": SIGMA_MUNU[0, 3], "syz": SIGMA_MUNU[1, 2],
    "syt": SIGMA_MUNU[1, 3], "szt": SIGMA_MUNU[2, 3],
}

#: named meson interpolator channels (reference QKXTM "ten mesons"
#: two-point set [U] contractions_2pt; SURVEY.md C23): the correlator
#: is -Tr[Gamma S Gammabar g5 S^dag g5] with the SAME Gamma at source
#: and sink, so the table maps physical channel names to that Gamma.
MESON_CHANNELS = {
    "a0": ID4,                       # scalar
    "pion": GAMMA5,                  # pseudoscalar (pi+)
    "pion_g4": GAMMA_T @ GAMMA5,     # alt pseudoscalar interpolator
    "b0": GAMMA_T,                   # gamma_4 channel
    "rho_x": GAMMA_X, "rho_y": GAMMA_Y, "rho_z": GAMMA_Z,   # vector
    "a1_x": GAMMA5 @ GAMMA_X,        # axial vector
    "a1_y": GAMMA5 @ GAMMA_Y,
    "a1_z": GAMMA5 @ GAMMA_Z,
}
