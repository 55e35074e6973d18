"""Gamma algebra sanity (pins SURVEY.md Appendix A convention risks)."""
import numpy as np

from tpuqcd import gammas as g


def test_clifford_algebra():
    for mu in range(4):
        for nu in range(4):
            anti = g.GAMMA[mu] @ g.GAMMA[nu] + g.GAMMA[nu] @ g.GAMMA[mu]
            np.testing.assert_allclose(anti, 2 * (mu == nu) * np.eye(4),
                                       atol=1e-14)


def test_hermitian():
    for mu in range(4):
        np.testing.assert_allclose(g.GAMMA[mu], g.GAMMA[mu].conj().T,
                                   atol=1e-14)
    np.testing.assert_allclose(g.GAMMA5, g.GAMMA5.conj().T, atol=1e-14)


def test_gamma5_diagonal_and_squares_to_one():
    np.testing.assert_allclose(g.GAMMA5, np.diag(np.diag(g.GAMMA5)),
                               atol=1e-14)
    np.testing.assert_allclose(g.GAMMA5 @ g.GAMMA5, np.eye(4), atol=1e-14)
    d = np.real(np.diag(g.GAMMA5))
    assert sorted(d) == [-1, -1, 1, 1]


def test_gamma5_anticommutes():
    for mu in range(4):
        anti = g.GAMMA5 @ g.GAMMA[mu] + g.GAMMA[mu] @ g.GAMMA5
        np.testing.assert_allclose(anti, 0 * anti, atol=1e-14)


def test_projectors_rank2_and_factorization():
    for mu in range(4):
        for P, proj, recon in (
                (g.PROJ_MINUS[mu], g.HALF_PROJ_MINUS[mu], g.HALF_RECON_MINUS[mu]),
                (g.PROJ_PLUS[mu], g.HALF_PROJ_PLUS[mu], g.HALF_RECON_PLUS[mu])):
            assert np.linalg.matrix_rank(P) == 2
            np.testing.assert_allclose(recon @ proj, P, atol=1e-13)
            # idempotent/2: P^2 = 2P
            np.testing.assert_allclose(P @ P, 2 * P, atol=1e-13)


def test_sigma_antisymmetric():
    for mu in range(4):
        np.testing.assert_allclose(g.SIGMA_MUNU[mu, mu], 0 * g.ID4, atol=1e-14)
        for nu in range(4):
            np.testing.assert_allclose(g.SIGMA_MUNU[mu, nu],
                                       -g.SIGMA_MUNU[nu, mu], atol=1e-14)


def test_epsilon():
    assert g.EPS3[0, 1, 2] == 1 and g.EPS3[2, 1, 0] == -1
    assert np.count_nonzero(g.EPS3) == 6
