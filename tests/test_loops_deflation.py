"""Disconnected loops (one-end identity, TSM, stochastic convergence) and
Lanczos deflation, all against dense oracles on 2^3 x 4."""
import jax
import jax.numpy as jnp
import numpy as np

from tpuqcd import su3
from tpuqcd.fields import apply_boundary_phase
from tpuqcd.gammas import GAMMA5, ID4, GAMMA
from tpuqcd.lattice import Lattice
from tpuqcd.operators import TMOperator
from tpuqcd.phys.loops import (loop_lowmode, loops_stochastic, loops_tsm,
                               z4_noise)
from tpuqcd.solvers.lanczos import (deflated_initial_guess, lanczos_lowest)
from tpuqcd.utils.dense import operator_to_dense

LAT = Lattice((2, 2, 2, 4))
KAPPA, MU = 0.11, 0.07
GAMMAS = {"one": ID4, "g5": GAMMA5, "gt": GAMMA[3]}
MOM = np.array([[0, 0, 0]])
_CACHE = {}


def _setup():
    if "u" in _CACHE:
        return _CACHE["u"], _CACHE["dense"]
    u = apply_boundary_phase(
        su3.random_gauge(jax.random.PRNGKey(6), LAT), LAT)
    dense = {}
    for nm, fl in (("u", +1), ("d", -1)):
        m = TMOperator(LAT, kappa=KAPPA, mu=MU, flavor=fl)
        u128 = u.astype(jnp.complex128)

        @jax.jit
        def ap(v, m=m, u128=u128):
            return m.apply(u128, v.reshape(*LAT.full_shape, 4, 3)).reshape(
                *LAT.full_shape, 12)
        dense[nm] = operator_to_dense(ap, LAT)
    _CACHE["u"], _CACHE["dense"] = u, dense
    return u, dense


def _site_diag(minv):
    """[V, 12, 12] site-diagonal blocks of a dense inverse."""
    V = LAT.volume
    m4 = minv.reshape(V, 12, V, 12)
    return m4[np.arange(V), :, np.arange(V), :]


def _exact_loop(minv, gam):
    """[T] exact sum_{x@t} Tr[O S(x,x)]."""
    o12 = np.kron(gam, np.eye(3))
    s_xx = _site_diag(minv)
    tr = np.einsum("ij,vji->v", o12, s_xx)
    return tr.reshape(LAT.Lt, -1).sum(axis=1)


def test_one_end_identity_exact():
    """S_d - S_u = 4 i kappa mu S_u g5 S_d and the (M M^dag)^{-1} form of
    the one-end estimator, checked densely."""
    u, dense = _setup()
    su_ = np.linalg.inv(dense["u"])
    sd_ = np.linalg.inv(dense["d"])
    g5_12 = np.kron(np.diag(np.real(np.diag(GAMMA5))), np.eye(3))
    g5_big = np.kron(np.eye(LAT.volume), g5_12)  # dense flattening is
    lhs = sd_ - su_                              # site-major, dof-minor
    rhs = 4j * KAPPA * MU * (su_ @ g5_big @ sd_)
    np.testing.assert_allclose(lhs, rhs, atol=1e-10)
    # estimator form: sum_x Tr[O(Sd-Su)(x,x)] = 4 i k mu
    #                 sum_x Tr[O g5 (M_d M_d^dag)^{-1}(x,x)]
    md = dense["d"]
    mmd_inv = np.linalg.inv(md @ md.conj().T)
    for name, gam in GAMMAS.items():
        want = _exact_loop(sd_, gam) - _exact_loop(su_, gam)
        o12 = np.kron(gam, np.eye(3)) @ g5_12
        got = 4j * KAPPA * MU * np.einsum(
            "ij,vji->v", o12, _site_diag(mmd_inv)).reshape(
                LAT.Lt, -1).sum(axis=1)
        np.testing.assert_allclose(got, want, atol=1e-10)


def test_stochastic_loops_converge():
    """Plain and one-end stochastic estimators approach the dense loops
    (many noises, loose statistical tolerance)."""
    u, dense = _setup()
    su_inv = np.linalg.inv(dense["u"])
    sd_inv = np.linalg.inv(dense["d"])

    def solve_u(b):
        x = su_inv @ np.asarray(b.astype(jnp.complex128)).reshape(-1)
        return jnp.asarray(x.reshape(*LAT.full_shape, 4, 3)
                           .astype(np.complex64))

    g5 = np.real(np.diag(GAMMA5))

    def solve_ddag(b):
        # (M_d^dag)^{-1} b = g5 M_u^{-1} g5 b
        gb = b * jnp.asarray(g5, b.dtype)[:, None]
        x = solve_u(gb)
        return x * jnp.asarray(g5, x.dtype)[:, None]

    keys = list(jax.random.split(jax.random.PRNGKey(3), 384))
    est = loops_stochastic(solve_u, keys, {"g5": GAMMA5}, LAT, MOM)
    want = _exact_loop(su_inv, GAMMA5)
    got = np.asarray(est["g5"])[0]
    # statistical check: the estimator noise per timeslice is O(1) per
    # noise vector; with N noises demand agreement within ~5 sigma
    sigma = 3.0 / np.sqrt(len(keys))
    assert np.abs(got - want).max() < 5 * sigma, (got, want, sigma)

    # one-end with COMPLETE dilution (noise = full dof basis): the
    # estimator is then deterministic and must equal the exact loop —
    # an exact check of every factor in loop_one_end
    from tpuqcd.phys.loops import loop_one_end
    acc = None
    dim = 12 * LAT.volume
    for k in range(dim):
        e = np.zeros(dim, np.complex64)
        e[k] = 1.0
        eta = jnp.asarray(e.reshape(*LAT.full_shape, 4, 3))
        psi = solve_ddag(eta)
        est = loop_one_end(psi, {"g5": GAMMA5}, LAT, MOM, KAPPA, MU)["g5"]
        acc = est if acc is None else acc + est
    want2 = _exact_loop(sd_inv, GAMMA5) - _exact_loop(su_inv, GAMMA5)
    np.testing.assert_allclose(np.asarray(acc)[0], want2, atol=2e-4)


def test_tsm_unbiased_identity():
    """TSM with identical key sets for cheap and corr reduces exactly to
    the full estimator (algebraic identity)."""
    u, dense = _setup()
    su_inv = np.linalg.inv(dense["u"])

    def solve_full(b):
        x = su_inv @ np.asarray(b.astype(jnp.complex128)).reshape(-1)
        return jnp.asarray(x.reshape(*LAT.full_shape, 4, 3)
                           .astype(np.complex64))

    def solve_cheap(b):   # crude truncation: one Jacobi-ish step
        return 0.5 * b

    keys = list(jax.random.split(jax.random.PRNGKey(4), 8))
    tsm = loops_tsm(solve_cheap, solve_full, keys, keys, {"g5": GAMMA5},
                    LAT, MOM)
    full = loops_stochastic(solve_full, keys, {"g5": GAMMA5}, LAT, MOM)
    np.testing.assert_allclose(np.asarray(tsm["g5"]),
                               np.asarray(full["g5"]), atol=1e-4)


def test_lanczos_vs_dense_and_deflation():
    """Lanczos lowest eigenpairs of M^dag M == dense eigh; deflated guess
    removes the low-mode residual components; low-mode loops match the
    dense spectral sum."""
    u, dense = _setup()
    m = dense["u"]
    a = m.conj().T @ m
    w_exact, v_exact = np.linalg.eigh(a)

    def apply_a(v):
        x = a @ np.asarray(v.astype(jnp.complex128)).reshape(-1)
        return jnp.asarray(x.reshape(*LAT.full_shape, 4, 3))

    v0 = jnp.asarray(np.random.default_rng(0).normal(
        size=(*LAT.full_shape, 4, 3))
        + 1j * np.random.default_rng(1).normal(size=(*LAT.full_shape, 4, 3)))
    # low modes cluster tightly; the Chebyshev filter separates them
    # (plain 70-step Lanczos only pins the lowest one)
    hi = float(w_exact[-1]) * 1.05
    cut = float(w_exact[6])
    evals, evecs = lanczos_lowest(apply_a, v0, n_ev=4, n_iter=30,
                                  filter_degree=24,
                                  filter_window=(cut, hi))
    np.testing.assert_allclose(evals, w_exact[:4], rtol=1e-5)

    # deflated initial guess solves the low-mode subspace exactly
    b = v0 / float(jnp.sqrt(jnp.vdot(v0, v0).real))
    x0 = deflated_initial_guess(evals, evecs, b)
    r = b - apply_a(x0)
    for lam, v in zip(evals, evecs):
        assert abs(complex(jnp.vdot(v, r))) < 1e-6

    # low-mode loops: eigenpairs of (M M^dag) reproduce the spectral part
    mm = m @ m.conj().T
    w_mm, v_mm = np.linalg.eigh(mm)
    n_low = 6
    evecs_mm = [jnp.asarray(v_mm[:, i].reshape(*LAT.full_shape, 4, 3))
                for i in range(n_low)]

    def apply_mdag(v):
        x = m.conj().T @ np.asarray(v.astype(jnp.complex128)).reshape(-1)
        return jnp.asarray(x.reshape(*LAT.full_shape, 4, 3))

    low = loop_lowmode(w_mm[:n_low], evecs_mm, apply_mdag,
                       {"g5": GAMMA5}, LAT, MOM)
    # dense spectral sum of the same n_low modes
    g5_12 = np.kron(np.diag(np.real(np.diag(GAMMA5))), np.eye(3))
    s_low = sum((1.0 / w_mm[i]) * np.outer(
        m.conj().T @ v_mm[:, i], v_mm[:, i].conj())
        for i in range(n_low))
    want = _exact_loop(s_low, GAMMA5)
    np.testing.assert_allclose(np.asarray(low["g5"])[0], want, atol=1e-8)
