"""Disconnected loops (one-end identity, TSM, stochastic convergence) and
Lanczos deflation, all against dense oracles on 2^3 x 4."""
import jax
import jax.numpy as jnp
import pytest
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


def _full_c_to_mgpk(v_full):
    """[T,Z,Y,X,4,3] complex -> packed [2ri, 2par, 4, 3, T, Z, S] f32."""
    from tpuqcd.fields import full_to_eo
    from tpuqcd.ops.layout import spinor_to_device
    dev = spinor_to_device(full_to_eo(v_full, LAT), LAT)
    return jnp.stack([jnp.real(dev), jnp.imag(dev)]).astype(jnp.float32)


def _mgpk_to_full_c(v_pk):
    from tpuqcd.fields import eo_to_full
    from tpuqcd.ops.layout import spinor_from_device
    c = jax.lax.complex(v_pk[0], v_pk[1])      # [2par, 4, 3, T, Z, S]
    return eo_to_full(spinor_from_device(c, LAT), LAT)


@pytest.mark.slow
def test_lanczos_pk_vs_dense():
    """Packed-real Lanczos (TPU-layout deflation path, SURVEY.md C27) on
    A = M_d M_d^dag matches the dense spectrum, and the returned basis
    is orthonormal to f32 precision."""
    from tpuqcd.fields import gauge_full_to_eo
    from tpuqcd.mg.device import DeviceFineLevel
    from tpuqcd.ops.layout import gauge_to_device
    from tpuqcd.utils.packed import pack_gauge
    from tpuqcd.solvers.lanczos import lanczos_lowest_pk

    u, dense = _setup()
    u_pk = pack_gauge(gauge_to_device(gauge_full_to_eo(u, LAT), LAT))
    lv_p = DeviceFineLevel(LAT, u_pk.astype(jnp.float32), KAPPA, MU, +1,
                           backend="xla")
    g5 = jnp.asarray(np.real(np.diag(GAMMA5)),
                     jnp.float32).reshape(1, 1, 4, 1, 1, 1, 1)

    def apply_a(v):           # M_d M_d^dag v; M_d^dag = g5 M_u g5
        w = g5 * lv_p.apply(g5 * v)
        lv_m = DeviceFineLevel(LAT, lv_p.u_pk, KAPPA, MU, -1,
                               backend="xla")
        return lv_m.apply(w)

    m = dense["d"]
    a = m @ m.conj().T
    w_exact = np.linalg.eigvalsh(a)
    v0 = jax.random.normal(jax.random.PRNGKey(2),
                           (2, 2, 4, 3, LAT.Lt, LAT.Lz,
                            LAT.Ly * LAT.Lx // 2), jnp.float32)
    hi = float(w_exact[-1]) * 1.05
    cut = float(w_exact[6])
    evals, evecs = lanczos_lowest_pk(apply_a, v0, n_ev=4, n_iter=30,
                                     filter_degree=24,
                                     filter_window=(cut, hi))
    np.testing.assert_allclose(evals, w_exact[:4], rtol=2e-4)
    # orthonormality of the packed basis
    for i in range(4):
        for j in range(4):
            vi, vj = evecs[i], evecs[j]
            cr = float(jnp.sum(vi[0] * vj[0] + vi[1] * vj[1]))
            ci = float(jnp.sum(vi[0] * vj[1] - vi[1] * vj[0]))
            want = 1.0 if i == j else 0.0
            assert abs(cr - want) < 1e-5 and abs(ci) < 1e-5, (i, j)
    # eigen-residual |A v - lam v| small relative to lam
    for lam, v in zip(evals, evecs):
        r = apply_a(v) - jnp.asarray(lam, jnp.float32) * v
        rn = float(jnp.sqrt(jnp.sum(jnp.square(r))))
        assert rn < 5e-3 * max(lam, 1.0), (lam, rn)


def _solver_layout_to_full(b_pk):
    """packed solver layout [2par, 2ri, 4, 3, T, Z, S] -> complex full."""
    from tpuqcd.fields import eo_to_full
    from tpuqcd.ops.layout import spinor_from_device
    c = jax.lax.complex(b_pk[:, 0], b_pk[:, 1])
    return eo_to_full(spinor_from_device(c, LAT), LAT)


def _full_to_solver_layout(v):
    from tpuqcd.fields import full_to_eo
    from tpuqcd.ops.layout import spinor_to_device
    dev = spinor_to_device(full_to_eo(v, LAT), LAT)
    return jnp.stack([jnp.real(dev), jnp.imag(dev)],
                     axis=1).astype(jnp.float32)


def _rand_orthonormal_basis(n):
    rng = np.random.default_rng(7)
    vs = rng.normal(size=(n, LAT.volume * 12)) \
        + 1j * rng.normal(size=(n, LAT.volume * 12))
    q, _ = np.linalg.qr(vs.T)
    return [jnp.asarray(q[:, i].reshape(*LAT.full_shape, 4, 3)
                        .astype(np.complex64)) for i in range(n)]


def _dense_solve_ddag(su_inv):
    g5 = np.real(np.diag(GAMMA5))

    def solve_ddag(b):
        gb = b * jnp.asarray(g5, b.dtype)[:, None]
        x = su_inv @ np.asarray(gb.astype(jnp.complex128)).reshape(-1)
        x = jnp.asarray(x.reshape(*LAT.full_shape, 4, 3)
                        .astype(np.complex64))
        return x * jnp.asarray(g5, x.dtype)[:, None]

    return solve_ddag


def test_oneend_lowmode_exact_matches_dense():
    """ADVICE r1 fix: the exact low-mode one-end part computed by
    oneend_lowmode_exact must equal the dense expectation removed by
    deflating the noise with an ARBITRARY orthonormal basis:

      E[deflated] = 4ik mu tr(W (M_d^dag)^{-1} Q M_d^{-1}),  Q = 1-VV^dag
      exact part  = E[full] - E[deflated] = sum_i w_i^dag W w_i,
                    w_i = (M_d^dag)^{-1} v_i,

    so stochastic + exact parts are unbiased by construction."""
    from tpuqcd.phys.loops import oneend_lowmode_exact
    u, dense = _setup()
    su_inv = np.linalg.inv(dense["u"])
    md = dense["d"]
    evecs = _rand_orthonormal_basis(3)
    V = np.stack([np.asarray(v.astype(jnp.complex128)).reshape(-1)
                  for v in evecs], axis=1)           # [N, 3]
    Q = np.eye(V.shape[0]) - V @ V.conj().T
    mdinvdag = np.linalg.inv(md.conj().T)
    a_defl = mdinvdag @ Q @ np.linalg.inv(md)        # (Mdag)^-1 Q M^-1
    a_full = mdinvdag @ np.linalg.inv(md)
    g5_12 = np.kron(np.diag(np.real(np.diag(GAMMA5))), np.eye(3))
    pref = 4j * KAPPA * MU

    # dense removed piece per timeslice for O = g5: W = (g5 g5) = 1
    o12 = g5_12 @ g5_12
    def tslice_tr(a):
        return pref * np.einsum("ij,vji->v", o12, _site_diag(a)).reshape(
            LAT.Lt, -1).sum(axis=1)
    want_low = tslice_tr(a_full) - tslice_tr(a_defl)

    low, _ = oneend_lowmode_exact(evecs, _dense_solve_ddag(su_inv),
                                  {"g5": GAMMA5}, LAT, MOM, KAPPA, MU)
    np.testing.assert_allclose(np.asarray(low["g5"])[0], want_low,
                               rtol=2e-4, atol=2e-5)


def test_oneend_driver_host_vs_pk():
    """The unified per-noise drivers (dilution x deflation x one-end,
    host complex vs packed device layouts) agree exactly on the SAME
    injected noise."""
    from tpuqcd.phys.loops import (make_deflate, oneend_estimate_for_noise)
    from tpuqcd.phys.loops_dev import (make_deflate_pk,
                                       oneend_estimate_for_noise_pk)
    u, dense = _setup()
    su_inv = np.linalg.inv(dense["u"])
    solve_ddag = _dense_solve_ddag(su_inv)

    def solve_ddag_batch(b_pks):
        out = []
        for i in range(b_pks.shape[0]):
            b = _solver_layout_to_full(b_pks[i])
            out.append(_full_to_solver_layout(solve_ddag(b)))
        return jnp.stack(out)

    eta = z4_noise(jax.random.PRNGKey(11), LAT)
    eta_pk = _full_to_solver_layout(eta)
    evecs = _rand_orthonormal_basis(2)
    evecs_pk = jnp.stack([_full_to_solver_layout(v) for v in evecs])
    gammas = {"g5": GAMMA5, "one": ID4}

    kw = dict(dilute_t=2, dilute_sc=True)
    est_h, der_h = oneend_estimate_for_noise(
        eta, solve_ddag, gammas, LAT, MOM, KAPPA, MU,
        u_full=u, derivs=True, deflate_fn=make_deflate(evecs), **kw)
    # packed gauge for the derivative insertions
    from tpuqcd.fields import gauge_full_to_eo
    from tpuqcd.ops.layout import gauge_to_device
    from tpuqcd.utils.packed import pack_gauge
    u_pk = pack_gauge(gauge_to_device(gauge_full_to_eo(u, LAT), LAT))
    est_d, der_d = oneend_estimate_for_noise_pk(
        eta_pk, solve_ddag_batch, gammas, LAT, MOM, KAPPA, MU,
        u_pk=u_pk.astype(jnp.float32), derivs=True,
        deflate_fn=make_deflate_pk(evecs_pk), **kw)
    for k in est_h:
        np.testing.assert_allclose(np.asarray(est_d[k]),
                                   np.asarray(est_h[k]), rtol=2e-3,
                                   atol=2e-4)
    for k in der_h:
        np.testing.assert_allclose(np.asarray(der_d[k]),
                                   np.asarray(der_h[k]), rtol=2e-3,
                                   atol=2e-4)


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
