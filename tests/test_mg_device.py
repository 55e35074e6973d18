"""Device-resident MG (mg/device.py, mg/dsolve.py) on CPU.

Anchors: the host full-layout MG stack (mg/level.py — the CPU oracle),
exact algebraic identities (R P = I, Galerkin A_c = R A P), and the
true-residual self-oracle (SURVEY.md §5).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuqcd import su3
from tpuqcd.fields import apply_boundary_phase_dev, full_to_eo
from tpuqcd.lattice import Lattice
from tpuqcd.mg.device import (DeviceCoarseTransfer, DeviceFineLevel,
                              DeviceFineTransfer, build_coarse_device)
from tpuqcd.mg.dsolve import DeviceMG, DeviceMGParams
from tpuqcd.mg.level import FineTMLevel
from tpuqcd.ops.layout import gauge_from_device, spinor_to_device
from tpuqcd.utils import pkalg as pk
from tpuqcd.utils.packed import pack_gauge

LAT = Lattice((4, 4, 4, 8))
KAPPA, MU = 0.15, 0.1


def _gauge():
    return apply_boundary_phase_dev(
        su3.random_gauge_dev(jax.random.PRNGKey(0), LAT), LAT)


def _full_to_pk(v_full, lat):
    """host-MG field [T, Z, Y, X, 12] complex -> [2ri, 2par, 4, 3, T, Z, S]."""
    sc = v_full.reshape(*v_full.shape[:-1], 4, 3)
    eo = full_to_eo(sc, lat)
    dev = spinor_to_device(eo, lat)             # [2par, 4, 3, T, Z, S]
    return jnp.stack([jnp.real(dev), jnp.imag(dev)]).astype(jnp.float32)


def _pk_to_full(v_pk, lat):
    from tpuqcd.fields import eo_to_full
    from tpuqcd.ops.layout import spinor_from_device
    dev = jax.lax.complex(v_pk[0], v_pk[1])
    eo = spinor_from_device(dev, lat)
    full = eo_to_full(eo, lat)
    return full.reshape(*full.shape[:-2], 12)


def _host_level(u_dev):
    u_full = gauge_from_device(u_dev, LAT)
    from tpuqcd.fields import gauge_eo_to_full
    u_f = gauge_eo_to_full(u_full, LAT)
    return FineTMLevel(lat=LAT, u=u_f, kappa=KAPPA, mu=MU)


def _rand_full(key):
    kr, ki = jax.random.split(key)
    shape = (LAT.Lt, LAT.Lz, LAT.Ly, LAT.Lx, 12)
    return jax.lax.complex(jax.random.normal(kr, shape, jnp.float32),
                           jax.random.normal(ki, shape, jnp.float32))


@pytest.mark.parametrize("n", [5, 12])
def test_cholesky_pk_vs_numpy(rng, n):
    # n=5 covers the unrolled path, n=12 the masked fori_loop path
    # (pkalg switches at n > 8)
    sites = 7
    a = rng.normal(size=(sites, n, n)) + 1j * rng.normal(size=(sites, n, n))
    g = np.einsum("sij,skj->sik", a, a.conj()) + 3 * np.eye(n)
    g_pk = jnp.asarray(np.stack([g.real, g.imag]).transpose(0, 2, 3, 1),
                       dtype=jnp.float32)       # [2, n, n, sites]
    L = pk.cholesky_pk(g_pk, n)
    Linv = pk.tril_inverse_pk(L, n)
    Lc = np.asarray(L[0] + 1j * L[1]).transpose(2, 0, 1)
    ref = np.linalg.cholesky(g)
    np.testing.assert_allclose(Lc, ref, rtol=2e-4, atol=2e-4)
    Ic = np.einsum("ijs,jks->iks", np.asarray(Linv[0] + 1j * Linv[1]),
                   np.asarray(L[0] + 1j * L[1]))
    np.testing.assert_allclose(
        Ic, np.broadcast_to(np.eye(n)[:, :, None], Ic.shape), atol=2e-4)


def test_device_fine_level_vs_host():
    """DeviceFineLevel.apply == host FineTMLevel.apply through layout
    conversion; same for single-hop applies (the probing legs)."""
    u = _gauge()
    dev = DeviceFineLevel(LAT, pack_gauge(u), KAPPA, MU, backend="xla")
    host = _host_level(u)
    v = _rand_full(jax.random.PRNGKey(3))
    v_pk = _full_to_pk(v, LAT)

    got = _pk_to_full(dev.apply(v_pk), LAT)
    want = host.apply(v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-5)
    for mu in range(4):
        for sign in (+1, -1):
            got = _pk_to_full(dev.apply_hop(v_pk, mu, sign), LAT)
            want = host.apply_hop(v, mu, sign)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), atol=5e-5,
                err_msg=f"hop mu={mu} sign={sign}")


def _fine_and_transfer(n_vec=3, block=(2, 2, 2, 2)):
    u = _gauge()
    dev = DeviceFineLevel(LAT, pack_gauge(u), KAPPA, MU, backend="xla")
    key = jax.random.PRNGKey(11)
    nulls = jnp.stack([dev.random_field(k)
                       for k in jax.random.split(key, n_vec)])
    tr = DeviceFineTransfer(LAT, block, nulls)
    return dev, tr


def test_fine_transfer_rp_identity():
    dev, tr = _fine_and_transfer()
    key = jax.random.PRNGKey(5)
    xc = jax.random.normal(
        key, (2, tr.n_c, tr.dims_c[0] * tr.dims_c[1] * tr.dims_c[2] * tr.dims_c[3]),
        dtype=jnp.float32)
    rt = tr.restrict(tr.prolong(xc))
    np.testing.assert_allclose(np.asarray(rt), np.asarray(xc), atol=2e-4)


def test_fine_transfer_adjoint():
    """<restrict(v), w>_c == <v, prolong(w)>_f (R = P^dag)."""
    dev, tr = _fine_and_transfer()
    v = dev.random_field(jax.random.PRNGKey(6))
    w = jax.random.normal(
        jax.random.PRNGKey(7),
        (2, tr.n_c, tr.dims_c[0] * tr.dims_c[1] * tr.dims_c[2] * tr.dims_c[3]),
        dtype=jnp.float32)
    lhs = pk.cdot(tr.restrict(v), w)
    rhs = pk.cdot(v, tr.prolong(w))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), rtol=2e-3,
                               atol=2e-3)


@pytest.mark.slow
def test_galerkin_identity_fine():
    """coarse.apply == R . M . P (exact by construction)."""
    dev, tr = _fine_and_transfer()
    coarse = build_coarse_device(dev, tr)
    vc = coarse.random_field(jax.random.PRNGKey(8))
    got = coarse.apply(vc)
    want = tr.restrict(dev.apply(tr.prolong(vc)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-3, rtol=1e-3)


@pytest.mark.slow
def test_galerkin_identity_odd_coarse_dims():
    """Probing == R A P at ODD coarse extents (dims_c carries 3s).

    Regression for the v1 per-mu parity masks, which are invalid across
    the periodic wrap at odd extents (first and last coarse site share
    parity but are neighbors): the wrap-link columns were silently
    dropped into the diagonal, so the coarse operator disagreed with
    R A P on any vector varying along the wrapped direction.  The
    global 3-coloring (mg/device._coarse_colors) makes this exact; this
    is the coarse geometry of the production config 3 (24^3x48 ->
    level-2 dims (3, 3, 3, 6))."""
    lat = Lattice((4, 4, 6, 6))
    u = apply_boundary_phase_dev(
        su3.random_gauge_dev(jax.random.PRNGKey(21), lat), lat)
    dev = DeviceFineLevel(lat, pack_gauge(u), KAPPA, MU, backend="xla")
    nulls = jnp.stack([dev.random_field(k)
                       for k in jax.random.split(jax.random.PRNGKey(22),
                                                 3)])
    tr = DeviceFineTransfer(lat, (2, 2, 2, 2), nulls)
    assert any(n % 2 for n in tr.dims_c), tr.dims_c  # exercises 3-color
    coarse = build_coarse_device(dev, tr)
    vc = coarse.random_field(jax.random.PRNGKey(23))
    got = coarse.apply(vc)
    want = tr.restrict(dev.apply(tr.prolong(vc)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-3, rtol=1e-3)


@pytest.mark.slow
def test_galerkin_identity_coarse_level():
    """Second coarsening: DeviceCoarseTransfer + probing on a coarse
    level reproduce R A_1 P."""
    dev, tr = _fine_and_transfer()
    c1 = build_coarse_device(dev, tr)
    nulls = jnp.stack([c1.random_field(k)
                       for k in jax.random.split(jax.random.PRNGKey(9), 3)])
    tr2 = DeviceCoarseTransfer(c1.dims, c1.n, (2, 2, 2, 2), nulls)
    xc = jax.random.normal(
        jax.random.PRNGKey(10),
        (2, tr2.n_c, tr2.dims_c[0] * tr2.dims_c[1] * tr2.dims_c[2] * tr2.dims_c[3]),
        dtype=jnp.float32)
    rt = tr2.restrict(tr2.prolong(xc))
    np.testing.assert_allclose(np.asarray(rt), np.asarray(xc), atol=2e-4)
    c2 = build_coarse_device(c1, tr2)
    got = c2.apply(xc)
    want = tr2.restrict(c1.apply(tr2.prolong(xc)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-3, rtol=1e-3)


@pytest.mark.slow
def test_device_mg_solve_and_certify():
    """2-level device MG: GCR converges, then defect correction reaches
    1e-10 in the f64 true residual (the contract tolerance)."""
    u = _gauge()
    dev = DeviceFineLevel(LAT, pack_gauge(u), KAPPA, MU, backend="xla")
    params = DeviceMGParams(n_vec=(3,), block=((2, 2, 2, 2),),
                            setup_iters=25, smoother_iters=3,
                            coarse_iters=16, restart=6)
    mg = DeviceMG(dev, params)
    b = dev.random_field(jax.random.PRNGKey(21))
    res = mg.solve(b, tol=1e-5, maxiter=120)
    assert res.converged, res.relres
    # true residual self-oracle in f32
    r = pk.caxpy(-1.0, 0.0, dev.apply(res.x), b)
    rel = float(pk.norm2(r) / pk.norm2(b)) ** 0.5
    assert rel < 5e-5, rel

    x, rel10, iters = mg.solve_certified(b, tol=1e-10, inner_tol=1e-4,
                                         max_refine=20)
    assert rel10 <= 1e-10, rel10


def test_g5_flavor_dagger_identity():
    """The CG-NE setup's dagger: M^dag = g5 M_{-flavor} g5 (DeGrand-
    Rossi g5 = diag(+,+,-,-)), verified as <M x, y> == <x, g5 M_- g5 y>
    on random packed fields — the identity the cgne null-vector setup
    (mg/dsolve.DeviceMGParams.setup_solver) rests on."""
    import dataclasses as dc

    from tpuqcd.operators import _G5_DIAG
    u = _gauge()
    lv = DeviceFineLevel(LAT, pack_gauge(u), KAPPA, MU, backend="xla")
    lv_m = dc.replace(lv, flavor=-lv.flavor)
    g5 = jnp.asarray(_G5_DIAG, jnp.float32).reshape(1, 1, 4, 1, 1, 1, 1)
    x = lv.random_field(jax.random.PRNGKey(3))
    y = lv.random_field(jax.random.PRNGKey(4))
    lhs = pk.cdot(jax.jit(lv.apply)(x), y)
    rhs = pk.cdot(x, g5 * jax.jit(lv_m.apply)(g5 * y))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs),
                               rtol=1e-5, atol=1e-5)


def test_device_mg_cgne_setup_solves():
    """setup_solver='cgne' builds a working hierarchy: the normal-
    operator inverse-iteration null vectors give a V-cycle whose
    certified solve reaches 1e-10 (the near-kappa_c setup mode —
    measured on the TPU it cut the stalled kappa=0.157 heatbath solve
    from 1000 to 352 inner iterations, BASELINE.md round 4)."""
    u = _gauge()
    dev = DeviceFineLevel(LAT, pack_gauge(u), KAPPA, MU, backend="xla")
    params = DeviceMGParams(n_vec=(3,), block=((2, 2, 2, 2),),
                            setup_iters=25, smoother_iters=3,
                            coarse_iters=16, restart=6,
                            setup_solver="cgne")
    mg = DeviceMG(dev, params)
    b = dev.random_field(jax.random.PRNGKey(22))
    x, rel10, iters = mg.solve_certified(b, tol=1e-10, inner_tol=1e-4,
                                         max_refine=20)
    assert rel10 <= 1e-10, rel10


def _clover_level(backend="xla", interpret=False):
    from tpuqcd.operators import CloverData
    from tpuqcd.utils.packed import pack_clover
    u = _gauge()
    cl = CloverData.build(u, LAT, KAPPA, MU, csw=1.2)
    cl_pk = jnp.stack([pack_clover(cl.a_blocks[0]),
                       pack_clover(cl.a_blocks[1])])
    from tpuqcd.mg.device import DeviceFineCloverLevel
    lv = DeviceFineCloverLevel(LAT, pack_gauge(u), cl_pk, KAPPA, MU,
                               csw=1.2, backend=backend,
                               interpret=interpret)
    return u, cl, lv


def test_fine_tm_fused_pallas_apply():
    """Fused xpay full-M apply (pallas, interpret) == the XLA path."""
    u = _gauge()
    xla = DeviceFineLevel(LAT, pack_gauge(u), KAPPA, MU, backend="xla")
    pal = DeviceFineLevel(LAT, pack_gauge(u), KAPPA, MU,
                          backend="pallas", interpret=True)
    v = xla.random_field(jax.random.PRNGKey(12))
    np.testing.assert_allclose(np.asarray(pal.apply(v)),
                               np.asarray(xla.apply(v)), atol=5e-5)


@pytest.mark.slow
def test_fine_clover_level_vs_oracle():
    """DeviceFineCloverLevel (xla + pallas-interpret) vs the composed
    complex-device oracle A v + i tw g5 v - kappa D v."""
    from tpuqcd.ops.clover import clover_apply
    from tpuqcd.ops.dslash_xla import dslash_eo_dev
    from tpuqcd.operators import gamma5_apply_dev
    u, cl, lv = _clover_level()
    v = lv.random_field(jax.random.PRNGKey(13))
    vc = [jax.lax.complex(v[0, p], v[1, p]) for p in (0, 1)]
    tw = 2.0 * KAPPA * MU
    want = []
    for p in (0, 1):
        a = clover_apply(cl.a_blocks[p], vc[p])
        a = a + (1j * tw) * gamma5_apply_dev(vc[p])
        want.append(a - KAPPA * dslash_eo_dev(u, vc[1 - p], 1 - p, LAT))
    got = lv.apply(v)
    for p in (0, 1):
        gc = jax.lax.complex(got[0, p], got[1, p])
        np.testing.assert_allclose(np.asarray(gc), np.asarray(want[p]),
                                   atol=5e-5, err_msg=f"xla p={p}")
    _, _, lvp = _clover_level(backend="pallas", interpret=True)
    gotp = lvp.apply(v)
    np.testing.assert_allclose(np.asarray(gotp), np.asarray(got),
                               atol=5e-5)


@pytest.mark.slow
def test_device_mg_clover_solve():
    """Device MG on the twisted-clover operator: Galerkin identity +
    certified solve (self-oracle)."""
    from tpuqcd.mg.device import DeviceFineTransfer, build_coarse_device
    _, _, lv = _clover_level()
    nulls = jnp.stack([lv.random_field(k)
                       for k in jax.random.split(jax.random.PRNGKey(14), 3)])
    tr = DeviceFineTransfer(LAT, (2, 2, 2, 2), nulls)
    coarse = build_coarse_device(lv, tr)
    vc = coarse.random_field(jax.random.PRNGKey(15))
    np.testing.assert_allclose(
        np.asarray(coarse.apply(vc)),
        np.asarray(tr.restrict(lv.apply(tr.prolong(vc)))),
        atol=1e-3, rtol=1e-3)

    params = DeviceMGParams(n_vec=(3,), block=((2, 2, 2, 2),),
                            setup_iters=25, smoother_iters=3,
                            coarse_iters=16, restart=6)
    mg = DeviceMG(lv, params)
    b = lv.random_field(jax.random.PRNGKey(16))
    x, rel, iters = mg.solve_certified(b, tol=1e-10, inner_tol=1e-4,
                                       max_refine=25)
    assert rel <= 1e-10, rel


def test_device_mg_solve_certified_df64():
    """hp='df64' certification (on-chip double-single residuals,
    mg/dsolve._solve_certified_df64) reaches the same 1e-10 true
    residual as the f64 path — verified against the INDEPENDENT f64
    operator (VERDICT r4 #1 at MG scope)."""
    u = _gauge()
    dev = DeviceFineLevel(LAT, pack_gauge(u), KAPPA, MU, backend="xla")
    params = DeviceMGParams(n_vec=(3,), block=((2, 2, 2, 2),),
                            setup_iters=25, smoother_iters=3,
                            coarse_iters=16, restart=6)
    mg = DeviceMG(dev, params)
    b = dev.random_field(jax.random.PRNGKey(31))
    x, rel10, iters = mg.solve_certified(b, tol=1e-10, inner_tol=1e-4,
                                         max_refine=20, hp="df64")
    assert rel10 <= 1e-10, rel10
    # independent f64 certification of the df64-certified iterate
    hp = dev.as_hp()
    r = b.astype(jnp.float64) - hp.apply(x)
    rel = float(pk.norm2(r, dtype=jnp.float64)
                / pk.norm2(b.astype(jnp.float64),
                           dtype=jnp.float64)) ** 0.5
    assert rel <= 2e-10, rel


def test_device_mg_bf16_vec_storage_certifies():
    """vec_dtype='bfloat16' stores the null-vector bank bf16 FROM
    GENERATION (donated in-place stash, dsolve._stash_vec) — the
    HBM-bound-volume configuration (48^3x96 arithmetic in BASELINE.md
    round 5).  The Linv Gram must upcast the mapped column to f32
    (_LinvMixin.gram_linv), else the bf16*bf16 Gram loses the block
    orthogonalization.  Certify 1e-10 end-to-end through the bf16
    transfer + bf16 GCR basis."""
    u = _gauge()
    dev = DeviceFineLevel(LAT, pack_gauge(u), KAPPA, MU, backend="xla")
    params = DeviceMGParams(n_vec=(3,), block=((2, 2, 2, 2),),
                            setup_iters=25, smoother_iters=3,
                            coarse_iters=16, restart=6,
                            vec_dtype="bfloat16", gcr_dtype="bfloat16")
    mg = DeviceMG(dev, params)
    assert mg.transfers[0].v_pk.dtype == jnp.bfloat16
    assert mg.transfers[0].linv.dtype == jnp.float32
    b = dev.random_field(jax.random.PRNGKey(23))
    x, rel10, iters = mg.solve_certified(b, tol=1e-10, inner_tol=1e-4,
                                         max_refine=25)
    assert rel10 <= 1e-10, rel10


def test_galerkin_probing_per_leg_matches_fused():
    """The HBM-bounded per-leg probing (fused_legs=False — the auto
    selection at 48^3x96 where the fused 8-leg stack OOMs) builds the
    SAME Galerkin links as the fused multi-leg kernel pass."""
    dev, tr = _fine_and_transfer()
    cf = build_coarse_device(dev, tr, fused_legs=True)
    cp = build_coarse_device(dev, tr, fused_legs=False)
    np.testing.assert_allclose(np.asarray(cp.links), np.asarray(cf.links),
                               atol=1e-5, rtol=1e-5)
