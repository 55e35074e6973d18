"""df64 (double-single) arithmetic and the df64 certification operator
vs native f64 (SURVEY.md §8.3 hard part #1; VERDICT r4 #1).

The df64 path must agree with the exact-f64 XLA packed operator to
~2^-48 relative for the 48^3x96 on-chip certification to be honest.
These tests pin that: error-free transforms exactly, field arithmetic
to ~1e-13, and the full even-odd TM Schur operator to ~5e-13.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuqcd import su3
from tpuqcd.fields import apply_boundary_phase_dev, random_spinor_dev
from tpuqcd.lattice import Lattice
from tpuqcd.operators import PackedTMOperatorPC
from tpuqcd.ops.dslash_df64 import TMOperatorPCDF64, dslash_eo_dev_df
from tpuqcd.ops.dslash_xla import dslash_eo_dev_ri
from tpuqcd.utils import df64 as df
from tpuqcd.utils.packed import pack_gauge, pack_spinor

LAT = Lattice((4, 6, 4, 8))
KEY = jax.random.PRNGKey(11)


def _rand64(rng, shape, scale=1.0):
    return jnp.asarray(rng.uniform(-scale, scale, shape), jnp.float64)


def test_two_prod_exact(rng):
    """fl(a*b) + err == a*b exactly (48-bit product fits f64)."""
    a = jnp.asarray(rng.uniform(-2, 2, 512), jnp.float32)
    b = jnp.asarray(rng.uniform(-2, 2, 512), jnp.float32)
    p, e = jax.jit(df.two_prod)(a, b)
    exact = a.astype(jnp.float64) * b.astype(jnp.float64)
    got = p.astype(jnp.float64) + e.astype(jnp.float64)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(exact))


def test_two_sum_exact(rng):
    a = jnp.asarray(rng.uniform(-2, 2, 512), jnp.float32)
    b = jnp.asarray(rng.uniform(-2e-6, 2e-6, 512), jnp.float32)
    s, e = jax.jit(df.two_sum)(a, b)
    exact = a.astype(jnp.float64) + b.astype(jnp.float64)
    got = s.astype(jnp.float64) + e.astype(jnp.float64)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(exact))


def test_df64_field_ops_match_f64(rng):
    a64 = _rand64(rng, (64,))
    b64 = _rand64(rng, (64,))
    x32 = jnp.asarray(rng.uniform(-1, 1, 64), jnp.float32)
    a = df.from_f64(a64)
    b = df.from_f64(b64)

    @jax.jit
    def ops(a, b, x32):
        return (df.to_f64(df.add(a, b)), df.to_f64(df.mul(a, b)),
                df.to_f64(df.mul_f(a, x32)), df.to_f64(df.sub(a, b)),
                df.to_f64(df.add_f(a, x32)))

    got = ops(a, b, x32)
    want = (a64 + b64, a64 * b64, a64 * x32.astype(jnp.float64),
            a64 - b64, a64 + x32.astype(jnp.float64))
    for g, w in zip(got, want):
        err = np.max(np.abs(np.asarray(g - w)))
        assert err < 1e-13, err


def test_df64_scalar_roundtrip():
    for v in (0.128 * 0.128, 1.0 / (1.0 + 0.3**2), -2.0 * 0.157 * 9e-4):
        hi, lo = df.scalar(v)
        # df64 carries ~2^-48 relative precision (lo has its own f32
        # rounding), i.e. ~3.6e-15 * |v|
        assert abs((np.float64(hi) + np.float64(lo)) - np.float64(v)) \
            < 5e-15 * max(abs(v), 1e-30)


def _fields():
    ku, kp = jax.random.split(KEY)
    u = apply_boundary_phase_dev(su3.random_gauge_dev(ku, LAT), LAT)
    u_pk = pack_gauge(u)
    psi64 = pack_spinor(random_spinor_dev(kp, LAT, parities=1),
                        dtype=jnp.float64)
    # give psi genuine sub-f32 content so the lo words matter
    psi64 = psi64 * (1.0 + 1e-9 * jnp.arange(psi64.size, dtype=jnp.float64)
                     .reshape(psi64.shape) % 1.0)
    return u_pk, psi64


def test_dslash_df64_matches_f64():
    u_pk, psi64 = _fields()
    want = dslash_eo_dev_ri(u_pk.astype(jnp.float64), psi64, 0, LAT)
    got_df = jax.jit(
        lambda u, p: dslash_eo_dev_df(u, df.from_f64(p), 0, LAT))(
            u_pk, psi64)
    got = df.to_f64(got_df)
    err = float(jnp.max(jnp.abs(got - want)) /
                jnp.max(jnp.abs(want)))
    assert err < 5e-13, err


@pytest.mark.parametrize("dagger", [False, True])
def test_tm_pc_apply_df_matches_f64(dagger):
    u_pk, psi64 = _fields()
    kappa, mu = 0.131, 0.0071
    pc64 = PackedTMOperatorPC(LAT, kappa=kappa, mu=mu, backend="xla")
    pcdf = TMOperatorPCDF64(LAT, kappa=kappa, mu=mu)
    u64 = u_pk.astype(jnp.float64)
    if dagger:
        want = pc64.apply_dagger(u64, psi64)
        got = df.to_f64(jax.jit(pcdf.apply_dagger)(u_pk,
                                                   df.from_f64(psi64)))
    else:
        want = pc64.apply(u64, psi64)
        got = df.to_f64(jax.jit(pcdf.apply)(u_pk, df.from_f64(psi64)))
    err = float(jnp.max(jnp.abs(got - want)) / jnp.max(jnp.abs(want)))
    assert err < 5e-13, err


def test_prepare_reconstruct_df_match_f64():
    ku, kp = jax.random.split(jax.random.PRNGKey(5))
    u = apply_boundary_phase_dev(su3.random_gauge_dev(ku, LAT), LAT)
    u_pk = pack_gauge(u)
    b = random_spinor_dev(kp, LAT)     # both parities
    b64 = jnp.stack([pack_spinor(b[0], jnp.float64),
                     pack_spinor(b[1], jnp.float64)])
    kappa, mu = 0.12, 0.05
    pc64 = PackedTMOperatorPC(LAT, kappa=kappa, mu=mu, backend="xla")
    pcdf = TMOperatorPCDF64(LAT, kappa=kappa, mu=mu)
    u64 = u_pk.astype(jnp.float64)
    bhat64 = pc64.prepare(u64, b64)
    bhat_df = jax.jit(pcdf.prepare)(u_pk, df.from_f64(b64))
    err = float(jnp.max(jnp.abs(df.to_f64(bhat_df) - bhat64)) /
                jnp.max(jnp.abs(bhat64)))
    assert err < 5e-13, err
    # reconstruct with some x_e
    x64 = 0.3 * bhat64
    want = pc64.reconstruct(u64, x64, b64)
    got = df.to_f64(jax.jit(pcdf.reconstruct)(
        u_pk, df.from_f64(x64), df.from_f64(b64)))
    err = float(jnp.max(jnp.abs(got - want)) / jnp.max(jnp.abs(want)))
    assert err < 5e-13, err


def test_df64_certified_residual_matches_f64():
    """The certification meter itself: |bhat - Mhat x|^2 via df64 vs
    native f64, at a residual scale (1e-11) far below f32 resolution."""
    u_pk, _ = _fields()
    kappa, mu = 0.125, 0.003
    pc64 = PackedTMOperatorPC(LAT, kappa=kappa, mu=mu, backend="xla")
    pcdf = TMOperatorPCDF64(LAT, kappa=kappa, mu=mu)
    u64 = u_pk.astype(jnp.float64)
    rng = np.random.default_rng(3)
    shape = (2, 4, 3, LAT.Lt, LAT.Lz, LAT.Ly * LAT.Lx // 2)
    x64 = jnp.asarray(rng.uniform(-1, 1, shape), jnp.float64)
    # construct bhat so the true residual is ~1e-11 * |bhat|
    r_tiny = jnp.asarray(rng.uniform(-1e-11, 1e-11, shape), jnp.float64)
    bhat64 = pc64.apply(u64, x64) + r_tiny
    rsq_want = float(jnp.sum(r_tiny * r_tiny))
    _, rsq_got = jax.jit(pcdf.residual)(u_pk, df.from_f64(x64),
                                        df.from_f64(bhat64))
    assert abs(float(rsq_got) - rsq_want) < 1e-4 * rsq_want


def test_staged_apply_matches_monolithic():
    """The leg-staged large-volume path (bounded per-program transients)
    computes the same operator as the monolithic df64 apply."""
    u_pk, psi64 = _fields()
    kappa, mu = 0.131, 0.0071
    pcdf = TMOperatorPCDF64(LAT, kappa=kappa, mu=mu)
    x_df = df.from_f64(psi64)
    mono = df.to_f64(jax.jit(pcdf.apply)(u_pk, x_df))
    for lpc in (1, 2, 8):
        staged = df.to_f64(pcdf.apply_staged(u_pk, x_df,
                                             legs_per_call=lpc))
        err = float(jnp.max(jnp.abs(staged - mono)) /
                    jnp.max(jnp.abs(mono)))
        # leg-accumulation order differs; agreement at the df64 floor
        assert err < 1e-12, (lpc, err)
    # staged residual meter agrees with the monolithic one
    b_df = df.from_f64(1.01 * psi64)
    _, rsq_m = jax.jit(pcdf.residual)(u_pk, x_df, b_df)
    _, rsq_s = pcdf.residual_staged(u_pk, x_df, b_df)
    assert abs(float(rsq_s) - float(rsq_m)) < 1e-9 * float(rsq_m)
    # staged prepare too
    b2 = jnp.stack([1.01 * psi64, 0.99 * psi64])
    want = df.to_f64(jax.jit(pcdf.prepare)(u_pk, df.from_f64(b2)))
    got = df.to_f64(pcdf.prepare_staged(u_pk, df.from_f64(b2)))
    err = float(jnp.max(jnp.abs(got - want)) / jnp.max(jnp.abs(want)))
    assert err < 1e-12, err
