"""Sharded operator == single-device operator (SURVEY.md §5 item 3):
runs on the 8-virtual-device CPU mesh with interpreter-mode kernels."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuqcd import su3
from tpuqcd.fields import apply_boundary_phase_dev, random_spinor_dev
from tpuqcd.lattice import Lattice
from tpuqcd.operators import PackedTMOperatorPC
from tpuqcd.parallel.mesh import LatticeMesh
from tpuqcd.parallel.sharded import ShardedTMOperatorPC
from tpuqcd.utils.packed import pack_gauge, pack_spinor

LAT = Lattice((4, 4, 4, 8))
KAPPA, MU = 0.13, 0.05


def _problem():
    u = apply_boundary_phase_dev(
        su3.random_gauge_dev(jax.random.PRNGKey(0), LAT), LAT)
    psi = random_spinor_dev(jax.random.PRNGKey(1), LAT, parities=1)
    return pack_gauge(u), pack_spinor(psi)


@pytest.mark.parametrize("grid", [
    (2, 1),
    pytest.param((4, 1), marks=pytest.mark.slow),
    pytest.param((2, 2), marks=pytest.mark.slow)])
def test_sharded_apply_matches_single(grid, cpu_devices):
    nt, nz = grid
    u_pk, psi_pk = _problem()
    ref_op = PackedTMOperatorPC(LAT, kappa=KAPPA, mu=MU, backend="xla")
    ref = ref_op.apply(u_pk, psi_pk)

    lmesh = LatticeMesh.make(LAT, nt, nz, devices=cpu_devices)
    op = ShardedTMOperatorPC(LAT, lmesh, kappa=KAPPA, mu=MU,
                             interpret=True, block_z=2)
    u_sh = lmesh.shard_gauge(u_pk)
    psi_sh = lmesh.shard_spinor(psi_pk)
    u_ext = op.extend_gauge(u_sh)
    out = op.apply(u_ext, psi_sh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5)
    outd = op.apply_dagger(u_ext, psi_sh)
    refd = ref_op.apply_dagger(u_pk, psi_pk)
    np.testing.assert_allclose(np.asarray(outd), np.asarray(refd),
                               atol=3e-5)


@pytest.mark.slow
def test_sharded_solve(cpu_devices):
    """End-to-end sharded CG (xla reductions auto-psum across shards)."""
    from tpuqcd.solvers.cg import cg_normal
    u_pk, _ = _problem()
    b = random_spinor_dev(jax.random.PRNGKey(7), LAT)
    b_pk = jnp.stack([pack_spinor(b[0]), pack_spinor(b[1])])
    lmesh = LatticeMesh.make(LAT, 4, 1, devices=cpu_devices)
    op = ShardedTMOperatorPC(LAT, lmesh, kappa=KAPPA, mu=MU,
                             interpret=True, block_z=2)
    u_sh = lmesh.shard_gauge(u_pk)
    b_sh = jax.device_put(
        b_pk, jax.NamedSharding(lmesh.mesh,
                                jax.P(None, *lmesh.spinor_spec())))
    u_ext = op.extend_gauge(u_sh)
    bhat = op.prepare(u_ext, b_sh)
    res = cg_normal(lambda x: op.apply(u_ext, x),
                    lambda x: op.apply_dagger(u_ext, x),
                    bhat, tol=1e-5, maxiter=500)
    assert bool(res.converged), float(res.relres)
    x = op.reconstruct(u_ext, res.x, b_sh)
    # compare against single-device solve of the same system
    ref_op = PackedTMOperatorPC(LAT, kappa=KAPPA, mu=MU, backend="xla")
    bhat_ref = ref_op.prepare(u_pk, b_pk)
    res_ref = cg_normal(lambda v: ref_op.apply(u_pk, v),
                        lambda v: ref_op.apply_dagger(u_pk, v),
                        bhat_ref, tol=1e-5, maxiter=500)
    x_ref = ref_op.reconstruct(u_pk, res_ref.x, b_pk)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref), atol=1e-3)


@pytest.mark.parametrize("grid,overlap", [
    pytest.param((4, 1), False, marks=pytest.mark.slow),
    pytest.param((2, 2), False, marks=pytest.mark.slow),
    pytest.param((2, 2), True, marks=pytest.mark.slow)])
def test_sharded_clover_apply_matches_single(grid, overlap, cpu_devices):
    """ShardedTMCloverOperatorPC == PackedTMCloverOperatorPC on the
    virtual mesh (clover + z-axis multi-chip path, VERDICT r1 #7)."""
    from tpuqcd.operators import CloverData, PackedTMCloverOperatorPC
    from tpuqcd.parallel.sharded import ShardedTMCloverOperatorPC
    nt, nz = grid
    CSW = 1.4
    u = apply_boundary_phase_dev(
        su3.random_gauge_dev(jax.random.PRNGKey(0), LAT), LAT)
    psi = random_spinor_dev(jax.random.PRNGKey(1), LAT, parities=1)
    u_pk, psi_pk = pack_gauge(u), pack_spinor(psi)
    clov = CloverData.build(u, LAT, KAPPA, MU, CSW)
    ref_op = PackedTMCloverOperatorPC(LAT, kappa=KAPPA, mu=MU, csw=CSW,
                                      backend="xla")
    fields_ref = ref_op.make_fields(u_pk, clov)
    ref = ref_op.apply(fields_ref, psi_pk)
    refd = ref_op.apply_dagger(fields_ref, psi_pk)

    lmesh = LatticeMesh.make(LAT, nt, nz, devices=cpu_devices)
    # non-overlap path = fused Pallas kernel (interpret on CPU);
    # overlap path = backend-agnostic repairs over the XLA stencil
    op = ShardedTMCloverOperatorPC(
        LAT, lmesh, kappa=KAPPA, mu=MU, csw=CSW,
        backend="xla" if overlap else "pallas",
        interpret=not overlap, block_z=2, overlap=overlap)
    fields = op.extend_fields(*fields_ref)
    psi_sh = lmesh.shard_spinor(psi_pk)
    out = jax.jit(lambda f, p: op.apply(f, p))(fields, psi_sh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5)
    outd = jax.jit(lambda f, p: op.apply_dagger(f, p))(fields, psi_sh)
    np.testing.assert_allclose(np.asarray(outd), np.asarray(refd),
                               atol=3e-5)
    # prepare / reconstruct round-trip equality
    b = jnp.stack([psi_pk, pack_spinor(
        random_spinor_dev(jax.random.PRNGKey(5), LAT, parities=1))])
    b_sh = jax.device_put(
        b, jax.NamedSharding(lmesh.mesh,
                             jax.P(None, *lmesh.spinor_spec())))
    bhat = jax.jit(lambda f, x: op.prepare(f, x))(fields, b_sh)
    want_bhat = ref_op.prepare(fields_ref, b)
    np.testing.assert_allclose(np.asarray(bhat), np.asarray(want_bhat),
                               atol=3e-5)
    x = jax.jit(lambda f, e, x: op.reconstruct(f, e, x))(
        fields, bhat, b_sh)
    want_x = ref_op.reconstruct(fields_ref, want_bhat, b)
    np.testing.assert_allclose(np.asarray(x), np.asarray(want_x),
                               atol=3e-5)


@pytest.mark.parametrize("grid", [
    (2, 1), pytest.param((2, 2), marks=pytest.mark.slow)])
def test_sharded_recon12_matches_single(grid, cpu_devices):
    """Compressed (reconstruct-12) links on the T-sharded kernel path
    (VERDICT r1 #5): the global-t boundary-phase fix rides in as the
    shard's t-offset scalar."""
    from tpuqcd.utils.packed import pack_gauge12
    nt, nz = grid
    u_pk, psi_pk = _problem()
    ref_op = PackedTMOperatorPC(LAT, kappa=KAPPA, mu=MU, backend="xla")
    ref = ref_op.apply(u_pk, psi_pk)
    refd = ref_op.apply_dagger(u_pk, psi_pk)

    u12 = u_pk[:, :, :2]                     # pack_gauge12 of the same u
    lmesh = LatticeMesh.make(LAT, nt, nz, devices=cpu_devices)
    op = ShardedTMOperatorPC(LAT, lmesh, kappa=KAPPA, mu=MU,
                             interpret=True, block_z=2)
    u_sh = lmesh.shard_gauge(u12)
    psi_sh = lmesh.shard_spinor(psi_pk)
    u_ext = op.extend_gauge(u_sh)
    out = jax.jit(lambda ue, ps: op.apply(ue, ps))(u_ext, psi_sh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5)
    outd = jax.jit(lambda ue, ps: op.apply_dagger(ue, ps))(u_ext, psi_sh)
    np.testing.assert_allclose(np.asarray(outd), np.asarray(refd),
                               atol=3e-5)


@pytest.mark.slow
def test_sharded_apply_production_shape(cpu_devices):
    """Mesh == single-device at a 48^3x96-PROPORTIONED volume
    (16^2x48x96, memory-scaled config 5; VERDICT r1 #1 "nothing
    48^3x96-proportioned has ever run, even virtually").

    A (4, 2) t x z mesh with Tl=24, Zl=24 local slabs — production-like
    surface-to-volume — through the xla-backend overlap engine with
    fused epilogues (the multi-chip production configuration for this
    backend).  Operator-apply level: the full-pipeline mesh equality at
    this shape is a multi-hour CPU run; tests/test_cli_mesh.py proves
    pipeline equality at small shape, this proves the operator at
    production shape."""
    lat = Lattice((16, 16, 48, 96))
    u = apply_boundary_phase_dev(
        su3.random_gauge_dev(jax.random.PRNGKey(3), lat), lat)
    psi = random_spinor_dev(jax.random.PRNGKey(4), lat, parities=1)
    u_pk, psi_pk = pack_gauge(u), pack_spinor(psi)
    del u, psi
    ref_op = PackedTMOperatorPC(lat, kappa=KAPPA, mu=MU, backend="xla")
    ref = np.asarray(ref_op.apply(u_pk, psi_pk))

    lmesh = LatticeMesh.make(lat, 4, 2, devices=cpu_devices)
    op = ShardedTMOperatorPC(lat, lmesh, kappa=KAPPA, mu=MU,
                             backend="xla", overlap=True)
    u_sh = lmesh.shard_gauge(u_pk)
    psi_sh = lmesh.shard_spinor(psi_pk)
    u_ext = jax.jit(op.extend_gauge)(u_sh)
    out = jax.jit(op.apply)(u_ext, psi_sh)
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-5)


def test_half_pack_algebra():
    """Spin-projected halo pack invariant (C6, reference dslash_pack.cu
    [U]): proj(tab, zero-pad(halfproj(tab, psi))) == proj(tab, psi) for
    every table — the kernel's in-VMEM projection of the reconstructed
    slab reproduces the sender's half-spinor EXACTLY (the tables carry
    the identity in their first two spin columns)."""
    from tpuqcd.gammas import HALF_PROJ_MINUS, HALF_PROJ_PLUS
    from tpuqcd.parallel.sharded import _hpad_pk, _hproj_pk
    rng = np.random.default_rng(3)
    psi = jnp.asarray(rng.normal(size=(2, 4, 3, 5)).astype(np.float32))
    for tabs in (HALF_PROJ_MINUS, HALF_PROJ_PLUS):
        for mu in range(4):
            h = _hproj_pk(psi, tabs[mu])
            # reference: complex projection on the unpacked spinor
            z = np.asarray(psi[0] + 1j * np.asarray(psi[1]))
            want = np.einsum("sk,kcx->scx", tabs[mu], z)
            np.testing.assert_allclose(np.asarray(h[0]), want.real,
                                       atol=1e-6)
            np.testing.assert_allclose(np.asarray(h[1]), want.imag,
                                       atol=1e-6)
            # zero-padded reconstruction round-trips bit-exactly
            h2 = _hproj_pk(_hpad_pk(h), tabs[mu])
            np.testing.assert_array_equal(np.asarray(h2), np.asarray(h))


def _half_problem():
    lat = Lattice((4, 4, 4, 4))
    u = apply_boundary_phase_dev(
        su3.random_gauge_dev(jax.random.PRNGKey(0), lat), lat)
    psi = random_spinor_dev(jax.random.PRNGKey(1), lat, parities=1)
    return lat, pack_gauge(u), pack_spinor(psi)


def test_half_spinor_halo_pack_fused_exact(cpu_devices):
    """Fused-kernel path: half-spinor halos must be BIT-IDENTICAL to
    the full-spinor exchange in f32 (see test_half_pack_algebra)."""
    lat, u_pk, psi_pk = _half_problem()
    lmesh = LatticeMesh.make(lat, 2, 2, devices=cpu_devices[:4])
    kw = dict(kappa=KAPPA, mu=MU, interpret=True, block_z=2)
    u_sh = lmesh.shard_gauge(u_pk)
    psi_sh = lmesh.shard_spinor(psi_pk)
    full = ShardedTMOperatorPC(lat, lmesh, halo_half=False, **kw)
    half = ShardedTMOperatorPC(lat, lmesh, halo_half=True, **kw)
    u_ext = full.extend_gauge(u_sh)
    a = full.apply(u_ext, psi_sh)
    b = half.apply(u_ext, psi_sh)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_half_spinor_halo_pack_dagger_and_overlap(cpu_devices):
    """dagger (table swap) on the fused path; overlap path agrees to
    rounding (projection and SU(3) multiply commute, float order
    swaps)."""
    lat, u_pk, psi_pk = _half_problem()
    lmesh = LatticeMesh.make(lat, 2, 2, devices=cpu_devices[:4])
    kw = dict(kappa=KAPPA, mu=MU, interpret=True, block_z=2)
    u_sh = lmesh.shard_gauge(u_pk)
    psi_sh = lmesh.shard_spinor(psi_pk)
    full = ShardedTMOperatorPC(lat, lmesh, halo_half=False, **kw)
    half = ShardedTMOperatorPC(lat, lmesh, halo_half=True, **kw)
    u_ext = full.extend_gauge(u_sh)
    a = full.apply_dagger(u_ext, psi_sh)
    b = half.apply_dagger(u_ext, psi_sh)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    fo = ShardedTMOperatorPC(lat, lmesh, halo_half=False, overlap=True,
                             backend="xla", kappa=KAPPA, mu=MU)
    ho = ShardedTMOperatorPC(lat, lmesh, halo_half=True, overlap=True,
                             backend="xla", kappa=KAPPA, mu=MU)
    for dag in (False, True):
        a = fo._apply(u_ext, psi_sh, dagger=dag)
        b = ho._apply(u_ext, psi_sh, dagger=dag)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6,
                                   err_msg=f"overlap dagger={dag}")


# --- non-degenerate doublet on the mesh ---------------------------------

def _ndeg_problem():
    u = apply_boundary_phase_dev(
        su3.random_gauge_dev(jax.random.PRNGKey(3), LAT), LAT)
    u_pk = pack_gauge(u)
    cols = [random_spinor_dev(jax.random.PRNGKey(11 + f), LAT,
                              parities=1) for f in range(2)]
    chi = jnp.stack([pack_spinor(c) for c in cols])   # [2fl, 2ri, ...]
    return u_pk, chi


@pytest.mark.parametrize("grid,block_z", [
    ((2, 1, 1), 2),
    # block_z=None exercises the auto-block path (_zb reads has_clover —
    # ADVICE r2 regression guard for the borrowed-method dataclass field)
    ((2, 1, 1), None),
    ((2, 2, 1), 2),
    pytest.param((2, 1, 2), 2, marks=pytest.mark.slow)])
def test_sharded_ndeg_apply_matches_single(grid, block_z, cpu_devices):
    """ShardedNdegTMOperatorPC == PackedNdegTMOperatorPC on (t, z, y)
    meshes: flavor-diagonal hops through the halo machinery, the
    flavor-mixing site terms shard-local (reference ndeg doublet under
    --gridsize [U])."""
    from tpuqcd.operators import PackedNdegTMOperatorPC
    from tpuqcd.parallel.sharded import ShardedNdegTMOperatorPC

    nt, nz, ny = grid
    KAP, MUB, EPS = 0.13, 0.05, 0.03
    u_pk, chi = _ndeg_problem()
    ref_op = PackedNdegTMOperatorPC(LAT, kappa=KAP, mubar=MUB,
                                    epsbar=EPS, backend="xla")
    ref = ref_op.apply(u_pk, chi)

    lmesh = LatticeMesh.make(LAT, nt, nz, ny, devices=cpu_devices)
    op = ShardedNdegTMOperatorPC(LAT, lmesh, kappa=KAP, mubar=MUB,
                                 epsbar=EPS, interpret=True,
                                 block_z=block_z, overlap=ny > 1)
    u_ext = op.extend_gauge(lmesh.shard_gauge(u_pk))
    chi_sh = jax.device_put(
        chi, jax.sharding.NamedSharding(
            lmesh.mesh, jax.sharding.PartitionSpec(
                None, *lmesh.spinor_spec())))
    out = op.apply(u_ext, chi_sh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5)
    outd = op.apply_dagger(u_ext, chi_sh)
    refd = ref_op.apply_dagger(u_pk, chi)
    np.testing.assert_allclose(np.asarray(outd), np.asarray(refd),
                               atol=3e-5)


@pytest.mark.slow
def test_sharded_ndeg_solve_matches_single(cpu_devices):
    """Full-system mesh ndeg solve == single-device solve_ndeg_tm
    (both f64-certified; VERDICT r1 missing #6 closed multi-chip)."""
    import dataclasses as dc

    from tpuqcd.parallel.sharded import ShardedNdegTMOperatorPC
    from tpuqcd.solve import solve_ndeg_tm, solve_ndeg_tm_sharded

    KAP, MUB, EPS = 0.13, 0.05, 0.03
    u_pk, _ = _ndeg_problem()
    cols = [random_spinor_dev(jax.random.PRNGKey(21 + i), LAT)
            for i in range(2)]
    b = jnp.stack([jnp.stack([pack_spinor(c[0]), pack_spinor(c[1])])
                   for c in cols])                    # [2fl, 2par, ...]

    res1 = solve_ndeg_tm(u_pk, b, LAT, kappa=KAP, mubar=MUB, epsbar=EPS,
                         tol=1e-8, backend="xla")

    lmesh = LatticeMesh.make(LAT, 2, 1, devices=cpu_devices)
    op_s = ShardedNdegTMOperatorPC(LAT, lmesh, kappa=KAP, mubar=MUB,
                                   epsbar=EPS, backend="xla",
                                   overlap=True)
    op_hp = dc.replace(op_s)
    u_sh = lmesh.shard_gauge(u_pk)
    u_ext = op_s.extend_gauge(u_sh.astype(jnp.float32))
    sp = jax.sharding.NamedSharding(
        lmesh.mesh, jax.sharding.PartitionSpec(
            None, None, *lmesh.spinor_spec()))
    b_sh = jax.device_put(b, sp)
    res2 = solve_ndeg_tm_sharded(
        op_s, op_hp, u_ext, u_ext.astype(jnp.float64), b_sh, tol=1e-8)
    assert float(res2.relres) < 1e-8
    np.testing.assert_allclose(np.asarray(res2.x), np.asarray(res1.x),
                               atol=2e-7)
