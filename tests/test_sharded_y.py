"""Y-axis domain decomposition == single-device (SURVEY.md §2
parallelism table: the reference's 4-D --gridsize decomposition; here
the third mesh axis "y" shards the y-major packed S dimension and runs
through the interior/exterior overlap engine, parallel/overlap.py)."""
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


def test_mesh_y_config_validation(tmp_path):
    """Early ConfigError (not a deep assert) for bad y decompositions."""
    from tpuqcd.utils.config import ConfigError, load_config

    def load(text):
        p = tmp_path / "cfg.yaml"
        p.write_text("gauge: {dims: [4, 4, 4, 8], random_seed: 1}\n"
                     + text)
        return load_config(str(p))

    cfg = load("mesh: {nt: 2, ny: 2}\n")            # valid
    assert cfg.mesh.ny == 2
    with pytest.raises(ConfigError, match="ny.*divide Ly"):
        load("mesh: {ny: 3}\n")
    with pytest.raises(ConfigError, match="even"):
        load("mesh: {ny: 4}\n")                     # local Y = 1, odd
    with pytest.raises(ConfigError, match="overlap"):
        load("mesh: {ny: 2}\nsolver: {comm_policy: fused}\n")
    # MG on a y mesh: the first block's by must divide the local Y
    cfg = load("mesh: {ny: 2}\n"
               "mg: {enabled: true, n_vec: [8], block: [[2, 2, 2, 4]]}\n")
    assert cfg.mg.enabled and cfg.mesh.ny == 2
    with pytest.raises(ConfigError, match="divisible by the y-block"):
        load("mesh: {ny: 2}\n"
             "mg: {enabled: true, n_vec: [8], block: [[2, 2, 4, 4]]}\n")


def test_fused_path_rejects_y_mesh(cpu_devices):
    """No fused halo_y kernel mode: the operator refuses early."""
    lmesh = LatticeMesh.make(LAT, 1, 1, 2, devices=cpu_devices)
    op = ShardedTMOperatorPC(LAT, lmesh, kappa=KAPPA, mu=MU,
                             overlap=False, interpret=True, block_z=2)
    u_pk, psi_pk = _problem()
    with pytest.raises(AssertionError, match="overlap"):
        op.apply(op.extend_gauge(lmesh.shard_gauge(u_pk)),
                 lmesh.shard_spinor(psi_pk))


@pytest.mark.slow
@pytest.mark.parametrize("grid", [(2, 1, 2), (2, 2, 2)])
def test_y_sharded_apply_matches_single(grid, cpu_devices):
    """(t, z, y) overlap operator == single-device, fwd and dagger."""
    nt, nz, ny = grid
    u_pk, psi_pk = _problem()
    ref_op = PackedTMOperatorPC(LAT, kappa=KAPPA, mu=MU, backend="xla")
    ref = ref_op.apply(u_pk, psi_pk)
    refd = ref_op.apply_dagger(u_pk, psi_pk)

    lmesh = LatticeMesh.make(LAT, nt, nz, ny, devices=cpu_devices)
    op = ShardedTMOperatorPC(LAT, lmesh, kappa=KAPPA, mu=MU,
                             overlap=True, backend="xla")
    u_ext = op.extend_gauge(lmesh.shard_gauge(u_pk))
    psi_sh = lmesh.shard_spinor(psi_pk)
    np.testing.assert_allclose(np.asarray(op.apply(u_ext, psi_sh)),
                               np.asarray(ref), atol=3e-5)
    np.testing.assert_allclose(np.asarray(op.apply_dagger(u_ext, psi_sh)),
                               np.asarray(refd), atol=3e-5)


@pytest.mark.slow
def test_y_sharded_pallas_interior(cpu_devices):
    """The Pallas interior under a y shard (local-Y kernel lattice)."""
    u_pk, psi_pk = _problem()
    ref = PackedTMOperatorPC(LAT, kappa=KAPPA, mu=MU,
                             backend="xla").apply(u_pk, psi_pk)
    lmesh = LatticeMesh.make(LAT, 1, 1, 2, devices=cpu_devices)
    op = ShardedTMOperatorPC(LAT, lmesh, kappa=KAPPA, mu=MU,
                             overlap=True, backend="pallas",
                             interpret=True, block_z=2)
    u_ext = op.extend_gauge(lmesh.shard_gauge(u_pk))
    out = op.apply(u_ext, lmesh.shard_spinor(psi_pk))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5)


@pytest.mark.slow
def test_y_sharded_production_shape(cpu_devices):
    """3-axis mesh == single-device at a 48^3x96-PROPORTIONED volume.

    (2, 2, 2) t x z x y over 16x16x48x96 (memory-scaled config 5,
    matching tests/test_sharded.py::test_sharded_apply_production_shape
    but with the full 3-axis decomposition): Tl=48, Zl=24, Yl=8 —
    the y shard is the thinnest, production-realistic face mix."""
    lat = Lattice((16, 16, 48, 96))
    u = apply_boundary_phase_dev(
        su3.random_gauge_dev(jax.random.PRNGKey(3), lat), lat)
    psi = random_spinor_dev(jax.random.PRNGKey(4), lat, parities=1)
    u_pk, psi_pk = pack_gauge(u), pack_spinor(psi)
    del u, psi
    ref_op = PackedTMOperatorPC(lat, kappa=KAPPA, mu=MU, backend="xla")
    ref = np.asarray(ref_op.apply(u_pk, psi_pk))

    lmesh = LatticeMesh.make(lat, 2, 2, 2, devices=cpu_devices)
    op = ShardedTMOperatorPC(lat, lmesh, kappa=KAPPA, mu=MU,
                             backend="xla", overlap=True)
    u_ext = jax.jit(op.extend_gauge)(lmesh.shard_gauge(u_pk))
    out = jax.jit(op.apply)(u_ext, lmesh.shard_spinor(psi_pk))
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-5)


@pytest.mark.slow
def test_y_sharded_clover_and_halo_full(cpu_devices):
    """TM-clover on a (2,1,2) mesh (epi_corr y regions) and the
    full-spinor (halo_half=False) y exchange."""
    from tpuqcd.operators import CloverData, PackedTMCloverOperatorPC
    from tpuqcd.parallel.sharded import ShardedTMCloverOperatorPC
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

    lmesh = LatticeMesh.make(LAT, 2, 1, 2, devices=cpu_devices)
    op = ShardedTMCloverOperatorPC(LAT, lmesh, kappa=KAPPA, mu=MU,
                                   csw=CSW, backend="xla", overlap=True)
    fields = op.extend_fields(*fields_ref)
    psi_sh = lmesh.shard_spinor(psi_pk)
    out = jax.jit(lambda f, p: op.apply(f, p))(fields, psi_sh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5)

    # plain TM, full-spinor halo variant
    tm_ref = PackedTMOperatorPC(LAT, kappa=KAPPA, mu=MU,
                                backend="xla").apply(u_pk, psi_pk)
    tm = ShardedTMOperatorPC(LAT, lmesh, kappa=KAPPA, mu=MU,
                             overlap=True, backend="xla",
                             halo_half=False)
    u_ext = tm.extend_gauge(lmesh.shard_gauge(u_pk))
    out2 = tm.apply(u_ext, psi_sh)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(tm_ref),
                               atol=3e-5)
