"""Interior/exterior-split sharded Dslash (parallel/overlap.py) ==
the single-device operator, on the virtual CPU mesh (SURVEY.md §5
item 3 discipline applied to the C7 overlap engine).

One (2, 2) mesh exercises both t- and z-boundary repairs; apply and
apply_dagger cover both projector tables (normal = their composition).
Interpret-mode Pallas under shard_map is slow, so everything shares one
test."""
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


def test_overlap_matches_single_device(cpu_devices):
    u = apply_boundary_phase_dev(
        su3.random_gauge_dev(jax.random.PRNGKey(0), LAT), LAT)
    psi = random_spinor_dev(jax.random.PRNGKey(1), LAT, parities=1)
    u_pk, psi_pk = pack_gauge(u), pack_spinor(psi)
    ref_op = PackedTMOperatorPC(LAT, kappa=KAPPA, mu=MU, backend="xla")

    lmesh = LatticeMesh.make(LAT, 2, 2, devices=cpu_devices)
    # backend="xla": the repair math is backend-agnostic and the
    # interpret-mode Pallas interior costs ~10 min of compile here;
    # the Pallas interior itself is covered by test_sharded/test_dslash
    op = ShardedTMOperatorPC(LAT, lmesh, kappa=KAPPA, mu=MU,
                             backend="xla", block_z=2, overlap=True)
    u_sh = lmesh.shard_gauge(u_pk)
    psi_sh = lmesh.shard_spinor(psi_pk)
    u_ext = jax.jit(op.extend_gauge)(u_sh)

    # jit the whole program: eager shard_map dispatches each unrolled
    # plane op of the boundary repair separately (minutes); one trace
    # compiles it all (and matches how production solvers run it)
    out = jax.jit(op.apply)(u_ext, psi_sh)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(ref_op.apply(u_pk, psi_pk)),
                               atol=5e-5, err_msg="apply")
    outd = jax.jit(op.apply_dagger)(u_ext, psi_sh)
    np.testing.assert_allclose(
        np.asarray(outd), np.asarray(ref_op.apply_dagger(u_pk, psi_pk)),
        atol=5e-5, err_msg="dagger")

    b = random_spinor_dev(jax.random.PRNGKey(7), LAT)
    b_pk = jnp.stack([pack_spinor(b[0]), pack_spinor(b[1])])
    b_sh = jax.device_put(
        b_pk, jax.NamedSharding(lmesh.mesh,
                                jax.P(None, *lmesh.spinor_spec())))
    bhat = jax.jit(op.prepare)(u_ext, b_sh)
    bhat_ref = ref_op.prepare(u_pk, b_pk)
    np.testing.assert_allclose(np.asarray(bhat), np.asarray(bhat_ref),
                               atol=5e-5, err_msg="prepare")
    x = jax.jit(op.reconstruct)(u_ext, bhat, b_sh)
    np.testing.assert_allclose(
        np.asarray(x),
        np.asarray(ref_op.reconstruct(u_pk, bhat_ref, b_pk)),
        atol=5e-5, err_msg="reconstruct")


@pytest.mark.slow
def test_overlap_pallas_fused_epilogue(cpu_devices):
    """Pallas interior WITH the fused epilogue (kernel_kwargs path) +
    slab corrections == single-device, on a t-only (2,1) mesh.

    The xla-backend test above proves the correction-transform math
    (epi_full/epi_corr); this one proves the same epilogues fuse into
    the interpret-mode Pallas interior (kernel_kwargs plumbing), which
    is the production multi-chip configuration."""
    lat = Lattice((4, 4, 2, 4))
    u = apply_boundary_phase_dev(
        su3.random_gauge_dev(jax.random.PRNGKey(0), lat), lat)
    psi = random_spinor_dev(jax.random.PRNGKey(1), lat, parities=1)
    u_pk, psi_pk = pack_gauge(u), pack_spinor(psi)
    ref_op = PackedTMOperatorPC(lat, kappa=KAPPA, mu=MU, backend="xla")

    lmesh = LatticeMesh.make(lat, 2, 1, devices=cpu_devices[:2])
    op = ShardedTMOperatorPC(lat, lmesh, kappa=KAPPA, mu=MU,
                             backend="pallas", interpret=True,
                             block_z=2, overlap=True)
    u_ext = jax.jit(op.extend_gauge)(lmesh.shard_gauge(u_pk))
    psi_sh = lmesh.shard_spinor(psi_pk)
    out = jax.jit(op.apply)(u_ext, psi_sh)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(ref_op.apply(u_pk, psi_pk)),
                               atol=5e-5)
