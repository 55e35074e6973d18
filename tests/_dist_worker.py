"""Worker process for the multi-process distribution test.

Launched by tests/test_dist.py once per process with TPUQCD_DIST env
bootstrapping; applies the sharded TM operator over a mesh of GLOBAL
devices (2 processes x 2 local CPU devices) and writes the result norm
plus a probe value from process 0.
"""
import os
import sys

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)

from tpuqcd.parallel.dist import (all_processes_agree, global_put,  # noqa
                                  init_distributed, is_multiprocess)

init_distributed()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from tpuqcd import su3  # noqa: E402
from tpuqcd.fields import apply_boundary_phase_dev, random_spinor_dev  # noqa
from tpuqcd.lattice import Lattice  # noqa: E402
from tpuqcd.parallel.mesh import LatticeMesh  # noqa: E402
from tpuqcd.parallel.sharded import ShardedTMOperatorPC  # noqa: E402
from tpuqcd.utils.packed import pack_gauge, pack_spinor  # noqa: E402


def main(outfile: str) -> None:
    assert jax.process_count() == 2, jax.process_count()
    assert is_multiprocess()
    assert all_processes_agree(0.12, "kappa")

    lat = Lattice((4, 4, 4, 8))
    u = apply_boundary_phase_dev(
        su3.random_gauge_dev(jax.random.PRNGKey(0), lat), lat)
    psi = random_spinor_dev(jax.random.PRNGKey(1), lat, parities=1)

    lmesh = LatticeMesh.make(lat, nt=4, nz=1, devices=jax.devices())
    op = ShardedTMOperatorPC(lat, lmesh, kappa=0.12, mu=0.05,
                             backend="xla", interpret=True)
    u_sh = lmesh.shard_gauge(pack_gauge(u))
    b_sh = lmesh.shard_spinor(pack_spinor(psi))

    @jax.jit
    def apply_norm(u_pk, b_pk):
        u_ext = op.extend_gauge(u_pk)
        y = op.apply(u_ext, b_pk)
        return jnp.sum(y * y)

    n2 = float(apply_norm(u_sh, b_sh))
    if jax.process_index() == 0:
        with open(outfile, "w") as f:
            f.write(f"{n2:.17e}\n")
    # every process must agree on the reduction (psum semantics)
    assert all_processes_agree(n2, "norm2")


if __name__ == "__main__":
    main(sys.argv[1])
