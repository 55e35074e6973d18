"""Multi-process distribution (VERDICT r1 missing #7): two OS processes
form one global JAX runtime via jax.distributed (the TPU-native stand-in
for the reference's `mpirun -np N` launch, `lib/comm_mpi.cpp` [U],
SURVEY.md §6.8), and the UNCHANGED sharded operator stack runs over the
global 4-device mesh (2 procs x 2 local CPU devices).

The axon TPU plugin force-registers itself via /root/.axon_site on
PYTHONPATH, which breaks JAX_PLATFORMS=cpu in subprocesses — the
launcher strips it (a real pod launch simply runs one process per host
with the TPU runtime).
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_sharded_apply(tmp_path):
    port = _free_port()
    out = tmp_path / "norm.txt"
    env_base = {k: v for k, v in os.environ.items()
                if not k.startswith(("JAX_", "XLA_", "PYTHONPATH",
                                     "TPUQCD_"))}
    procs = []
    for pid in range(2):
        env = dict(env_base,
                   JAX_PLATFORMS="cpu",
                   XLA_FLAGS="--xla_force_host_platform_device_count=2",
                   TPUQCD_DIST="1",
                   TPUQCD_COORDINATOR=f"127.0.0.1:{port}",
                   TPUQCD_NUM_PROCS="2",
                   TPUQCD_PROC_ID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests",
                                          "_dist_worker.py"), str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=600)
        logs.append(stdout)
    for p, l in zip(procs, logs):
        assert p.returncode == 0, l[-4000:]

    # single-process reference on the host CPU backend
    import jax
    import jax.numpy as jnp
    from tpuqcd import su3
    from tpuqcd.fields import apply_boundary_phase_dev, random_spinor_dev
    from tpuqcd.lattice import Lattice
    from tpuqcd.operators import PackedTMOperatorPC
    from tpuqcd.utils.packed import pack_gauge, pack_spinor
    lat = Lattice((4, 4, 4, 8))
    u = apply_boundary_phase_dev(
        su3.random_gauge_dev(jax.random.PRNGKey(0), lat), lat)
    psi = random_spinor_dev(jax.random.PRNGKey(1), lat, parities=1)
    op = PackedTMOperatorPC(lat, kappa=0.12, mu=0.05, backend="xla")
    y = op.apply(pack_gauge(u), pack_spinor(psi))
    want = float(jnp.sum(y * y))

    got = float(out.read_text().strip())
    np.testing.assert_allclose(got, want, rtol=1e-5)
