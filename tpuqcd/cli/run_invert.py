"""Solver benchmark / validation run (MG_invert_test / MG_bench
equivalent, [U]; SURVEY.md C30): one solve against a random source with
full reporting — iteration counts, certified residual, GFLOP/s.

    python -m tpuqcd.cli.run_invert --config examples/invert.yaml
"""
from __future__ import annotations

import numpy as np

from .common import (ensemble_members, log, make_solver, parse_args,
                     setup_gauge)


def main():
    cfg, _args = parse_args(__doc__)
    for ctag, c in ensemble_members(cfg):
        if ctag:
            log.info("=== ensemble member %s ===", ctag)
        _invert(c)


def _invert(cfg):
    import jax
    import jax.numpy as jnp
    from ..solvers.reductions import norm2
    from ..utils.profile import Profile, solve_flops

    lat, u_full, u_pk, u_dev = setup_gauge(cfg)
    if getattr(cfg.action, "epsbar", 0.0) != 0.0:
        return _main_ndeg(cfg, lat, u_pk)
    if getattr(cfg.action, "mu_list", ()):
        return _main_musweep(cfg, lat, u_pk)
    solve = make_solver(cfg, lat, u_pk, u_full)

    kr, ki = jax.random.split(jax.random.PRNGKey(99))
    b = jax.lax.complex(
        jax.random.normal(kr, (*lat.full_shape, 4, 3), dtype=jnp.float32),
        jax.random.normal(ki, (*lat.full_shape, 4, 3), dtype=jnp.float32))

    from ..phys.propagator import full_to_packed
    from ..solve import full_system_relres
    csw = float(getattr(cfg.action, "csw", 0.0) or 0.0)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        b_pk_host = full_to_packed(b, lat)

    prof = Profile()
    if cfg.mg.enabled:
        with prof.phase("solve"):
            x = solve(b)                  # complex128 (f64 end-to-end)
            jax.block_until_ready(x)
        t = prof.times["solve"]
        # independent full-system check against the csw-aware operator
        with jax.default_device(cpu):
            x_pk_host = full_to_packed(x, lat)
        rel = full_system_relres(
            jax.device_put(u_pk, cpu), b_pk_host, x_pk_host, lat,
            kappa=cfg.action.kappa, mu=cfg.action.mu, csw=csw)
    else:
        # direct packed path: keep the f64 iterate end-to-end so the
        # certified tolerance survives the final residual check (works on
        # TPU too — packed f64, no complex128)
        from ..solve import make_clover_fields, solve_tm
        from .common import accel
        b_pk = jax.device_put(b_pk_host, accel())
        sloppy = (jnp.bfloat16 if cfg.solver.sloppy_dtype == "bfloat16"
                  else jnp.float32)
        clover = (make_clover_fields(u_pk, lat, kappa=cfg.action.kappa,
                                     mu=cfg.action.mu, csw=csw)
                  if csw != 0.0 else None)
        with prof.phase("solve"):
            res = solve_tm(u_pk, b_pk, lat, kappa=cfg.action.kappa,
                           mu=cfg.action.mu, tol=cfg.solver.tol,
                           maxiter=cfg.solver.maxiter,
                           inner_tol=cfg.solver.inner_tol,
                           solver=cfg.solver.solver, sloppy_dtype=sloppy,
                           backend=cfg.solver.backend, csw=csw,
                           clover=clover)
            jax.block_until_ready(res.x)
        t = prof.times["solve"]
        log.info("solver: relres=%.2e iters=%d", float(res.relres),
                 int(res.iters))
        prof.add_flops("solve", solve_flops(lat, int(res.iters)))
        # full-system residual in packed f64, csw-aware operator
        rel = full_system_relres(
            u_pk, b_pk, res.x, lat, kappa=cfg.action.kappa,
            mu=cfg.action.mu, csw=csw,
            clover_pk=(clover[0] if clover is not None else None))
    gf = prof.flops["solve"] / t / 1e9 if prof.flops["solve"] else 0.0
    log.info("wallclock %.3f s (%.1f GFLOP/s), certified |r|/|b| = %.3e",
             t, gf, rel)
    print(f"RESULT solve_seconds={t:.3f} relres={rel:.3e} "
          f"gflops={gf:.1f} dims={lat.dims} tol={cfg.solver.tol}")


def _main_musweep(cfg, lat, u_pk):
    """Quark-mass sweep: one multi-shift CG Krylov space solves
    M(mu_i) x = b for every mu in action.mu_list (reference
    `inv_multi_cg_quda.cpp` mass-tuning [U]; SURVEY.md C11)."""
    import time

    import jax
    import jax.numpy as jnp
    from ..phys.propagator import full_to_packed
    from ..solve import solve_tm_musweep
    from .common import accel

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        kr, ki = jax.random.split(jax.random.PRNGKey(99))
        b = jax.lax.complex(
            jax.random.normal(kr, (*lat.full_shape, 4, 3),
                              dtype=jnp.float32),
            jax.random.normal(ki, (*lat.full_shape, 4, 3),
                              dtype=jnp.float32))
        b_pk = full_to_packed(b, lat)
    # multi-chip: route the matvec through the sharded fine level
    lmesh = None
    mesh_cfg = getattr(cfg, "mesh", None)
    if mesh_cfg is not None and \
            mesh_cfg.nt * mesh_cfg.nz * mesh_cfg.ny > 1:
        from ..parallel.mesh import LatticeMesh
        lmesh = LatticeMesh.make(lat, mesh_cfg.nt, mesh_cfg.nz,
                                 mesh_cfg.ny,
                                 devices=jax.devices(accel().platform))
        log.info("musweep lattice mesh: %d x %d x %d devices over "
                 "(T, Z, Y)", mesh_cfg.nt, mesh_cfg.nz, mesh_cfg.ny)
    b_acc = b_pk if lmesh is not None \
        else jax.device_put(b_pk, accel())
    mu_list = tuple(float(m) for m in cfg.action.mu_list)
    t0 = time.perf_counter()
    xs, relres, iters = solve_tm_musweep(
        u_pk, b_acc, lat, kappa=cfg.action.kappa, mu_list=mu_list,
        tol=cfg.solver.tol, maxiter=cfg.solver.maxiter,
        backend=cfg.solver.backend, lmesh=lmesh)
    jax.block_until_ready(xs)
    dt = time.perf_counter() - t0
    for i, mu in enumerate(mu_list):
        log.info("musweep mu=%g: certified relres=%.2e", mu,
                 float(relres[i]))
    log.info("musweep: %d masses, %d multishift iters, %.2f s total "
             "(one Krylov space)", len(mu_list), int(iters), dt)


def _main_ndeg(cfg, lat, u_pk):
    """Non-degenerate doublet solve (heavy s/c pair; reference
    MG_invert_test with QUDA_TWIST_NONDEG_DOUBLET [U], SURVEY.md C5)."""
    import jax
    import jax.numpy as jnp
    from ..operators import PackedNdegTMOperatorPC
    from ..phys.propagator import full_to_packed
    from ..solve import solve_ndeg_tm
    from ..utils import pkalg as pk
    from ..utils.profile import Profile
    from .common import accel

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        keys = jax.random.split(jax.random.PRNGKey(99), 4)
        cols = []
        for kk in keys[:2]:
            kr, ki = jax.random.split(kk)
            b = jax.lax.complex(
                jax.random.normal(kr, (*lat.full_shape, 4, 3),
                                  dtype=jnp.float32),
                jax.random.normal(ki, (*lat.full_shape, 4, 3),
                                  dtype=jnp.float32))
            cols.append(full_to_packed(b, lat))
        b_pk = jnp.stack(cols)               # [2(flavor), 2par, ...]
    # multi-chip: the sharded doublet operator over the config mesh
    # (reference: heavy s/c invertQuda under mpirun --gridsize [U])
    lmesh = None
    mesh_cfg = getattr(cfg, "mesh", None)
    if mesh_cfg is not None and \
            mesh_cfg.nt * mesh_cfg.nz * mesh_cfg.ny > 1:
        import dataclasses as _dc

        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import LatticeMesh
        from ..parallel.sharded import ShardedNdegTMOperatorPC
        from ..solve import solve_ndeg_tm_sharded
        lmesh = LatticeMesh.make(lat, mesh_cfg.nt, mesh_cfg.nz,
                                 mesh_cfg.ny,
                                 devices=jax.devices(accel().platform))
        log.info("ndeg lattice mesh: %d x %d x %d devices over (T, Z, Y)",
                 mesh_cfg.nt, mesh_cfg.nz, mesh_cfg.ny)
        overlap = (cfg.solver.backend == "xla" or mesh_cfg.ny > 1
                   or cfg.solver.comm_policy == "overlap")
        op_s = ShardedNdegTMOperatorPC(
            lat, lmesh, kappa=cfg.action.kappa, mubar=cfg.action.mubar,
            epsbar=cfg.action.epsbar, backend=cfg.solver.backend,
            overlap=overlap)
        op_hp = _dc.replace(op_s, backend="xla", overlap=True)
        u_ext = op_s.extend_gauge(
            lmesh.shard_gauge(u_pk.astype(jnp.float32)))
        b_acc = jax.device_put(b_pk, NamedSharding(
            lmesh.mesh, P(None, None, *lmesh.spinor_spec())))
    else:
        b_acc = jax.device_put(b_pk, accel())
    prof = Profile()
    with prof.phase("solve"):
        if lmesh is not None:
            res = solve_ndeg_tm_sharded(
                op_s, op_hp, u_ext, u_ext.astype(jnp.float64), b_acc,
                tol=cfg.solver.tol, maxiter=cfg.solver.maxiter,
                inner_tol=cfg.solver.inner_tol)
        else:
            res = solve_ndeg_tm(u_pk, b_acc, lat, kappa=cfg.action.kappa,
                                mubar=cfg.action.mubar,
                                epsbar=cfg.action.epsbar,
                                tol=cfg.solver.tol,
                                maxiter=cfg.solver.maxiter,
                                inner_tol=cfg.solver.inner_tol,
                                backend=cfg.solver.backend)
        jax.block_until_ready(res.x)
    t = prof.times["solve"]
    log.info("ndeg solve: relres=%.2e iters=%d", float(res.relres),
             int(res.iters))
    # independent full-doublet residual: M_nd x vs b in packed f64
    pc = PackedNdegTMOperatorPC(lat, kappa=cfg.action.kappa,
                                mubar=cfg.action.mubar,
                                epsbar=cfg.action.epsbar, backend="xla")
    u64 = u_pk.astype(jnp.float64)
    # gather the (possibly mesh-sharded) solution for the host-side cert
    x64 = jnp.asarray(jax.device_get(res.x), dtype=jnp.float64) \
        if lmesh is not None else res.x

    def full_m(chi):
        """full two-parity M_nd on [2fl, 2par, 2ri, ...] (site + hops)."""
        from ..ops.dslash_xla import dslash_eo_dev_ri
        k = cfg.action.kappa
        out = []
        for par in range(2):
            d = jnp.stack([dslash_eo_dev_ri(u64, chi[f, 1 - par],
                                            1 - par, lat)
                           for f in range(2)])
            out.append(pc._site(chi[:, par], False)
                       - jnp.asarray(k, chi.dtype) * d)
        return jnp.stack(out, axis=1)

    r = b_pk.astype(jnp.float64) - full_m(x64)
    num = float(pk.norm2(r, dtype=jnp.float64))
    den = float(pk.norm2(b_pk.astype(jnp.float64), dtype=jnp.float64))
    rel = (num / max(den, 1e-300)) ** 0.5
    log.info("wallclock %.3f s, certified doublet |r|/|b| = %.3e", t, rel)
    print(f"RESULT solve_seconds={t:.3f} relres={rel:.3e} "
          f"dims={lat.dims} tol={cfg.solver.tol} ndeg=1")


if __name__ == "__main__":
    main()
