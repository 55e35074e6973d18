"""Solver benchmark / validation run (MG_invert_test / MG_bench
equivalent, [U]; SURVEY.md C30): one solve against a random source with
full reporting — iteration counts, certified residual, GFLOP/s.

    python -m tpuqcd.cli.run_invert --config examples/invert.yaml
"""
from __future__ import annotations

import numpy as np

from .common import log, make_solver, parse_args, setup_gauge


def main():
    import jax
    import jax.numpy as jnp
    from ..solvers.reductions import norm2
    from ..utils.profile import Profile, solve_flops

    cfg, args = parse_args(__doc__)
    lat, u_full, u_pk, u_dev = setup_gauge(cfg)
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


if __name__ == "__main__":
    main()
