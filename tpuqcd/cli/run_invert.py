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

    prof = Profile()
    if cfg.mg.enabled:
        with prof.phase("solve"):
            x = solve(b)
            jax.block_until_ready(x)
        t = prof.times["solve"]
        from ..operators import TMOperator
        m = TMOperator(lat, kappa=cfg.action.kappa, mu=cfg.action.mu)
        u128 = u_full.astype(jnp.complex128)
        r = b.astype(jnp.complex128) - m.apply(u128,
                                               x.astype(jnp.complex128))
        rel = float(jnp.sqrt(norm2(r) / norm2(b)))
    else:
        # direct packed path: keep the f64 iterate end-to-end so the
        # certified tolerance survives the final residual check (works on
        # TPU too — packed f64, no complex128)
        from ..phys.propagator import full_to_packed
        from ..solve import solve_tm
        from ..ops.dslash_xla import dslash_eo_dev_ri
        from ..operators import twist_apply_pk
        from .common import accel
        b_pk = jax.device_put(full_to_packed(b, lat), accel())
        sloppy = (jnp.bfloat16 if cfg.solver.sloppy_dtype == "bfloat16"
                  else jnp.float32)
        with prof.phase("solve"):
            res = solve_tm(u_pk, b_pk, lat, kappa=cfg.action.kappa,
                           mu=cfg.action.mu, tol=cfg.solver.tol,
                           maxiter=cfg.solver.maxiter,
                           inner_tol=cfg.solver.inner_tol,
                           solver=cfg.solver.solver, sloppy_dtype=sloppy,
                           backend=cfg.solver.backend)
            jax.block_until_ready(res.x)
        t = prof.times["solve"]
        log.info("solver: relres=%.2e iters=%d", float(res.relres),
                 int(res.iters))
        prof.add_flops("solve", solve_flops(lat, int(res.iters)))
        # full-system residual in packed f64
        k = cfg.action.kappa
        u64 = u_pk.astype(jnp.float64)
        b64 = b_pk.astype(jnp.float64)
        x64 = res.x
        re_ = twist_apply_pk(x64[0], k, cfg.action.mu) - \
            k * dslash_eo_dev_ri(u64, x64[1], 1, lat)
        ro_ = twist_apply_pk(x64[1], k, cfg.action.mu) - \
            k * dslash_eo_dev_ri(u64, x64[0], 0, lat)
        num = norm2(b64[0] - re_) + norm2(b64[1] - ro_)
        den = norm2(b64[0]) + norm2(b64[1])
        rel = float(jnp.sqrt(num / den))
    gf = prof.flops["solve"] / t / 1e9 if prof.flops["solve"] else 0.0
    log.info("wallclock %.3f s (%.1f GFLOP/s), certified |r|/|b| = %.3e",
             t, gf, rel)
    print(f"RESULT solve_seconds={t:.3f} relres={rel:.3e} "
          f"gflops={gf:.1f} dims={lat.dims} tol={cfg.solver.tol}")


if __name__ == "__main__":
    main()
