#!/usr/bin/env python
"""Batched multi-RHS solve benchmark (SURVEY.md §8.4: "batch the 12 RHS
of a propagator — a genuine TPU win over the reference").

Times one propagator's 12 columns at 16^3x32, sequential vs batched:

  - plain mixed-precision CG: 12 x solve_tm  vs  solve_tm_batch
  - (--mg) MG-preconditioned: 12 x solve_tm_mg  vs  solve_tm_mg_batch

The batched paths vmap the solver over the RHS axis — one traced
iteration stream, per-column convergence scalars — so the Dslash runs
on 12-wide operands (better VPU occupancy, amortized control overhead).
Prints one JSON line per variant plus a summary speedup line.

Run on the real TPU: ``python bench_batch.py [--mg]``.
"""
import argparse
import json
import os
import socket
import sys
import time

if "axon" in os.environ.get("PYTHONPATH", ""):
    # fail fast instead of hanging minutes inside jax backend init when
    # the remote-TPU service is down (it dials localhost:8083)
    try:
        socket.create_connection(("localhost", 8083), timeout=3).close()
    except OSError:
        sys.exit("bench_batch: axon TPU service :8083 unreachable — "
                 "retry when the service is back (or run on CPU with "
                 "`env PYTHONPATH= JAX_PLATFORMS=cpu`)")

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dims", type=int, nargs=4, default=[16, 16, 16, 32])
    ap.add_argument("--kappa", type=float, default=0.1373)
    ap.add_argument("--mu", type=float, default=0.009)
    ap.add_argument("--tol", type=float, default=1e-10)
    ap.add_argument("--n-rhs", type=int, default=12)
    ap.add_argument("--mg", action="store_true")
    args = ap.parse_args()

    from tpuqcd import su3
    from tpuqcd.fields import apply_boundary_phase_dev, random_spinor_dev
    from tpuqcd.lattice import Lattice
    from tpuqcd.utils.packed import pack_gauge, pack_spinor

    lat = Lattice(tuple(args.dims))
    u = apply_boundary_phase_dev(
        su3.random_gauge_dev(jax.random.PRNGKey(0), lat), lat)
    u_pk = jax.block_until_ready(pack_gauge(u))
    bs = []
    for i in range(args.n_rhs):
        b = random_spinor_dev(jax.random.PRNGKey(100 + i), lat)
        bs.append(jnp.stack([pack_spinor(b[0]), pack_spinor(b[1])]))
    b_pks = jax.block_until_ready(jnp.stack(bs))
    del u, bs

    if args.mg:
        from tpuqcd.mg.dsolve import DeviceMGParams
        from tpuqcd.solve import (setup_multigrid, solve_tm_mg,
                                  solve_tm_mg_batch)
        params = DeviceMGParams(n_vec=(8, 8),
                                block=((4, 4, 4, 4), (2, 2, 2, 2)),
                                setup_iters=40)
        t0 = time.perf_counter()
        mg = setup_multigrid(u_pk, lat, kappa=args.kappa, mu=args.mu,
                             params=params)
        print(json.dumps({"metric": "mg_setup_seconds",
                          "value": round(time.perf_counter() - t0, 2),
                          "unit": "s"}), flush=True)

        def seq():
            outs = []
            for i in range(args.n_rhs):
                r = solve_tm_mg(mg, b_pks[i], tol=args.tol)
                outs.append(r)
            jax.block_until_ready(outs[-1].x)
            return max(float(r.relres) for r in outs)

        def bat():
            r = solve_tm_mg_batch(mg, b_pks, tol=args.tol)
            jax.block_until_ready(r.x)
            return float(jnp.max(r.relres))
    else:
        from tpuqcd.solve import solve_tm, solve_tm_batch

        # one traced program per variant (the python-level solve drivers
        # must run UNDER jit or every iteration dispatches individually
        # over the remote-compile tunnel)
        @jax.jit
        def one_jit(u_a, b_a):
            r = solve_tm(u_a, b_a, lat, kappa=args.kappa, mu=args.mu,
                         tol=args.tol)
            return r.x, r.relres, r.iters

        @jax.jit
        def bat_jit(u_a, bs):
            r = solve_tm_batch(u_a, bs, lat, kappa=args.kappa,
                               mu=args.mu, tol=args.tol)
            return r.x, r.relres, r.iters

        # iteration counts discriminate the two possible causes of a
        # batched slowdown: same-iters-but-slower = vmapped-kernel
        # inefficiency; more-iters = lockstep/refine stall (VERDICT r4
        # missing #4)
        iters_out = {}

        def seq():
            rels = []
            its = 0
            for i in range(args.n_rhs):
                x, rel, it = one_jit(u_pk, b_pks[i])
                rels.append(rel)
                its += int(it)
            jax.block_until_ready(x)
            iters_out["sequential"] = its
            return max(float(r) for r in rels)

        def bat():
            x, rel, it = bat_jit(u_pk, b_pks)
            jax.block_until_ready(x)
            iters_out["batched"] = int(jnp.max(it)) * args.n_rhs
            return float(jnp.max(rel))

    results = {}
    for name, fn in (("sequential", seq), ("batched", bat)):
        relres = fn()  # compile (and the MG path re-jits per shape once)
        t0 = time.perf_counter()
        relres = fn()
        dt = time.perf_counter() - t0
        results[name] = dt
        line = {"metric": f"propagator_{args.n_rhs}rhs_{name}",
                "value": round(dt, 3), "unit": "s",
                "max_relres": relres,
                "dims": args.dims,
                "path": "mg" if args.mg else "cg"}
        if not args.mg and name in iters_out:
            line["total_iters"] = iters_out[name]
        print(json.dumps(line), flush=True)
    print(json.dumps({"metric": "batched_rhs_speedup",
                      "value": round(results["sequential"]
                                     / results["batched"], 2),
                      "unit": "x", "path": "mg" if args.mg else "cg"}),
          flush=True)


if __name__ == "__main__":
    main()
