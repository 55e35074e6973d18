#!/usr/bin/env python
"""Config-5 scale proof: the flagship 48^3x96 volume on ONE v5e
(BASELINE.json:11; VERDICT r2 #5 / r3 missing #2).

Runs the production Dslash at the flagship volume and ONE certified
twisted-mass solve through solve_tm with hp_gauge="float32" (the
f64-gauge copy alone would be 6.1 GB on top of the 3.1 GB f32 gauge
and the solver workspace; the native-f32 gauge promotes
exactly into the f64 hop products, so certification is exact for the
system actually solved).  Prints JSON lines: dslash GF/s (via bench.py
conventions), solve wallclock/iters/relres, and the device's peak HBM.

    python bench_scale.py [--dims 48 48 48 96] [--kappa 0.128]
"""
import argparse
from functools import partial
import json
import os
import socket
import sys
import time

if "axon" in os.environ.get("PYTHONPATH", ""):
    try:
        socket.create_connection(("localhost", 8083), timeout=3).close()
    except OSError:
        sys.exit("bench_scale: axon TPU service unreachable")

import jax

jax.config.update("jax_enable_x64", True)

# Persistent XLA compile cache (same policy as cli/common.parse_args):
# MG setup is ~80-97% compile; cross-process reuse is free wallclock.
if (jax.devices()[0].platform != "cpu"
        and not os.environ.get("TPUQCD_NO_COMPILE_CACHE")
        and not os.environ.get("JAX_COMPILATION_CACHE_DIR")):
    _cd = os.path.expanduser("~/.cache/tpuqcd/xla")
    try:
        os.makedirs(_cd, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cd)
    except Exception:
        pass

import jax.numpy as jnp  # noqa: E402


def _hbm(tag):
    try:
        st = jax.devices()[0].memory_stats()
        print(json.dumps({
            "metric": f"hbm_{tag}",
            "value": round(st.get("peak_bytes_in_use", 0) / 2**30, 2),
            "unit": "GiB",
            "in_use_gib": round(st.get("bytes_in_use", 0) / 2**30, 2)}),
            flush=True)
    except Exception as e:      # memory_stats may be unimplemented
        print(json.dumps({"metric": f"hbm_{tag}", "value": None,
                          "error": str(e)[:120]}), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dims", type=int, nargs=4, default=[48, 48, 48, 96])
    # moderately heavy quark: the scale proof targets memory+throughput,
    # not criticality (near-kappa_c physics is bench_mg's job)
    ap.add_argument("--kappa", type=float, default=0.128)
    ap.add_argument("--mu", type=float, default=0.009)
    ap.add_argument("--tol", type=float, default=1e-10)
    ap.add_argument("--maxiter", type=int, default=8000)
    ap.add_argument("--sloppy", default="bfloat16",
                    choices=["float32", "bfloat16"],
                    help="sloppy dtype for the 48^3 solve (f32 sloppy "
                         "measured OOM: XLA bounds the program at "
                         "18.1 GiB vs the 15.75 GiB HBM; bf16 sloppy "
                         "fields fit)")
    ap.add_argument("--inner-tol", type=float, default=1e-3)
    ap.add_argument("--skip-solve", action="store_true")
    args = ap.parse_args()

    from tpuqcd import su3
    from tpuqcd.fields import apply_boundary_phase_dev, random_spinor_dev
    from tpuqcd.lattice import Lattice
    from tpuqcd.solve import solve_tm
    from tpuqcd.utils.packed import pack_gauge, pack_spinor

    lat = Lattice(tuple(args.dims))
    u = apply_boundary_phase_dev(
        su3.random_gauge_dev(jax.random.PRNGKey(0), lat), lat)
    u_pk = jax.block_until_ready(pack_gauge(u).astype(jnp.float32))
    del u
    _hbm("after_gauge")

    # --- Dslash throughput at the flagship volume (bench.py convention)
    from tpuqcd.ops.dslash_pallas import dslash_eo_pallas
    u12 = u_pk[:, :, :2]
    psi = pack_spinor(random_spinor_dev(jax.random.PRNGKey(1), lat,
                                        parities=1))
    niter = 50

    @jax.jit
    def chain(u_a, p):
        def body(i, x):
            return dslash_eo_pallas(u_a, x, 0, lat)
        x = jax.lax.fori_loop(0, niter, body, p)
        return jnp.real(jnp.ravel(x)[0])

    float(chain(u12, psi))          # warm/compile
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(chain(u12, psi))
        times.append(time.perf_counter() - t0)
    med = sorted(times)[len(times) // 2]
    gf = 1320 * lat.half_volume * niter / 1e9 / med
    print(json.dumps({
        "metric": "dslash_eo_gflops_per_chip[48cube]",
        "value": round(gf, 1), "unit": "GFLOP/s", "dims": args.dims,
        "rep_seconds": [round(t, 3) for t in times]}), flush=True)
    _hbm("after_dslash")
    del psi, u12   # the recon-12 slice is a 2.04 GiB copy

    if args.skip_solve:
        return

    # --- one certified TM solve at the flagship volume.
    # STAGED defect correction (host refine loop, one jit per phase,
    # like mg/dsolve.solve_certified): the monolithic solve_tm jit holds
    # every phase's buffers in one program and XLA bounds it at
    # 18.1 GiB (f32 sloppy) / 19.0 GiB (bf16) against 15.75 GiB HBM —
    # both compiler reports recorded in .bench_logs.  Staged, the
    # persistent set is u_pk(f32 3.05G) + u_sloppy + three f64 eo
    # fields, ~9.5 GiB peak.
    from tpuqcd.operators import PackedTMOperatorPC
    from tpuqcd.solvers.cg import _cg_cycle
    from tpuqcd.solvers.reductions import norm2

    b = random_spinor_dev(jax.random.PRNGKey(2), lat)
    b_pk = jnp.stack([pack_spinor(b[0]), pack_spinor(b[1])])
    del b
    sdt = jnp.bfloat16 if args.sloppy == "bfloat16" else jnp.float32
    pc_s = PackedTMOperatorPC(lat, kappa=args.kappa, mu=args.mu)
    pc_hp = PackedTMOperatorPC(lat, kappa=args.kappa, mu=args.mu,
                               backend="xla")
    u_s = u_pk.astype(sdt)

    # prepare + per-refine f64 residuals run ON THE HOST CPU in native
    # f64 (the on-chip f64 operator programs measured 15.8-16.2 GiB
    # alone; reports in .bench_logs).  125 GiB host RAM takes them.
    cpu = jax.devices("cpu")[0]

    # the f64 residual ALSO runs on the host: on-chip, jit(resid)'s
    # f64 operator materializes an f64 gauge + layout copies and needs
    # 16.2 GiB alone (compiler report in .bench_logs).  Host cost is a
    # few f64 dslash passes per refine on the 125 GiB-RAM CPU; the TPU
    # does what it is good at (the sloppy Krylov iteration).
    u_host = jax.device_put(u_pk, cpu)

    def resid(x64, bhat_h):
        with jax.default_device(cpu):
            xh = jax.device_put(x64, cpu)
            r = bhat_h - pc_hp.apply(u_host, xh)
            rsq = norm2(r)
        return jax.device_put(r, jax.devices()[0]), float(rsq)

    inner_cap = 2000

    @jax.jit
    def inner(u_sl, r64):
        r_s = r64.astype(sdt)
        bn = pc_s.apply_dagger(u_sl, r_s)
        dx, _, k = _cg_cycle(
            lambda x: pc_s.apply_dagger(u_sl, pc_s.apply(u_sl, x)),
            bn, jnp.zeros_like(bn),
            (args.inner_tol * args.inner_tol) * norm2(bn), inner_cap)
        return dx.astype(jnp.float32), k

    @partial(jax.jit, donate_argnums=(0,))
    def update(x64, dx):
        return x64 + dx.astype(jnp.float64)

    # prepare once (one dslash pass, per-source cost in production) and
    # FREE the full-field source: the 48^3 working set fits HBM with
    # ~57 MB to spare only without b_pk's 1.02 GiB resident (the first
    # staged attempt OOM'd by exactly that margin).
    with jax.default_device(cpu):
        bhat_h = pc_hp.prepare(u_host, jax.device_put(
            b_pk, cpu).astype(jnp.float64))
        bsq = float(norm2(bhat_h))
    del b_pk

    def staged_solve():
        x = jnp.zeros(bhat_h.shape, jnp.float64)
        total = 0
        rel = 1.0
        for _ in range(40):
            r, rsq = resid(x, bhat_h)
            rel = (rsq / bsq) ** 0.5
            if rel <= args.tol or total >= args.maxiter:
                break
            dx, k = inner(u_s, r)
            del r
            total += 2 * int(k) + 1
            x = update(x, dx)
        return rel, total

    t0 = time.perf_counter()
    rel, it = staged_solve()             # cold (compiles included)
    t_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    rel, it = staged_solve()
    t_warm = time.perf_counter() - t0
    print(json.dumps({
        "metric": "tm_solve_certified_48cube",
        "value": round(t_warm, 2), "unit": "s",
        "cold_s": round(t_cold, 2), "relres": rel,
        "iters": it, "kappa": args.kappa, "sloppy": args.sloppy,
        "dims": args.dims}), flush=True)
    _hbm("after_solve")


if __name__ == "__main__":
    main()
