#!/usr/bin/env python
"""Config-5 scale proof: the flagship 48^3x96 volume on ONE v5e
(BASELINE.json:11; VERDICT r2 #5 / r3 missing #2).

Runs the production Dslash at the flagship volume and ONE certified
twisted-mass solve: bf16 sloppy CG-NE inner iterations on-chip with the
true residual certified by the ON-CHIP df64 operator
(ops/dslash_df64.py — double-single f32 pairs, gauge kept native f32;
an f64-gauge copy alone would be 6.1 GB and XLA's emulated-f64 operator
measured 15.8-16.2 GiB, neither of which fits the 15.75 GiB v5e next to
the solver workspace).  Prints JSON lines: dslash GF/s (bench.py
conventions), solve wallclock/iters/relres, and the device's HBM use.

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
    """Peak/in-use HBM.  The axon backend's memory_stats() returns None
    (VERDICT r4 weak #4), so fall back to summing the live device
    arrays — not a true allocator peak, but a real measured number for
    the persistent set on successful runs (OOM reports remain the only
    peak evidence when allocation fails)."""
    dev = jax.devices()[0]
    st = None
    try:
        st = dev.memory_stats()
    except Exception:
        pass
    if st:
        print(json.dumps({
            "metric": f"hbm_{tag}",
            "value": round(st.get("peak_bytes_in_use", 0) / 2**30, 2),
            "unit": "GiB",
            "in_use_gib": round(st.get("bytes_in_use", 0) / 2**30, 2)}),
            flush=True)
        return
    try:
        live = sum(int(a.nbytes) for a in jax.live_arrays()
                   if list(a.devices())[0].platform != "cpu")
        print(json.dumps({
            "metric": f"hbm_{tag}", "value": round(live / 2**30, 2),
            "unit": "GiB", "source": "live_arrays (allocator stats "
            "unavailable on this backend; transients not counted)"}),
            flush=True)
    except Exception as e:
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
    # both compiler reports recorded in .bench_logs.  The true-residual
    # path is the ON-CHIP df64 operator (ops/dslash_df64.py; SURVEY.md
    # §8.3 hard part #1): ~2^-48 relative precision from f32 pairs with
    # the gauge kept native f32, so no f64 gauge copy (6.1 GiB) and no
    # emulated-f64 field buffers — the round-4 host-CPU stage (~10 min
    # per residual pass on this 1-core box) is gone.
    from tpuqcd.operators import PackedTMOperatorPC
    from tpuqcd.ops.dslash_df64 import TMOperatorPCDF64
    from tpuqcd.solvers.cg import _cg_cycle
    from tpuqcd.solvers.reductions import norm2
    from tpuqcd.utils import df64 as df

    b = random_spinor_dev(jax.random.PRNGKey(2), lat)
    b_pk = jnp.stack([pack_spinor(b[0]), pack_spinor(b[1])])
    del b
    sdt = jnp.bfloat16 if args.sloppy == "bfloat16" else jnp.float32
    pc_s = PackedTMOperatorPC(lat, kappa=args.kappa, mu=args.mu)
    pc_df = TMOperatorPCDF64(lat, kappa=args.kappa, mu=args.mu)
    u_s = u_pk.astype(sdt)

    inner_cap = 2000

    # LEG-STAGED df64 programs (apply_staged/residual_staged): the
    # monolithic df64 residual jit OOM'd at 48^3x96 (RESOURCE_EXHAUSTED
    # — the unrolled 8-leg stencil's transients on top of the ~5.2 GiB
    # persistent set), so each XLA execution covers 2 hop legs and XLA
    # frees its transients at exit.
    def prepare_df(u_a, b_f32):
        bhat = pc_df.prepare_staged(u_a, (b_f32, jnp.zeros_like(b_f32)))
        return bhat, jax.jit(df.norm2_f64)(bhat)

    def resid_df(u_a, x_df, bhat_df):
        r_df, rsq = pc_df.residual_staged(u_a, x_df, bhat_df)
        # the residual's magnitude is far above the df64 noise floor,
        # so its hi word is the exact f32 rounding of the true residual
        return df.hi(r_df), rsq

    @jax.jit
    def inner(u_sl, r32):
        r_s = r32.astype(sdt)
        bn = pc_s.apply_dagger(u_sl, r_s)
        dx, _, k = _cg_cycle(
            lambda x: pc_s.apply_dagger(u_sl, pc_s.apply(u_sl, x)),
            bn, jnp.zeros_like(bn),
            (args.inner_tol * args.inner_tol) * norm2(bn), inner_cap)
        return dx.astype(jnp.float32), k

    @partial(jax.jit, donate_argnums=(0,))
    def update(x_df, dx):
        return df.add_f(x_df, dx)

    # prepare once (one df64 dslash pass, per-source cost in
    # production) and FREE the full-field source (1.02 GiB).
    bhat_df, bsq_a = prepare_df(u_pk, b_pk)
    bsq = float(bsq_a)
    del b_pk
    _hbm("after_prepare")

    def staged_solve():
        x_df = (jnp.zeros(bhat_df[0].shape, jnp.float32),
                jnp.zeros(bhat_df[0].shape, jnp.float32))
        total = 0
        rel = 1.0
        for _ in range(40):
            r32, rsq = resid_df(u_pk, x_df, bhat_df)
            rel = (float(rsq) / bsq) ** 0.5
            if rel <= args.tol or total >= args.maxiter:
                break
            dx, k = inner(u_s, r32)
            del r32
            total += 2 * int(k) + 1
            x_df = update(x_df, dx)
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
        "hp": "df64_onchip", "dims": args.dims}), flush=True)
    _hbm("after_solve")


if __name__ == "__main__":
    main()
