#!/usr/bin/env python
"""MG solve wallclock benchmark — the second half of the contract metric
("MG twisted-mass solve wallclock to 1e-10 at 32^3x64", BASELINE.json:2).

Builds the device-resident MG hierarchy (tpuqcd.mg.dsolve) on a random
SU(3) gauge field at the contract volume, then times the certified
1e-10 solve of the full twisted-mass system.  For context it also times
the MG-preconditioned fp32 inner solve alone and (optionally) the plain
mixed-precision CG path to the same tolerance (--with-cg).

Run on the real TPU: ``python bench_mg.py [--dims 32 32 32 64]``.
Prints one JSON line per phase plus a summary line.
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
        sys.exit("bench_mg: axon TPU service :8083 unreachable — "
                 "retry when the service is back (or run on CPU with "
                 "`env PYTHONPATH= JAX_PLATFORMS=cpu`)")

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

# Count distinct XLA program compiles + total compile seconds (the MG
# setup is ~97% compile, BASELINE.md — this meters it honestly).
_COMPILES: list = []
jax.monitoring.register_event_duration_secs_listener(
    lambda event, dur, **kw: _COMPILES.append((event, dur))
    if "compile" in event else None)


def _compile_stats(since=0):
    evs = [d for e, d in _COMPILES[since:] if "backend_compile" in e]
    return {"programs": len(evs), "compile_s": round(sum(evs), 1)}


def _gauge_cache_path(dims, beta, sweeps, seed=0):
    import pathlib
    d = pathlib.Path.home() / ".cache" / "tpuqcd" / "gauges"
    d.mkdir(parents=True, exist_ok=True)
    tag = "x".join(map(str, dims))
    return d / f"hb_b{beta:g}_{tag}_s{sweeps}_k{seed}.npy"


def _load_or_thermalize(lat, dims, beta, sweeps, cache=True):
    """Thermalized gauge in device layout (WITHOUT the fermionic
    boundary phase), disk-cached so kappa scans and MG-tuning reruns
    don't redo the O(100 s) heatbath each process."""
    import numpy as np

    from tpuqcd.ops.gauge_tools import plaquette
    from tpuqcd.ops.heatbath import thermalize
    # storage is split re/im f32: complex64 D2H dies UNIMPLEMENTED on
    # the axon backend (fetch reals; rebuild complex on-device via
    # lax.complex, the same construction the heatbath itself uses)
    cplx = jax.jit(lambda r, i: jax.lax.complex(r, i))
    path = _gauge_cache_path(dims, beta, sweeps)
    if cache and path.exists():
        ri = np.load(path)
        u = cplx(jnp.asarray(ri[0]), jnp.asarray(ri[1]))
        print(json.dumps({
            "metric": "heatbath_plaquette",
            "value": round(float(plaquette(u, lat)), 6),
            "beta": beta, "sweeps": sweeps, "cached": str(path)}),
            flush=True)
        return u
    t0 = time.perf_counter()
    # Volume-scaled execution chunk: the default 20-sweep program is
    # ~1 min of device time at 32^3x64 but ~5 min at 48^3x96, back in
    # the remote worker's hung-execution kill zone (the round-4 crash,
    # ops/heatbath.MAX_SWEEPS_PER_CALL).  Keep per-execution device
    # time roughly constant across volumes.
    ref_v = 32 * 32 * 32 * 64
    chunk = max(2, min(20, (20 * ref_v) // lat.volume))
    u = thermalize(jax.random.PRNGKey(0), lat, beta, sweeps,
                   max_sweeps_per_call=chunk)
    plaq = float(plaquette(u, lat))
    print(json.dumps({
        "metric": "heatbath_plaquette", "value": round(plaq, 6),
        "beta": beta, "sweeps": sweeps,
        "seconds": round(time.perf_counter() - t0, 1)}), flush=True)
    if cache:
        split = jax.jit(lambda x: (jnp.real(x), jnp.imag(x)))
        re, im = split(u)
        np.save(path, np.stack([np.asarray(re), np.asarray(im)]))
    return u


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dims", type=int, nargs=4, default=[32, 32, 32, 64])
    # On a beta=6.0 heatbath gauge kappa_c ~ 0.157 (literature quenched
    # Wilson value ~0.1572); the near-critical MG regime is kappa ->
    # 0.157 at small mu.  On the RANDOM (infinite-temperature) gauge
    # criticality instead sits near kappa ~ 0.24 — pass it explicitly
    # for that (worst-case-for-MG) source.
    ap.add_argument("--kappa", type=float, default=0.157)
    ap.add_argument("--mu", type=float, default=0.0009)
    ap.add_argument("--tol", type=float, default=1e-10)
    ap.add_argument("--n-vec", type=int, nargs="+", default=None)
    ap.add_argument("--setup-iters", type=int, default=None)
    ap.add_argument("--with-cg", action="store_true")
    ap.add_argument("--cg-only", action="store_true",
                    help="skip MG entirely (kappa scans of plain CG)")
    ap.add_argument("--cg-maxiter", type=int, default=60000)
    ap.add_argument("--cg-exec-chunk", type=int, default=5000,
                    help="CG iterations per XLA execution (bounds "
                         "device time per call; the remote worker "
                         "kills multi-minute executions)")
    ap.add_argument("--nrhs", type=int, default=0,
                    help="also time the batched multi-RHS production "
                         "path (N columns through one vmapped stream)")
    ap.add_argument("--backend", default="pallas")
    ap.add_argument("--smoother-dtype", default=None,
                    choices=["float32", "bfloat16"])
    ap.add_argument("--coarse-dtype", default=None,
                    choices=["float32", "bfloat16"])
    ap.add_argument("--gcr-dtype", default=None,
                    choices=["float32", "bfloat16"],
                    help="outer GCR basis storage (bf16 halves the "
                         "2*restart-field workspace; needed at 32^3x64 "
                         "restart>=12 on one v5e)")
    ap.add_argument("--vec-dtype", default=None,
                    choices=["float32", "bfloat16"],
                    help="transfer null-vector storage after setup")
    ap.add_argument("--hp", default=None, choices=["float64", "df64"],
                    help="true-residual certification operator (df64 = "
                         "on-chip double-single; lighter HBM)")
    # MG cycle/tuning knobs (DeviceMGParams); None = from the preset
    ap.add_argument("--setup-solver", default=None,
                    choices=["bicgstab", "cgne"])
    ap.add_argument("--smoother-iters", type=int, default=None)
    ap.add_argument("--coarse-iters", type=int, default=None)
    ap.add_argument("--restart", type=int, default=None)
    ap.add_argument("--mu-factor", type=float, default=None)
    ap.add_argument("--inner-tol", type=float, default=None)
    ap.add_argument("--block0", type=int, nargs=4, default=None,
                    help="geometric aggregate for the first coarsening")
    # Parameter preset the unset knobs above default to.  "auto" =
    # the tuned near-critical recipe (DeviceMGParams.near_critical:
    # CG-NE setup 300, n_vec 16, restart 24, bf16 smoother + coarse,
    # coarse GCR 24, inner 1e-7 — the BASELINE.md 1.29x row) whenever
    # --heatbath is given (structured gauge near kappa_c is what it
    # was tuned on), else the generic random-gauge defaults.
    ap.add_argument("--preset", default="auto",
                    choices=["auto", "near-critical", "generic"])
    # structured gauge: thermalize a quenched Wilson-action field at
    # this beta instead of using the infinite-temperature random field
    # (VERDICT r2 #2: a random gauge is MG's worst case; the heatbath
    # field carries the low-mode structure the algorithm exists for).
    ap.add_argument("--heatbath", type=float, default=None,
                    metavar="BETA")
    ap.add_argument("--hb-sweeps", type=int, default=200)
    ap.add_argument("--no-hb-cache", action="store_true")
    ap.add_argument("--hb-tile", type=int, default=1,
                    help="thermalize at dims/F and periodically "
                         "replicate F^4 (ops/gauge_tools.tile_field_dev)"
                         ": structured gauge at volumes whose heatbath "
                         "program exceeds one chip's HBM — plaquette-"
                         "preserving replica, NOT an independent "
                         "ensemble member (48^3x96 note, BASELINE.md)")
    ap.add_argument("--hb-only", action="store_true",
                    help="thermalize (and disk-cache) the gauge, then "
                         "exit — decouples the O(10 min) generation at "
                         "large volumes from the solve runs")
    ap.add_argument("--profile-cycle", action="store_true",
                    help="time V-cycle phases (fine/coarse applies, "
                         "vcycle, GCR cycle) instead of solving")
    args = ap.parse_args()

    from tpuqcd import su3
    from tpuqcd.fields import apply_boundary_phase_dev, random_spinor_dev
    from tpuqcd.lattice import Lattice
    from tpuqcd.mg.dsolve import DeviceMGParams
    from tpuqcd.solve import setup_multigrid, solve_tm_mg
    from tpuqcd.utils.packed import pack_gauge, pack_spinor

    lat = Lattice(tuple(args.dims))
    if args.heatbath is not None:
        f = args.hb_tile
        hdims = [d // f for d in args.dims]
        assert [d * f for d in hdims] == list(args.dims), \
            f"--hb-tile {f} must divide every extent in {args.dims}"
        hlat = Lattice(tuple(hdims)) if f > 1 else lat
        u = _load_or_thermalize(hlat, hdims, args.heatbath,
                                args.hb_sweeps,
                                cache=not args.no_hb_cache)
        if f > 1:
            from tpuqcd.ops.gauge_tools import tile_field_dev
            u = tile_field_dev(u, hlat, (f, f, f, f))
            print(json.dumps({"metric": "heatbath_tiled",
                              "from": hdims, "factor": f,
                              "note": "periodic replica, plaquette-"
                                      "preserving"}), flush=True)
        if args.hb_only:
            return
        u = apply_boundary_phase_dev(u, lat)
    else:
        u = apply_boundary_phase_dev(
            su3.random_gauge_dev(jax.random.PRNGKey(0), lat), lat)
    u_pk = jax.block_until_ready(pack_gauge(u))
    del u  # free the complex copies — HBM is the budget here

    def make_source():
        b = random_spinor_dev(jax.random.PRNGKey(1), lat)
        return jax.block_until_ready(
            jnp.stack([pack_spinor(b[0]), pack_spinor(b[1])]))

    if args.cg_only:
        _run_cg(args, lat, u_pk, make_source(), t_mg_solve=None)
        return

    import dataclasses as _dc
    use_nc = (args.preset == "near-critical"
              or (args.preset == "auto" and args.heatbath is not None))
    n_vec = tuple(args.n_vec) if args.n_vec else None
    base = (DeviceMGParams.near_critical(
                levels=(len(n_vec) + 1) if n_vec else 2)
            if use_nc else DeviceMGParams())
    if n_vec is None:
        n_vec = base.n_vec
    b0 = tuple(args.block0) if args.block0 else base.block[0]
    blocks = ((b0,) + ((2, 2, 2, 2),) * 3)[:len(n_vec)]
    over = {k: v for k, v in dict(
        setup_iters=args.setup_iters,
        smoother_iters=args.smoother_iters,
        coarse_iters=args.coarse_iters, restart=args.restart,
        mu_factor=args.mu_factor, smoother_dtype=args.smoother_dtype,
        setup_solver=args.setup_solver, coarse_dtype=args.coarse_dtype,
        gcr_dtype=args.gcr_dtype, vec_dtype=args.vec_dtype,
        inner_tol=args.inner_tol).items() if v is not None}
    params = _dc.replace(base, n_vec=n_vec, block=blocks, **over)
    args.inner_tol = params.inner_tol
    print(json.dumps({"metric": "mg_params", "preset":
                      ("near_critical" if use_nc else "generic"),
                      **{k: str(getattr(params, k)) for k in
                         ("n_vec", "block", "setup_iters", "setup_solver",
                          "restart", "coarse_iters", "smoother_dtype",
                          "coarse_dtype", "inner_tol")}}), flush=True)

    n0 = len(_COMPILES)
    t0 = time.perf_counter()
    mg = setup_multigrid(u_pk, lat, kappa=args.kappa, mu=args.mu,
                         params=params, backend=args.backend, verbose=True)
    # force completion of every async setup dispatch HERE so a runtime
    # OOM inside setup surfaces at this line, not at the first solve
    # fetch (async-error localization; axon defers errors to fetches)
    jax.block_until_ready(mg.state)
    t_setup = time.perf_counter() - t0
    print(json.dumps({"metric": "mg_setup_seconds", "value":
                      round(t_setup, 2), "unit": "s",
                      **_compile_stats(n0),
                      "detail": {k: round(v, 2) for k, v in
                                 mg.setup_seconds.items()}}), flush=True)
    try:
        live = sum(int(a.nbytes) for a in jax.live_arrays()
                   if list(a.devices())[0].platform != "cpu")
        print(json.dumps({"metric": "hbm_live_after_setup",
                          "value": round(live / 2**30, 2),
                          "unit": "GiB"}), flush=True)
    except Exception:
        pass
    b_pk = make_source()  # AFTER setup: setup peak is the HBM budget

    if args.profile_cycle:
        _profile_cycle(mg, b_pk)
        return

    # warm the solve path (compiles), then time.  The source goes in
    # WITHOUT a bench-side binding (regenerated per call, same PRNG key
    # -> identical system): at 48^3x96 every live fine field counts.
    del b_pk
    hp = args.hp or "float64"
    res = solve_tm_mg(mg, make_source(), tol=args.tol,
                      inner_tol=args.inner_tol, verbose=True, hp=hp)
    del res
    t0 = time.perf_counter()
    res = solve_tm_mg(mg, make_source(), tol=args.tol,
                      inner_tol=args.inner_tol, hp=hp)
    t_solve = time.perf_counter() - t0
    print(json.dumps({
        "metric": "mg_solve_wallclock_1e10",
        "value": round(t_solve, 3), "unit": "s",
        "relres": float(res.relres), "inner_iters": int(res.iters),
        "dims": args.dims, "kappa": args.kappa}), flush=True)

    t_batch = None
    if args.nrhs:
        from tpuqcd.solve import solve_tm_mg_batch
        bb = jnp.stack([make_source()] * args.nrhs)
        bb = bb * (1.0 + 0.01 * jnp.arange(args.nrhs).reshape(
            -1, 1, 1, 1, 1, 1, 1, 1))  # distinct systems, one stream
        resb = solve_tm_mg_batch(mg, bb, tol=args.tol,
                                 inner_tol=args.inner_tol)  # warm
        t0 = time.perf_counter()
        resb = solve_tm_mg_batch(mg, bb, tol=args.tol,
                                 inner_tol=args.inner_tol)
        t_batch = time.perf_counter() - t0
        print(json.dumps({
            "metric": f"mg_solve_batch{args.nrhs}_per_rhs",
            "value": round(t_batch / args.nrhs, 3), "unit": "s",
            "total_s": round(t_batch, 3),
            "relres_max": float(max(resb.relres)),
            "inner_iters": int(resb.iters)}), flush=True)

    if args.with_cg:
        del res
        _run_cg(args, lat, u_pk, make_source(), t_mg_solve=t_solve,
                t_mg_batch=t_batch)




def _profile_cycle(mg, b_pk):
    """Phase timings of the MG cycle via fused chains + scalar probes
    (same technique as bench.py/bench_coarse — per-call timing lies
    through the remote runtime)."""
    from functools import partial as _part

    from tpuqcd.solvers.krylov_pk import _gcr_cycle
    from tpuqcd.utils import pkalg as pk

    state = mg.state
    levels = state[0]
    b = jnp.swapaxes(b_pk.astype(jnp.float32), 0, 1)

    def chain_time(fn, x0, n=20, reps=3):
        @jax.jit
        def chain(st, v):
            def body(i, x):
                return fn(st, x)
            x = jax.lax.fori_loop(0, n, body, v)
            return jnp.real(jnp.ravel(x)[0].astype(jnp.float32))

        float(chain(state, x0))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(chain(state, x0))
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[len(ts) // 2] / n

    out = {}
    out["fine_apply_ms"] = chain_time(
        lambda st, v: st[0][0].apply(v), b) * 1e3
    if state[2] is not None:
        out["fine_apply_bf16_ms"] = chain_time(
            lambda st, v: st[2].apply(v.astype(jnp.bfloat16)).astype(
                jnp.float32), b) * 1e3
    for li, lvl in enumerate(levels[1:], 1):
        vc = lvl.random_field(jax.random.PRNGKey(li))
        out[f"coarse{li}_apply_ms"] = chain_time(
            lambda st, v, li=li: st[0][li].apply(v), vc) * 1e3
    out["vcycle_ms"] = chain_time(
        lambda st, v: mg._vcycle(st, 0, v), b, n=5) * 1e3
    p = mg.params

    def gcr1(st, v):
        x, r = _gcr_cycle(lambda w: st[0][0].apply(w),
                          lambda w: mg._vcycle(st, 0, w), jnp.zeros_like(v),
                          v, p.restart)
        return r

    out["gcr_cycle_ms"] = chain_time(gcr1, b, n=3) * 1e3
    out["gcr_per_iter_ms"] = out["gcr_cycle_ms"] / p.restart
    print(json.dumps({"metric": "mg_cycle_profile",
                      **{k: round(v, 2) for k, v in out.items()},
                      "restart": p.restart}), flush=True)


def _run_cg(args, lat, u_pk, b_pk, t_mg_solve=None, t_mg_batch=None):
    from tpuqcd.solve import solve_tm

    # CHUNKED executions: one monolithic solve at near-critical kappa
    # is O(10^4-10^5) CG iterations = many minutes of uninterrupted
    # device time, which the remote TPU worker kills as hung (measured:
    # "UNAVAILABLE: TPU device error" at 32^3x64 kappa=0.157, round 5 —
    # the same failure class as the round-4 heatbath crash).  Defect
    # correction restarts exactly from any iterate (solve_tm x0_e), so
    # the solve runs as ceil(iters/chunk) bounded executions of ONE
    # compiled program.
    chunk = getattr(args, "cg_exec_chunk", 5000)

    @jax.jit
    def cg_jit(u_a, b_a, x0_e):
        r = solve_tm(u_a, b_a, lat, kappa=args.kappa, mu=args.mu,
                     tol=args.tol, maxiter=chunk, x0_e=x0_e)
        return r.x, r.relres, r.iters

    def cg_solve():
        x0_e = jnp.zeros(b_pk.shape[1:], jnp.float64)
        total = 0
        for _ in range(max(1, -(-args.cg_maxiter // chunk))):
            x, rel, it = cg_jit(u_pk, b_pk, x0_e)
            total += int(it)
            if float(rel) <= args.tol:
                break
            x0_e = x[0]
        jax.block_until_ready(x)
        return x, float(rel), total

    x, rel, it = cg_solve()  # warm/compile
    t0 = time.perf_counter()
    x, rel, it = cg_solve()
    t_cg = time.perf_counter() - t0
    line = {"metric": "cg_solve_wallclock_1e10", "value": round(t_cg, 3),
            "unit": "s", "relres": float(rel), "iters": int(it),
            "kappa": args.kappa}
    if t_mg_solve:
        line["mg_speedup"] = round(t_cg / t_mg_solve, 2)
    print(json.dumps(line), flush=True)

    if args.nrhs:
        from tpuqcd.solve import solve_tm_batch
        bb = jnp.stack([b_pk] * args.nrhs)
        bb = bb * (1.0 + 0.01 * jnp.arange(args.nrhs).reshape(
            -1, 1, 1, 1, 1, 1, 1, 1))

        resb = solve_tm_batch(u_pk, bb, lat, kappa=args.kappa,
                              mu=args.mu, tol=args.tol,
                              maxiter=args.cg_maxiter)  # warm
        jax.block_until_ready(resb.x)
        t0 = time.perf_counter()
        resb = solve_tm_batch(u_pk, bb, lat, kappa=args.kappa,
                              mu=args.mu, tol=args.tol,
                              maxiter=args.cg_maxiter)
        jax.block_until_ready(resb.x)
        t_cgb = time.perf_counter() - t0
        line = {"metric": f"cg_solve_batch{args.nrhs}_per_rhs",
                "value": round(t_cgb / args.nrhs, 3), "unit": "s",
                "total_s": round(t_cgb, 3),
                "relres_max": float(jnp.max(resb.relres)),
                "iters": int(jnp.max(resb.iters))}
        if t_mg_batch:
            line["mg_speedup"] = round(t_cgb / t_mg_batch, 2)
        print(json.dumps(line), flush=True)


if __name__ == "__main__":
    main()
