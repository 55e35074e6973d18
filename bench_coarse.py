#!/usr/bin/env python
"""A/B bench: MG coarse-operator apply, VPU broadcast-reduce vs MXU
dot_general (VERDICT r2 weak #3 — resolve the BASELINE.md vs
mg/device.py contradiction with a measured number).

The coarse operator is 9 per-site dense N x N complex matvecs
(mg/device.DeviceCoarseLevel.apply; reference dslash_coarse.cu [U]).
Per site the contraction dim is N (24-32), far below the 128-lane MXU
tile, and every site carries its OWN matrix — so the MXU formulation is
a batched matvec (dot_general with the site axes as batch dims), not a
weight-stationary matmul.  This script times:

  A. the production path: broadcast-multiply + sum over the contraction
     axis (VPU streaming, links read once),
  B. dot_general over packed-real links, batch dims (Tc, Zc, Sc),
     f32 and bf16 variants, single-RHS and 12-RHS batched.

Run on the real TPU: python bench_coarse.py [--n 24] [--dims 8 8 8 16]
Prints one JSON line per variant.
"""
import argparse
import json
import time

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402


def chain_and_time(apply_fn, fields, v, niter=50, reps=5):
    """Median seconds per apply: one jitted chain of `niter` DEPENDENT
    applies ending in a scalar probe.  Per-call timing with
    block_until_ready reads dispatch latency, not kernel time, through
    the axon remote runtime (bench.py:126-132) — first measurements
    this way reported a physically impossible 205 TF/s f32."""
    import jax.numpy as jnp

    @jax.jit
    def chain(f, x0):
        def body(i, x):
            return apply_fn(f, x)
        x = jax.lax.fori_loop(0, niter, body, x0)
        return jnp.real(jnp.ravel(x)[0].astype(jnp.float32))

    float(chain(fields, v))            # warmup/compile
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(chain(fields, v))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2] / niter


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=24)
    ap.add_argument("--dims", type=int, nargs=4, default=[8, 8, 8, 16],
                    help="coarse dims (Yc, Xc merged into Sc)")
    ap.add_argument("--nrhs", type=int, default=12)
    args = ap.parse_args()

    from tpuqcd.mg.device import DeviceCoarseLevel

    Tc, Zc, Yc, Xc = args.dims[3], args.dims[2], args.dims[1], args.dims[0]
    dims = (Tc, Zc, Yc, Xc)
    n = args.n
    vol = Tc * Zc * Yc * Xc
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    links = jax.random.normal(
        k1, (2, 9, n, n, Tc, Zc, Yc * Xc), dtype=jnp.float32)
    # production (round-5 lane-merged) layout: ONE flat site axis
    lvl = DeviceCoarseLevel(dims=dims, n=n,
                            links=links.reshape(2, 9, n, n, vol))
    v1 = jax.random.normal(k2, (2, n, vol), jnp.float32)
    vb = jax.random.normal(k3, (args.nrhs, 2, n, vol), jnp.float32)
    v1t = v1.reshape(2, n, Tc, Zc, Yc * Xc)
    vbt = vb.reshape(args.nrhs, 2, n, Tc, Zc, Yc * Xc)

    # ---- A: production VPU broadcast-reduce (flat site axis) ---------
    # The level enters the jit as a traced pytree ARGUMENT:
    # closure-capturing lvl would embed the (tens-of-MB) links into the
    # HLO as constants, which the remote-compile service rejects with
    # HTTP 413 (the trap documented at mg/device.py:73-76).
    apply_vpu = DeviceCoarseLevel.apply
    apply_vpu_b = jax.vmap(DeviceCoarseLevel.apply, in_axes=(None, 0))

    # ---- A': the pre-round-5 TILED layout [.., Tc, Zc, Sc] -----------
    # (Zc, Sc) were the TPU-tiled trailing axes, padding (8, 128)/(Zc,
    # Sc)x at f32 — 4.7x at production coarse sizes.  Kept here purely
    # to measure the lane-merge before/after (VERDICT r4 #3).
    def _shift_t(v, mu, sign):
        if mu == 3:
            return jnp.roll(v, -sign, axis=-3)
        if mu == 2:
            return jnp.roll(v, -sign, axis=-2)
        if mu == 1:
            return jnp.roll(v, -sign * Xc, axis=-1)
        xi = jnp.arange(Yc * Xc, dtype=jnp.int32) % Xc
        if sign == +1:
            return jnp.where(xi == Xc - 1, jnp.roll(v, Xc - 1, axis=-1),
                             jnp.roll(v, -1, axis=-1))
        return jnp.where(xi == 0, jnp.roll(v, -(Xc - 1), axis=-1),
                         jnp.roll(v, 1, axis=-1))

    def _cmul_t(L, w):
        r = (L[0] * w[0][None] - L[1] * w[1][None]).sum(axis=1)
        i = (L[0] * w[1][None] + L[1] * w[0][None]).sum(axis=1)
        return jnp.stack([r, i])

    def apply_tiled(L, v):
        out = _cmul_t(L[:, 8], v)
        for mu in range(4):
            out = out + _cmul_t(L[:, mu], _shift_t(v, mu, +1))
            out = out + _cmul_t(L[:, 4 + mu], _shift_t(v, mu, -1))
        return out

    apply_tiled_b = jax.vmap(apply_tiled, in_axes=(None, 0))

    # ---- B: dot_general (site axes batched, contraction over N) -----
    def _cmul_dg(L, w):
        # L [2, N, N, T, Z, S], w [..., 2, N, T, Z, S] (leading RHS axes)
        # dot_general: batch dims (T, Z, S), contract over the second N.
        def dg(a, b):
            # a [N, N, T, Z, S] x b [R, N, T, Z, S] -> [R, N, T, Z, S]
            r = jax.lax.dot_general(
                a, b,
                (((1,), (1,)), ((2, 3, 4), (2, 3, 4))),
                preferred_element_type=jnp.float32)
            # result [T, Z, S, N, R] -> [R, N, T, Z, S]
            return jnp.moveaxis(r, (0, 1, 2, 3, 4), (2, 3, 4, 1, 0))
        rr = dg(L[0], w[:, 0]) - dg(L[1], w[:, 1])
        ri = dg(L[0], w[:, 1]) + dg(L[1], w[:, 0])
        return jnp.stack([rr, ri], axis=1)

    def apply_mxu(links, w):
        # w [R, 2, N, T, Z, S]
        out = _cmul_dg(links[:, 8], w)
        for mu in range(4):
            out = out + _cmul_dg(links[:, mu], _shift(w, mu, +1))
            out = out + _cmul_dg(links[:, 4 + mu], _shift(w, mu, -1))
        return out

    def _shift(v, mu, sign):
        if mu == 3:
            return jnp.roll(v, -sign, axis=-3)
        if mu == 2:
            return jnp.roll(v, -sign, axis=-2)
        if mu == 1:
            return jnp.roll(v, -sign * Xc, axis=-1)
        Sc = v.shape[-1]
        xi = jnp.arange(Sc, dtype=jnp.int32) % Xc
        if sign == +1:
            return jnp.where(xi == Xc - 1, jnp.roll(v, Xc - 1, axis=-1),
                             jnp.roll(v, -1, axis=-1))
        return jnp.where(xi == 0, jnp.roll(v, -(Xc - 1), axis=-1),
                         jnp.roll(v, 1, axis=-1))

    # Links enter as traced jit ARGUMENTS here too (not closure
    # constants) so the HLO stays small enough for remote compile.
    links_bf = links.astype(jnp.bfloat16)

    def apply_mxu_bf(L, w):
        return apply_mxu(L, w.astype(jnp.bfloat16))

    flops1 = 9 * 4 * n * n * vol * 2      # 9 slots, complex madd, 1 RHS
    link_bytes = 2 * 9 * n * n * vol * 4  # useful f32 link traffic/apply
    lvl_bf = type(lvl)(dims=dims, n=n,
                       links=lvl.links.astype(jnp.bfloat16))
    variants = [
        ("flat_f32_rhs1", apply_vpu, lvl, v1, flops1, link_bytes),
        (f"flat_f32_rhs{args.nrhs}", apply_vpu_b, lvl, vb,
         flops1 * args.nrhs, link_bytes),
        ("flat_bf16_rhs1", apply_vpu, lvl_bf, v1, flops1,
         link_bytes // 2),
        ("tiled_f32_rhs1", apply_tiled, links, v1t, flops1, link_bytes),
        (f"tiled_f32_rhs{args.nrhs}", apply_tiled_b, links, vbt,
         flops1 * args.nrhs, link_bytes),
        ("mxu_f32_rhs1", apply_mxu, links, v1t[None], flops1,
         link_bytes),
        (f"mxu_f32_rhs{args.nrhs}", apply_mxu, links, vbt,
         flops1 * args.nrhs, link_bytes),
        (f"mxu_bf16_rhs{args.nrhs}", apply_mxu_bf, links_bf, vbt,
         flops1 * args.nrhs, link_bytes // 2),
    ]
    results = {}
    for name, fn, fields, v, fl, lb in variants:
        dt = chain_and_time(fn, fields, v)
        gf = fl / dt / 1e9
        results[name] = round(gf, 1)
        print(json.dumps({"metric": f"coarse_apply[{name}]",
                          "value": round(gf, 1), "unit": "GFLOP/s",
                          "ms": round(dt * 1e3, 3),
                          "useful_link_gbps": round(lb / dt / 1e9, 1),
                          "n": n, "dims": list(dims)}), flush=True)
    print(json.dumps({
        "metric": "coarse_apply_flat_over_tiled",
        "value": round(results["flat_f32_rhs1"]
                       / results["tiled_f32_rhs1"], 3),
        "unit": "ratio (lane-merge speedup, 1 RHS f32)", "n": n}))


if __name__ == "__main__":
    main()
