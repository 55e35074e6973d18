"""Device MG: setup driver, traced V-cycle, certified 1e-10 solve.

Completes mg/device.py into the production TPU solver (SURVEY.md §4.3 /
§8.3 hard part #1): the full MG-preconditioned GCR runs on-chip over
packed-real fields — each GCR restart cycle (V-cycles included) is one
XLA program — and an outer defect-correction loop against the f64 packed
operator certifies the 1e-10 *true* residual that fp32 alone cannot
reach (reference: reliable updates + double-precision outer,
`inv_gcr_quda.cpp` / `interface_quda.cpp` [U]).
"""
from __future__ import annotations

import dataclasses
import time
from functools import partial

import jax
import jax.numpy as jnp

from ..lattice import Lattice
from ..solvers.krylov_pk import (bicgstab_fixed_pk, gcr_fixed_pk, gcr_pk,
                                 mr_smoother_pk)
from ..utils import pkalg as pk
from .device import (DeviceCoarseLevel, DeviceCoarseTransfer,
                     DeviceFineLevel, DeviceFineTransfer,
                     build_coarse_device)


@partial(jax.jit, donate_argnums=0)
def _stash_vec(buf, k, v):
    """buf[k] = v (dtype-cast), with buf DONATED: the null-vector bank
    updates in place on the device instead of the stack-at-the-end
    pattern whose peak was 2x the bank PLUS every vector f32 (measured
    6.4 GB at 32^3x64 n_vec 16 — and 2x24 GB at 48^3x96, over any
    single chip's HBM)."""
    return jax.lax.dynamic_update_index_in_dim(
        buf, v.astype(buf.dtype), k, 0)


@jax.jit
def _apply_jit(lvl, v):
    """Inner-jitted level apply, traced ONCE per level pytree structure
    and shared by every call site: the V-cycle/solver outer traces
    stitch cached pjit calls instead of re-tracing the unrolled stencil
    graph ~6x per cycle.  Measured on the tiny CLI-mesh tier (1-core
    CPU): trace+compile wall of the batched solve program dropped ~2x.
    lvl is a pytree ARGUMENT (gauge/links as data, not constants)."""
    return lvl.apply(v)


@dataclasses.dataclass
class DeviceMGParams:
    """Mirrors the host mg/vcycle.MGParams (reference QudaMultigridParam
    essentials [U]): n_vec per coarsening, geometric blocks, setup
    smoothing depth, cycle smoothing, fixed coarsest work, mu boost."""
    n_vec: tuple = (8, 8)
    block: tuple = ((4, 4, 4, 4), (2, 2, 2, 2))
    setup_iters: int = 60
    smoother_iters: int = 4
    coarse_iters: int = 32
    restart: int = 8
    mu_factor: float = 6.0
    seed: int = 7
    #: "bfloat16" runs the fine-level smoothers on a low-precision twin
    #: (the reference's half-precision smoother); residuals/corrections
    #: stay f32 and flexible GCR absorbs the preconditioner perturbation
    smoother_dtype: str = "float32"
    #: null-vector setup solver on the FINE level: "bicgstab" (fixed-
    #: iteration BiCGStab on M — the historical default) or "cgne"
    #: (fixed-iteration CG on the normal operator M^dag M via the
    #: g5-flavor trick M^dag = g5 M_{-flavor} g5 — monotone inverse
    #: iteration toward the smallest singular vectors, which BiCGStab
    #: on the nearly singular M fails to deliver near kappa_c).
    #: Coarse-level setup always uses BiCGStab (no cheap dagger there).
    setup_solver: str = "bicgstab"
    #: "bfloat16" stores the COARSE-level links in bf16 (fields and
    #: accumulation stay f32): the coarsest GCR dominates the V-cycle
    #: (24^3 profile: 16 x 4.1 ms coarse applies = 57% of the 116 ms
    #: cycle) and its applies are links-bandwidth-bound, so halving
    #: link bytes halves the dominant term; flexible GCR absorbs the
    #: preconditioner perturbation like the bf16 smoother.
    coarse_dtype: str = "float32"
    #: default inner (f32 GCR) tolerance for solve_certified when the
    #: caller does not pass one; the near-critical recipe measured 1e-7
    #: as the winner (fewer defect-correction restarts re-entering a
    #: stalled preconditioner; BASELINE.md round-4 ladder 1.02x -> 1.29x)
    inner_tol: float = 1e-5
    #: "bfloat16" stores the outer flexible-GCR direction buffers (Z, V)
    #: in bf16 — the dominant solver workspace, 2 * restart fine fields
    #: (19.3 GB in f32 at 32^3x64 restart 24, alone over a v5e's HBM).
    #: Arithmetic stays f32; see solvers/krylov_pk._gcr_cycle.
    gcr_dtype: str = "float32"
    #: "bfloat16" stores the transfer null vectors v_pk in bf16 after
    #: setup (n_vec fine fields: 6.4 GB f32 at 32^3x64 n_vec 16).
    #: Affects only the preconditioner's restrict/prolong (Linv stays
    #: f32); absorbed like the bf16 smoother.
    vec_dtype: str = "float32"

    @classmethod
    def near_critical(cls, levels: int = 2) -> "DeviceMGParams":
        """The measured-best recipe near kappa_c on thermalized gauges
        (BASELINE.md round-4 campaign, canonical 24^3 command: 1.29x
        over CG at kappa=0.157, beta=6.0): CG-NE inverse-iteration
        setup at depth 300 (the only setup whose coarse space tracks
        the critical modes), n_vec 16, restart-24 flexible GCR, bf16
        smoother + bf16 coarse links, coarse GCR 24, inner 1e-7.
        levels=3 keeps the same fine recipe and adds a 2^4 second
        coarsening (the [P:1710.06198]-style 3-level cycle)."""
        nv = (16,) if levels == 2 else (16,) * (levels - 1)
        blocks = ((4, 4, 4, 4),) + ((2, 2, 2, 2),) * (levels - 2)
        return cls(n_vec=nv, block=blocks, setup_iters=300,
                   smoother_iters=4, coarse_iters=24, restart=24,
                   mu_factor=6.0, smoother_dtype="bfloat16",
                   setup_solver="cgne", coarse_dtype="bfloat16",
                   inner_tol=1e-7)


class DeviceMG:
    """Adaptive MG hierarchy living on the device.

    setup: null vectors by fixed-iteration BiCGStab on random starts
    (one jitted lax loop per vector), chirality-split on-device block
    orthogonalization (Gram + Cholesky), Galerkin links by colored
    probing — all without host round-trips of field data.
    """

    def __init__(self, fine: DeviceFineLevel, params: DeviceMGParams,
                 verbose: bool = False):
        self.params = params
        self.levels = [fine]
        self.transfers = []
        self.setup_seconds = {}
        key = jax.random.PRNGKey(params.seed)
        level = fine
        for depth, nv in enumerate(params.n_vec):
            key, sub = jax.random.split(key)
            t0 = time.perf_counter()
            nulls = self._gen_null_vectors(
                level, nv, params.setup_iters, sub,
                setup_solver=params.setup_solver,
                store_dtype=(jnp.bfloat16
                             if params.vec_dtype == "bfloat16"
                             else None))
            self.setup_seconds[f"nulls{depth}"] = time.perf_counter() - t0
            t0 = time.perf_counter()
            if depth == 0:
                tr = DeviceFineTransfer(fine.lat, params.block[depth],
                                        nulls)
            else:
                tr = DeviceCoarseTransfer(level.dims, level.n,
                                          params.block[depth], nulls)
            coarse = build_coarse_device(level, tr)
            self.setup_seconds[f"galerkin{depth}"] = time.perf_counter() - t0
            self.transfers.append(tr)
            self.levels.append(coarse)
            level = coarse
            if verbose:
                print(f"[mg] level {depth + 1}: dims={coarse.dims} "
                      f"n={coarse.n} "
                      f"({self.setup_seconds[f'nulls{depth}']:.1f}s nulls, "
                      f"{self.setup_seconds[f'galerkin{depth}']:.1f}s RAP)")
        # coarsest-level twisted-mass boost
        if params.mu_factor != 1.0 and fine.mu != 0.0:
            delta = 2.0 * fine.kappa * fine.mu * (params.mu_factor - 1.0)
            self.levels[-1] = self.levels[-1].boosted(delta)
        if params.coarse_dtype == "bfloat16":
            self.levels[1:] = [
                dataclasses.replace(
                    lvl, links=lvl.links.astype(jnp.bfloat16))
                for lvl in self.levels[1:]]
        if params.vec_dtype == "bfloat16":
            self.transfers = [
                dataclasses.replace(
                    tr, v_pk=tr.v_pk.astype(jnp.bfloat16))
                for tr in self.transfers]
        self.sloppy_fine = (fine.sloppy(jnp.bfloat16)
                            if params.smoother_dtype == "bfloat16"
                            else None)

    @staticmethod
    def _gen_null_vectors(level, n_vec, iters, key,
                          setup_solver="bicgstab", store_dtype=None):
        """Generate n_vec null vectors into a preallocated (optionally
        bf16) bank via donated in-place stashes — the solve is f32 per
        vector, only the STORED bank takes store_dtype.  Early bf16
        storage is what lets the n_vec * fine-field bank fit at
        HBM-bound volumes (the post-hoc astype in __init__ would still
        pay the full f32 bank first)."""
        # level passes through jit as a pytree ARGUMENT (closure capture
        # would embed the gauge/links as HLO constants; the remote
        # compiler rejects production sizes)
        use_ne = setup_solver == "cgne" and hasattr(level, "flavor")
        if use_ne:
            from ..solvers.krylov_pk import cg_fixed_pk
            level_m = dataclasses.replace(level, flavor=-level.flavor)

            @partial(jax.jit, static_argnums=3)
            def gen(lvl, lvl_m, v, it):
                def g5(w):
                    from ..operators import _G5_DIAG
                    return w * jnp.asarray(_G5_DIAG, w.dtype).reshape(
                        1, 1, 4, 1, 1, 1, 1)

                def mv(w):      # M^dag M w = g5 M_- g5 (M_+ w)
                    return g5(_apply_jit(lvl_m, g5(_apply_jit(lvl, w))))

                x = cg_fixed_pk(mv, v, it)
                return x / jnp.sqrt(jnp.maximum(pk.norm2(x), 1e-30))

            args = (level, level_m)
        else:
            @partial(jax.jit, static_argnums=2)
            def gen(lvl, v, it):
                x = bicgstab_fixed_pk(partial(_apply_jit, lvl), v, it)
                return x / jnp.sqrt(jnp.maximum(pk.norm2(x), 1e-30))

            args = (level,)

        buf = None
        for i in range(n_vec):
            key, sub = jax.random.split(key)
            v = gen(*args, level.random_field(sub), iters)
            if buf is None:
                buf = jnp.zeros((n_vec,) + v.shape,
                                store_dtype or v.dtype)
            buf = _stash_vec(buf, jnp.int32(i), v)
        return buf

    # --- solve cycle ------------------------------------------------------
    # The hierarchy travels through every jit boundary as the explicit
    # `state` pytree (levels, transfers) — see the DeviceFineLevel note.

    @property
    def state(self):
        return (tuple(self.levels), tuple(self.transfers),
                getattr(self, "sloppy_fine", None))

    def _vcycle(self, state, depth: int, b):
        p = self.params
        levels, transfers, sfine = state
        lv = levels[depth]
        if depth == len(levels) - 1:
            return gcr_fixed_pk(partial(_apply_jit, lv), b,
                                iters=p.coarse_iters,
                                restart=p.restart)

        def smooth(rhs):
            if depth == 0 and sfine is not None:
                xs = mr_smoother_pk(partial(_apply_jit, sfine),
                                    rhs.astype(jnp.bfloat16),
                                    iters=p.smoother_iters)
                return xs.astype(jnp.float32)
            return mr_smoother_pk(partial(_apply_jit, lv), rhs,
                                  iters=p.smoother_iters)

        tr = transfers[depth]
        x = smooth(b)
        r = pk.caxpy(-1.0, 0.0, _apply_jit(lv, x), b)
        xc = self._vcycle(state, depth + 1, tr.restrict(r))
        x = x + tr.prolong(xc)
        r = pk.caxpy(-1.0, 0.0, _apply_jit(lv, x), b)
        return x + smooth(r)

    def precondition(self, r):
        """One V-cycle ~ A^{-1} r (traced; use inside flexible GCR)."""
        return self._vcycle(self.state, 0, r)

    def _basis_dtype(self):
        return (jnp.bfloat16 if self.params.gcr_dtype == "bfloat16"
                else None)

    # jitted solve machinery is built ONCE and cached — rebuilding the
    # lambdas per solve() call would miss the jit cache (keyed on
    # function identity) and recompile every defect-correction refine.
    #
    # The WHOLE convergence loop runs on-device (lax.while_loop over
    # GCR cycles, tol/maxiter as traced scalars): the earlier per-cycle
    # host loop cost 2 tunnel round-trips per 8 inner iterations, which
    # at 16^3x32 was comparable to the V-cycle compute itself — the
    # same no-host-control-flow discipline as solve_tm's refined CG.
    def _jits(self):
        if getattr(self, "_jit_cache", None) is None:
            from ..solvers.krylov_pk import _gcr_cycle
            p = self.params

            @jax.jit
            def solve_loop(state, b, tol2, maxiter):
                def cond(st):
                    x, r, rsq, it = st
                    return jnp.logical_and(rsq > tol2, it < maxiter)

                def body(st):
                    x, r, rsq, it = st
                    x, r = _gcr_cycle(
                        lambda v: _apply_jit(state[0][0], v),
                        lambda v: self._vcycle(state, 0, v), x, r,
                        p.restart, basis_dtype=self._basis_dtype())
                    return (x, r, pk.norm2(r), it + p.restart)

                x = jnp.zeros_like(b)
                st = (x, b, pk.norm2(b), jnp.int32(0))
                x, _, rsq, it = jax.lax.while_loop(cond, body, st)
                return x, rsq, it

            self._jit_cache = solve_loop
        return self._jit_cache

    # Batched multi-RHS machinery: the 12 spin-color columns of a
    # propagator solve as ONE vmapped GCR iteration stream (per-RHS
    # scalars come free: pk.norm2/cdot reduce over all non-batch axes
    # under vmap).  This is the genuine TPU win over the reference's
    # sequential 12 solves (SURVEY.md §8.4): one kernel launch sequence
    # feeds all columns, amortizing V-cycle latency and host round-trips
    # 12x.  Memory scales with n_rhs * restart (GCR direction buffers) —
    # chunk via cli config solver.rhs_batch on big volumes.
    def _jits_batched(self):
        if getattr(self, "_jit_cache_b", None) is None:
            from ..solvers.krylov_pk import _gcr_cycle
            p = self.params

            @jax.jit
            def solve_loop(state, b, tol2, maxiter):
                def one_cycle(x1, r1):
                    return _gcr_cycle(
                        lambda v: _apply_jit(state[0][0], v),
                        lambda v: self._vcycle(state, 0, v), x1, r1,
                        p.restart, basis_dtype=self._basis_dtype())

                def cond(st):
                    x, r, rsq, it = st
                    return jnp.logical_and(jnp.max(rsq) > tol2,
                                           it < maxiter)

                def body(st):
                    x, r, rsq, it = st
                    x, r = jax.vmap(one_cycle)(x, r)
                    return (x, r, jax.vmap(lambda a: pk.norm2(a))(r),
                            it + p.restart)

                x = jnp.zeros_like(b)
                st = (x, b, jax.vmap(lambda a: pk.norm2(a))(b),
                      jnp.int32(0))
                x, _, rsq, it = jax.lax.while_loop(cond, body, st)
                return x, rsq, it

            self._jit_cache_b = solve_loop
        return self._jit_cache_b

    def solve_batch(self, b, tol=1e-6, maxiter=200):
        """MG-preconditioned GCR on n_rhs fine systems at once.

        b: [n_rhs, 2(ri), 2(par), 4, 3, T, Z, S] fp32.  Iterates until
        EVERY right-hand side meets tol (converged columns keep
        polishing — harmless, and the lockstep keeps one trace).
        Returns GCRResultPk with per-RHS relres (np array) and the max
        iteration count.
        """
        from ..solvers.krylov_pk import GCRResultPk
        import numpy as np
        solve_loop = self._jits_batched()
        state = self.state
        bsq = np.asarray(jax.vmap(lambda a: pk.norm2(a))(b), np.float64)
        live = bsq > 0.0
        bnorm = np.sqrt(np.where(live, bsq, 1.0))
        b = b * jnp.asarray(1.0 / bnorm, b.dtype).reshape(
            -1, *([1] * (b.ndim - 1)))
        x, rsq, it = solve_loop(state, b, jnp.float32(tol * tol),
                                jnp.int32(maxiter))
        total = int(it)
        rsq = np.asarray(rsq, np.float64)
        relres = np.sqrt(np.where(live, rsq, 0.0))
        x = x * jnp.asarray(bnorm, x.dtype).reshape(
            -1, *([1] * (x.ndim - 1)))
        return GCRResultPk(x=x, relres=relres, iters=total,
                           converged=bool((relres <= tol).all()))

    def solve_certified_batch(self, b, *, tol=1e-10, inner_tol=None,
                              maxiter=200, max_refine=12, verbose=False):
        """Batched defect correction to the f64 true residual: the
        multi-RHS twin of solve_certified (per-RHS normalization and
        certification).  b: [n_rhs, 2, 2, 4, 3, T, Z, S]; returns
        (x_f64 [n_rhs, ...], relres [n_rhs] np, total_inner_iters)."""
        import numpy as np
        if inner_tol is None:
            inner_tol = self.params.inner_tol
        fine = self.levels[0]
        if getattr(self, "_hp_cache_b", None) is None:
            hp = (self._hp_cache[0] if getattr(self, "_hp_cache", None)
                  else fine.as_hp())

            @jax.jit
            def residual_hp(lvl, x64, b64):
                def one(x1, b1):
                    r = b1 - _apply_jit(lvl, x1)
                    return r, pk.norm2(r, dtype=jnp.float64)
                return jax.vmap(one)(x64, b64)

            self._hp_cache_b = (hp, residual_hp)
        hp, residual_hp = self._hp_cache_b

        b64 = b.astype(jnp.float64)
        bsq0 = np.asarray(jax.vmap(
            lambda a: pk.norm2(a, dtype=jnp.float64))(b64), np.float64)
        live = bsq0 > 0.0
        bnorm = np.sqrt(np.where(live, bsq0, 1.0))
        b64 = b64 * jnp.asarray(1.0 / bnorm, b64.dtype).reshape(
            -1, *([1] * (b64.ndim - 1)))
        x = jnp.zeros_like(b64)
        total = 0
        rel = np.ones_like(bnorm)
        for it in range(max_refine):
            r64, rsq = residual_hp(hp, x, b64)
            rel = np.sqrt(np.where(live, np.asarray(rsq, np.float64), 0.0))
            if verbose:
                print(f"[mg] refine {it}: true relres max "
                      f"{rel.max():.3e} ({total} inner iters)")
            if rel.max() <= tol:
                break
            res = self.solve_batch(r64.astype(jnp.float32), tol=inner_tol,
                                   maxiter=maxiter)
            total += res.iters
            x = x + res.x.astype(jnp.float64)
        else:
            _, rsq = residual_hp(hp, x, b64)
            rel = np.sqrt(np.where(live, np.asarray(rsq, np.float64), 0.0))
        x = x * jnp.asarray(bnorm, x.dtype).reshape(
            -1, *([1] * (x.ndim - 1)))
        return x, rel, total

    def solve(self, b, tol=1e-6, maxiter=200):
        """MG-preconditioned GCR on the fine system M x = b (fp32).

        The RHS is normalized to unit norm before iterating: the packed
        algebra's epsilon floors (pkalg.sdiv 1e-30, Cholesky 1e-12) are
        calibrated for O(1) fields, and production sources can be tiny —
        a sequential source at a deep t_sink measured |b| ~ 1e-8, whose
        un-normalized solve stalled at relres 1e-8 with the floors
        swallowing the GCR scalars (M is linear; the rescale is exact).
        """
        from ..solvers.krylov_pk import GCRResultPk
        solve_loop = self._jits()
        state = self.state
        bsq = float(pk.norm2(b))
        if bsq == 0.0:
            return GCRResultPk(x=jnp.zeros_like(b), relres=0.0, iters=0,
                               converged=True)
        bnorm = bsq ** 0.5
        b = b * jnp.asarray(1.0 / bnorm, b.dtype)
        x, rsq, it = solve_loop(state, b, jnp.float32(tol * tol),
                                jnp.int32(maxiter))
        total = int(it)
        relres = float(rsq) ** 0.5
        return GCRResultPk(x=x * jnp.asarray(bnorm, x.dtype),
                           relres=relres, iters=total,
                           converged=relres <= tol)

    def solve_certified(self, b, *, tol=1e-10, inner_tol=None,
                        maxiter=200, max_refine=12, verbose=False,
                        hp="float64"):
        """Defect correction to the f64 *true* residual (the contract's
        "MG solve to 1e-10", SURVEY.md §8.3 hard part #1).

        inner_tol=None uses params.inner_tol (so presets carry their
        tuned value).  hp="df64" computes the true residuals with the
        ON-CHIP double-single operator (ops/dslash_df64.py, leg-staged)
        instead of XLA's emulated f64 — required at volumes where the
        f64 fine operator does not fit HBM (48^3x96 on one v5e;
        BASELINE.md round 5).  Returns (x_f64, relres,
        total_inner_iters).
        """
        if inner_tol is None:
            inner_tol = self.params.inner_tol
        if hp == "df64":
            # hand the source over WITHOUT keeping a frame reference:
            # the df64 loop frees it once the normalized df64 system is
            # formed (one fine field of HBM back at 48^3x96)
            bref = [b]
            del b
            return self._solve_certified_df64(
                bref, tol=tol, inner_tol=inner_tol, maxiter=maxiter,
                max_refine=max_refine, verbose=verbose)
        fine = self.levels[0]
        # f32 gauge/clover entries promote EXACTLY into the f64 products,
        # so the high-precision operator keeps the f32 data (an f64 gauge
        # copy OOMed the chip at 32^3x64)
        if getattr(self, "_hp_cache", None) is None:
            hp = fine.as_hp()

            @jax.jit
            def residual_hp(lvl, x64, b64):
                r = b64 - _apply_jit(lvl, x64)
                return r, pk.norm2(r, dtype=jnp.float64)

            self._hp_cache = (hp, residual_hp)
        hp, residual_hp = self._hp_cache

        b64 = b.astype(jnp.float64)
        bsq0 = float(pk.norm2(b64, dtype=jnp.float64))
        if bsq0 == 0.0:
            return b64, 0.0, 0
        # normalize: keeps every residual quantity O(relres) — the
        # TPU's emulated f64 inherits the f32 exponent range, so squared
        # residuals of un-normalized tiny sources (|b| ~ 1e-8 sequential
        # sources) underflow to 0 and the certification loses its meter
        bnorm = bsq0 ** 0.5
        b64 = b64 * (1.0 / bnorm)
        x = jnp.zeros_like(b64)
        bsq = 1.0
        total = 0
        rel = 1.0
        for it in range(max_refine):
            t0 = time.perf_counter()
            r64, rsq = residual_hp(hp, x, b64)
            rel = (float(rsq) / max(bsq, 1e-300)) ** 0.5
            t_res = time.perf_counter() - t0
            if rel <= tol:
                if verbose:
                    print(f"[mg] refine {it}: true relres {rel:.3e} "
                          f"({total} inner iters)")
                break
            t0 = time.perf_counter()
            res = self.solve(r64.astype(jnp.float32), tol=inner_tol,
                             maxiter=maxiter)
            total += res.iters
            x = x + res.x.astype(jnp.float64)
            if verbose:
                print(f"[mg] refine {it}: true relres {rel:.3e} "
                      f"(f64 residual {t_res:.2f}s, inner {res.iters} "
                      f"iters {time.perf_counter() - t0:.2f}s)")
        else:  # max_refine exhausted: certify the final iterate
            _, rsq = residual_hp(hp, x, b64)
            rel = (float(rsq) / max(bsq, 1e-300)) ** 0.5
        return x * bnorm, rel, total

    def _solve_certified_df64(self, bref, *, tol, inner_tol, maxiter,
                              max_refine, verbose):
        """df64 twin of solve_certified: x as an (hi, lo) f32 pair, true
        residuals via the leg-staged FullTMOperatorDF64 — no f64 field
        or gauge buffer ever materializes (SURVEY.md §8.3 hard part #1
        at flagship volume)."""
        from ..ops.dslash_df64 import FullTMOperatorDF64
        from ..utils import df64 as df
        fine = self.levels[0]
        if (not hasattr(fine, "u_pk") or not hasattr(fine, "kappa")
                or getattr(fine, "csw", None)):
            raise NotImplementedError(
                "hp='df64' supports the single-chip plain-TM fine level "
                "(clover/sharded df64 apply not implemented; use "
                "hp='float64')")
        op = FullTMOperatorDF64(fine.lat, fine.kappa, fine.mu,
                                fine.flavor)
        u_pk = fine.u_pk
        b32 = bref.pop().astype(jnp.float32)
        bsq0 = float(pk.norm2(b32, dtype=jnp.float64))
        if bsq0 == 0.0:
            return b32.astype(jnp.float64), 0.0, 0
        import math as _math
        # POWER-OF-2 normalization: 1/s is exact in f32, so the scaled
        # source's df64 lo is IDENTICALLY zero and b travels as one f32
        # field (residual_staged_hi) — the normalized |bhat|^2 lands in
        # [1/2, 2] and divides out of the relative residual below.
        s = 2.0 ** round(_math.log2(bsq0) / 2.0)
        bhat_sq = bsq0 / (s * s)
        b_hi = jax.jit(lambda bb: bb * jnp.float32(1.0 / s))(b32)
        x_df = (jnp.zeros_like(b32), jnp.zeros_like(b32))
        del b32  # b_hi is the certified system from here on
        total = 0
        rel = 1.0
        for it in range(max_refine):
            t0 = time.perf_counter()
            r_df, rsq = op.residual_staged_hi(u_pk, x_df, b_hi,
                                              legs_per_call=1)
            rel = (float(rsq) / bhat_sq) ** 0.5
            t_res = time.perf_counter() - t0
            if rel <= tol:
                if verbose:
                    print(f"[mg] refine {it}: true relres {rel:.3e} "
                          f"({total} inner iters, df64)")
                break
            t0 = time.perf_counter()
            r_hi = r_df[0]
            del r_df  # drop the lo half before the inner GCR program
            res = self.solve(r_hi, tol=inner_tol, maxiter=maxiter)
            del r_hi
            total += res.iters
            x_df = jax.jit(df.add_f)(x_df, res.x)
            if verbose:
                print(f"[mg] refine {it}: true relres {rel:.3e} "
                      f"(df64 residual {t_res:.2f}s, inner {res.iters} "
                      f"iters {time.perf_counter() - t0:.2f}s)")
        else:
            _, rsq = op.residual_staged_hi(u_pk, x_df, b_hi,
                                           legs_per_call=1)
            rel = (float(rsq) / bhat_sq) ** 0.5
        x = jax.jit(df.to_f64)(x_df) * s
        return x, rel, total
