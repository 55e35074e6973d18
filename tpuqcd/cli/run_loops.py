"""Disconnected-loop production run (config 5 disconnected part).

The CalcMG_loops_w_oneD_TSM equivalent ([U]
programs/CalcMG_loops_w_oneD_TSM_MG.cpp; SURVEY.md §4.5), with the full
estimator structure composable in ONE run:

  one-end (d-u)  x  one-derivative insertions  x  time / spin-color
  dilution  x  TSM (cheap truncated solves + bias correction)  x  exact
  low-mode deflation

On an accelerator everything runs on packed device fields: packed-real
Lanczos (solvers/lanczos.lanczos_lowest_pk) for the deflation basis,
multi-RHS batched solves for the dilution classes, streaming device
contractions (phys/loops_dev.py).  The deflated stochastic estimate plus
the EXACT low-mode one-end part (w_i = (M_d^dag)^{-1} v_i solves) sum to
the unbiased full loop — see phys/loops_dev.oneend_lowmode_exact_pk.

    python -m tpuqcd.cli.run_loops --config examples/loops.yaml
    python -m tpuqcd.cli.run_loops --config examples/loops_strange.yaml

Strange/charm loops use the Osterwalder-Seiler prescription: the same
one-end estimator at the tuned heavy twisted mass (action.mu = mu_s or
mu_c) — the reference's heavy-flavor loop runs are exactly this
parameter change ([U] calcMG_loops with strange invert params).

Datasets written: loops/oneend (+ _der), and with n_deflate > 0 the
exact complements loops/oneend_lowmode (+ _der).
"""
from __future__ import annotations

import numpy as np

from .common import (accel, ensemble_members, log, make_solver,
                     parse_args, setup_gauge)


def main():
    cfg, _args = parse_args(__doc__)
    for ctag, c in ensemble_members(cfg):
        if ctag:
            log.info("=== ensemble member %s ===", ctag)
        _measure(c)


def _measure(cfg):
    import os

    import jax
    from ..gammas import GAMMA5
    from ..io.hdf5io import write_loops

    csw = float(getattr(cfg.action, "csw", 0.0) or 0.0)
    lat, u_full, u_pk, u_dev = setup_gauge(cfg)
    solve = make_solver(cfg, lat, u_pk, u_full)
    momenta = np.asarray(cfg.physics.momenta)
    g5d = np.real(np.diag(GAMMA5))
    ka, mu_ = cfg.action.kappa, cfg.action.mu
    ph = cfg.physics

    acc = accel()
    use_dev = (solve.lmesh is not None or acc.platform != "cpu"
               or os.environ.get("TPUQCD_DEVICE_CONTRACT") == "1")
    if csw != 0.0 and not use_dev:
        raise NotImplementedError(
            "run_loops with action.csw != 0 needs the device estimator "
            "path (the host complex-layout operator is plain TM); run "
            "on an accelerator or set TPUQCD_DEVICE_CONTRACT=1")

    keys = list(jax.random.split(jax.random.PRNGKey(17), ph.n_noise))
    keys_cheap = (list(jax.random.split(jax.random.PRNGKey(23),
                                        ph.tsm_cheap))
                  if ph.tsm_cheap > 0 else [])

    meta = {"n_noise": ph.n_noise, "kappa": ka, "mu": mu_,
            "tsm_cheap": ph.tsm_cheap, "n_deflate": ph.n_deflate,
            "dilute_t": ph.dilute_t,
            "dilute_sc": int(bool(ph.dilute_sc))}

    if use_dev:
        est, est_der, low, low_der = _run_device(
            cfg, lat, u_pk, solve, keys, keys_cheap, momenta, g5d, csw)
    else:
        est, est_der, low, low_der = _run_host(
            cfg, lat, u_full, u_pk, solve, keys, keys_cheap, momenta,
            g5d)

    names = list(est.keys())
    write_loops(ph.output, "loops/oneend",
                np.stack([np.asarray(est[k]) for k in names]), names,
                meta=meta)
    if est_der is not None:
        dnames = list(est_der.keys())
        write_loops(ph.output, "loops/oneend_der",
                    np.stack([np.asarray(est_der[k]) for k in dnames]),
                    dnames, meta=meta)
    if low is not None:
        write_loops(ph.output, "loops/oneend_lowmode",
                    np.stack([np.asarray(low[k]) for k in names]), names,
                    meta=meta)
        if low_der is not None:
            dnames = list(low_der.keys())
            write_loops(ph.output, "loops/oneend_lowmode_der",
                        np.stack([np.asarray(low_der[k])
                                  for k in dnames]), dnames, meta=meta)
    log.info("wrote loops -> %s", ph.output)


def _tsm_combine(a, b_full, b_cheap):
    """E[full] = E_cheap[trunc] + E_corr[full - trunc] per dataset."""
    if a is None:
        return None
    return {k: a[k] + (b_full[k] - b_cheap[k]) for k in a}


def _run_device(cfg, lat, u_pk, solve, keys, keys_cheap, momenta, g5d,
                csw):
    """All-device estimator path: packed noise/dilution/deflation,
    batched multi-RHS solves, streaming contractions."""
    import jax
    import jax.numpy as jnp
    from ..gammas import INSERTION_GAMMAS
    from ..phys.loops_dev import (make_deflate_pk, oneend_lowmode_exact_pk,
                                  stochastic_oneend_pk)
    ph = cfg.physics
    ka, mu_ = cfg.action.kappa, cfg.action.mu
    g5pk = jnp.asarray(g5d, jnp.float32)[:, None, None, None, None]
    u_acc = solve.put(u_pk)

    def solve_ddag_batch(b_pks):
        """psi = (M_d^dag)^{-1} b = g5 M_u^{-1} g5 b, batched."""
        xs = solve.packed_src_batch(b_pks * g5pk, flavor=+1)
        return xs * g5pk

    # TSM cheap solves: truncated tolerance/iterations, same structure
    cheap_batch = None
    if ph.tsm_cheap > 0:
        from ..solve import make_clover_fields, solve_tm_batch
        clover = (make_clover_fields(u_acc, lat, kappa=ka, mu=mu_,
                                     csw=csw) if csw != 0.0 else None)

        @jax.jit
        def _cheap_jit(u_pk_, clover_, b_pks):
            res = solve_tm_batch(
                u_pk_, b_pks, lat, kappa=ka, mu=mu_, flavor=+1,
                tol=ph.tsm_tol, maxiter=ph.tsm_maxiter_cheap,
                inner_tol=max(ph.tsm_tol, 1e-3),
                solver=cfg.solver.solver
                if cfg.solver.solver != "eigcg" else "cg",
                backend=cfg.solver.backend, csw=csw, clover=clover_)
            return res.x.astype(jnp.float32)

        def cheap_batch(b_pks):
            x = _cheap_jit(u_acc, clover, b_pks * g5pk)
            return x * g5pk

    # deflation basis: packed-real Lanczos on A = M_d M_d^dag (C27)
    deflate_fn = None
    evecs_solver = None
    if ph.n_deflate > 0 and ph.eig_infile:
        # reference QKXTM_Deflation eigenvector reload ([U] SURVEY §6.4c)
        from ..utils.checkpoint import load_eigenpairs
        _evals, evs = load_eigenpairs(ph.eig_infile,
                                      expect_layout="packed",
                                      n_expect=ph.n_deflate)
        evecs = jnp.stack([solve.put(v) for v in evs])
        log.info("loaded %d deflation eigenpairs from %s",
                 evecs.shape[0], ph.eig_infile)
        evecs_solver = jnp.swapaxes(evecs, 1, 2)
        deflate_fn = make_deflate_pk(evecs_solver)
    elif ph.n_deflate > 0:
        from ..solvers.lanczos import lanczos_lowest_pk
        from .common import _mg_fine_level
        # On a mesh the Lanczos operator applies run through the
        # per-shard kernel fine level (mg/shard.ShardedFineLevel: fused
        # Pallas/XLA kernels on the local volume under shard_map, halos
        # via the interior/exterior overlap engine) — the same operator
        # the sharded MG fine level uses, so multi-chip deflated loops
        # keep the fast kernel in their hottest loop (SURVEY.md C27: the
        # reference ran deflation under full MPI decomposition [U]
        # QKXTM_Deflation; VERDICT r3 #8).  Single-device keeps the
        # DeviceFineLevel on cfg.solver.backend.
        lv_p = _mg_fine_level(cfg, lat, u_acc, +1, lmesh=solve.lmesh)
        lv_m = _mg_fine_level(cfg, lat, u_acc, -1, lmesh=solve.lmesh)
        g5mg = jnp.asarray(g5d, jnp.float32).reshape(1, 1, 4, 1, 1, 1, 1)

        @jax.jit
        def apply_mmdag(v):        # MG layout [2ri, 2par, 4, 3, T, Z, S]
            return lv_m.apply(g5mg * lv_p.apply(g5mg * v))

        log.info("packed Lanczos deflation: %d modes", ph.n_deflate)
        v0 = jax.random.normal(
            jax.random.PRNGKey(9),
            (2, 2, 4, 3, lat.Lt, lat.Lz, lat.Ly * lat.Lx // 2),
            jnp.float32)
        if solve.lmesh is not None:
            v0 = solve.put(v0)     # mesh sharding on the (T, Z, S) axes
        _evals, evecs = lanczos_lowest_pk(
            apply_mmdag, v0, ph.n_deflate,
            n_iter=max(40, 3 * ph.n_deflate))
        evecs_solver = jnp.swapaxes(evecs, 1, 2)   # -> [n, 2par, 2ri, ..]
        deflate_fn = make_deflate_pk(evecs_solver)
        log.info("deflation basis ready (lowest Ritz value %.3e)",
                 float(_evals[0]))
        if ph.eig_outfile:
            from ..utils.checkpoint import save_eigenpairs
            save_eigenpairs(ph.eig_outfile, _evals, list(evecs),
                            layout="packed")
            log.info("wrote deflation eigenpairs -> %s", ph.eig_outfile)

    kw = dict(u_pk=u_acc, derivs=True, dilute_t=ph.dilute_t,
              dilute_sc=bool(ph.dilute_sc), deflate_fn=deflate_fn)
    if keys_cheap:
        log.info("TSM: %d cheap + %d correction noises", len(keys_cheap),
                 len(keys))
        est_c, der_c = stochastic_oneend_pk(
            keys_cheap, cheap_batch, INSERTION_GAMMAS, lat, momenta, ka,
            mu_, **kw)
        est_f, der_f = stochastic_oneend_pk(
            keys, solve_ddag_batch, INSERTION_GAMMAS, lat, momenta, ka,
            mu_, **kw)
        est_fc, der_fc = stochastic_oneend_pk(
            keys, cheap_batch, INSERTION_GAMMAS, lat, momenta, ka, mu_,
            **kw)
        est = _tsm_combine(est_c, est_f, est_fc)
        est_der = _tsm_combine(der_c, der_f, der_fc)
    else:
        est, est_der = stochastic_oneend_pk(
            keys, solve_ddag_batch, INSERTION_GAMMAS, lat, momenta, ka,
            mu_, **kw)

    low = low_der = None
    if evecs_solver is not None:
        log.info("exact low-mode one-end part (%d production solves)",
                 int(evecs_solver.shape[0]))
        low, low_der = oneend_lowmode_exact_pk(
            evecs_solver, solve_ddag_batch, INSERTION_GAMMAS, lat,
            momenta, ka, mu_, u_pk=u_acc, derivs=True)
    return est, est_der, low, low_der


def _run_host(cfg, lat, u_full, u_pk, solve, keys, keys_cheap, momenta,
              g5d):
    """Host complex-layout path (CPU oracle of _run_device)."""
    import jax
    import jax.numpy as jnp
    from ..gammas import INSERTION_GAMMAS
    from ..phys.loops import (make_deflate, oneend_lowmode_exact,
                              stochastic_oneend)
    ph = cfg.physics
    ka, mu_ = cfg.action.kappa, cfg.action.mu

    def solve_ddag(b):
        gb = b * jnp.asarray(g5d, b.dtype)[:, None]
        x = solve(gb, flavor=+1)
        return x * jnp.asarray(g5d, x.dtype)[:, None]

    cheap_solve = None
    if ph.tsm_cheap > 0:
        from ..phys.propagator import full_to_packed, packed_to_full
        from ..solve import solve_tm

        def cheap_solve(b):
            gb = b * jnp.asarray(g5d, b.dtype)[:, None]
            b_pk = full_to_packed(gb, lat)
            res = solve_tm(u_pk, b_pk, lat, kappa=ka, mu=mu_, flavor=+1,
                           tol=ph.tsm_tol, maxiter=ph.tsm_maxiter_cheap,
                           inner_tol=max(ph.tsm_tol, 1e-3),
                           backend=cfg.solver.backend)
            x = packed_to_full(res.x.astype(jnp.float32), lat)
            return x * jnp.asarray(g5d, x.dtype)[:, None]

    deflate_fn = None
    evecs = None
    if ph.n_deflate > 0 and ph.eig_infile:
        from ..utils.checkpoint import load_eigenpairs
        _evals, evecs = load_eigenpairs(ph.eig_infile,
                                        expect_layout="full",
                                        n_expect=ph.n_deflate)
        log.info("loaded %d deflation eigenpairs from %s",
                 len(evecs), ph.eig_infile)
        deflate_fn = make_deflate(evecs)
    elif ph.n_deflate > 0:
        from ..operators import TMOperator
        from ..solvers.lanczos import lanczos_lowest
        m_d = TMOperator(lat, kappa=ka, mu=mu_, flavor=-1)

        def apply_mmdag(v):
            sc = v.reshape(*lat.full_shape, 4, 3)
            w = m_d.apply_dagger(u_full, sc)
            return m_d.apply(u_full, w).reshape(v.shape)

        log.info("Lanczos deflation: %d modes", ph.n_deflate)
        v0 = jax.random.normal(
            jax.random.PRNGKey(9),
            (*lat.full_shape, 4, 3)).astype(jnp.complex64)
        _evals, evecs = lanczos_lowest(
            apply_mmdag, v0, ph.n_deflate,
            n_iter=max(40, 3 * ph.n_deflate))
        evecs = [v.reshape(*lat.full_shape, 4, 3) for v in evecs]
        # orthonormalize (Ritz vectors are near- but not exactly
        # orthonormal; exact deflation needs V^dag V = I)
        from ..utils.cplx import cvdot
        on = []
        for v in evecs:
            for u in on:
                v = v - cvdot(u, v) * u
            v = v / jnp.sqrt(cvdot(v, v).real)
            on.append(v)
        evecs = on
        deflate_fn = make_deflate(evecs)
        if ph.eig_outfile:
            from ..utils.checkpoint import save_eigenpairs
            save_eigenpairs(ph.eig_outfile, _evals, evecs, layout="full")
            log.info("wrote deflation eigenpairs -> %s", ph.eig_outfile)

    kw = dict(u_full=u_full, derivs=True, dilute_t=ph.dilute_t,
              dilute_sc=bool(ph.dilute_sc), deflate_fn=deflate_fn)
    if keys_cheap:
        log.info("TSM: %d cheap + %d correction noises", len(keys_cheap),
                 len(keys))
        est_c, der_c = stochastic_oneend(
            keys_cheap, cheap_solve, INSERTION_GAMMAS, lat, momenta, ka,
            mu_, **kw)
        est_f, der_f = stochastic_oneend(
            keys, solve_ddag, INSERTION_GAMMAS, lat, momenta, ka, mu_,
            **kw)
        est_fc, der_fc = stochastic_oneend(
            keys, cheap_solve, INSERTION_GAMMAS, lat, momenta, ka, mu_,
            **kw)
        est = _tsm_combine(est_c, est_f, est_fc)
        est_der = _tsm_combine(der_c, der_f, der_fc)
    else:
        est, est_der = stochastic_oneend(
            keys, solve_ddag, INSERTION_GAMMAS, lat, momenta, ka, mu_,
            **kw)

    low = low_der = None
    if evecs is not None:
        log.info("exact low-mode one-end part (%d production solves)",
                 len(evecs))
        low, low_der = oneend_lowmode_exact(
            evecs, solve_ddag, INSERTION_GAMMAS, lat, momenta, ka, mu_,
            u_full=u_full, derivs=True)
    return est, est_der, low, low_der


if __name__ == "__main__":
    main()
