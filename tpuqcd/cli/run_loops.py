"""Disconnected-loop production run (config 5 disconnected part).

The CalcMG_loops_w_oneD_TSM equivalent ([U]
programs/CalcMG_loops_w_oneD_TSM_MG.cpp; SURVEY.md §4.5): optional
Lanczos deflation -> Z4 noise vectors -> (deflated / truncated) solves ->
one-end + plain loop estimators for the 16 ultra-local insertions ->
HDF5.

    python -m tpuqcd.cli.run_loops --config examples/loops.yaml
"""
from __future__ import annotations

import numpy as np

from .common import log, make_solver, parse_args, setup_gauge


def main():
    import jax
    import jax.numpy as jnp
    from ..gammas import GAMMA5, INSERTION_GAMMAS
    from ..io.hdf5io import write_loops
    from ..phys.loops import loops_stochastic, loops_tsm
    from ..operators import TMOperator

    cfg, args = parse_args(__doc__)
    lat, u_full, u_pk, u_dev = setup_gauge(cfg)
    solve = make_solver(cfg, lat, u_pk, u_full)
    momenta = np.asarray(cfg.physics.momenta)
    g5d = np.real(np.diag(GAMMA5))

    def solve_u(b):
        return solve(b, flavor=+1)

    def solve_ddag(b):
        gb = b * jnp.asarray(g5d, b.dtype)[:, None]
        x = solve_u(gb)
        return x * jnp.asarray(g5d, x.dtype)[:, None]

    # optional deflation of the solves (exact low-mode part separately)
    low = None
    if cfg.physics.n_deflate > 0:
        from ..solvers.lanczos import lanczos_lowest
        from ..phys.loops import loop_lowmode
        m_d = TMOperator(lat, kappa=cfg.action.kappa, mu=cfg.action.mu,
                         flavor=-1)

        def apply_mmdag(v):
            sc = v.reshape(*lat.full_shape, 4, 3)
            w = m_d.apply_dagger(u_full, sc)
            return m_d.apply(u_full, w).reshape(v.shape)

        log.info("Lanczos deflation: %d modes", cfg.physics.n_deflate)
        v0 = jax.random.normal(jax.random.PRNGKey(9),
                               (*lat.full_shape, 4, 3)).astype(jnp.complex64)
        evals, evecs = lanczos_lowest(
            apply_mmdag, v0, cfg.physics.n_deflate,
            n_iter=max(40, 3 * cfg.physics.n_deflate))
        evecs = [v.reshape(*lat.full_shape, 4, 3) for v in evecs]

        def apply_mdag(v):
            return m_d.apply_dagger(u_full, v)

        low = loop_lowmode(evals, evecs, apply_mdag, INSERTION_GAMMAS,
                           lat, momenta)
        log.info("exact low-mode loop part done")

        # deflate the stochastic sources: project the captured (M M^dag)
        # low modes out of each noise vector — their loop contribution is
        # the exact `low` part above; the stochastic estimator then only
        # carries the (far lower-variance) high-mode remainder
        # (reference 4.5 "deflate: project out low modes from source")
        from ..utils.cplx import cvdot

        def deflate_src(eta):
            for v in evecs:
                eta = eta - cvdot(v, eta) * v
            return eta
    else:
        deflate_src = None

    keys = list(jax.random.split(jax.random.PRNGKey(17),
                                 cfg.physics.n_noise))
    if cfg.physics.tsm_cheap > 0:
        # TSM: cheap truncated solves + bias correction
        from ..phys.propagator import full_to_packed, packed_to_full
        from ..solve import solve_tm

        def solve_cheap(b):
            b_pk = full_to_packed(b, lat)
            res = solve_tm(u_pk, b_pk, lat, kappa=cfg.action.kappa,
                           mu=cfg.action.mu, tol=1e-3,
                           maxiter=cfg.physics.tsm_maxiter_cheap,
                           backend=cfg.solver.backend)
            return packed_to_full(res.x.astype(jnp.float32), lat)

        keys_cheap = list(jax.random.split(
            jax.random.PRNGKey(23), cfg.physics.tsm_cheap))
        est = loops_tsm(solve_cheap, solve_u, keys_cheap, keys,
                        INSERTION_GAMMAS, lat, momenta)
        est_der = None
    else:
        from .common import accel
        import os
        acc = accel()
        use_dev = (acc.platform != "cpu"
                   or os.environ.get("TPUQCD_DEVICE_CONTRACT") == "1")
        if deflate_src is not None and use_dev:
            # deflated sources live in the full complex layout (the
            # Lanczos eigenvectors); route the estimator through the
            # host contraction path in that case
            use_dev = False
        ka, m_ = cfg.action.kappa, cfg.action.mu

        def _acc_into(tot, est):
            if tot is None:
                return est
            return {k: tot[k] + est[k] for k in tot}

        # ultra-local AND one-derivative estimates from the SAME psi
        # per noise (the reference's `_w_One_Der_` program structure)
        est = None
        est_der = None
        if use_dev:
            # all-device path: packed noise, packed solves, streaming
            # contraction + momentum projection (phys/loops_dev.py)
            from ..phys.loops_dev import (loop_one_end_der_pk,
                                          loop_one_end_pk, z4_noise_pk)
            g5pk = jnp.asarray(g5d, jnp.float32)[:, None, None, None, None]
            u_acc = jax.device_put(u_pk, acc)
            for key in keys:
                eta = z4_noise_pk(key, lat)
                psi = solve.packed_src(eta * g5pk, flavor=+1) * g5pk
                est = _acc_into(est, loop_one_end_pk(
                    psi, INSERTION_GAMMAS, lat, momenta, ka, m_))
                der = {}
                for nu in range(4):
                    d = loop_one_end_der_pk(psi, u_acc, INSERTION_GAMMAS,
                                            nu, lat, momenta, ka, m_)
                    der.update({f"{k}_D{nu}": v for k, v in d.items()})
                est_der = _acc_into(est_der, der)
        else:
            from ..phys.loops import (loop_one_end, loop_one_end_der,
                                      z4_noise)
            for key in keys:
                eta = z4_noise(key, lat)
                if deflate_src is not None:
                    # exact in expectation for the plain estimator;
                    # the standard ETMC variance reduction when combined
                    # with the one-end trick
                    eta = deflate_src(eta)
                psi = solve_ddag(eta)
                est = _acc_into(est, loop_one_end(
                    psi, INSERTION_GAMMAS, lat, momenta, ka, m_))
                der = {}
                for nu in range(4):
                    d = loop_one_end_der(psi, u_full, INSERTION_GAMMAS,
                                         nu, lat, momenta, ka, m_)
                    der.update({f"{k}_D{nu}": v for k, v in d.items()})
                est_der = _acc_into(est_der, der)
        n = len(keys)
        est = {k: v / n for k, v in est.items()}
        est_der = {k: v / n for k, v in est_der.items()}

    names = list(est.keys())
    arr = np.stack([np.asarray(est[k]) for k in names])
    write_loops(cfg.physics.output, "loops/oneend", arr, names,
                meta={"n_noise": cfg.physics.n_noise,
                      "kappa": cfg.action.kappa, "mu": cfg.action.mu})
    if est_der is not None:
        dnames = list(est_der.keys())
        write_loops(cfg.physics.output, "loops/oneend_der",
                    np.stack([np.asarray(est_der[k]) for k in dnames]),
                    dnames)
    if low is not None:
        arr_low = np.stack([np.asarray(low[k]) for k in names])
        write_loops(cfg.physics.output, "loops/lowmode", arr_low, names)
    log.info("wrote loops -> %s", cfg.physics.output)


if __name__ == "__main__":
    main()
