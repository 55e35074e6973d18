"""Gauge fixing (Landau / Coulomb) by checkerboard overrelaxation.

TPU-native equivalent of reference `lib/gauge_fix_ovr.cu` /
`gauge_fix_fft.cu` [U]; SURVEY.md C16.  Maximizes

    F[g] = sum_{x, mu in dirs} Re tr[ g(x) U_mu(x) g(x+mu)^dag ]

(dirs = all four for Landau, spatial only for Coulomb) by sweeping the
even/odd site checkerboards: on each parity all local updates are
independent, so a sweep is one batched SU(3)-projection of the local
staple sum K(x) = sum_mu [ U_mu(x) + U_mu(x-mu)^dag ] — the eo analog of
the reference's overrelaxation kernel.  Convergence is monitored by the
standard theta = mean |divergence of A|^2 proxy (change in F).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..lattice import Lattice
from . import mat3
from .shifts import link_at, neighbor


def _local_k(u_dev, p, dirs, lat):
    """K(x) = sum_mu [U_mu(x) + U_mu(x-mu)^dag] at parity-p sites."""
    acc = None
    for mu in dirs:
        t = u_dev[mu, p] + mat3.dag(link_at(u_dev, mu, p, [(mu, -1)], lat))
        acc = t if acc is None else acc + t
    return acc


def _apply_g(u_dev, g_p, p, lat):
    """gauge-transform the links touched by parity-p g: U_mu(x)|p ->
    g(x) U_mu(x); U_mu(x)|1-p -> U_mu(x) g(x+mu)^dag."""
    out = []
    for mu in range(4):
        u_p = mat3.mul(g_p, u_dev[mu, p])
        g_at_xpmu = neighbor(g_p, mu, +1, p, lat)   # g(x+mu) at 1-p sites
        u_q = mat3.mul(u_dev[mu, 1 - p], g_at_xpmu, bdag=True)
        pair = [None, None]
        pair[p] = u_p
        pair[1 - p] = u_q
        out.append(jnp.stack(pair))
    return jnp.stack(out)


def gauge_fix(u_dev: jax.Array, lat: Lattice, *, gauge: str = "landau",
              n_sweeps: int = 200, omega: float = 1.7,
              tol: float = 1e-9):
    """Returns (u_fixed, functional_history).

    omega in (1, 2): overrelaxation (g -> g^omega approximated by the
    standard first-order SU(3) trick: project(1 + omega (g - 1))).
    """
    dirs = (0, 1, 2, 3) if gauge == "landau" else (0, 1, 2)
    nd = len(dirs)

    def functional(u):
        f = jnp.float64(0.0)
        for p in (0, 1):
            for mu in dirs:
                f = f + jnp.sum(jnp.real(mat3.trace(u[mu, p]))
                                .astype(jnp.float64))
        return f / (3.0 * nd * lat.volume)

    def sweep(u, p):
        k = _local_k(u, p, dirs, lat)
        g = mat3.project_su3(mat3.dag(k))
        if omega != 1.0:
            g = mat3.project_su3(
                (1.0 - omega) * mat3.eye_like(g) + omega * g)
        return _apply_g(u, g, p, lat)

    def reunit(u):
        return jnp.stack([jnp.stack([mat3.project_su3(u[mu, p], iters=3)
                                     for p in (0, 1)])
                          for mu in range(4)])

    hist = []
    f_prev = float(functional(u_dev))
    u = u_dev
    for it in range(n_sweeps):
        u = sweep(u, 0)
        u = sweep(u, 1)
        if (it + 1) % 10 == 0:
            u = reunit(u)  # drift control (fp32 projection roundoff)
        f = float(functional(u))
        hist.append(f)
        if abs(f - f_prev) < tol:
            break
        f_prev = f
    return reunit(u), hist
