"""Gauge-field observables and smearing: plaquette, APE (3-D spatial).

TPU-native equivalents of reference `lib/gauge_plaq.cu`,
`lib/gauge_ape.cu`, `performAPEnStep` [U]; SURVEY.md C16.  All in complex
device layout (u_dev [4, 2, 3, 3, T, Z, S]) built on ops/mat3 + the eo
shift algebra of ops/shifts.  These run at gauge-load / smearing-setup
time, off the solver hot path.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..lattice import Lattice
from . import mat3
from .shifts import link_at


def plaquette(u_dev: jax.Array, lat: Lattice) -> jax.Array:
    """Average plaquette Re tr P / 3 over all sites and mu < nu.

    The standard sanity check after gauge load (reference calls plaqQuda
    right after loadGaugeQuda, SURVEY.md §4.1); unit gauge -> 1.0.
    """
    total = jnp.float64(0.0)
    for p in (0, 1):
        for mu in range(4):
            for nu in range(mu + 1, 4):
                a = u_dev[mu, p]
                b = link_at(u_dev, nu, p, [(mu, +1)], lat)
                c = link_at(u_dev, mu, p, [(nu, +1)], lat)
                d = u_dev[nu, p]
                ab = mat3.mul(a, b)
                cd_dag = mat3.mul(ab, c, bdag=True)
                pl = mat3.mul(cd_dag, d, bdag=True)
                total = total + jnp.sum(
                    jnp.real(mat3.trace(pl)).astype(jnp.float64))
    return total / (3.0 * 6.0 * lat.volume)


def spatial_plaquette(u_dev: jax.Array, lat: Lattice) -> jax.Array:
    """Average spatial-only plaquette (mu < nu in {x, y, z})."""
    total = jnp.float64(0.0)
    for p in (0, 1):
        for mu in range(3):
            for nu in range(mu + 1, 3):
                a = u_dev[mu, p]
                b = link_at(u_dev, nu, p, [(mu, +1)], lat)
                c = link_at(u_dev, mu, p, [(nu, +1)], lat)
                d = u_dev[nu, p]
                pl = mat3.mul(mat3.mul(mat3.mul(a, b), c, bdag=True),
                              d, bdag=True)
                total = total + jnp.sum(
                    jnp.real(mat3.trace(pl)).astype(jnp.float64))
    return total / (3.0 * 3.0 * lat.volume)


def tile_field_dev(x: jax.Array, lat_small: Lattice,
                   factors=(2, 2, 2, 2)) -> jax.Array:
    """Periodically replicate a device-layout field [..., T, Z, S]
    (gauge [4, 2, 3, 3, T, Z, S] or packed/complex spinor alike) by
    integer factors (ft, fz, fy, fx) onto the enlarged lattice.

    This is exact periodic replication: the big field at site
    (t + i*T, z + j*Z, y + k*Y, x + l*X) equals the small field at
    (t, z, y, x).  Because every small extent is even, the replication
    offsets are even and site parities are preserved, so the eo-packed
    device layout tiles axis-by-axis: T and Z directly, and the packed
    S = Y*Xh axis as a (Y, Xh) block tile (for x = x0 + X*l the packed
    half-index is x0//2 + (X//2)*l — a plain repeat along Xh).

    Purpose: structured benchmark gauges at volumes whose in-place
    heatbath program exceeds one chip's HBM (the 48^3x96 sweep program
    OOMs on a 16 GiB v5e, BASELINE.md round 5).  A tiled thermalized
    gauge has the SAME plaquette and the same local fluctuation
    structure as its generator — but it is a periodic replica, not an
    independent ensemble member: long-distance observables and the
    Dirac spectrum inherit the small lattice's (folded, degenerate)
    low modes.  Label results accordingly.
    """
    assert lat_small.Lx % 2 == 0 and lat_small.Ly % 2 == 0
    assert lat_small.Lz % 2 == 0 and lat_small.Lt % 2 == 0
    ft, fz, fy, fx = factors
    T, Z = lat_small.Lt, lat_small.Lz
    Y, Xh = lat_small.Ly, lat_small.Lx // 2
    assert x.shape[-3:] == (T, Z, Y * Xh), (x.shape, (T, Z, Y * Xh))
    lead = x.shape[:-3]
    x4 = x.reshape(lead + (T, Z, Y, Xh))
    x4 = jnp.tile(x4, (1,) * len(lead) + (ft, fz, fy, fx))
    return x4.reshape(lead + (T * ft, Z * fz, Y * fy * Xh * fx))


def _staple_sum(u_dev: jax.Array, mu: int, p: int, dirs, lat: Lattice):
    """Sum of staples around link (x, mu) at parity-p sites over nu in dirs."""
    acc = None
    for nu in dirs:
        if nu == mu:
            continue
        # forward: U_nu(x) U_mu(x+nu) U_nu(x+mu)^dag
        t1 = mat3.mul(u_dev[nu, p], link_at(u_dev, mu, p, [(nu, +1)], lat))
        t1 = mat3.mul(t1, link_at(u_dev, nu, p, [(mu, +1)], lat), bdag=True)
        # backward: U_nu(x-nu)^dag U_mu(x-nu) U_nu(x-nu+mu)
        a = link_at(u_dev, nu, p, [(nu, -1)], lat)
        b = link_at(u_dev, mu, p, [(nu, -1)], lat)
        c = link_at(u_dev, nu, p, [(nu, -1), (mu, +1)], lat)
        t2 = mat3.mul(mat3.mul(mat3.dag(a), b), c)
        s = t1 + t2
        acc = s if acc is None else acc + s
    return acc


def ape_smear_step(u_dev: jax.Array, lat: Lattice, alpha: float = 0.5,
                   spatial_only: bool = True) -> jax.Array:
    """One APE step: U' = Proj_SU3[(1-alpha) U + (alpha/(2(n-1))) staples].

    spatial_only=True smears x,y,z links over spatial staples only and
    leaves t links untouched — the QKXTM convention for the smearing
    gauge used by Gaussian source smearing ([U] plugin APE usage).
    """
    dirs = (0, 1, 2) if spatial_only else (0, 1, 2, 3)
    nsmear_dirs = len(dirs) - 1
    out = []
    for mu in range(4):
        if spatial_only and mu == 3:
            out.append(u_dev[3])
            continue
        pars = []
        for p in (0, 1):
            st = _staple_sum(u_dev, mu, p, dirs, lat)
            mixed = ((1.0 - alpha) * u_dev[mu, p] +
                     (alpha / (2.0 * nsmear_dirs)) * st)
            pars.append(mat3.project_su3(mixed))
        out.append(jnp.stack(pars))
    return jnp.stack(out)


def ape_smear(u_dev: jax.Array, lat: Lattice, alpha: float = 0.5,
              n_steps: int = 10, spatial_only: bool = True) -> jax.Array:
    def body(i, u):
        return ape_smear_step(u, lat, alpha=alpha, spatial_only=spatial_only)
    return jax.lax.fori_loop(0, n_steps, body, u_dev)


def stout_smear_step(u_dev: jax.Array, lat: Lattice, rho: float = 0.1,
                     spatial_only: bool = False) -> jax.Array:
    """One stout (analytic SU(3) exponential) smearing step
    (reference gauge_stout.cu [U]):
      Omega = rho * C U^dag; Q = (i/2)(Omega^dag - Omega)
              - (i/6) tr(Omega^dag - Omega);  U' = exp(iQ) U.
    exp(iQ) via a converged power series on the traceless-Hermitian Q
    (||rho C U|| is O(1); 16 terms reach fp32 roundoff).
    """
    dirs = (0, 1, 2) if spatial_only else (0, 1, 2, 3)
    out = []
    for mu in range(4):
        if spatial_only and mu == 3:
            out.append(u_dev[3])
            continue
        pars = []
        for p in (0, 1):
            c = _staple_sum(u_dev, mu, p, dirs, lat)
            omega = rho * mat3.mul(c, u_dev[mu, p], bdag=True)
            anti = mat3.dag(omega) - omega
            q = 0.5j * anti
            tr = mat3.trace(q) / 3.0
            eye = mat3.eye_like(q)
            q = q - tr * eye   # traceless Hermitian
            # exp(iQ) power series
            iq = 1j * q
            term = eye
            acc = eye
            for k in range(1, 17):
                term = mat3.mul(term, iq) / k
                acc = acc + term
            pars.append(mat3.mul(acc, u_dev[mu, p]))
        out.append(jnp.stack(pars))
    return jnp.stack(out)


def stout_smear(u_dev: jax.Array, lat: Lattice, rho: float = 0.1,
                n_steps: int = 3, spatial_only: bool = False) -> jax.Array:
    def body(i, u):
        return stout_smear_step(u, lat, rho=rho, spatial_only=spatial_only)
    return jax.lax.fori_loop(0, n_steps, body, u_dev)
