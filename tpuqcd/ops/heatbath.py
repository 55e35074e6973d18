"""Quenched SU(3) gauge generation: Cabibbo-Marinari pseudo-heatbath.

The reference consumes externally produced ETMC ensembles (ILDG files,
SURVEY.md §4.1); this environment has no network, so structured gauge
fields — the regime adaptive multigrid exists for (BASELINE.md Tier 3,
[P:1710.06198]) — must be generated in-repo.  This module is the
TPU-native generator: Wilson plaquette action, Cabibbo-Marinari SU(2)
subgroup pseudo-heatbath (Kennedy-Pendleton sampling, Creutz fallback at
weak coupling) plus microcanonical overrelaxation sweeps.

All updates run in the complex device layout (u_dev [4, 2, 3, 3, T, Z,
S], color axes leading) through ops/mat3 and the ops/gauge_tools staple
algebra.  The update schedule is the standard 8-sublattice sweep: all
links of one (direction mu, parity p) class update simultaneously —
their staples touch only nu != mu links and mu links at opposite-parity
sites, so the class-conditional distributions factorize and the sweep is
a valid Gibbs/heatbath kernel.  One thermalization run is ONE compiled
XLA program (lax.fori_loop over sweeps); there is no per-site or
per-sweep host control flow.

Physics conventions: Wilson action S = beta * sum_p (1 - Re tr U_p / 3).
For a link U the local weight is exp((beta/3) Re tr(U A)) with A the
dagger of gauge_tools._staple_sum (whose forward term is the dagger of
the conventional staple; see that docstring).  Pure-gauge boundary
conditions are periodic in all directions — the fermionic antiperiodic
t-phase is applied later by fields.apply_boundary_phase_dev.
"""
from __future__ import annotations

import math
from functools import lru_cache as _lru_cache

import jax
import jax.numpy as jnp

from ..lattice import Lattice
from . import mat3
from .gauge_tools import _staple_sum

#: SU(2) subgroup index pairs of SU(3) (Cabibbo-Marinari set).
_SUBGROUPS = ((0, 1), (0, 2), (1, 2))


def _quat_of_block(w00, w01, w10, w11):
    """Real quaternion components (a0, a1, a2, a3) and norm k of the
    SU(2)-covariant part of a complex 2x2 block w: for any g in SU(2),
    Re tr(g w) = k * Re tr(g V) with V = quat_matrix(a)/k in SU(2).

    a_mu = Re of the coefficients of w in the basis (I, i sigma_k):
    a0 = (Re w00 + Re w11)/2, a1 = (Im w01 + Im w10)/2,
    a2 = (Re w01 - Re w10)/2, a3 = (Im w00 - Im w11)/2.
    """
    a0 = 0.5 * (jnp.real(w00) + jnp.real(w11))
    a1 = 0.5 * (jnp.imag(w01) + jnp.imag(w10))
    a2 = 0.5 * (jnp.real(w01) - jnp.real(w10))
    a3 = 0.5 * (jnp.imag(w00) - jnp.imag(w11))
    k = jnp.sqrt(a0 * a0 + a1 * a1 + a2 * a2 + a3 * a3)
    return (a0, a1, a2, a3), k


def _quat_matrix(q0, q1, q2, q3):
    """2x2 complex entries of q0*I + i(q1 s1 + q2 s2 + q3 s3):
    [[q0 + i q3, q2 + i q1], [-q2 + i q1, q0 - i q3]]."""
    g00 = jax.lax.complex(q0, q3)
    g01 = jax.lax.complex(q2, q1)
    g10 = jax.lax.complex(-q2, q1)
    g11 = jax.lax.complex(q0, -q3)
    return g00, g01, g10, g11


def _mul2(a, b):
    """(2x2) @ (2x2) on entry tuples."""
    a00, a01, a10, a11 = a
    b00, b01, b10, b11 = b
    return (a00 * b00 + a01 * b10, a00 * b01 + a01 * b11,
            a10 * b00 + a11 * b10, a10 * b01 + a11 * b11)


def _sample_h0(key, xi, n_rounds: int = 30):
    """Sample h0 in [-1, 1] with density ~ sqrt(1 - h0^2) exp(xi * h0),
    elementwise over an array xi > 0.  Returns (h0, accepted-mask).

    Hybrid rejection: Kennedy-Pendleton where xi > 1 (acceptance -> 1 at
    strong ordering), Creutz where xi <= 1 (KP's acceptance collapses
    there).  Fixed n_rounds trip count (XLA-friendly).  The residual miss
    probability after 30 rounds is negligible in bulk (typically below
    1e-9) but can reach ~1e-6 per site-update near the KP/Creutz
    crossover xi ~ 1 where per-round acceptance bottoms out; callers must
    therefore treat unaccepted sites as a rejection (keep the old link)
    rather than substituting any fixed value, which would bias the
    measure.
    """
    dt = xi.dtype
    tiny = jnp.asarray(1e-12, dt)
    xi = jnp.maximum(xi, tiny)
    use_kp = xi > 1.0
    zmin = jnp.exp(-2.0 * xi)

    def body(i, state):
        h0, acc = state
        kr = jax.random.fold_in(key, i)
        r = jax.random.uniform(kr, (5,) + xi.shape, dtype=dt,
                               minval=1e-10, maxval=1.0)
        # Kennedy-Pendleton
        lam2 = -(jnp.log(r[0])
                 + jnp.cos(2.0 * math.pi * r[1]) ** 2 * jnp.log(r[2])
                 ) / (2.0 * xi)
        kp_ok = r[3] * r[3] <= 1.0 - lam2
        kp_h0 = 1.0 - 2.0 * lam2
        # Creutz
        z = zmin + (1.0 - zmin) * r[0]
        cr_h0 = 1.0 + jnp.log(z) / xi
        cr_ok = r[4] * r[4] <= 1.0 - cr_h0 * cr_h0
        cand = jnp.where(use_kp, kp_h0, cr_h0)
        ok = jnp.where(use_kp, kp_ok, cr_ok) & ~acc
        return jnp.where(ok, cand, h0), acc | ok

    h0 = jnp.ones(xi.shape, dt)
    h0, acc = jax.lax.fori_loop(0, n_rounds, body,
                                (h0, jnp.zeros(xi.shape, bool)))
    return jnp.clip(h0, -1.0, 1.0), acc


def _su2_heatbath(key, w_block, beta_eff):
    """Heatbath sample g in SU(2) (2x2 entry tuple) for weight
    exp(beta_eff * Re tr(g w)); w_block = (w00, w01, w10, w11)."""
    (a0, a1, a2, a3), k = _quat_of_block(*w_block)
    dt = a0.dtype
    k = jnp.maximum(k, jnp.asarray(1e-12, dt))
    xi = (2.0 * beta_eff) * k          # exponent coefficient of h0
    kh, kd = jax.random.split(key)
    h0, acc = _sample_h0(kh, xi)
    # uniform direction on S^2, radius sqrt(1 - h0^2)
    n = jax.random.normal(kd, (3,) + h0.shape, dtype=dt)
    nn = jnp.sqrt(n[0] ** 2 + n[1] ** 2 + n[2] ** 2)
    nn = jnp.maximum(nn, jnp.asarray(1e-12, dt))
    hr = jnp.sqrt(jnp.maximum(1.0 - h0 * h0, 0.0)) / nn
    h = _quat_matrix(h0, n[0] * hr, n[1] * hr, n[2] * hr)
    vdag = _quat_matrix(a0 / k, -a1 / k, -a2 / k, -a3 / k)
    g = _mul2(h, vdag)                 # g = h V^dag
    # Rejection-sampling miss: fall back to the identity (link unchanged)
    # — the genuinely unbiased outcome.  h0 = 1 alone would instead set
    # the link to maximal staple alignment, a tiny ordering bias.
    one = jnp.ones_like(g[0])
    zero = jnp.zeros_like(g[0])
    return tuple(jnp.where(acc, gi, fi)
                 for gi, fi in zip(g, (one, zero, zero, one)))


def _su2_overrelax(w_block):
    """Microcanonical overrelaxation g = (V^dag)^2: Re tr(g w) is exactly
    preserved (Re tr((V^dag)^2 kV) = k Re tr(V^dag) = k Re tr(V))."""
    (a0, a1, a2, a3), k = _quat_of_block(*w_block)
    k = jnp.maximum(k, jnp.asarray(1e-12, a0.dtype))
    vdag = _quat_matrix(a0 / k, -a1 / k, -a2 / k, -a3 / k)
    return _mul2(vdag, vdag)


def _apply_subgroup(m, g, i, j):
    """Left-multiply rows (i, j) of the [3, 3, T, Z, S] matrix m by the
    2x2 g (entry tuple)."""
    g00, g01, g10, g11 = g
    ri = g00 * m[i] + g01 * m[j]
    rj = g10 * m[i] + g11 * m[j]
    return m.at[i].set(ri).at[j].set(rj)


def _update_class(u_dev, mu: int, p: int, key, beta: float, lat: Lattice,
                  overrelax: bool):
    """Update all links of direction mu at parity-p sites (one
    Cabibbo-Marinari visit through the three SU(2) subgroups)."""
    beta_eff = beta / 3.0
    st = _staple_sum(u_dev, mu, p, (0, 1, 2, 3), lat)
    link = u_dev[mu, p]
    w = mat3.mul(link, st, bdag=True)   # W = U A, A = st^dag
    for s, (i, j) in enumerate(_SUBGROUPS):
        block = (w[i, i], w[i, j], w[j, i], w[j, j])
        if overrelax:
            g = _su2_overrelax(block)
        else:
            g = _su2_heatbath(jax.random.fold_in(key, s), block, beta_eff)
        link = _apply_subgroup(link, g, i, j)
        w = _apply_subgroup(w, g, i, j)
    return u_dev.at[mu, p].set(link)


def heatbath_sweep(u_dev: jax.Array, key, beta: float,
                   lat: Lattice) -> jax.Array:
    """One full pseudo-heatbath sweep (8 link classes x 3 subgroups)."""
    for p in (0, 1):
        for mu in range(4):
            kc = jax.random.fold_in(key, 4 * p + mu)
            u_dev = _update_class(u_dev, mu, p, kc, beta, lat,
                                  overrelax=False)
    return u_dev


def overrelax_sweep(u_dev: jax.Array, lat: Lattice) -> jax.Array:
    """One microcanonical overrelaxation sweep (no randomness)."""
    for p in (0, 1):
        for mu in range(4):
            u_dev = _update_class(u_dev, mu, p, None, 0.0, lat,
                                  overrelax=True)
    return u_dev


def _reunit(u):
    """Project every link of a device-layout gauge field back onto SU(3)."""
    return jax.vmap(mat3.project_su3)(
        u.reshape((8, 3, 3) + u.shape[4:])).reshape(u.shape)


@_lru_cache(maxsize=None)
def _therm_fn(lat: Lattice, n_or: int, reunit_every: int):
    """One compiled thermalization program per (lattice, schedule): key,
    beta, the sweep count AND the global sweep offset are all dynamic,
    so thermalization, the decorrelation skips of an ensemble run, and
    the chunked segments of a long run all share a single XLA program."""

    def run(u0, key, beta, n_sweeps, start):
        def body(i, u):
            # fold in the GLOBAL sweep index: chunked executions of a
            # long run draw the same randomness stream as one monolithic
            # execution would
            ks = jax.random.fold_in(key, start + i)
            u = heatbath_sweep(u, ks, beta, lat)
            for _ in range(n_or):
                u = overrelax_sweep(u, lat)
            return jax.lax.cond(
                (i + 1) % reunit_every == 0,
                _reunit, lambda x: x, u)

        u = jax.lax.fori_loop(0, n_sweeps, body, u0)
        # Always reunitarize at loop exit: the in-loop counter restarts
        # at 0 on every call, so a chain continued in short segments
        # (n_sweeps < reunit_every, the measurement/skip pattern) would
        # otherwise NEVER reunitarize and drift off SU(3) by ~1.3e-6 per
        # sweep, compounding across segments.
        return _reunit(u)

    return jax.jit(run)


#: Upper bound on sweeps per XLA execution.  One monolithic execution of
#: a long thermalization is minutes of device time at production
#: volumes, and the remote (axon) TPU worker kills executions it deems
#: hung: the round-4 32^3x64 campaign crashed the worker 3/3 times
#: inside a single 160-sweep program (.bench_logs/mg32.log, "TPU worker
#: process crashed or restarted ... kernel fault") while the identical
#: physics ran fine at 24^3x48.  Chunking bounds per-execution wallclock
#: with zero recompiles (one program, dynamic count + offset) and — via
#: the global sweep offset above — an unchanged randomness stream.
MAX_SWEEPS_PER_CALL = 20


def thermalize(key, lat: Lattice, beta: float, n_sweeps: int,
               n_or: int = 3, u0: jax.Array | None = None,
               reunit_every: int = 20,
               max_sweeps_per_call: int | None = None) -> jax.Array:
    """Run n_sweeps compound (1 heatbath + n_or overrelaxation) sweeps
    from u0 (default: cold/unit start) and return the gauge field.

    Long runs execute as ceil(n_sweeps / max_sweeps_per_call) calls of
    ONE compiled program (see MAX_SWEEPS_PER_CALL); the default chunk
    equals reunit_every so the reunitarization schedule matches the
    monolithic execution too."""
    from .. import su3
    if u0 is None:
        u0 = su3.unit_gauge_dev(lat)
    fn = _therm_fn(lat, n_or, reunit_every)
    chunk = max_sweeps_per_call or min(MAX_SWEEPS_PER_CALL, reunit_every)
    u = u0
    for start in range(0, int(n_sweeps), chunk):
        n = min(chunk, int(n_sweeps) - start)
        u = fn(u, key, jnp.float32(beta), jnp.int32(n), jnp.int32(start))
    return u


def generate_ensemble(key, lat: Lattice, beta: float, n_cfg: int,
                      n_therm: int = 200, n_skip: int = 20, n_or: int = 3,
                      u0: jax.Array | None = None):
    """Yield n_cfg decorrelated gauge configs (device layout).

    Thermalizes from u0 (default cold) for n_therm compound sweeps, then
    yields a config every n_skip sweeps — ONE Markov chain with skip
    decorrelation, not per-member cold restarts.  Each yielded array is
    safe to keep (the generator does not alias it).  Pass u0 already on
    the target device to pin the whole chain there.
    """
    u = thermalize(key, lat, beta, n_therm, n_or=n_or, u0=u0)
    for c in range(n_cfg):
        yield u
        u = thermalize(jax.random.fold_in(key, 10_000 + c), lat, beta,
                       n_skip, n_or=n_or, u0=u)
