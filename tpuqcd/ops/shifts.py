"""Even-odd neighbor gathers for arbitrary site fields in device layout.

Shared shift algebra (see tpuqcd.lattice / ops.layout docstrings) used by
the gauge tools, clover construction, covariant derivative, and smearing
— anything that reads a field at x +- mu while everything is stored in
the parity-split [..., T, Z, S] layout.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..lattice import Lattice
from .dslash_xla import _masks


def neighbor(f: jax.Array, mu: int, sign: int, stored_parity: int,
             lat: Lattice) -> jax.Array:
    """Gather f(x + sign*mu) onto the sites of parity 1 - stored_parity.

    f: [..., T, Z, S] holding values on sites of parity ``stored_parity``;
    the result is aligned with the (t, z, s) grid of the *opposite*
    parity (neighbors always flip parity).
    """
    Xh = lat.Lx // 2
    o_p, is_first, is_last = _masks(lat, stored_parity)
    o_p = jnp.asarray(o_p)
    is_first = jnp.asarray(is_first)
    is_last = jnp.asarray(is_last)

    def sroll(x, k):
        return jnp.roll(x, k, axis=-1)

    if sign == +1:
        if mu == 3:
            return jnp.roll(f, -1, axis=-3)
        if mu == 2:
            return jnp.roll(f, -1, axis=-2)
        if mu == 1:
            return sroll(f, -Xh)
        return jnp.where(o_p, f,
                         jnp.where(is_last, sroll(f, Xh - 1), sroll(f, -1)))
    else:
        if mu == 3:
            return jnp.roll(f, +1, axis=-3)
        if mu == 2:
            return jnp.roll(f, +1, axis=-2)
        if mu == 1:
            return sroll(f, +Xh)
        return jnp.where(o_p,
                         jnp.where(is_first, sroll(f, -(Xh - 1)), sroll(f, 1)),
                         f)


def link_at(u_dev: jax.Array, mu: int, parity_of_x: int,
            shifts: list[tuple[int, int]], lat: Lattice) -> jax.Array:
    """U_mu evaluated at x + sum(shifts), aligned to sites of parity
    ``parity_of_x``.

    u_dev: complex eo gauge [4, 2, 3, 3, T, Z, S]; shifts: list of
    (nu, sign) applied left to right (x + s1 + s2 + ...).
    """
    tp = parity_of_x ^ (len(shifts) & 1)  # parity of the target site
    f = u_dev[mu, tp]
    par = tp
    for nu, sign in reversed(shifts):
        f = neighbor(f, nu, sign, par, lat)
        par ^= 1
    assert par == parity_of_x
    return f


def field_at(f_eo: jax.Array, parity_of_x: int,
             shifts: list[tuple[int, int]], lat: Lattice) -> jax.Array:
    """Same as link_at for a generic parity-stacked field [2, ..., T, Z, S]."""
    tp = parity_of_x ^ (len(shifts) & 1)
    f = f_eo[tp]
    par = tp
    for nu, sign in reversed(shifts):
        f = neighbor(f, nu, sign, par, lat)
        par ^= 1
    return f
