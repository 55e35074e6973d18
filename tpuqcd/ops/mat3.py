"""3x3 color-matrix algebra on leading axes, unrolled.

All gauge-tool math (plaquettes, staples, smearing, field strength) runs
through these helpers.  Matrices are [3, 3, *site_dims] complex arrays
(device layout: matrix indices lead, site dims trail) and every product
is unrolled over the 3x3 indices so XLA:TPU never sees a dot over the
color axis (see ops/dslash_xla.py docstring for why that matters).

TPU-native replacement for the reference's quda_matrix.h / su3 utilities
([U] `include/quda_matrix.h`, `lib/gauge_ape.cu`, `gauge_plaq.cu`).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def mul(a: jax.Array, b: jax.Array, adag: bool = False,
        bdag: bool = False) -> jax.Array:
    """a @ b with optional daggers; a, b: [3, 3, *sites]."""
    rows = []
    for i in range(3):
        cols = []
        for j in range(3):
            acc = None
            for k in range(3):
                x = jnp.conj(a[k, i]) if adag else a[i, k]
                y = jnp.conj(b[j, k]) if bdag else b[k, j]
                t = x * y
                acc = t if acc is None else acc + t
            cols.append(acc)
        rows.append(jnp.stack(cols))
    return jnp.stack(rows)


def dag(a: jax.Array) -> jax.Array:
    return jnp.conj(jnp.swapaxes(a, 0, 1))


def trace(a: jax.Array) -> jax.Array:
    return a[0, 0] + a[1, 1] + a[2, 2]


def eye_like(a: jax.Array) -> jax.Array:
    z = jnp.zeros_like(a[0, 0])
    o = jnp.ones_like(a[0, 0])
    return jnp.stack([jnp.stack([o, z, z]), jnp.stack([z, o, z]),
                      jnp.stack([z, z, o])])


def matvec(a: jax.Array, v: jax.Array, adag: bool = False) -> jax.Array:
    """a @ v, v: [3, *sites]."""
    rows = []
    for i in range(3):
        acc = None
        for k in range(3):
            x = jnp.conj(a[k, i]) if adag else a[i, k]
            t = x * v[k]
            acc = t if acc is None else acc + t
        rows.append(acc)
    return jnp.stack(rows)


def det(a: jax.Array) -> jax.Array:
    return (a[0, 0] * (a[1, 1] * a[2, 2] - a[1, 2] * a[2, 1])
            - a[0, 1] * (a[1, 0] * a[2, 2] - a[1, 2] * a[2, 0])
            + a[0, 2] * (a[1, 0] * a[2, 1] - a[1, 1] * a[2, 0]))


def project_su3(x: jax.Array, iters: int = 6) -> jax.Array:
    """Project [3,3,*] matrices onto SU(3).

    Newton iteration for unitarity, U <- U (3 I - U^dag U) / 2 (converges
    quadratically for near-unitary input; we pre-scale by the Frobenius
    norm so smeared staple sums land in the basin), then a det^{-1/3}
    phase fix.  Reference uses an equivalent polar projection in
    `gauge_ape.cu` [U].
    """
    nrm = jnp.sqrt(jnp.real(trace(mul(x, x, adag=True))) / 3.0)
    u = x / nrm.astype(x.dtype)
    for _ in range(iters):
        udu = mul(u, u, adag=True)          # u^dag u
        corr = 1.5 * eye_like(u) - 0.5 * udu
        u = mul(u, corr)                    # u (3I - u^dag u) / 2
    d = det(u)
    # d is on the unit circle after unitarization; divide by d^{1/3}
    phase = jnp.exp((-1.0 / 3.0) * 1j * jnp.angle(d)).astype(u.dtype)
    return u * phase
