"""Field creation and layout conversion (full site-order <-> even-odd).

Replaces the reference's ColorSpinorField/GaugeField order-conversion
machinery (reference `lib/color_spinor_field.cpp`,
`include/color_spinor_field_order.h` [U]; SURVEY.md C2/C3) with pure
functions over jax arrays.  See tpuqcd.lattice for layout definitions.

The even-odd split is a *pair view* of the x axis: reshape X -> (X//2, 2);
within each pair, which element is even depends on the 3-D checkerboard
s(t,z,y) = (t+z+y) % 2 (lattice.Lattice.eo_sub_parity).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .lattice import Lattice

EVEN, ODD = 0, 1


def _sub_parity_mask(lat: Lattice) -> np.ndarray:
    """bool [T,Z,Y,1]: True where s(t,z,y)==1, broadcastable over (Xh, ...)."""
    return (lat.eo_sub_parity == 1)[..., None]


def full_to_eo(f: jax.Array, lat: Lattice, site_ndim_left: int = 0) -> jax.Array:
    """[..., T,Z,Y,X, *inner] -> [..., 2, T,Z,Y,X//2, *inner].

    ``site_ndim_left`` counts leading batch axes before the T axis.
    """
    b = site_ndim_left
    T, Z, Y, X = f.shape[b], f.shape[b + 1], f.shape[b + 2], f.shape[b + 3]
    inner = f.shape[b + 4:]
    fp = f.reshape(*f.shape[:b], T, Z, Y, X // 2, 2, *inner)
    # move the pair axis next to the site axes:
    # fp[..., t,z,y,xh,e, *inner]; even element is e = s(t,z,y)
    s = _sub_parity_mask(lat)  # [T,Z,Y,1]
    s = s.reshape((1,) * b + s.shape + (1,) * len(inner))
    e0 = jnp.take(fp, 0, axis=b + 4)
    e1 = jnp.take(fp, 1, axis=b + 4)
    even = jnp.where(s, e1, e0)
    odd = jnp.where(s, e0, e1)
    return jnp.stack([even, odd], axis=b)


def eo_to_full(f: jax.Array, lat: Lattice, site_ndim_left: int = 0) -> jax.Array:
    """[..., 2, T,Z,Y,X//2, *inner] -> [..., T,Z,Y,X, *inner]."""
    b = site_ndim_left
    even = jnp.take(f, 0, axis=b)
    odd = jnp.take(f, 1, axis=b)
    T, Z, Y, Xh = even.shape[b], even.shape[b + 1], even.shape[b + 2], even.shape[b + 3]
    inner = even.shape[b + 4:]
    s = _sub_parity_mask(lat)
    s = s.reshape((1,) * b + s.shape + (1,) * len(inner))
    slot0 = jnp.where(s, odd, even)
    slot1 = jnp.where(s, even, odd)
    pairs = jnp.stack([slot0, slot1], axis=b + 4)
    return pairs.reshape(*even.shape[:b], T, Z, Y, 2 * Xh, *inner)


def gauge_full_to_eo(u: jax.Array, lat: Lattice) -> jax.Array:
    """[4, T,Z,Y,X, 3,3] -> [4, 2, T,Z,Y,X//2, 3,3]."""
    return full_to_eo(u, lat, site_ndim_left=1)


def gauge_eo_to_full(u: jax.Array, lat: Lattice) -> jax.Array:
    return eo_to_full(u, lat, site_ndim_left=1)


def zeros_spinor(lat: Lattice, eo: bool = False, dtype=jnp.complex64,
                 batch: tuple[int, ...] = ()) -> jax.Array:
    return jnp.zeros((*batch, *lat.spinor_shape(eo=eo)), dtype=dtype)


def point_source(lat: Lattice, t: int, z: int, y: int, x: int,
                 spin: int, color: int, dtype=jnp.complex64) -> jax.Array:
    """Full-layout delta source at one site/spin/color."""
    f = np.zeros(lat.spinor_shape(eo=False), dtype=np.complex64)
    f[t, z, y, x, spin, color] = 1.0
    return jnp.asarray(f, dtype=dtype)


def random_spinor(key: jax.Array, lat: Lattice, eo: bool = False,
                  dtype=jnp.complex64, batch: tuple[int, ...] = ()) -> jax.Array:
    shape = (*batch, *lat.spinor_shape(eo=eo))
    kr, ki = jax.random.split(key)
    z = jax.lax.complex(jax.random.normal(kr, shape, dtype=jnp.float32),
                        jax.random.normal(ki, shape, dtype=jnp.float32))
    return z.astype(dtype)


def apply_boundary_phase(u: jax.Array, lat: Lattice, eo: bool = False,
                         antiperiodic_t: bool = True) -> jax.Array:
    """Fold fermion temporal BC into the gauge links (SURVEY.md App A #3).

    Multiplies U_t(t = Lt-1) by -1 so the hopping term is antiperiodic in T
    while kernels stay purely periodic (reference folds the same phase at
    gauge load [U]).
    """
    if not antiperiodic_t:
        return u
    t_axis = 2 if eo else 1  # [4,(2,)T,...]
    sl = [slice(None)] * u.ndim
    sl[0] = 3  # mu = t
    sl[t_axis] = lat.Lt - 1
    return u.at[tuple(sl)].multiply(-1.0)


def apply_boundary_phase_dev(u_dev: jax.Array, lat: Lattice,
                             antiperiodic_t: bool = True) -> jax.Array:
    """Device-layout [4, 2, 3, 3, T, Z, S] variant of apply_boundary_phase."""
    if not antiperiodic_t:
        return u_dev
    return u_dev.at[3, :, :, :, lat.Lt - 1].multiply(-1.0)


def random_spinor_dev(key: jax.Array, lat: Lattice, dtype=jnp.complex64,
                      parities: int = 2,
                      batch: tuple[int, ...] = ()) -> jax.Array:
    """Random spinor directly in device layout: [(2,) 4, 3, T, Z, S]."""
    T, Z, Y, Xh = (*lat.full_shape[:3], lat.Lx // 2)
    lead = (parities,) if parities == 2 else ()
    shape = (*batch, *lead, 4, 3, T, Z, Y * Xh)
    kr, ki = jax.random.split(key)
    z = jax.lax.complex(jax.random.normal(kr, shape, dtype=jnp.float32),
                        jax.random.normal(ki, shape, dtype=jnp.float32))
    return z.astype(dtype)
