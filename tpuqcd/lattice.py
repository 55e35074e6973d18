"""Lattice geometry, parity (even-odd) bookkeeping, and layout descriptors.

TPU-native replacement for the reference's `LatticeField` /
`LatticeFieldParam` layer (reference `lib/lattice_field.cpp`,
`include/lattice_field.h` [U]; SURVEY.md C1).  There are no field *classes*:
fields are plain jax arrays; this module owns the geometry facts every
kernel needs.

Canonical array layouts
-----------------------
full  (site-order) spinor : ``[T, Z, Y, X, 4(spin), 3(color)]`` complex
eo    (parity-split)      : ``[2(parity), T, Z, Y, X//2, 4, 3]`` complex
gauge full                : ``[4(mu), T, Z, Y, X, 3, 3]``
gauge eo                  : ``[4(mu), 2, T, Z, Y, X//2, 3, 3]``

Axis order is t-slowest / x-fastest, matching ILDG site ordering so gauge
I/O is a plain reshape.  Direction index mu = 0..3 = (x, y, z, t); the
*array* axis for direction mu is ``3 - mu`` (x-direction shifts move along
the last site axis).

Even-odd convention (SURVEY.md Appendix A #4): parity(x) = (t+z+y+x) % 2,
parity 0 ("even") first.  In eo layout the site with full-x coordinate x
lives at xh = x // 2; for fixed (t, z, y) and parity p the stored x
coordinates are x = 2*xh + ((t + z + y + p) % 2).
"""
from __future__ import annotations

import dataclasses
from functools import cached_property

import numpy as np

#: direction indices
MU_X, MU_Y, MU_Z, MU_T = 0, 1, 2, 3
#: map direction mu -> site-axis position in the *full* layout [T,Z,Y,X,...]
AXIS_OF_MU = (3, 2, 1, 0)


@dataclasses.dataclass(frozen=True)
class Lattice:
    """Global lattice geometry.

    dims = (Lx, Ly, Lz, Lt).  X must be even (even-odd layout halves it).
    """
    dims: tuple[int, int, int, int]

    def __post_init__(self):
        assert len(self.dims) == 4
        assert self.dims[0] % 2 == 0, "Lx must be even for eo layout"

    @property
    def Lx(self) -> int: return self.dims[0]

    @property
    def Ly(self) -> int: return self.dims[1]

    @property
    def Lz(self) -> int: return self.dims[2]

    @property
    def Lt(self) -> int: return self.dims[3]

    @property
    def volume(self) -> int:
        return self.Lx * self.Ly * self.Lz * self.Lt

    @property
    def spatial_volume(self) -> int:
        return self.Lx * self.Ly * self.Lz

    @property
    def half_volume(self) -> int:
        return self.volume // 2

    @property
    def full_shape(self) -> tuple[int, ...]:
        """Site shape of full layout: (T, Z, Y, X)."""
        return (self.Lt, self.Lz, self.Ly, self.Lx)

    @property
    def eo_shape(self) -> tuple[int, ...]:
        """Site shape of one parity in eo layout: (T, Z, Y, X//2)."""
        return (self.Lt, self.Lz, self.Ly, self.Lx // 2)

    def spinor_shape(self, eo: bool = False) -> tuple[int, ...]:
        if eo:
            return (2, *self.eo_shape, 4, 3)
        return (*self.full_shape, 4, 3)

    def gauge_shape(self, eo: bool = False) -> tuple[int, ...]:
        if eo:
            return (4, 2, *self.eo_shape, 3, 3)
        return (4, *self.full_shape, 3, 3)

    @cached_property
    def parity_mask(self) -> np.ndarray:
        """bool [T,Z,Y,X]: True where site parity is odd ((t+z+y+x)%2==1)."""
        t, z, y, x = np.ix_(*[np.arange(n) for n in self.full_shape])
        return ((t + z + y + x) % 2).astype(bool)

    @cached_property
    def eo_sub_parity(self) -> np.ndarray:
        """int8 [T,Z,Y]: s(t,z,y) = (t+z+y) % 2.

        In eo layout, parity-p sites at (t,z,y,xh) have full x coordinate
        ``2*xh + ((s + p) % 2)``.  This 3-D checkerboard drives the
        parity-dependent x-shifts of the eo Dslash.
        """
        t, z, y = np.ix_(*[np.arange(n) for n in self.full_shape[:3]])
        return ((t + z + y) % 2).astype(np.int8)

    def coords(self) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """Broadcastable (t, z, y, x) index arrays for the full layout."""
        return np.ix_(*[np.arange(n) for n in self.full_shape])
