"""Sharded Dslash / operator: ppermute halo exchange + per-shard kernels.

TPU-native equivalent of the reference's halo machinery
(`dslash_pack.cu` pack kernels + MPI_Isend/Irecv + interior/exterior
kernels, `dslash_policy.cuh` [U]; SURVEY.md C6/C7, §4.4): here the
boundary slices are exchanged with lax.ppermute over the ICI mesh inside
shard_map, appended to the local arrays as halo slabs, and the Pallas
kernel reads them via its halo_t/halo_z index maps
(ops/dslash_pallas.py).  XLA schedules the ppermutes concurrently with
other work; an explicit interior/boundary split is a later optimization
(the reference's overlap engine).

Gauge halos are static per configuration: extend_gauge() exchanges them
once and the extended array is reused by every solve.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..fields import EVEN, ODD
from ..lattice import Lattice
from .mesh import LatticeMesh


def _pperm(x, axis_name, shift):
    """receive from the neighbor at (my_index - shift) on a periodic ring."""
    n = jax.lax.axis_size(axis_name)
    perm = [(i, (i + shift) % n) for i in range(n)]
    return jax.lax.ppermute(x, axis_name, perm)


def _exchange_t(psi_loc, tn):
    """psi [2,4,3,Tl,Z,S] -> [2,4,3,Tl+2,Z,S] with t-1, t+1 halos appended."""
    if tn == 1:
        lo = psi_loc[:, :, :, -1:]
        hi = psi_loc[:, :, :, :1]
    else:
        lo = _pperm(psi_loc[:, :, :, -1:], "t", +1)   # from t-neighbor below
        hi = _pperm(psi_loc[:, :, :, :1], "t", -1)    # from t-neighbor above
    return jnp.concatenate([psi_loc, lo, hi], axis=3)


def _exchange_z(psi_loc, zn, Zb):
    """append z-lo / z-hi halo slabs of Zb rows along Z (axis 4)."""
    if zn == 1:
        lo = psi_loc[:, :, :, :, -Zb:]
        hi = psi_loc[:, :, :, :, :Zb]
    else:
        lo = _pperm(psi_loc[:, :, :, :, -Zb:], "z", +1)
        hi = _pperm(psi_loc[:, :, :, :, :Zb], "z", -1)
    return jnp.concatenate([psi_loc, lo, hi], axis=4)


# --- spin-projected (half-spinor) halo pack --------------------------------
# The reference packs ghost faces WITH the spin projection
# (`dslash_pack.cu` PackGhost kernels [U], SURVEY.md C6): only
# (1 +- gamma_mu) psi of a face enters the mu-hop, the projector is rank
# 2, so 12 reals/site cross the wire instead of 24.  Every HALF_PROJ
# table (gammas.py) carries the identity in its first two spin columns,
# so the receiver reconstructs psi' = (h0, h1, 0, 0) and the kernel's
# own in-VMEM projection gives proj(psi') == h EXACTLY — no kernel
# change, bit-identical f32 hops, half the ICI traffic.  The z halo
# additionally shrinks from a Zb-row slab to the ONE row the kernel
# actually consumes (row 0 of the z-hi slab / row Zb-1 of the z-lo
# slab), a further Zb x saving.


def _hproj_pk(psi, tab):
    """Apply a 2x4 half-projector (entries 0, +-1, +-i — gammas.py
    HALF_PROJ_*) to a packed-real spinor [2(ri), 4, 3, ...] ->
    [2(ri), 2, 3, ...].  Pure adds/sign-flips, no complex multiplies."""
    re, im = psi[0], psi[1]
    rows_r, rows_i = [], []
    for s in range(2):
        r = i_ = None
        for k in range(4):
            c = complex(tab[s, k])
            if c == 0:
                continue
            if c.imag == 0:  # +-1
                tr = re[k] if c.real > 0 else -re[k]
                ti = im[k] if c.real > 0 else -im[k]
            else:            # +-i: (i b z).re = -b z.im, .im = b z.re
                tr = -im[k] if c.imag > 0 else im[k]
                ti = re[k] if c.imag > 0 else -re[k]
            r = tr if r is None else r + tr
            i_ = ti if i_ is None else i_ + ti
        rows_r.append(r)
        rows_i.append(i_)
    return jnp.stack([jnp.stack(rows_r), jnp.stack(rows_i)])


def _hpad_pk(h):
    """[2(ri), 2, 3, ...] -> [2(ri), 4, 3, ...], zero spins 2, 3."""
    return jnp.concatenate([h, jnp.zeros_like(h)], axis=1)


def _half_tables(dagger):
    from ..gammas import HALF_PROJ_MINUS, HALF_PROJ_PLUS
    if dagger:  # the kernel swaps hpm <-> hpp under dagger
        return HALF_PROJ_PLUS, HALF_PROJ_MINUS
    return HALF_PROJ_MINUS, HALF_PROJ_PLUS


def _exchange_t_half(psi_loc, tn, dagger):
    """Spin-projected t halo: slab Tl (t-1 face, consumed with hpp[3]) and
    slab Tl+1 (t+1 face, hpm[3]) travel as 2-spin half-spinors."""
    hpm, hpp = _half_tables(dagger)
    lo_h = _hproj_pk(psi_loc[:, :, :, -1:], hpp[3])
    hi_h = _hproj_pk(psi_loc[:, :, :, :1], hpm[3])
    if tn > 1:
        lo_h = _pperm(lo_h, "t", +1)
        hi_h = _pperm(hi_h, "t", -1)
    return jnp.concatenate(
        [psi_loc, _hpad_pk(lo_h), _hpad_pk(hi_h)], axis=3)


def _exchange_z_half(psi_ext, zn, Zb, dagger):
    """Spin-projected z halo: ship only the single consumed row per side
    (kernel reads z-lo slab row Zb-1 and z-hi slab row 0), zero-fill the
    rest of the Zb-row block."""
    hpm, hpp = _half_tables(dagger)
    lo_h = _hproj_pk(psi_ext[:, :, :, :, -1:], hpp[2])
    hi_h = _hproj_pk(psi_ext[:, :, :, :, :1], hpm[2])
    if zn > 1:
        lo_h = _pperm(lo_h, "z", +1)
        hi_h = _pperm(hi_h, "z", -1)
    lo_row, hi_row = _hpad_pk(lo_h), _hpad_pk(hi_h)
    if Zb > 1:
        zfill = jnp.zeros(lo_row.shape[:4] + (Zb - 1,) + lo_row.shape[5:],
                          lo_row.dtype)
        lo_slab = jnp.concatenate([zfill, lo_row], axis=4)
        hi_slab = jnp.concatenate([hi_row, zfill], axis=4)
    else:
        lo_slab, hi_slab = lo_row, hi_row
    return jnp.concatenate([psi_ext, lo_slab, hi_slab], axis=4)


def _exchange_gauge(u_loc, tn, zn, Zb, yn=1, Xh=None):
    """u [4,2,3,3,2,Tl,Z,S] -> extended along T (+1 slice), Z (+Zb) and,
    when the mesh shards Y (yn > 1, overlap engine only), S (+Xh: the
    U_y(y=-1) row feeding the backward-leg y repairs)."""
    if tn == 1:
        t_lo = u_loc[..., -1:, :, :]
    else:
        t_lo = _pperm(u_loc[..., -1:, :, :], "t", +1)
    u_ext = jnp.concatenate([u_loc, t_lo], axis=5)
    if Zb is not None:
        if zn == 1:
            z_lo = u_ext[..., -Zb:, :]
        else:
            z_lo = _pperm(u_ext[..., -Zb:, :], "z", +1)
        u_ext = jnp.concatenate([u_ext, z_lo], axis=6)
    if yn > 1:
        y_lo = _pperm(u_ext[..., -Xh:], "y", +1)
        u_ext = jnp.concatenate([u_ext, y_lo], axis=7)
    return u_ext


@dataclasses.dataclass(frozen=True)
class ShardedTMOperatorPC:
    """Even-odd preconditioned TM operator over a LatticeMesh.

    apply()/apply_dagger()/prepare()/reconstruct() mirror
    PackedTMOperatorPC but run as shard_map programs: halo exchange via
    ppermute, per-shard fused Pallas kernels (backend="pallas") or the
    packed XLA stencil on the *extended* local arrays is not needed for
    xla — the rolls are auto-partitioned by XLA SPMD, so backend="xla"
    simply calls the global implementation under jit.
    """
    lat: Lattice
    lmesh: LatticeMesh
    kappa: float
    mu: float = 0.0
    flavor: int = +1
    backend: str = "pallas"
    block_z: int | None = None
    interpret: bool = False
    #: interior/exterior split (parallel/overlap.py): the kernel runs
    #: halo-free on the local volume while the ppermutes fly; boundary
    #: slices are repaired with slab corrections (the reference's
    #: dslash_policy overlap engine, C7).  Epilogues become separate
    #: elementwise passes in this mode.
    overlap: bool = False
    #: spin-projected halo pack (reference dslash_pack.cu [U], C6):
    #: faces travel as 12-real half-spinors; exact in f32 (see the
    #: _exchange_*_half docstrings).  Both comm policies honor it.
    halo_half: bool = True
    #: set by the clover twin: the fused clover epilogues stream the
    #: packed chiral blocks too, which _auto_block_z must budget for
    has_clover: bool = False

    def _local_lat_dims(self):
        return self.lmesh.local_dims

    def _zb(self):
        from ..ops.dslash_pallas import _auto_block_z
        if self.block_z is not None:
            return self.block_z
        Tl, Zl = self.lmesh.local_dims
        S = self.lmesh.local_y * self.lat.Lx // 2
        zb = _auto_block_z(Zl, S, 4, clover=self.has_clover)
        return zb

    def _dslash_local(self, u_ext, psi_loc, parity, dagger, epilogue,
                      flavor, psi0_loc=None):
        """One halo exchange + one fused kernel call on a shard (or the
        interior/exterior split when overlap=True)."""
        from ..ops.dslash_pallas import dslash_eo_pallas
        tn, zn = self.lmesh.nt, self.lmesh.nz
        Tl, Zl = self.lmesh.local_dims
        Zb = self._zb()
        assert self.overlap or self.lmesh.ny == 1, \
            "y-sharded meshes need overlap=True (no fused halo_y mode)"
        if self.overlap:
            assert u_ext.shape[2] == 3, \
                "overlap mode needs full links (slab repairs are 3x3)"
            from ..operators import twist_apply_pk, twist_inv_apply_pk
            from .overlap import dslash_overlap
            # fused epilogues survive the interior/exterior split: the
            # epilogue's site-local linear part L rides on the O(surface)
            # slab corrections (overlap.py module docstring)
            kk = dict(epilogue=epilogue, kappa=self.kappa, mu=self.mu,
                      flavor=flavor, psi0_pk=psi0_loc)
            k2 = self.kappa * self.kappa
            if epilogue == "twist_inv":
                epi_full = lambda d: twist_inv_apply_pk(  # noqa: E731
                    d, self.kappa, self.mu, flavor)
                epi_corr = lambda dl, r: twist_inv_apply_pk(  # noqa: E731
                    dl, self.kappa, self.mu, flavor)
            elif epilogue == "xpay":
                epi_full = lambda d: twist_apply_pk(  # noqa: E731
                    psi0_loc, self.kappa, self.mu, flavor) \
                    - jnp.asarray(k2, d.dtype) * d
                epi_corr = lambda dl, r: -jnp.asarray(  # noqa: E731
                    k2, dl.dtype) * dl
            else:
                assert epilogue == "none", epilogue
                epi_full = epi_corr = None
            return dslash_overlap(u_ext, psi_loc, parity, self.lat,
                                  self.lmesh, dagger, block_z=Zb,
                                  interpret=self.interpret,
                                  backend=self.backend,
                                  kernel_kwargs=kk, epi_full=epi_full,
                                  epi_corr=epi_corr,
                                  halo_half=self.halo_half)
        if self.halo_half:
            psi_ext = _exchange_t_half(psi_loc, tn, dagger)
            psi_ext = _exchange_z_half(psi_ext, zn, Zb, dagger)
        else:
            psi_ext = _exchange_t(psi_loc, tn)
            psi_ext = _exchange_z(psi_ext, zn, Zb)
        # compressed links (reconstruct-12/-8): the rebuilt-row boundary
        # phase is a GLOBAL-t condition, so pass this shard's T offset
        toff = (jax.lax.axis_index("t") * Tl
                if u_ext.shape[2] != 3 else None)
        return dslash_eo_pallas(
            u_ext, psi_ext, parity, self.lat, dagger=dagger,
            epilogue=epilogue, kappa=self.kappa, mu=self.mu, flavor=flavor,
            psi0_pk=psi0_loc, block_z=Zb, interpret=self.interpret,
            local_dims=(Tl, Zl), halo_t=True, halo_z=True,
            t_offset=toff)

    # --- shard_map plumbing ---------------------------------------------
    def _smap(self, fn, n_spinor_in: int, has_gauge=True):
        m = self.lmesh
        specs_in = ([m.gauge_spec()] if has_gauge else []) + \
            [m.spinor_spec()] * n_spinor_in
        return jax.shard_map(fn, mesh=m.mesh, in_specs=tuple(specs_in),
                             out_specs=m.spinor_spec(), check_vma=False)

    def extend_gauge(self, u_pk: jax.Array) -> jax.Array:
        """One-time gauge halo exchange; result feeds every apply."""
        m = self.lmesh
        Zb = self._zb()

        def fn(u_loc):
            return _exchange_gauge(u_loc, m.nt, m.nz, Zb, m.ny,
                                   self.lat.Lx // 2)

        return jax.shard_map(
            fn, mesh=m.mesh, in_specs=(m.gauge_spec(),),
            out_specs=m.gauge_spec(), check_vma=False)(u_pk)

    def _apply(self, u_ext, psi_pk, dagger):
        f = self.flavor if not dagger else -self.flavor

        def fn(u_l, psi_l):
            t1 = self._dslash_local(u_l, psi_l, EVEN, dagger, "twist_inv", f)
            return self._dslash_local(u_l, t1, ODD, dagger, "xpay", f,
                                      psi0_loc=psi_l)

        return self._smap(fn, 1)(u_ext, psi_pk)

    def apply(self, u_ext, psi_pk):
        return self._apply(u_ext, psi_pk, dagger=False)

    def apply_dagger(self, u_ext, psi_pk):
        return self._apply(u_ext, psi_pk, dagger=True)

    def normal(self, u_ext, psi_pk):
        return self.apply_dagger(u_ext, self.apply(u_ext, psi_pk))

    def prepare(self, u_ext, b_pk):
        """b_pk [2(par), 2, 4, 3, T, Z, S] -> even source."""
        from ..operators import twist_inv_apply_pk

        def fn(u_l, be_l, bo_l):
            t = twist_inv_apply_pk(bo_l, self.kappa, self.mu, self.flavor)
            d = self._dslash_local(u_l, t, ODD, False, "none", self.flavor)
            return be_l + jnp.asarray(self.kappa, be_l.dtype) * d

        return self._smap(fn, 2)(u_ext, b_pk[0], b_pk[1])

    def reconstruct(self, u_ext, x_e, b_pk):
        from ..operators import twist_inv_apply_pk

        def fn(u_l, xe_l, bo_l):
            d = self._dslash_local(u_l, xe_l, EVEN, False, "none",
                                   self.flavor)
            t = bo_l + jnp.asarray(self.kappa, xe_l.dtype) * d
            return twist_inv_apply_pk(t, self.kappa, self.mu, self.flavor)

        x_o = self._smap(fn, 2)(u_ext, x_e, b_pk[1])
        return jnp.stack([x_e, x_o], axis=0)


@dataclasses.dataclass(frozen=True)
class ShardedTMCloverOperatorPC:
    """Even-odd preconditioned twisted-CLOVER operator over a
    LatticeMesh (the multi-chip config-2/production operator; reference
    `dirac_twisted_clover.cpp` *PC classes under MPI decomposition [U],
    SURVEY.md C4/C10/C13).

    Mirrors operators.PackedTMCloverOperatorPC; clover data is
    site-local so it shards over (t, z) with NO halo machinery — only
    the hop term exchanges faces.  Operand tuple (built by
    :meth:`extend_fields`):

        fields = (u_ext,            gauge with t/z halo slabs appended
                  cl_pk,            [2par, 2ri, 2chir, 6, 6, T, Z, S]
                  clinv_o_plus,     [2ri, 2chir, 6, 6, T, Z, S]
                  clinv_o_minus)

    overlap=True routes the hops through the interior/exterior split
    engine with the clover site terms applied as elementwise passes.
    """
    lat: Lattice
    lmesh: LatticeMesh
    kappa: float
    mu: float = 0.0
    csw: float = 1.0
    flavor: int = +1
    backend: str = "pallas"
    block_z: int | None = None
    interpret: bool = False
    overlap: bool = False
    halo_half: bool = True

    def _tm(self) -> ShardedTMOperatorPC:
        """Hop-engine twin (shares _dslash_local/_zb plumbing)."""
        return ShardedTMOperatorPC(
            self.lat, self.lmesh, self.kappa, self.mu, self.flavor,
            self.backend, self.block_z, self.interpret, self.overlap,
            self.halo_half, has_clover=True)

    def extend_fields(self, u_pk, cl_pk, clinv_p, clinv_m):
        """Shard the clover arrays and exchange the gauge halo once."""
        m = self.lmesh
        u_ext = self._tm().extend_gauge(m.shard_gauge(u_pk))
        cl_spec = P(None, None, None, None, None, "t", "z", "y")
        ci_spec = P(None, None, None, None, "t", "z", "y")
        put = jax.device_put
        return (u_ext,
                put(cl_pk, jax.NamedSharding(m.mesh, cl_spec)),
                put(clinv_p, jax.NamedSharding(m.mesh, ci_spec)),
                put(clinv_m, jax.NamedSharding(m.mesh, ci_spec)))

    def _clinv(self, fields, f):
        return fields[2] if f == +1 else fields[3]

    #: specs for the (cl_pk, clinv) operands
    @property
    def _cl_specs(self):
        return [P(None, None, None, None, None, "t", "z", "y"),
                P(None, None, None, None, "t", "z", "y")]

    def _dslash_clover_local(self, tm, u_l, psi_l, parity, dagger,
                             epilogue, f, cl_l=None, psi0_l=None):
        """Hop + fused clover epilogue on one shard."""
        from ..ops.clover import clover_apply_pk
        from ..ops.dslash_pallas import dslash_eo_pallas
        from ..operators import _itwg5_packed
        m = self.lmesh
        Tl, Zl = m.local_dims
        Zb = tm._zb()
        assert self.overlap or m.ny == 1, \
            "y-sharded meshes need overlap=True (no fused halo_y mode)"
        if self.overlap:
            from .overlap import dslash_overlap
            # fused clover epilogues across the split (overlap.py module
            # docstring): C^{-1} (clover_inv) / -kappa^2 (clover_xpay)
            # is the linear part applied to the slab corrections; the
            # clover blocks are site-varying, so region picks the slice
            kk = dict(epilogue=epilogue, kappa=self.kappa, mu=self.mu,
                      flavor=f, psi0_pk=psi0_l, clover_pk=cl_l)
            k2 = self.kappa * self.kappa
            Xh = self.lat.Lx // 2

            def _cl_region(r):
                # cl_l [..., Tl, Zl, S]; y rows are Xh-wide S slices
                return {"t_first": cl_l[..., :1, :, :],
                        "t_last": cl_l[..., -1:, :, :],
                        "z_first": cl_l[..., :, :1, :],
                        "z_last": cl_l[..., :, -1:, :],
                        "y_first": cl_l[..., :Xh],
                        "y_last": cl_l[..., -Xh:]}[r]

            if epilogue == "clover_inv":
                epi_full = lambda d: clover_apply_pk(  # noqa: E731
                    cl_l.astype(d.dtype), d)
                epi_corr = lambda dl, r: clover_apply_pk(  # noqa: E731
                    _cl_region(r).astype(dl.dtype), dl)
            elif epilogue == "clover_xpay":
                tw = 2.0 * self.kappa * self.mu * f

                def epi_full(d):
                    site = clover_apply_pk(cl_l.astype(psi0_l.dtype),
                                           psi0_l) \
                        + _itwg5_packed(psi0_l, tw)
                    return site - jnp.asarray(k2, d.dtype) * d

                epi_corr = lambda dl, r: -jnp.asarray(  # noqa: E731
                    k2, dl.dtype) * dl
            else:
                assert epilogue == "none", epilogue
                epi_full = epi_corr = None
            return dslash_overlap(u_l, psi_l, parity, self.lat, m,
                                  dagger, block_z=Zb,
                                  interpret=self.interpret,
                                  backend=self.backend,
                                  kernel_kwargs=kk, epi_full=epi_full,
                                  epi_corr=epi_corr,
                                  halo_half=self.halo_half)
        if self.halo_half:
            psi_ext = _exchange_t_half(psi_l, m.nt, dagger)
            psi_ext = _exchange_z_half(psi_ext, m.nz, Zb, dagger)
        else:
            psi_ext = _exchange_t(psi_l, m.nt)
            psi_ext = _exchange_z(psi_ext, m.nz, Zb)
        return dslash_eo_pallas(
            u_l, psi_ext, parity, self.lat, dagger=dagger,
            epilogue=epilogue, kappa=self.kappa, mu=self.mu, flavor=f,
            clover_pk=cl_l, psi0_pk=psi0_l, block_z=Zb,
            interpret=self.interpret, local_dims=(Tl, Zl), halo_t=True,
            halo_z=True)

    def _apply(self, fields, psi_pk, dagger):
        tm = self._tm()
        f = self.flavor if not dagger else -self.flavor
        clinv = self._clinv(fields, f)

        def fn(u_l, cl_l, ci_l, psi_l):
            t = self._dslash_clover_local(tm, u_l, psi_l, EVEN, dagger,
                                          "clover_inv", f, cl_l=ci_l)
            return self._dslash_clover_local(tm, u_l, t, ODD, dagger,
                                             "clover_xpay", f,
                                             cl_l=cl_l[EVEN],
                                             psi0_l=psi_l)

        m = self.lmesh
        specs = (m.gauge_spec(), self._cl_specs[0], self._cl_specs[1],
                 m.spinor_spec())
        return jax.shard_map(fn, mesh=m.mesh, in_specs=specs,
                             out_specs=m.spinor_spec(),
                             check_vma=False)(
            fields[0], fields[1], clinv, psi_pk)

    def apply(self, fields, psi_pk):
        return self._apply(fields, psi_pk, dagger=False)

    def apply_dagger(self, fields, psi_pk):
        return self._apply(fields, psi_pk, dagger=True)

    def normal(self, fields, psi_pk):
        return self.apply_dagger(fields, self.apply(fields, psi_pk))

    def prepare(self, fields, b_pk):
        """bhat_e = b_e + k D_eo Atw_oo^{-1} b_o."""
        from ..ops.clover import clover_apply_pk
        tm = self._tm()
        clinv = self._clinv(fields, self.flavor)

        def fn(u_l, ci_l, be_l, bo_l):
            t = clover_apply_pk(ci_l.astype(bo_l.dtype), bo_l)
            d = self._dslash_clover_local(tm, u_l, t, ODD, False,
                                          "none", self.flavor)
            return be_l + jnp.asarray(self.kappa, be_l.dtype) * d

        m = self.lmesh
        specs = (m.gauge_spec(), self._cl_specs[1], m.spinor_spec(),
                 m.spinor_spec())
        return jax.shard_map(fn, mesh=m.mesh, in_specs=specs,
                             out_specs=m.spinor_spec(),
                             check_vma=False)(
            fields[0], clinv, b_pk[0], b_pk[1])

    def reconstruct(self, fields, x_e, b_pk):
        """x_o = Atw_oo^{-1} (b_o + k D_oe x_e)."""
        from ..ops.clover import clover_apply_pk
        tm = self._tm()
        clinv = self._clinv(fields, self.flavor)

        def fn(u_l, ci_l, xe_l, bo_l):
            d = self._dslash_clover_local(tm, u_l, xe_l, EVEN, False,
                                          "none", self.flavor)
            t = bo_l + jnp.asarray(self.kappa, xe_l.dtype) * d
            return clover_apply_pk(ci_l.astype(t.dtype), t)

        m = self.lmesh
        specs = (m.gauge_spec(), self._cl_specs[1], m.spinor_spec(),
                 m.spinor_spec())
        x_o = jax.shard_map(fn, mesh=m.mesh, in_specs=specs,
                            out_specs=m.spinor_spec(),
                            check_vma=False)(
            fields[0], clinv, x_e, b_pk[1])
        return jnp.stack([x_e, x_o], axis=0)


@dataclasses.dataclass(frozen=True)
class ShardedNdegTMOperatorPC:
    """Even-odd preconditioned NON-DEGENERATE twisted-mass doublet over
    a LatticeMesh (the multi-chip heavy s/c solver; reference
    `dslash_ndeg_twisted_mass.cu` + its *PC Dirac class run under the
    MPI --gridsize decomposition [U]; SURVEY.md C5/C10/C13).

    Mirrors operators.PackedNdegTMOperatorPC; the hop term is
    FLAVOR-DIAGONAL (one plain Wilson hop per flavor, each through the
    inherited halo machinery / overlap engine with epilogue "none"),
    while the flavor-MIXING site terms

        A = 1 + i t g5 tau3 + e tau1   (t = 2 kappa mubar,
                                        e = 2 kappa epsbar)

    and the closed-form A^{-1} are purely site-local, so they run as
    elementwise passes inside the same shard_map region with no extra
    communication.  chi: packed doublet [2(fl), 2(ri), 4, 3, T, Z, S],
    sharded with the spinor spec on the trailing axes (flavor
    replicated across the mesh axes like the other leading dims).

    Boundary-phase convention matches the other sharded operators: the
    gauge field arrives pre-phased (cli/common.setup_gauge), so no
    t_boundary parameter; compressed links get the rebuilt-row phase
    via the inherited global-T offset.
    """
    lat: Lattice
    lmesh: LatticeMesh
    kappa: float
    mubar: float = 0.0
    epsbar: float = 0.0
    backend: str = "pallas"
    block_z: int | None = None
    interpret: bool = False
    overlap: bool = False
    halo_half: bool = True
    #: read by the borrowed _zb (no clover epilogue on the ndeg path)
    has_clover: bool = False

    # hop plumbing shared with the TM operator: epilogue is always
    # "none" so mu/flavor are inert (site terms live here instead)
    _local_lat_dims = ShardedTMOperatorPC._local_lat_dims
    _zb = ShardedTMOperatorPC._zb
    _dslash_local = ShardedTMOperatorPC._dslash_local
    extend_gauge = ShardedTMOperatorPC.extend_gauge
    mu: float = 0.0          # read by _dslash_local's kernel kwargs
    flavor: int = +1         # (inert under epilogue "none")

    def _smap_nd(self, fn, n_doublet_in: int):
        m = self.lmesh
        dspec = P(None, *m.spinor_spec())
        specs_in = (m.gauge_spec(),) + (dspec,) * n_doublet_in
        return jax.shard_map(fn, mesh=m.mesh, in_specs=specs_in,
                             out_specs=dspec, check_vma=False)

    # --- site algebra (operators.PackedNdegTMOperatorPC twins) --------
    def _t_e(self, flip):
        t = 2.0 * self.kappa * self.mubar * (1 if not flip else -1)
        e = 2.0 * self.kappa * self.epsbar
        return t, e

    def _site(self, chi, flip):
        from ..operators import _itwg5_packed
        t, e = self._t_e(flip)
        ee = jnp.asarray(e, chi.dtype)
        a0 = chi[0] + _itwg5_packed(chi[0], t) + ee * chi[1]
        a1 = chi[1] + _itwg5_packed(chi[1], -t) + ee * chi[0]
        return jnp.stack([a0, a1])

    def _site_inv(self, chi, flip):
        from ..operators import _itwg5_packed
        t, e = self._t_e(flip)
        den = 1.0 / (1.0 + t * t - e * e)
        ee = jnp.asarray(e, chi.dtype)
        d = jnp.asarray(den, chi.dtype)
        x0 = d * (chi[0] - _itwg5_packed(chi[0], t) - ee * chi[1])
        x1 = d * (chi[1] - _itwg5_packed(chi[1], -t) - ee * chi[0])
        return jnp.stack([x0, x1])

    def _hop(self, u_l, chi_l, parity, dagger):
        """Flavor-diagonal hop on the local doublet (2 kernel calls)."""
        return jnp.stack([
            self._dslash_local(u_l, chi_l[0], parity, dagger, "none", +1),
            self._dslash_local(u_l, chi_l[1], parity, dagger, "none", +1)])

    # --- operator ------------------------------------------------------
    def _apply(self, u_ext, chi_e, dagger):
        k2 = self.kappa * self.kappa

        def fn(u_l, chi_l):
            d = self._hop(u_l, chi_l, EVEN, dagger)
            w = self._site_inv(d, dagger)
            d2 = self._hop(u_l, w, ODD, dagger)
            return (self._site(chi_l, dagger)
                    - jnp.asarray(k2, chi_l.dtype) * d2)

        return self._smap_nd(fn, 1)(u_ext, chi_e)

    def apply(self, u_ext, chi_e):
        return self._apply(u_ext, chi_e, dagger=False)

    def apply_dagger(self, u_ext, chi_e):
        return self._apply(u_ext, chi_e, dagger=True)

    def normal(self, u_ext, chi_e):
        return self.apply_dagger(u_ext, self.apply(u_ext, chi_e))

    def prepare(self, u_ext, b_pk):
        """b [2fl, 2par, 2ri, 4, 3, T, Z, S] -> even doublet source."""
        def fn(u_l, be_l, bo_l):
            t = self._site_inv(bo_l, False)
            d = self._hop(u_l, t, ODD, False)
            return be_l + jnp.asarray(self.kappa, be_l.dtype) * d

        return self._smap_nd(fn, 2)(u_ext, b_pk[:, 0], b_pk[:, 1])

    def reconstruct(self, u_ext, x_e, b_pk):
        """x_o = A_oo^{-1} (b_o + k D_oe x_e) -> [2fl, 2par, ...]."""
        def fn(u_l, xe_l, bo_l):
            d = self._hop(u_l, xe_l, EVEN, False)
            t = bo_l + jnp.asarray(self.kappa, xe_l.dtype) * d
            return self._site_inv(t, False)

        x_o = self._smap_nd(fn, 2)(u_ext, x_e, b_pk[:, 1])
        return jnp.stack([x_e, x_o], axis=1)
