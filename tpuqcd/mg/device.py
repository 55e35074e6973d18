"""Device-resident adaptive multigrid (packed-real, TPU-native).

The production MG stack: every solve-path object here lives on the chip
as packed-real arrays (ri axis first, utils/pkalg.py) and every cycle
traces into a single XLA program — the TPU-native re-architecture of the
reference MG (`lib/multigrid.cpp`, `transfer.cpp`, `coarse_op.cu`,
`dslash_coarse.cu` [U]; SURVEY.md C12, §4.3), built for a backend where
complex tensors may exist only as jit-internal values.

Representation choices (vs the host mg/{transfer,coarse,vcycle}.py,
which remain the CPU oracle):

  - fine fields: ``[2(ri), 2(par), 4, 3, T, Z, S]`` — the Pallas Dslash
    layout with parity stacked, so smoother applies are two fused kernel
    launches;
  - transfers store the *raw* near-null vectors V plus the per-aggregate
    inverse Cholesky factor Linv of the chirality-split Gram matrix
    (P = W L^{-dag} per aggregate/chirality, W = chirality-projected V):
    restrict r = Linv (W^dag r), prolong x = W (Linv^dag x).  R P = I
    exactly, no explicit dense prolongator (which would store the
    chirality zeros), and the block orthogonalization runs on-device
    (unrolled complex Cholesky, pkalg.cholesky_pk) — no host QR;
  - aggregate sums never transpose the big fine arrays: (spin, color,
    parity) reduce on leading axes, (t, z) blocks reshape on leading
    axes, and only a coarse-sized intermediate reshapes its lane axis;
  - coarse levels: fields ``[2, N, Vc]`` with ONE flat site axis
    Vc = Tc*Zc*Yc*Xc (lane-merged), links ``[2, 9, N, N, Vc]`` (4 fwd +
    4 bwd + diag) — applies are VPU broadcast-reductions (the coarse
    operator is bandwidth-bound like the fine Dslash, so elementwise
    streaming beats an MXU re-layout).  The flat site axis is the
    round-5 lane-merge: TPU tiles pad the trailing two axes to (8, 128)
    f32, and the previous ``[.., Tc, Zc, Sc]`` layout padded 4.7x at
    production coarse sizes (Zc=6, Sc=36 -> (8, 128)), throttling the
    dominant coarsest-level GCR to ~6% of HBM peak (BASELINE.md round-4
    profile); merged, the pad is Vc -> ceil(Vc/128)*128 at most a few
    percent, with N (a multiple of 8) on the sublane axis;
  - Galerkin construction by colored probing (same algorithm as the host
    mg/coarse.py) with all 17 probes of one coarse color traced into one
    jitted call.
"""
from __future__ import annotations

import dataclasses
from functools import lru_cache as _lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..lattice import Lattice
from ..operators import _G5_DIAG, twist_apply_pk
from ..utils import pkalg as pk

# chirality of each spin in the DeGrand-Rossi basis (g5 = diag(+,+,-,-))
_CHI_OF_SPIN = tuple(0 if g > 0 else 1 for g in _G5_DIAG)
_CHI0_SPINS = tuple(s for s in range(4) if _CHI_OF_SPIN[s] == 0)
_CHI1_SPINS = tuple(s for s in range(4) if _CHI_OF_SPIN[s] == 1)


# --------------------------------------------------------------------------
# fine level
# --------------------------------------------------------------------------

@partial(jax.tree_util.register_dataclass,
         data_fields=["u_pk", "u12_pk"],
         meta_fields=["lat", "kappa", "mu", "flavor", "backend",
                      "interpret", "t_boundary"])
@dataclasses.dataclass
class DeviceFineLevel:
    """Full-lattice twisted-mass operator on packed fields.

    M = (1 + 2 i kappa mu f g5) - kappa D over both parities; fields
    [2(ri), 2(par), 4, 3, T, Z, S].  ``backend="pallas"`` runs the hot
    applies through the fused kernel (with reconstruct-12 links);
    ``"xla"`` is the CPU-testable path.  Hop applies (setup/probing only)
    always use the XLA packed dslash with the `dirs` filter.

    Registered as a pytree (gauge arrays = children) so it can cross jit
    boundaries as an ARGUMENT — closure capture would embed the gauge as
    HLO constants, which the remote-compile service rejects at
    production sizes (HTTP 413).
    """
    lat: Lattice
    u_pk: jax.Array
    kappa: float
    mu: float = 0.0
    flavor: int = +1
    backend: str = "pallas"
    interpret: bool = False
    t_boundary: int = -1
    u12_pk: jax.Array | None = None

    def __post_init__(self):
        if self.u12_pk is None and self.backend == "pallas" \
                and isinstance(self.u_pk, jax.Array):
            self.u12_pk = self.u_pk[:, :, :2]

    @property
    def n(self) -> int:
        return 12

    def _dslash(self, psi_par, src_parity):
        if self.backend == "pallas":
            from ..ops.dslash_pallas import dslash_eo_pallas
            return dslash_eo_pallas(self.u12_pk, psi_par, src_parity,
                                    self.lat, interpret=self.interpret,
                                    t_boundary=self.t_boundary)
        from ..ops.dslash_xla import dslash_eo_dev_ri
        return dslash_eo_dev_ri(self.u_pk, psi_par, src_parity, self.lat)

    @staticmethod
    def _join(oe, oo):
        """two [2ri, 4, 3, T, Z, S] parity halves -> [2ri, 2par, ...]."""
        return jnp.stack([oe, oo], axis=1)

    @staticmethod
    def _split(v):
        return (jnp.stack([v[0, 0], v[1, 0]]),
                jnp.stack([v[0, 1], v[1, 1]]))

    def apply(self, v: jax.Array) -> jax.Array:
        """v [2, 2, 4, 3, T, Z, S] -> M v (same layout)."""
        ve, vo = self._split(v)
        if self.backend == "pallas":
            # ONE fused kernel launch per parity: the xpay epilogue with
            # xpay_scale=kappa computes (1 + i tw g5) psi0 - kappa D psi
            # = the full unpreconditioned M (no extra HBM passes)
            from ..ops.dslash_pallas import dslash_eo_pallas

            def m_par(src, psi0, src_par):
                return dslash_eo_pallas(
                    self.u12_pk, src, src_par, self.lat, epilogue="xpay",
                    kappa=self.kappa, mu=self.mu, flavor=self.flavor,
                    psi0_pk=psi0, xpay_scale=self.kappa,
                    interpret=self.interpret, t_boundary=self.t_boundary)
            return self._join(m_par(vo, ve, 1), m_par(ve, vo, 0))
        de = self._dslash(vo, 1)             # result on even sites
        do = self._dslash(ve, 0)
        k = self.kappa
        oe = twist_apply_pk(ve, k, self.mu, self.flavor) - k * de
        oo = twist_apply_pk(vo, k, self.mu, self.flavor) - k * do
        return self._join(oe, oo)

    def apply_hop(self, v: jax.Array, mu: int, sign: int) -> jax.Array:
        """Single hop term of M (including the -kappa), both parities."""
        if self.backend == "pallas":
            return _hop_full_pallas(self, v, mu, sign)
        return _hop_full(self.u_pk, self.lat, self.kappa, v, mu, sign)

    def apply_hop_all(self, v: jax.Array) -> jax.Array:
        """All 8 single-leg hop terms of M (incl. -kappa), both
        parities, in _LEG_ORDER -> [8, 2ri, 2par, 4, 3, T, Z, S].

        Pallas path: ONE legs_out kernel pass per source parity —
        gauge + spinor read once for all 8 legs (the Galerkin-probing
        hot loop; the per-leg `dirs` path pays full operand traffic
        8 times over)."""
        if self.backend == "pallas":
            from ..ops.dslash_pallas import dslash_eo_pallas
            ve = jnp.stack([v[0, 0], v[1, 0]])
            vo = jnp.stack([v[0, 1], v[1, 1]])
            de = dslash_eo_pallas(self.u12_pk, vo, 1, self.lat,
                                  legs_out=True, interpret=self.interpret,
                                  t_boundary=self.t_boundary)
            do = dslash_eo_pallas(self.u12_pk, ve, 0, self.lat,
                                  legs_out=True, interpret=self.interpret,
                                  t_boundary=self.t_boundary)
            return -self.kappa * jnp.stack([de, do], axis=2)
        return jnp.stack([self.apply_hop(v, m, s)
                          for (m, s) in _LEG_ORDER])

    def as_hp(self) -> "DeviceFineLevel":
        """XLA-backend twin for f64 defect-correction residuals (f32
        gauge entries promote exactly into f64 hop products)."""
        return dataclasses.replace(self, backend="xla", u12_pk=None)

    def sloppy(self, dtype=jnp.bfloat16) -> "DeviceFineLevel":
        """Low-precision twin (compressed links cast) for the V-cycle
        smoothers (the reference's half-precision smoother [U])."""
        assert self.backend == "pallas"
        return dataclasses.replace(self, u12_pk=self.u12_pk.astype(dtype))

    def random_field(self, key) -> jax.Array:
        shape = (2, 2, 4, 3, self.lat.Lt, self.lat.Lz,
                 self.lat.Ly * self.lat.Lx // 2)
        return jax.random.normal(key, shape, dtype=jnp.float32)


def _hop_full(u_pk, lat, kappa, v, mu, sign):
    """Single hop term of the full operator, both parities (setup path)."""
    from ..ops.dslash_xla import dslash_eo_dev_ri
    ve = jnp.stack([v[0, 0], v[1, 0]])
    vo = jnp.stack([v[0, 1], v[1, 1]])
    de = dslash_eo_dev_ri(u_pk, vo, 1, lat, dirs=((mu, sign),))
    do = dslash_eo_dev_ri(u_pk, ve, 0, lat, dirs=((mu, sign),))
    return jnp.stack([-kappa * de, -kappa * do], axis=1)


def _hop_full_pallas(level, v, mu, sign):
    """Single-leg hop via the fused kernel's `dirs` filter — kernel-rate
    probing (the XLA hop path runs ~100x slower per leg at 32^3x64)."""
    from ..ops.dslash_pallas import dslash_eo_pallas

    def leg(src, src_par):
        return dslash_eo_pallas(
            level.u12_pk, src, src_par, level.lat, dirs=((mu, sign),),
            interpret=level.interpret, t_boundary=level.t_boundary)
    ve = jnp.stack([v[0, 0], v[1, 0]])
    vo = jnp.stack([v[0, 1], v[1, 1]])
    k = level.kappa
    return jnp.stack([-k * leg(vo, 1), -k * leg(ve, 0)], axis=1)


def _itwg5_pk(v_par, tw):
    """i * tw * g5 * v on a packed single-parity spinor."""
    g5 = jnp.asarray(_G5_DIAG, dtype=v_par.dtype).reshape(4, 1, 1, 1, 1)
    t = jnp.asarray(tw, v_par.dtype)
    return jnp.stack([-t * g5 * v_par[1], t * g5 * v_par[0]])


@partial(jax.tree_util.register_dataclass,
         data_fields=["u_pk", "clover_pk", "u12_pk"],
         meta_fields=["lat", "kappa", "mu", "csw", "flavor", "backend",
                      "interpret", "t_boundary"])
@dataclasses.dataclass
class DeviceFineCloverLevel:
    """Full-lattice twisted-clover operator M = (A + 2 i kappa mu f g5)
    - kappa D on packed fields (reference `dirac_twisted_clover.cpp`
    full-operator form [U]; SURVEY.md C4/C10).

    clover_pk: packed chiral A blocks for BOTH parities
    [2(par), 2(ri), 2(chir), 6, 6, T, Z, S] (utils.packed.pack_clover of
    CloverData.a_blocks).  The Pallas path is one fused clover_xpay
    launch per parity (xpay_scale=kappa); hops are clover-free, so the
    whole MG machinery (probing included) works unchanged — the clover
    term lands in the Galerkin diagonal automatically.
    """
    lat: Lattice
    u_pk: jax.Array
    clover_pk: jax.Array
    kappa: float
    mu: float = 0.0
    csw: float = 1.0
    flavor: int = +1
    backend: str = "pallas"
    interpret: bool = False
    t_boundary: int = -1
    u12_pk: jax.Array | None = None

    def __post_init__(self):
        if self.u12_pk is None and self.backend == "pallas" \
                and isinstance(self.u_pk, jax.Array):
            self.u12_pk = self.u_pk[:, :, :2]

    @property
    def n(self) -> int:
        return 12

    def apply(self, v: jax.Array) -> jax.Array:
        ve = jnp.stack([v[0, 0], v[1, 0]])
        vo = jnp.stack([v[0, 1], v[1, 1]])
        tw = 2.0 * self.kappa * self.mu * self.flavor
        if self.backend == "pallas":
            from ..ops.dslash_pallas import dslash_eo_pallas

            def m_par(src, psi0, p):
                return dslash_eo_pallas(
                    self.u12_pk, src, 1 - p, self.lat,
                    epilogue="clover_xpay", kappa=self.kappa, mu=self.mu,
                    flavor=self.flavor, psi0_pk=psi0,
                    clover_pk=self.clover_pk[p], xpay_scale=self.kappa,
                    interpret=self.interpret, t_boundary=self.t_boundary)
            return jnp.stack([m_par(vo, ve, 0), m_par(ve, vo, 1)], axis=1)
        from ..ops.clover import clover_apply_pk
        from ..ops.dslash_xla import dslash_eo_dev_ri
        k = self.kappa
        out = []
        for p, (vp, vq) in enumerate(((ve, vo), (vo, ve))):
            d = dslash_eo_dev_ri(self.u_pk, vq, 1 - p, self.lat)
            a = clover_apply_pk(self.clover_pk[p], vp)  # dtype-promoting
            out.append(a + _itwg5_pk(vp, tw) - k * d)
        return jnp.stack(out, axis=1)

    def apply_hop(self, v: jax.Array, mu: int, sign: int) -> jax.Array:
        if self.backend == "pallas":
            return _hop_full_pallas(self, v, mu, sign)
        return _hop_full(self.u_pk, self.lat, self.kappa, v, mu, sign)

    # the hop term is clover-independent, so the multi-leg probing
    # pass is identical to the plain fine level's
    apply_hop_all = DeviceFineLevel.apply_hop_all

    def as_hp(self) -> "DeviceFineCloverLevel":
        return dataclasses.replace(self, backend="xla", u12_pk=None)

    def sloppy(self, dtype=jnp.bfloat16) -> "DeviceFineCloverLevel":
        assert self.backend == "pallas"
        return dataclasses.replace(
            self, u12_pk=self.u12_pk.astype(dtype),
            clover_pk=self.clover_pk.astype(dtype))

    def random_field(self, key) -> jax.Array:
        shape = (2, 2, 4, 3, self.lat.Lt, self.lat.Lz,
                 self.lat.Ly * self.lat.Lx // 2)
        return jax.random.normal(key, shape, dtype=jnp.float32)


# --------------------------------------------------------------------------
# coarse level
# --------------------------------------------------------------------------

@_lru_cache(maxsize=None)
def _flat_coords(dims):
    """Per-dim coordinate arrays on the flat Vc site axis (numpy)."""
    Tc, Zc, Yc, Xc = dims
    idx = np.arange(Tc * Zc * Yc * Xc)
    return (idx // (Zc * Yc * Xc),          # t
            (idx // (Yc * Xc)) % Zc,        # z
            (idx // Xc) % Yc,               # y
            idx % Xc)                       # x


@partial(jax.tree_util.register_dataclass,
         data_fields=["links"], meta_fields=["dims", "n"])
@dataclasses.dataclass
class DeviceCoarseLevel:
    """Nearest-neighbor coarse operator, dense links, packed layout.

    links [2(ri), 9, N, N, Vc], Vc = Tc*Zc*Yc*Xc flat (lane-merged; see
    module docstring): slots 0-3 forward mu, 4-7 backward mu, 8
    diagonal.  (A v)(y) = X[y] v(y) + sum_mu Y+_mu[y] v(y+mu) +
    Y-_mu[y] v(y-mu) — reference dslash_coarse.cu [U].
    Pytree: links are children (see DeviceFineLevel note).
    """
    dims: tuple[int, int, int, int]          # (Tc, Zc, Yc, Xc)
    n: int
    links: jax.Array

    @property
    def Xc(self) -> int:
        return self.dims[3]

    @property
    def Vc(self) -> int:
        Tc, Zc, Yc, Xc = self.dims
        return Tc * Zc * Yc * Xc

    def _shift(self, v, mu, sign):
        """fetch v(x + sign*mu); v [..., Vc] flat.

        The t dim is outermost in the flat index, so its periodic shift
        is one whole-axis roll; inner dims roll by their stride with a
        masked fix-up at the wrap boundary (same pattern as the old
        packed-x handling, generalized to every merged dim).
        """
        Tc, Zc, Yc, Xc = self.dims
        strides = (1, Xc, Yc * Xc, Zc * Yc * Xc)
        extents = (Xc, Yc, Zc, Tc)
        s_d, n_d = strides[mu], extents[mu]
        if mu == 3:
            return jnp.roll(v, -sign * s_d, axis=-1)
        coord = jnp.asarray(_flat_coords(self.dims)[3 - mu])
        if sign == +1:
            base = jnp.roll(v, -s_d, axis=-1)
            fix = jnp.roll(v, (n_d - 1) * s_d, axis=-1)
            return jnp.where(coord == n_d - 1, fix, base)
        base = jnp.roll(v, s_d, axis=-1)
        fix = jnp.roll(v, -(n_d - 1) * s_d, axis=-1)
        return jnp.where(coord == 0, fix, base)

    @staticmethod
    def _cmul(L, w):
        """L [2, N, N, ...] x w [2, N, ...] -> [2, N, ...]."""
        r = (L[0] * w[0][None] - L[1] * w[1][None]).sum(axis=1)
        i = (L[0] * w[1][None] + L[1] * w[0][None]).sum(axis=1)
        return jnp.stack([r, i])

    def apply(self, v: jax.Array) -> jax.Array:
        out = self._cmul(self.links[:, 8], v)
        for mu in range(4):
            out = out + self._cmul(self.links[:, mu],
                                   self._shift(v, mu, +1))
            out = out + self._cmul(self.links[:, 4 + mu],
                                   self._shift(v, mu, -1))
        return out

    def apply_hop(self, v: jax.Array, mu: int, sign: int) -> jax.Array:
        slot = mu if sign == +1 else 4 + mu
        return self._cmul(self.links[:, slot], self._shift(v, mu, sign))

    def boosted(self, delta: float) -> "DeviceCoarseLevel":
        """Twisted-mass coarse-grid mu boost: diag += i * delta * g5_c
        (g5_c = +1 on the first N/2 dof, -1 on the rest;
        arXiv:1710.06198)."""
        h = self.n // 2
        g5 = np.concatenate([np.ones(h, np.float32),
                             -np.ones(self.n - h, np.float32)])
        idx = jnp.arange(self.n)
        add = jnp.asarray(delta * g5)[:, None]
        diag_i = self.links[1, 8].at[idx, idx].add(add)
        return dataclasses.replace(self, links=self.links.at[1, 8]
                                   .set(diag_i))

    def random_field(self, key) -> jax.Array:
        return jax.random.normal(key, (2, self.n, self.Vc),
                                 dtype=jnp.float32)


# --------------------------------------------------------------------------
# transfers
# --------------------------------------------------------------------------

class _LinvMixin:
    """restrict/prolong in terms of the subclass's raw aggregate
    contraction ``_wdag`` (r -> W^dag r, [2, 2chir, n, Tc, Zc, Sc]) and
    expansion ``_vmul`` (coefficients [2, 2chir, n, Tc, Zc, Sc] -> fine
    field)."""

    def _apply_linv(self, wd):
        lr, li = self.linv[0], self.linv[1]      # [2chir, n, n, ...]
        wr, wi = wd[0], wd[1]                    # [2chir, n, ...]
        rr = (lr * wr[:, None] - li * wi[:, None]).sum(axis=2)
        ri = (lr * wi[:, None] + li * wr[:, None]).sum(axis=2)
        return jnp.stack([rr, ri])               # [2, 2chir, n, ...]

    def _apply_linv_dag(self, xc):
        """tmp[chi, k] = sum_l conj(Linv[chi, l, k]) xc[chi, l]."""
        lr, li = self.linv[0], self.linv[1]
        xr, xi = xc[0], xc[1]
        tr = (lr * xr[:, :, None] + li * xi[:, :, None]).sum(axis=1)
        ti = (lr * xi[:, :, None] - li * xr[:, :, None]).sum(axis=1)
        return jnp.stack([tr, ti])               # [2, 2chir, n, ...]

    @property
    def n_c(self) -> int:
        return 2 * self.n_vec

    def restrict(self, r: jax.Array) -> jax.Array:
        wd = self._wdag(r)
        rc = self._apply_linv(wd)                # [2, 2chir, n, Tc, Zc, Sc]
        s = rc.shape
        # flatten to the coarse level's lane-merged site axis [2, N, Vc]
        return rc.reshape(s[0], s[1] * s[2], s[3] * s[4] * s[5])

    def prolong(self, xc: jax.Array) -> jax.Array:
        Tc, Zc, Yc, Xc = self.dims_c
        s = xc.shape
        xc2 = xc.reshape(s[0], 2, s[1] // 2, Tc, Zc, Yc * Xc)
        return self._vmul(self._apply_linv_dag(xc2))

    def gram_linv(self) -> jax.Array:
        """Linv from the raw vectors: per (aggregate, chirality) Gram ->
        unrolled complex Cholesky -> triangular inverse (on device).
        The Gram columns run under lax.map (one _wdag instance in the
        graph instead of n_vec — compile-time discipline, see _wdag).
        The mapped column is upcast to f32: with bf16-STORED null
        vectors (DeviceMGParams.vec_dtype at HBM-bound volumes) the
        q*r products inside _wdag would otherwise run bf16*bf16 and
        the Gram/Cholesky chain loses the orthogonalization; one f32
        column (vs a full f32 copy of v_pk) keeps the accumulation
        f32 at one-field peak memory."""
        cols = jax.lax.map(
            lambda q: self._wdag(q.astype(jnp.float32)), self.v_pk)
        G = jnp.moveaxis(cols, 0, 3)             # [2, 2chir, n_k, n_l, ...]
        linvs = []
        for c in range(2):
            L = pk.cholesky_pk(G[:, c], self.n_vec)
            linvs.append(pk.tril_inverse_pk(L, self.n_vec))
        return jnp.stack(linvs, axis=1)          # [2, 2chir, n, n, ...]


@partial(jax.jit, static_argnums=(1, 2))
def _fine_linv(v_pk, lat, block):
    """Block-orthogonalization Linv as ONE jitted program.  Eagerly the
    Gram/Cholesky chain is hundreds of tiny op-by-op dispatches, each a
    separate remote compile on the axon backend — measured as the bulk
    of the MG setup's 149-program count (VERDICT r3 #4)."""
    return DeviceFineTransfer(lat, block, v_pk, linv=False).gram_linv()


@partial(jax.jit, static_argnums=(1, 2, 3))
def _coarse_linv(v_pk, dims, n_f, block):
    return DeviceCoarseTransfer(dims, n_f, block, v_pk,
                                linv=False).gram_linv()


@partial(jax.tree_util.register_dataclass,
         data_fields=["v_pk", "linv"], meta_fields=["lat", "block"])
@dataclasses.dataclass
class DeviceFineTransfer(_LinvMixin):
    """fine [2, 2par, 4, 3, T, Z, S] <-> coarse [2, 2*n_vec, Tc, Zc, Sc].

    Chirality is the g5 spin split.  The aggregate geometry folds the
    even-odd x packing: with block (bt, bz, by, bx), bx even, the
    aggregate x-index of a packed site is xh // (bx/2) for both
    parities (x = 2*xh + parity offset stays inside the block).
    Pytree: null vectors + Linv are children (see DeviceFineLevel note).
    """
    lat: Lattice
    block: tuple[int, int, int, int]
    v_pk: jax.Array                        # [n, 2, 2par, 4, 3, T, Z, S]
    linv: jax.Array | None = None

    def __post_init__(self):
        bt, bz, by, bx = self.block
        lat = self.lat
        assert bx % 2 == 0, "x block must be even (eo packing)"
        assert (lat.Lt % bt == 0 and lat.Lz % bz == 0 and
                lat.Ly % by == 0 and lat.Lx % bx == 0)
        if self.linv is None and isinstance(self.v_pk, jax.Array):
            # one jitted program; linv=False sentinel skips this path
            # for the temporary instance inside the jit trace
            self.linv = _fine_linv(self.v_pk, self.lat, self.block)
        elif self.linv is False:
            self.linv = None

    @property
    def n_vec(self) -> int:
        return self.v_pk.shape[0]

    @property
    def dims_c(self):
        bt, bz, by, bx = self.block
        return (self.lat.Lt // bt, self.lat.Lz // bz, self.lat.Ly // by,
                self.lat.Lx // bx)

    def _wdag(self, r: jax.Array) -> jax.Array:
        # lax.map over the null-vector axis: ONE body instance in the
        # graph regardless of n_vec (an unrolled Python loop made the
        # probing/Linv programs' compile time superlinear in n_vec —
        # measured 761 s at n_vec=16 vs ~25 s at 8), and per-vector
        # sequencing keeps peak intermediates one-field-sized.
        rr, ri = r[0], r[1]
        bt, bz, by, bx = self.block
        Tc, Zc, Yc, Xc = self.dims_c
        S = rr.shape[-1]

        def one(q):
            qr, qi = q[0], q[1]                 # [2par, 4, 3, T, Z, S]
            pr = (qr * rr + qi * ri).sum(axis=(0, 2))  # conj(V) r
            pi = (qr * ri - qi * rr).sum(axis=(0, 2))
            x = jnp.stack([pr, pi])             # [2, 4, T, Z, S]
            x = jnp.stack(
                [sum(x[:, s] for s in _CHI0_SPINS),
                 sum(x[:, s] for s in _CHI1_SPINS)], axis=1)
            x = x.reshape(2, 2, Tc, bt, Zc, bz, S).sum(axis=(3, 5))
            x = x.reshape(2, 2, Tc, Zc, Yc, by, Xc, bx // 2).sum(
                axis=(5, 7))
            return x.reshape(2, 2, Tc, Zc, Yc * Xc)

        cols = jax.lax.map(one, self.v_pk)      # [n, 2, 2chir, ...]
        return jnp.moveaxis(cols, 0, 2)         # [2, 2chir, n, Tc, Zc, Sc]

    def _vmul(self, tmp: jax.Array) -> jax.Array:
        """tmp [2, 2chir, n, Tc, Zc, Sc] -> fine field sum_k V_k tmp_k."""
        bt, bz, by, bx = self.block
        Tc, Zc, Yc, Xc = self.dims_c
        n = self.n_vec
        T, Z = self.lat.Lt, self.lat.Lz
        S = self.lat.Ly * self.lat.Lx // 2
        t = tmp.reshape(2, 2, n, Tc, Zc, Yc, Xc)
        t = jnp.broadcast_to(t[..., None, :, None],
                             (2, 2, n, Tc, Zc, Yc, by, Xc, bx // 2))
        t = t.reshape(2, 2, n, Tc, Zc, S)
        t = jnp.take(t, jnp.asarray(_CHI_OF_SPIN), axis=1)
        # t [2ri, 4spin, n, Tc, Zc, S]; accumulate over k with a scan —
        # one body instance in the graph (see the _wdag note) and
        # one-field-sized peak intermediates
        tk = jnp.moveaxis(t, 2, 0)              # [n, 2ri, 4, Tc, Zc, S]

        def body(carry, qt):
            out_r, out_i = carry
            vq, tl = qt
            vq = vq.reshape(2, 2, 4, 3, Tc, bt, Zc, bz, S)
            # broadcast axes [2par, 4spin, 3col, Tc, bt, Zc, bz, S]
            wr = tl[0][None, :, None, :, None, :, None, :]
            wi = tl[1][None, :, None, :, None, :, None, :]
            return (out_r + (vq[0] * wr - vq[1] * wi),
                    out_i + (vq[0] * wi + vq[1] * wr)), None

        z = jnp.zeros((2, 4, 3, Tc, bt, Zc, bz, S), t.dtype)
        (out_r, out_i), _ = jax.lax.scan(body, (z, z), (self.v_pk, tk))
        out = jnp.stack([out_r, out_i])  # [2, 2par, 4, 3, Tc, bt, Zc, bz, S]
        return out.reshape(2, 2, 4, 3, T, Z, S)


@partial(jax.tree_util.register_dataclass,
         data_fields=["v_pk", "linv"],
         meta_fields=["dims", "n_f", "block"])
@dataclasses.dataclass
class DeviceCoarseTransfer(_LinvMixin):
    """coarse [2, N, Vf] (flat) <-> coarser [2, 2*n_vec, Vc] (flat).

    Chirality on a coarse level is the exact N/2 dof split (the
    prolongator preserves chirality at every level).  Pytree like
    DeviceFineTransfer.
    """
    dims: tuple[int, int, int, int]
    n_f: int
    block: tuple[int, int, int, int]
    v_pk: jax.Array                        # [n, 2, N, Vf] flat
    linv: jax.Array | None = None

    def __post_init__(self):
        bt, bz, by, bx = self.block
        T, Z, Y, X = self.dims
        assert T % bt == 0 and Z % bz == 0 and Y % by == 0 and X % bx == 0
        if self.linv is None and isinstance(self.v_pk, jax.Array):
            self.linv = _coarse_linv(self.v_pk, self.dims, self.n_f,
                                     self.block)
        elif self.linv is False:
            self.linv = None

    @property
    def n_vec(self) -> int:
        return self.v_pk.shape[0]

    @property
    def dims_c(self):
        bt, bz, by, bx = self.block
        T, Z, Y, X = self.dims
        return (T // bt, Z // bz, Y // by, X // bx)

    def _wdag(self, r: jax.Array) -> jax.Array:
        q = self.v_pk
        pr = q[:, 0] * r[0] + q[:, 1] * r[1]   # [n, N, Vf]
        pi = q[:, 0] * r[1] - q[:, 1] * r[0]
        x = jnp.stack([pr, pi], axis=1)        # [n, 2, N, Vf]
        h = self.n_f // 2
        x = jnp.stack([x[:, :, :h].sum(axis=2),
                       x[:, :, h:].sum(axis=2)], axis=2)
        bt, bz, by, bx = self.block
        Tc, Zc, Yc, Xc = self.dims_c
        T, Z, Y, X = self.dims
        n, Sf = x.shape[0], Y * X
        x = x.reshape(n, 2, 2, Tc, bt, Zc, bz, Sf).sum(axis=(4, 6))
        x = x.reshape(n, 2, 2, Tc, Zc, Yc, by, Xc, bx).sum(axis=(6, 8))
        x = x.reshape(n, 2, 2, Tc, Zc, Yc * Xc)
        return jnp.moveaxis(x, 0, 2)           # [2, 2chir, n, Tc, Zc, Sc]

    def _vmul(self, tmp: jax.Array) -> jax.Array:
        bt, bz, by, bx = self.block
        Tc, Zc, Yc, Xc = self.dims_c
        T, Z, Y, X = self.dims
        n = self.n_vec
        h = self.n_f // 2
        Sf = Y * X
        t = tmp.reshape(2, 2, n, Tc, Zc, Yc, Xc)
        t = jnp.broadcast_to(t[..., None, :, None],
                             (2, 2, n, Tc, Zc, Yc, by, Xc, bx))
        t = t.reshape(2, 2, n, Tc, Zc, Sf)
        chi = jnp.asarray([0] * h + [1] * (self.n_f - h))
        t = jnp.take(t, chi, axis=1)           # [2, N, n, Tc, Zc, Sf]
        # target axes [N, n, Tc, bt, Zc, bz, Sf]
        wr = t[0][:, :, :, None, :, None, :]
        wi = t[1][:, :, :, None, :, None, :]
        vq = self.v_pk.reshape(n, 2, self.n_f, Tc, bt, Zc, bz, Sf)
        vr = jnp.moveaxis(vq[:, 0], 0, 1)      # [N, n, Tc, bt, Zc, bz, Sf]
        vi = jnp.moveaxis(vq[:, 1], 0, 1)
        out_r = (vr * wr - vi * wi).sum(axis=1)
        out_i = (vr * wi + vi * wr).sum(axis=1)
        out = jnp.stack([out_r, out_i])        # [2, N, Tc, bt, Zc, bz, Sf]
        return out.reshape(2, self.n_f, T * Z * Sf)


# --------------------------------------------------------------------------
# Galerkin coarse construction (colored probing, device)
# --------------------------------------------------------------------------

#: canonical leg order (matches ops/dslash_pallas legs_out order)
_LEG_ORDER = tuple((m, s) for m in range(4) for s in (+1, -1))


def _coarse_colors(dims_c):
    """Distance-1 coloring of the periodic coarse grid.

    Per-dim colors alternate 0/1, with the LAST site of an odd extent
    (> 1) recolored 2 — the simple coordinate parity is INVALID across
    the periodic wrap at odd extents (first and last site share parity
    but are neighbors), which silently dropped the wrap-link columns
    into the diagonal in the v1 per-mu masks.  The global color is the
    per-dim sum mod 3 when any dim needs three colors, else mod 2:
    neighbors differ by the changed dim's color step (+-1 or +-2),
    nonzero under either modulus.  Extent-1 dims contribute 0 — their
    self-wrap hop lands on the SAME block (same color), so it is masked
    out of the links and folded into the diagonal by the full-probe
    subtraction, which is where a self-coupling belongs.

    -> (colors [Tc, Zc, Sc] int32, n_colors).
    """
    Tc, Zc, Yc, Xc = dims_c

    def dim_color(n):
        c = np.arange(n) % 2
        if n % 2 and n > 1:
            c[n - 1] = 2
        return c

    n_col = 3 if any(n % 2 and n > 1 for n in (Tc, Zc, Yc, Xc)) else 2
    s = np.arange(Yc * Xc)
    col = (dim_color(Tc)[:, None, None]
           + dim_color(Zc)[None, :, None]
           + (dim_color(Yc)[s // Xc] + dim_color(Xc)[s % Xc]
              )[None, None, :]) % n_col
    return col.astype(np.int32), n_col


def _probe_color(level, transfer, ek, fused_legs=True):
    """ek one-hot [n_c] -> (fwd[4], bwd[4], full) coarse columns.

    Global distance-1 coloring: one masked source feeds ALL 8 hop legs
    at once, so the fine hops run through the multi-leg kernel pass
    (dslash_pallas legs_out — gauge + spinor read ONCE per color class
    instead of once per (mu, parity, sign): ~8x fewer kernel launches
    and ~3x less probing HBM traffic than the v1 per-mu masks, and
    correct at odd coarse extents where those masks were not).

    The color-class loop is a lax.fori_loop with TRACED masks and the
    8 per-leg restrictions run as ONE vmapped restrict: setup cost is
    ~97% XLA compile (BASELINE.md), so the probing program is built for
    minimum trace size — one copy of (prolong + 8-leg hop + restrict)
    instead of n_col unrolled copies with 8 separate restrict graphs
    (VERDICT r3 #4; measured compile-time numbers in BASELINE.md).

    level/transfer are pytree arguments (NOT closure captures — see the
    DeviceFineLevel pytree note)."""
    Tc, Zc, Yc, Xc = transfer.dims_c
    Vc = Tc * Zc * Yc * Xc
    n_c = transfer.n_c
    colors_np, n_col = _coarse_colors(transfer.dims_c)
    colors = jnp.asarray(colors_np.reshape(-1))     # flat [Vc]
    base = jnp.zeros((2, n_c, Vc), jnp.float32)
    base = base.at[0].set(ek[:, None])
    hop_all = getattr(level, "apply_hop_all", None)

    def legs_restricted(vf):
        # Fused: ONE multi-leg kernel pass emits all 8 hop legs — but
        # the stacked legs are 8 live fine fields (8.1 GiB at 48^3x96,
        # the measured probing OOM, BASELINE.md round 5).  Per-leg:
        # 8 hop+restrict passes with ~2 fine fields peak — slower
        # (gauge re-read per leg) but HBM-bounded; build_coarse_device
        # auto-selects by fine-field footprint.
        if fused_legs and hop_all is not None:
            return jax.vmap(transfer.restrict)(hop_all(vf))
        return jnp.stack([transfer.restrict(level.apply_hop(vf, m, s))
                          for (m, s) in _LEG_ORDER])

    def body(c, acc):
        src = base * (colors == c).astype(jnp.float32)
        vf = transfer.prolong(src)
        w = legs_restricted(vf)
        return acc + w * (colors != c).astype(jnp.float32)

    acc = jax.lax.fori_loop(
        0, n_col, body,
        jnp.zeros((8, 2, n_c, Vc), jnp.float32))
    fwd = [None] * 4
    bwd = [None] * 4
    for idx, (m, sgn) in enumerate(_LEG_ORDER):
        if sgn > 0:
            fwd[m] = acc[idx]
        else:
            bwd[m] = acc[idx]
    full = transfer.restrict(level.apply(transfer.prolong(base)))
    return jnp.stack(fwd), jnp.stack(bwd), full


# probe a CHUNK of coarse colors in one jitted program.  Measured on the
# v5e (v1 per-mu probing): chunk=1 wins — the vmapped graph compiles and
# runs ~4x slower — so batching stays opt-in.
_probe_colors = jax.jit(
    jax.vmap(_probe_color, in_axes=(None, None, 0, None)),
    static_argnums=3)


def _fine_field_bytes(level) -> int:
    """f32 bytes of one solver field on `level` (both parities)."""
    if hasattr(level, "lat"):
        return 96 * level.lat.volume      # 2ri*2par*4spin*3col * V/2 * 4B
    import numpy as _np
    return int(2 * level.n * _np.prod(level.dims) * 4)


def build_coarse_device(level, transfer, probe_chunk: int = 1,
                        fused_legs: bool | None = None
                        ) -> DeviceCoarseLevel:
    """A_c = R A P as explicit nearest-neighbor links, by colored probing
    (all 17 probes of `probe_chunk` coarse colors per jitted call; see
    the host mg/coarse.py for the algorithm derivation).

    fused_legs=None auto-selects the probing leg strategy: the fused
    8-leg kernel pass when the stacked legs fit comfortably (< 6 GiB),
    the per-leg hop+restrict sequence at HBM-bound volumes (48^3x96:
    fused probing measured OOM at 21 GiB, BASELINE.md round 5)."""
    if fused_legs is None:
        fused_legs = 8 * _fine_field_bytes(level) < 6 * 2**30
    n_c = transfer.n_c
    chunk = probe_chunk
    while n_c % chunk:
        chunk //= 2
    eye = np.eye(n_c, dtype=np.float32)
    fwd_cols, bwd_cols, diag_cols = [], [], []
    for k0 in range(0, n_c, chunk):
        f, b, d = _probe_colors(level, transfer,
                                jnp.asarray(eye[k0:k0 + chunk]),
                                fused_legs)
        # batch axis 0 = color k
        fwd_cols.extend(f[i] for i in range(chunk))
        bwd_cols.extend(b[i] for i in range(chunk))
        diag_cols.extend(d[i] for i in range(chunk))
    # columns k on a new axis 3 (after [2ri?]): assemble [2, 9, n, n, ...]
    fwd = jnp.stack(fwd_cols, axis=3)    # [4, 2, n_row, n_col, Tc, Zc, Sc]
    bwd = jnp.stack(bwd_cols, axis=3)
    diag = jnp.stack(diag_cols, axis=2)  # [2, n_row, n_col, Tc, Zc, Sc]
    # full probe contains X + all link contributions; subtract the links
    diag = diag - fwd.sum(axis=0) - bwd.sum(axis=0)
    links = jnp.concatenate([jnp.moveaxis(fwd, 0, 1),
                             jnp.moveaxis(bwd, 0, 1),
                             diag[:, None]], axis=1)
    return DeviceCoarseLevel(dims=transfer.dims_c, n=n_c, links=links)
