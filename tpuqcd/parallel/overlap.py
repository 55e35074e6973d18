"""Interior/exterior-split sharded Dslash: comm/compute overlap (C7).

TPU-native equivalent of the reference's dslash communication policy
engine (`dslash_policy.cuh` interior/exterior kernels + async MPI [U];
SURVEY.md C7): the full-local Dslash kernel runs with LOCAL-periodic
wraps — independent of any halo data, so XLA is free to schedule the
`lax.ppermute`s concurrently with it — and the wrapped boundary slices
are then repaired with thin slab corrections once the halos arrive:

    fwd leg, last slice:   += P^- U_mu[q][last] (psi_hi - psi[first])
    bwd leg, first slice:  += P^+ (U_lo^dag psi_lo
                                   - U[p][last]^dag psi[last])

(t, z AND y directions — the mesh shards (T, Z, Y); y-rows are Xh-wide
slices of the y-major packed S axis, so their repairs are ordinary
S-slice corrections.  X stays on-chip: it is the lane axis.)
The corrections are exact by linearity of the hop term, cost O(surface)
elementwise work, and depend only on the exchanged slabs — the data-flow
graph the scheduler needs for overlap, without hand-written async DMA.

Epilogues stay FUSED in this mode: every epilogue E is affine in the
hop result d — E(d) = a + L d with a site-local linear part L
(L = A^{-1} for twist_inv, C^{-1} for clover_inv, -kappa^2 for the
xpay family) — so the interior kernel runs with the epilogue baked in
and each O(surface) slab correction delta is pushed through L before
being added:  E(d + delta) = E(d) + L delta, exactly.  The caller
supplies L as ``epi_corr(delta, region)`` (region selects the boundary
slice of any site-varying operand, e.g. the clover blocks) plus either
Pallas ``kernel_kwargs`` (fused in-VMEM) or an explicit ``epi_full``
pass for the XLA interior (where XLA's own fusion does the same job).
No extra HBM pass; the correction transforms are O(surface).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..gammas import PROJ_MINUS, PROJ_PLUS
from ..lattice import Lattice


def _nz(mat, tol=1e-12):
    m = np.asarray(mat)
    return [(a, b, complex(m[a, b])) for a in range(4) for b in range(4)
            if abs(m[a, b]) > tol]


def _proj_apply(p_nz, f):
    """Spin projector on a packed slab f [2ri, 4, 3, ...]."""
    fr, fi = f[0], f[1]
    out_r = [None] * 4
    out_i = [None] * 4
    for (a, b, c) in p_nz:
        tr = c.real * fr[b] - c.imag * fi[b]
        ti = c.real * fi[b] + c.imag * fr[b]
        out_r[a] = tr if out_r[a] is None else out_r[a] + tr
        out_i[a] = ti if out_i[a] is None else out_i[a] + ti
    zero = jnp.zeros_like(fr[0])
    out_r = [zero if v is None else v for v in out_r]
    out_i = [zero if v is None else v for v in out_i]
    return jnp.stack([jnp.stack(out_r), jnp.stack(out_i)])


def _su3_slab(u_slab, f, dagger):
    """Color matvec on packed slabs.

    u_slab [3, 3, 2ri, *site]; f [2ri, 4, 3, *site];
    out_i = sum_j U_ij f_j (or U^dag)."""
    out_r, out_i = [], []
    for i in range(3):
        ar = ai = None
        for j in range(3):
            if dagger:
                lr, li = u_slab[j, i, 0], -u_slab[j, i, 1]
            else:
                lr, li = u_slab[i, j, 0], u_slab[i, j, 1]
            tr = lr * f[0, :, j] - li * f[1, :, j]
            ti = lr * f[1, :, j] + li * f[0, :, j]
            ar = tr if ar is None else ar + tr
            ai = ti if ai is None else ai + ti
        out_r.append(ar)
        out_i.append(ai)
    return jnp.stack([jnp.stack(out_r, axis=1), jnp.stack(out_i, axis=1)])


def _leg(p_nz, u_slab, f, dagger_u):
    return _proj_apply(p_nz, _su3_slab(u_slab, f, dagger_u))


def _pperm(x, axis_name, shift):
    n = jax.lax.axis_size(axis_name)
    perm = [(i, (i + shift) % n) for i in range(n)]
    return jax.lax.ppermute(x, axis_name, perm)


def dslash_overlap(u_ext, psi_loc, parity, lat: Lattice, lmesh,
                   dagger: bool, block_z: int | None = None,
                   interpret: bool = False,
                   backend: str = "pallas",
                   dirs: tuple | None = None,
                   kernel_kwargs: dict | None = None,
                   epi_full=None, epi_corr=None,
                   halo_half: bool = False) -> jax.Array:
    """Sharded hopping term D_{q<-p} with interior/exterior split.

    u_ext: per-shard packed gauge WITH the t/z halo slabs appended
    (parallel/sharded._exchange_gauge — the gauge halos feed the
    backward-leg corrections); psi_loc [2ri, 4, 3, Tl, Zl, S] at
    ``parity``.  Runs inside shard_map over lmesh.mesh.

    backend "pallas" runs the interior through the fused kernel;
    "xla" uses the packed XLA stencil on a local-geometry Lattice (the
    CPU-testable path — the boundary-repair math is backend-agnostic,
    and a LOCAL lattice's periodic wrap is exactly the interior
    approximation being repaired; the eo masks match the global ones
    because shard offsets are even).

    Fused epilogues (see module docstring): ``kernel_kwargs`` are extra
    dslash_eo_pallas arguments (epilogue/kappa/mu/flavor/psi0_pk/
    clover_pk) baked into the Pallas interior; ``epi_full(d)`` is the
    equivalent explicit pass used for the XLA interior; ``epi_corr
    (delta, region)`` applies the epilogue's site-local linear part to
    a boundary slab correction, region in {"t_first", "t_last",
    "z_first", "z_last", "y_first", "y_last"} naming the slice for
    site-varying operands.
    All three default to the plain hop (identity epilogue).
    """
    p, q = parity, 1 - parity
    tn, zn = lmesh.nt, lmesh.nz
    yn = getattr(lmesh, "ny", 1)
    Tl, Zl = lmesh.local_dims
    Xh = lat.Lx // 2
    Yl = lat.Ly // yn
    S_loc = Yl * Xh          # local packed-S extent (S is y-major)

    def has(mu, sign):
        """dirs filter (single-leg probing, as in the kernel)."""
        return dirs is None or (mu, sign) in dirs

    # 1. halo sends first: nothing below depends on them until the
    # corrections, so the collective-permute can ride ICI while the
    # interior kernel occupies the core.  halo_half packs each face
    # with its leg's spin projection before the send (12 reals/site —
    # reference dslash_pack.cu [U], C6): every repair below applies
    # P = recon @ proj to the slab, and proj(zero-padded(proj psi))
    # == proj(psi) exactly (gammas.py tables have identity first-two
    # spin columns), so the repairs are unchanged.
    if halo_half:
        from .sharded import _half_tables, _hpad_pk, _hproj_pk
        hpm_t, hpp_t = _half_tables(dagger)

        def _send(slab, axis_name, shift, tab):
            return _hpad_pk(_pperm(_hproj_pk(slab, tab), axis_name,
                                   shift))
    else:
        def _send(slab, axis_name, shift, tab):
            return _pperm(slab, axis_name, shift)
        hpm_t = hpp_t = [None] * 4
    if tn > 1 and has(3, -1):
        psi_t_lo = _send(psi_loc[:, :, :, -1:], "t", +1, hpp_t[3])
    if tn > 1 and has(3, +1):
        psi_t_hi = _send(psi_loc[:, :, :, :1], "t", -1, hpm_t[3])
    if zn > 1 and has(2, -1):
        psi_z_lo = _send(psi_loc[:, :, :, :, -1:], "z", +1, hpp_t[2])
    if zn > 1 and has(2, +1):
        psi_z_hi = _send(psi_loc[:, :, :, :, :1], "z", -1, hpm_t[2])
    # y faces are Xh-wide slices of the y-major packed S axis
    if yn > 1 and has(1, -1):
        psi_y_lo = _send(psi_loc[..., -Xh:], "y", +1, hpp_t[1])
    if yn > 1 and has(1, +1):
        psi_y_hi = _send(psi_loc[..., :Xh], "y", -1, hpm_t[1])

    # 2. interior: full local volume with LOCAL-periodic wraps (the
    # boundary slices are wrong and repaired below; recompute cost is
    # 2/Tl + 2/Zl + 2/Yl of the volume over the sharded axes, the
    # classic interior/exterior tradeoff flipped into pure
    # data-parallel form)
    u_loc = u_ext[..., :Tl, :Zl, :S_loc]
    if backend == "pallas":
        from ..ops.dslash_pallas import dslash_eo_pallas
        # when Y is sharded the kernel's y-roll stride and eo masks come
        # from a LOCAL-Y lattice (even y offsets keep the checkerboard
        # shard-identical; X wraps are global since X is never sharded)
        lat_k = Lattice((lat.Lx, Yl, lat.Lz, lat.Lt)) if yn > 1 else lat
        out = dslash_eo_pallas(u_loc, psi_loc, p, lat_k, dagger=dagger,
                               block_z=block_z, interpret=interpret,
                               local_dims=(Tl, Zl), dirs=dirs,
                               **(kernel_kwargs or {}))
    else:
        from ..ops.dslash_xla import dslash_eo_dev_ri
        lat_loc = Lattice((lat.Lx, Yl, Zl, Tl))
        out = dslash_eo_dev_ri(u_loc, psi_loc, p, lat_loc, dagger=dagger,
                               dirs=dirs)
        if epi_full is not None:
            out = epi_full(out)

    if epi_corr is None:
        epi_corr = lambda delta, region: delta  # noqa: E731

    # 3. t-direction repairs (mu = 3); tn == 1 means the local wrap IS
    # the correct global wrap
    if tn > 1 and (has(3, +1) or has(3, -1)):
        fwd3 = _nz((PROJ_PLUS if dagger else PROJ_MINUS)[3])
        bwd3 = _nz((PROJ_MINUS if dagger else PROJ_PLUS)[3])
        first = out[:, :, :, :1]
        last = out[:, :, :, -1:]
        if has(3, +1):
            # forward leg at result t = Tl-1: local wrap used psi[0]
            u_q_last = u_loc[3, q, :, :, :, -1:, :, :]
            d_hi = psi_t_hi - psi_loc[:, :, :, :1]
            last = last + epi_corr(
                _leg(fwd3, u_q_last, d_hi, dagger_u=False), "t_last")
        if has(3, -1):
            # backward leg at result t = 0: local wrap used local data
            u_p_hal = u_ext[3, p, :, :, :, Tl:Tl + 1, :Zl, :S_loc]
            u_p_last = u_loc[3, p, :, :, :, -1:, :, :]
            first = first + epi_corr(
                _leg(bwd3, u_p_hal, psi_t_lo, dagger_u=True)
                - _leg(bwd3, u_p_last, psi_loc[:, :, :, -1:],
                       dagger_u=True), "t_first")
        out = jnp.concatenate([first, out[:, :, :, 1:-1], last], axis=3)

    # 4. z-direction repairs (mu = 2)
    if zn > 1 and (has(2, +1) or has(2, -1)):
        fwd2 = _nz((PROJ_PLUS if dagger else PROJ_MINUS)[2])
        bwd2 = _nz((PROJ_MINUS if dagger else PROJ_PLUS)[2])
        first = out[:, :, :, :, :1]
        last = out[:, :, :, :, -1:]
        if has(2, +1):
            u_q_last = u_loc[2, q, :, :, :, :, -1:, :]
            d_hi = psi_z_hi - psi_loc[:, :, :, :, :1]
            last = last + epi_corr(
                _leg(fwd2, u_q_last, d_hi, dagger_u=False), "z_last")
        if has(2, -1):
            u_p_hal = u_ext[2, p, :, :, :, :Tl, -1:, :S_loc]  # U_z(z=-1)
            u_p_last = u_loc[2, p, :, :, :, :, -1:, :]
            first = first + epi_corr(
                _leg(bwd2, u_p_hal, psi_z_lo, dagger_u=True)
                - _leg(bwd2, u_p_last, psi_loc[:, :, :, :, -1:],
                       dagger_u=True), "z_first")
        out = jnp.concatenate([first, out[:, :, :, :, 1:-1], last],
                              axis=4)

    # 5. y-direction repairs (mu = 1): a y-row is an Xh-wide slice of
    # the y-major packed S axis; the interior's roll_s(±Xh) wrapped
    # locally exactly like the t/z rolls
    if yn > 1 and (has(1, +1) or has(1, -1)):
        fwd1 = _nz((PROJ_PLUS if dagger else PROJ_MINUS)[1])
        bwd1 = _nz((PROJ_MINUS if dagger else PROJ_PLUS)[1])
        first = out[..., :Xh]
        last = out[..., -Xh:]
        if has(1, +1):
            # forward leg at result y = Yl-1: local wrap used row y = 0
            u_q_last = u_loc[1, q, ..., -Xh:]
            d_hi = psi_y_hi - psi_loc[..., :Xh]
            last = last + epi_corr(
                _leg(fwd1, u_q_last, d_hi, dagger_u=False), "y_last")
        if has(1, -1):
            # backward leg at result y = 0: needs U_y(y=-1) (the gauge
            # y-halo row appended on S by _exchange_gauge) and the
            # neighbor's last y-row
            u_p_hal = u_ext[1, p, :, :, :, :Tl, :Zl, S_loc:]
            u_p_last = u_loc[1, p, ..., -Xh:]
            first = first + epi_corr(
                _leg(bwd1, u_p_hal, psi_y_lo, dagger_u=True)
                - _leg(bwd1, u_p_last, psi_loc[..., -Xh:],
                       dagger_u=True), "y_first")
        out = jnp.concatenate([first, out[..., Xh:-Xh], last], axis=-1)

    return out
