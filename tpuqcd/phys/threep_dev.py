"""Device-resident three-point contractions (packed-real layout).

TPU-native port of the QKXTM 3pt contraction kernels ([U]
`contract_threep`-style CUDA kernels; SURVEY.md C24/C17/C25): the
bilinear insertion densities stream on the accelerator over the packed
propagator planes — the same discipline as phys/contract_dev.py — and
the momentum projection itself also runs on device as real einsums, so
only the tiny [n_mom, T] correlators cross to the host.

Key factorization: every ultra-local insertion Gamma shares the same
open-spin bilinear density

    D[g, h](x) = sum_{c, q, b}  B(x)_{(g c),(q b)}  S(x)_{(h c),(q b)}

(one volume pass computes the [4, 4] complex density for ALL 16 gamma
structures; each insertion is then a per-site weighted sum of D's spin
entries).  The one-derivative insertions reuse the same engine on
(B, D_nu S) and (D_nu^T B, S) pairs, with the symmetric covariant
derivative applied directly in the packed layout via the shared
even-odd shift algebra (ops/shifts.py).

Packed propagator layout (phys/contract_dev.py):
    ``[2(ri), 2(par), 4(snk s), 3(snk c), 4(src s), 3(src c), T, Z, S]``
Host oracles: phys/threep.py (validated against the dense all-to-all
propagator on tiny lattices).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..lattice import Lattice
from ..ops.shifts import neighbor
from .contract import momentum_phases

_PREC = jax.lax.Precision.HIGHEST

# NOTE on jit: the axon TPU backend cannot run dot_general *eagerly*
# (UNIMPLEMENTED at dispatch); every contraction below is therefore
# reached only through the module-level jitted kernels, which also lets
# XLA fuse the bilinear -> gamma-weight -> momentum-project chain into
# one HBM pass.


# --- packed momentum projection ---------------------------------------------

def momentum_phases_pk(lat: Lattice, momenta: np.ndarray,
                       src_pos=(0, 0, 0)) -> np.ndarray:
    """e^{-i p.(x - x0)} packed to the parity-split device layout:
    float32 ``[2(ri), n, 2(par), T, Z, S]``, S = Y * X//2.

    The packing is t-dependent only through the checkerboard sub-parity
    s(t, z, y) (fields._sub_parity_mask), replicated here in numpy.
    """
    ph = momentum_phases(lat, momenta, src_pos)          # [n, Z, Y, X]
    ph = ph.astype(np.complex64)
    s = (np.asarray(lat.eo_sub_parity) == 1)             # [T, Z, Y]
    ph0 = ph[:, None, :, :, 0::2]                        # [n,1,Z,Y,Xh]
    ph1 = ph[:, None, :, :, 1::2]
    sm = s[None, :, :, :, None]                          # [1,T,Z,Y,1]
    even = np.where(sm, ph1, ph0)                        # [n,T,Z,Y,Xh]
    odd = np.where(sm, ph0, ph1)
    pk = np.stack([even, odd], axis=1)                   # [n,2,T,Z,Y,Xh]
    n = pk.shape[0]
    pk = pk.reshape(n, 2, lat.Lt, lat.Lz, lat.Ly * lat.Lx // 2)
    return np.stack([pk.real, pk.imag]).astype(np.float32)


def _project_planes(dens_pk: jax.Array, ph: jax.Array) -> jax.Array:
    """[2ri, 2par, T, Z, S] x phases [2ri, n, 2par, T, Z, S] ->
    [2ri, n, T] (traced helper)."""
    sub = "nptzs,ptzs->nt"
    re = (jnp.einsum(sub, ph[0], dens_pk[0], precision=_PREC)
          - jnp.einsum(sub, ph[1], dens_pk[1], precision=_PREC))
    im = (jnp.einsum(sub, ph[0], dens_pk[1], precision=_PREC)
          + jnp.einsum(sub, ph[1], dens_pk[0], precision=_PREC))
    return jnp.stack([re, im])


_project_jit = jax.jit(_project_planes)


def _fetch_complex(planes: jax.Array) -> np.ndarray:
    """[2ri, ...] real on device -> complex HOST numpy array (small
    complex arrays can neither materialize on nor cross D2H from the
    axon TPU backend, utils/cplx.py — so never re-wrap in jnp here)."""
    out = np.asarray(jax.device_get(planes))
    return out[0] + 1j * out[1]


def project_momenta_pk(dens_pk: jax.Array, lat: Lattice,
                       momenta: np.ndarray, src_pos=(0, 0, 0)) -> jax.Array:
    """Packed density [2ri, 2par, T, Z, S] -> complex [n_mom, T]; the
    projection runs on device (C25; the density never leaves HBM).
    Momentum lists >= FFT_MOM_THRESHOLD take one on-device spatial FFT
    + gather (the reference's cuFFT projection) instead of the n x V
    phase einsum."""
    if _use_fft(momenta):
        iz, iy, ix = _mom_indices(lat, momenta)
        shift = (int(src_pos[2]), int(src_pos[1]), int(src_pos[0]))
        try:
            return _fetch_complex(_density_fft_gather(
                dens_pk, iz, iy, ix, lat=lat, shift=shift))
        except Exception as e:            # pragma: no cover - TPU only
            _note_fft_failure(e)
    ph = jnp.asarray(momentum_phases_pk(lat, momenta, src_pos),
                     dtype=dens_pk.dtype)
    return _fetch_complex(_project_jit(dens_pk, ph))


def _density_fft_full(dens_pk, lat, shift):
    """Traced: packed density -> complex momentum grid [T, Z, Y, X]."""
    from ..fields import eo_to_full
    T, Z, Y, Xh = lat.Lt, lat.Lz, lat.Ly, lat.Lx // 2
    # [2ri, 2par, T, Z, S] -> full real planes [2ri, T, Z, Y, X]
    full = eo_to_full(dens_pk.reshape(2, 2, T, Z, Y, Xh), lat,
                      site_ndim_left=1)
    if any(shift):   # e^{-ip.(x-x0)}: roll so the source sits at 0
        full = jnp.roll(full, (-shift[0], -shift[1], -shift[2]),
                        axis=(2, 3, 4))
    # fftn is linear: fft(re) + i fft(im) == fft(re + i im); two real
    # inputs avoid forming the complex density in the packed pipeline
    return (jnp.fft.fftn(full[0].astype(jnp.complex64), axes=(1, 2, 3))
            + 1j * jnp.fft.fftn(full[1].astype(jnp.complex64),
                                axes=(1, 2, 3)))


@partial(jax.jit, static_argnames=("lat", "shift"))
def _fft_project_kernel(dens_pk, *, lat, shift):
    f = _density_fft_full(dens_pk, lat, shift)
    return jnp.stack([jnp.real(f), jnp.imag(f)])


@partial(jax.jit, static_argnames=("lat", "shift"))
def _density_fft_gather(dens_pk, iz, iy, ix, *, lat, shift):
    f = _density_fft_full(dens_pk, lat, shift)[:, iz, iy, ix]  # [T, n]
    f = jnp.swapaxes(f, 0, 1)                                  # [n, T]
    return jnp.stack([jnp.real(f), jnp.imag(f)])


def project_all_momenta_fft_pk(dens_pk: jax.Array, lat: Lattice,
                               src_pos=(0, 0, 0)) -> np.ndarray:
    """FULL momentum grid from one on-device spatial FFT — the cuFFT
    projection path of the reference (C25; [U] plugin cuFFT plans over
    the spatial volume per timeslice).  For O(1..10) momenta the
    phase-list einsum (project_momenta_pk) is cheaper; for the dense
    momentum sets of loop analyses the FFT wins.

    dens_pk: packed [2ri, 2par, T, Z, S]; src_pos = (x0, y0, z0).
    Returns complex HOST array [T, Lz, Ly, Lx] with
    out[t, nz % Lz, ny % Ly, nx % Lx] == the phase-sum projection at
    integer momentum n = (nx, ny, nz) (momentum_phases convention).
    """
    shift = (int(src_pos[2]), int(src_pos[1]), int(src_pos[0]))  # z,y,x
    return _fetch_complex(_fft_project_kernel(dens_pk, lat=lat,
                                              shift=shift))


# --- open-spin bilinear density ---------------------------------------------

def bilinear_density_pk(bwd_pk: jax.Array, fwd_pk: jax.Array) -> jax.Array:
    """D[g,h](x) = sum_{c,q,b} B_{(g c),(q b)} S_{(h c),(q b)}:
    packed [2ri, 2par, 4(g), 4(h), T, Z, S].  Real dot_generals only
    (the axon TPU backend has no complex contractions, utils/cplx.py)."""
    br, bi = bwd_pk[0], bwd_pk[1]        # [2par,4,3,4,3,T,Z,S]
    sr, si = fwd_pk[0], fwd_pk[1]
    sub = "pgcqbtzs,phcqbtzs->pghtzs"
    re = (jnp.einsum(sub, br, sr, precision=_PREC)
          - jnp.einsum(sub, bi, si, precision=_PREC))
    im = (jnp.einsum(sub, br, si, precision=_PREC)
          + jnp.einsum(sub, bi, sr, precision=_PREC))
    return jnp.stack([re, im])


def _gamma_weighted(D: jax.Array, g: np.ndarray) -> jax.Array:
    """dens = sum_{g,h} Gamma[g,h] D[g,h]: [2ri, 2par, T, Z, S]
    (traced helper — call under jit on TPU)."""
    gr = jnp.asarray(np.real(g), dtype=D.dtype)
    gi = jnp.asarray(np.imag(g), dtype=D.dtype)
    sub = "gh,pghtzs->ptzs"
    re = (jnp.einsum(sub, gr, D[0], precision=_PREC)
          - jnp.einsum(sub, gi, D[1], precision=_PREC))
    im = (jnp.einsum(sub, gr, D[1], precision=_PREC)
          + jnp.einsum(sub, gi, D[0], precision=_PREC))
    return jnp.stack([re, im])


def _weighted_project_all(D: jax.Array, gr: jax.Array, gi: jax.Array,
                          ph: jax.Array) -> jax.Array:
    """All-gammas weight + project: D [2ri, 2par, 4, 4, T, Z, S],
    gr/gi [G, 4, 4], phases [2ri, n, 2par, T, Z, S] -> [G, 2ri, n, T]."""
    sub = "agh,pghtzs->aptzs"
    wre = (jnp.einsum(sub, gr, D[0], precision=_PREC)
           - jnp.einsum(sub, gi, D[1], precision=_PREC))
    wim = (jnp.einsum(sub, gr, D[1], precision=_PREC)
           + jnp.einsum(sub, gi, D[0], precision=_PREC))
    sub2 = "nptzs,aptzs->ant"
    re = (jnp.einsum(sub2, ph[0], wre, precision=_PREC)
          - jnp.einsum(sub2, ph[1], wim, precision=_PREC))
    im = (jnp.einsum(sub2, ph[0], wim, precision=_PREC)
          + jnp.einsum(sub2, ph[1], wre, precision=_PREC))
    return jnp.stack([re, im], axis=1)


@jax.jit
def _ultralocal_kernel(bwd_pk, fwd_pk, gr, gi, ph):
    return _weighted_project_all(bilinear_density_pk(bwd_pk, fwd_pk),
                                 gr, gi, ph)


#: momentum-list size at which the FFT projection beats the phase-list
#: einsum (the einsum streams n x V phases; the FFT is V log V once)
FFT_MOM_THRESHOLD = 32

#: set True after the first on-device FFT failure (the axon TPU backend
#: has partial complex-op coverage; errors can surface asynchronously
#: at the result fetch) — every dispatch then falls back to phase sums
_FFT_DISABLED = False


def _use_fft(momenta) -> bool:
    return (not _FFT_DISABLED) and len(momenta) >= FFT_MOM_THRESHOLD


def _note_fft_failure(e: Exception) -> None:
    global _FFT_DISABLED
    _FFT_DISABLED = True
    import logging
    logging.getLogger("tpuqcd").warning(
        "on-device FFT projection unavailable on this backend (%s); "
        "falling back to phase-list sums for this process", e)


def _mom_indices(lat: Lattice, momenta: np.ndarray):
    m = np.asarray(momenta, dtype=np.int64)
    return (jnp.asarray(m[:, 2] % lat.Lz), jnp.asarray(m[:, 1] % lat.Ly),
            jnp.asarray(m[:, 0] % lat.Lx))


def _weighted_fft_project_all(D: jax.Array, gr: jax.Array, gi: jax.Array,
                              iz, iy, ix, *, lat: Lattice,
                              shift) -> jax.Array:
    """FFT flavor of _weighted_project_all — same [G, 2ri, n, T] output,
    one spatial FFT per (gamma, ri-plane) instead of an n x V phase
    einsum (the reference's cuFFT projection, C25)."""
    from ..fields import eo_to_full
    sub = "agh,pghtzs->aptzs"
    wre = (jnp.einsum(sub, gr, D[0], precision=_PREC)
           - jnp.einsum(sub, gi, D[1], precision=_PREC))
    wim = (jnp.einsum(sub, gr, D[1], precision=_PREC)
           + jnp.einsum(sub, gi, D[0], precision=_PREC))
    T, Z, Y, Xh = lat.Lt, lat.Lz, lat.Ly, lat.Lx // 2
    G = wre.shape[0]
    fr = eo_to_full(wre.reshape(G, 2, T, Z, Y, Xh), lat, site_ndim_left=1)
    fi = eo_to_full(wim.reshape(G, 2, T, Z, Y, Xh), lat, site_ndim_left=1)
    if any(shift):
        roll = (-shift[0], -shift[1], -shift[2])
        fr = jnp.roll(fr, roll, axis=(2, 3, 4))
        fi = jnp.roll(fi, roll, axis=(2, 3, 4))
    F = (jnp.fft.fftn(fr.astype(jnp.complex64), axes=(2, 3, 4))
         + 1j * jnp.fft.fftn(fi.astype(jnp.complex64), axes=(2, 3, 4)))
    g = F[:, :, iz, iy, ix]                        # [G, T, n]
    g = jnp.moveaxis(g, 1, 2)                      # [G, n, T]
    return jnp.stack([jnp.real(g), jnp.imag(g)], axis=1)


@partial(jax.jit, static_argnames=("lat", "shift"))
def _ultralocal_fft_kernel(bwd_pk, fwd_pk, gr, gi, iz, iy, ix, *, lat,
                           shift):
    return _weighted_fft_project_all(
        bilinear_density_pk(bwd_pk, fwd_pk), gr, gi, iz, iy, ix,
        lat=lat, shift=shift)


def _gamma_stack(gammas: dict, dtype=np.float32):
    mats = np.stack([np.asarray(g, dtype=np.complex64)
                     for g in gammas.values()])
    return (jnp.asarray(mats.real.astype(dtype)),
            jnp.asarray(mats.imag.astype(dtype)))


def threep_ultralocal_pk(bwd_pk: jax.Array, fwd_pk: jax.Array,
                         gammas: dict, lat: Lattice, momenta: np.ndarray,
                         src_pos=(0, 0, 0, 0)) -> dict:
    """C3 for a dict of ultra-local gamma insertions, fully on device in
    ONE fused jit (bilinear density -> all gamma weights -> momentum
    projection; a single HBM pass over the propagator pair).

    bwd_pk/fwd_pk: packed device propagators.  Returns {name: [n_mom, T]}
    complex arrays (tiny; safe to np.asarray).  Matches
    phys/threep.threep_ultralocal on the same inputs.
    """
    gr, gi = _gamma_stack(gammas)
    sp = (src_pos[3], src_pos[2], src_pos[1])
    out = None
    if _use_fft(momenta):
        iz, iy, ix = _mom_indices(lat, momenta)
        try:
            out = np.asarray(_ultralocal_fft_kernel(
                bwd_pk, fwd_pk, gr, gi, iz, iy, ix, lat=lat,
                shift=(int(sp[2]), int(sp[1]), int(sp[0]))))
        except Exception as e:            # pragma: no cover - TPU only
            _note_fft_failure(e)
    if out is None:
        ph = jnp.asarray(momentum_phases_pk(lat, momenta, sp),
                         dtype=bwd_pk.dtype)
        out = _ultralocal_kernel(bwd_pk, fwd_pk, gr, gi, ph)
    return {name: _fetch_complex(out[i])
            for i, name in enumerate(gammas)}


# --- covariant derivative in packed layout ----------------------------------

def _su3_mul_planes(ur: jax.Array, ui: jax.Array, fr: jax.Array,
                    fi: jax.Array, dagger: bool):
    """out[i] = sum_j U[i,j] f[j] (or U^dag) on plane stacks.

    ur/ui: [3, 3, T, Z, S]; fr/fi: [4(s), 3(j), 4, 3, T, Z, S] with the
    color axis at position 1.  Unrolled 3x3 — elementwise only."""
    out_r, out_i = [], []
    for i in range(3):
        accr = acci = None
        for j in range(3):
            if dagger:
                lr, li = ur[j, i], -ui[j, i]
            else:
                lr, li = ur[i, j], ui[i, j]
            tr = lr * fr[:, j] - li * fi[:, j]
            ti = lr * fi[:, j] + li * fr[:, j]
            accr = tr if accr is None else accr + tr
            acci = ti if acci is None else acci + ti
        out_r.append(accr)
        out_i.append(acci)
    return jnp.stack(out_r, axis=1), jnp.stack(out_i, axis=1)


def cov_shift_pk(u_pk: jax.Array, f_pk: jax.Array, nu: int, sign: int,
                 lat: Lattice, conj_links: bool = False) -> jax.Array:
    """U_nu(x) f(x+nu) (sign=+1) or U_nu(x-nu)^dag f(x-nu) (sign=-1) on a
    packed propagator, acting on the SINK color index (C17 equivalent of
    threep.cov_shift, parity-split).

    u_pk: PACKED gauge [4, 2(par), 3, 3, 2(ri), T, Z, S]
    (utils/packed.pack_gauge — complex arrays cannot be rolled/gathered
    on the axon TPU backend, so the link shifts run on real planes);
    f_pk: [2ri, 2par, 4, 3, 4, 3, T, Z, S].
    """
    ur_all = u_pk[nu, :, :, :, 0]                   # [2par, 3, 3, T, Z, S]
    ui_all = u_pk[nu, :, :, :, 1]
    if conj_links:
        ui_all = -ui_all
    outs = []
    for p in (0, 1):
        # f at the neighbor site (parity 1-p), gathered onto the p grid
        fnb = neighbor(f_pk[:, 1 - p], nu, sign, 1 - p, lat)
        fr, fi = fnb[0], fnb[1]                     # [4,3,4,3,T,Z,S]
        if sign == +1:
            ur, ui = ur_all[p], ui_all[p]           # U_nu(x), x parity p
            rr, ii = _su3_mul_planes(ur, ui, fr, fi, dagger=False)
        else:
            # U_nu(x-nu) lives on parity 1-p; gather it onto the p grid
            wr = neighbor(ur_all[1 - p], nu, -1, 1 - p, lat)
            wi = neighbor(ui_all[1 - p], nu, -1, 1 - p, lat)
            rr, ii = _su3_mul_planes(wr, wi, fr, fi, dagger=True)
        outs.append(jnp.stack([rr, ii]))            # [2ri,4,3,4,3,T,Z,S]
    return jnp.stack(outs, axis=1)                  # [2ri,2par,...]


def cov_deriv_sym_pk(u_pk: jax.Array, f_pk: jax.Array, nu: int,
                     lat: Lattice, conj_links: bool = False) -> jax.Array:
    """Symmetric covariant derivative on the sink index, packed layout:
    (D_nu f)(x) = [U_nu(x) f(x+nu) - U_nu(x-nu)^dag f(x-nu)] / 2."""
    fw = cov_shift_pk(u_pk, f_pk, nu, +1, lat, conj_links)
    bw = cov_shift_pk(u_pk, f_pk, nu, -1, lat, conj_links)
    return 0.5 * (fw - bw)


def proton_seq_source_pk(su_pk: jax.Array, sd_pk: jax.Array, t_sink: int,
                         flavor_leg: str, lat: Lattice,
                         proj: np.ndarray | None = None,
                         snk_mom: np.ndarray | None = None) -> jax.Array:
    """Fixed-sink sequential source, fully on device (C24).

    A_f(x) = dC2(t_sink)/dS_f(x), computed as the gradient of the
    *packed-real* device Wick engine (phys/contract_dev.py): for the
    holomorphic C2(S), dC2/dS = dReC2/dS_re - i dReC2/dS_im, so one real
    jax.grad over the packed planes yields the complex gradient with no
    complex arithmetic on the accelerator.  Matches
    phys/threep.proton_seq_source via prop_to_device.

    t_sink and the sink-momentum phases enter the traced kernel as
    DYNAMIC arguments, so one (remote) compile per (leg, projector)
    serves every sink time, sink momentum, and source position — the
    compile-bound production regime (BASELINE.md: setup is ~97%
    compile on the axon backend).

    Returns the packed seq-source propagator
    [2ri, 2par, 4, 3, 4, 3, T, Z, S] supported on t_sink.
    """
    from ..gammas import PARITY_PLUS
    if proj is None:
        proj = PARITY_PLUS
    mom = np.zeros((1, 3)) if snk_mom is None else np.asarray([snk_mom])
    from .contract_dev import _on_cpu
    fn = _seq_source_jit(lat, flavor_leg, np.asarray(proj),
                         eager=_on_cpu(su_pk, sd_pk))
    ph = _phases_t_slice_pk(lat, mom, int(t_sink))    # [2ri, 2par, Z, S]
    return fn(su_pk, sd_pk, jnp.asarray(ph[0]), jnp.asarray(ph[1]),
              np.int32(t_sink))


def _phases_t_slice_pk(lat: Lattice, mom: np.ndarray,
                       t: int) -> np.ndarray:
    """Packed momentum phases for ONE timeslice: [2ri, 2par, Z, S]
    (the t_sink row of momentum_phases_pk without the O(volume) full
    build — this runs per (t_sink, projector, leg) in the 3pt inner
    loop)."""
    ph = momentum_phases(lat, mom)[0].astype(np.complex64)   # [Z, Y, X]
    sm = (np.asarray(lat.eo_sub_parity)[t] == 1)[:, :, None]  # [Z, Y, 1]
    ph0, ph1 = ph[:, :, 0::2], ph[:, :, 1::2]
    even = np.where(sm, ph1, ph0)
    odd = np.where(sm, ph0, ph1)
    pk = np.stack([even, odd]).reshape(2, lat.Lz,
                                       lat.Ly * lat.Lx // 2)
    return np.stack([pk.real, pk.imag]).astype(np.float32)


_SEQ_JIT: dict = {}


def _seq_source_jit(lat, flavor_leg, proj, eager=False):
    """jit cache for the grad-of-Wick-engine sequential source (one
    compile per (geometry, leg, projector); t_sink + phases dynamic).
    ``eager=True`` skips the jit — on CPU the unrolled-graph compile
    takes minutes while the eager evaluation is fast."""
    key = (lat.dims, flavor_leg, proj.tobytes(), eager)
    if key in _SEQ_JIT:
        return _SEQ_JIT[key]
    from .contract_dev import proton_2pt_site_dev

    def fn(su_pk, sd_pk, phr, phi, t_idx):
        def c2_re(s_var):
            if flavor_leg == "u":
                dens = proton_2pt_site_dev(s_var, sd_pk, proj)
            else:
                dens = proton_2pt_site_dev(su_pk, s_var, proj)
            dr = jax.lax.dynamic_index_in_dim(dens[0], t_idx, axis=1,
                                              keepdims=False)
            di = jax.lax.dynamic_index_in_dim(dens[1], t_idx, axis=1,
                                              keepdims=False)
            return jnp.sum(phr * dr - phi * di)

        s_in = su_pk if flavor_leg == "u" else sd_pk
        gr = jax.grad(c2_re)(s_in)
        return jnp.stack([gr[0], -gr[1]])

    _SEQ_JIT[key] = fn if eager else jax.jit(fn)
    return _SEQ_JIT[key]


def backward_prop_pk(seq_pk: jax.Array, solve_fn_flip_pk=None,
                     g5_diag: np.ndarray | None = None,
                     solve_batch_fn=None) -> jax.Array:
    """B from A on packed fields: 12 flavor-flipped solves on g5 conj(A)
    columns, B = conj(g5 x) (threep.backward_prop, device layout).

    seq_pk: packed seq source [2ri, 2par, 4, 3, 4(beta), 3(b), T, Z, S];
    solve_fn_flip_pk(b_pk [2par, 2ri, 4, 3, T, Z, S]) -> x_pk same
    layout = M_{f'}^{-1} b.  Pass solve_batch_fn(b_pks [12, 2par, ...])
    instead to run the 12 columns as one multi-RHS solve (SURVEY.md
    §8.4).  Returns the packed backward propagator.
    """
    from ..gammas import GAMMA5
    g5 = np.real(np.diag(GAMMA5)) if g5_diag is None else g5_diag
    g5 = jnp.asarray(g5, dtype=seq_pk.dtype)[:, None, None, None, None]
    srcs = []
    for beta in range(4):
        for b in range(3):
            a = seq_pk[:, :, :, :, beta, b]            # [2ri,2par,4,3,T,Z,S]
            # g5 conj(A): conj = negate the im plane, then spin signs
            src = jnp.stack([a[0] * g5, -a[1] * g5])   # [2ri,2par,...]
            srcs.append(jnp.swapaxes(src, 0, 1))       # solver layout
    if solve_batch_fn is not None:
        xs = solve_batch_fn(jnp.stack(srcs))           # [12, 2par, ...]
        xs = [xs[i] for i in range(12)]
    else:
        xs = [solve_fn_flip_pk(s) for s in srcs]
    cols = []
    for x in xs:
        x = jnp.swapaxes(x, 0, 1)
        # conj(g5 x)
        cols.append(jnp.stack([x[0] * g5, -x[1] * g5]))
    cols = jnp.stack(cols)                             # [12,2ri,2par,4,3,T,Z,S]
    cols = cols.reshape(4, 3, *cols.shape[1:])
    # -> [2ri, 2par, 4(snk s), 3, 4(beta), 3(b), T, Z, S]
    return jnp.transpose(cols, (2, 3, 4, 5, 0, 1, 6, 7, 8))


@partial(jax.jit, static_argnames=("nu", "lat"))
def _onederiv_kernel(bwd_pk, fwd_pk, u_pk, gr, gi, ph, *, nu, lat):
    ds = cov_deriv_sym_pk(u_pk, fwd_pk, nu, lat)
    db = cov_deriv_sym_pk(u_pk, bwd_pk, nu, lat, conj_links=True)
    d1 = bilinear_density_pk(bwd_pk, ds)
    d2 = bilinear_density_pk(db, fwd_pk)
    # [G=4, 2ri, n, T] for all four gamma_mu at once (d1/d2 dominate)
    return 0.5 * (_weighted_project_all(d1, gr, gi, ph)
                  - _weighted_project_all(d2, gr, gi, ph))


@partial(jax.jit, static_argnames=("nu", "lat", "shift"))
def _onederiv_fft_kernel(bwd_pk, fwd_pk, u_pk, gr, gi, iz, iy, ix, *,
                         nu, lat, shift):
    ds = cov_deriv_sym_pk(u_pk, fwd_pk, nu, lat)
    db = cov_deriv_sym_pk(u_pk, bwd_pk, nu, lat, conj_links=True)
    d1 = bilinear_density_pk(bwd_pk, ds)
    d2 = bilinear_density_pk(db, fwd_pk)
    w = _weighted_fft_project_all
    return 0.5 * (w(d1, gr, gi, iz, iy, ix, lat=lat, shift=shift)
                  - w(d2, gr, gi, iz, iy, ix, lat=lat, shift=shift))


def _onederiv_dispatch(bwd_pk, fwd_pk, u_pk, gr, gi, lat, momenta, sp,
                       nu):
    """Phase-list or FFT projection per the momentum-list size."""
    if _use_fft(momenta):
        iz, iy, ix = _mom_indices(lat, momenta)
        try:
            return np.asarray(_onederiv_fft_kernel(
                bwd_pk, fwd_pk, u_pk, gr, gi, iz, iy, ix, nu=int(nu),
                lat=lat, shift=(int(sp[2]), int(sp[1]), int(sp[0]))))
        except Exception as e:            # pragma: no cover - TPU only
            _note_fft_failure(e)
    ph = jnp.asarray(momentum_phases_pk(lat, momenta, sp),
                     dtype=fwd_pk.dtype)
    return _onederiv_kernel(bwd_pk, fwd_pk, u_pk, gr, gi, ph,
                            nu=int(nu), lat=lat)


def threep_one_derivative_pk(bwd_pk: jax.Array, fwd_pk: jax.Array,
                             u_pk: jax.Array, mu: int, nu: int,
                             lat: Lattice, momenta: np.ndarray,
                             src_pos=(0, 0, 0, 0)) -> jax.Array:
    """One-derivative insertion gamma_mu D<->_nu, fully on device:
    (1/2)[ B gamma_mu (D_nu S) - (D_nu^T B) gamma_mu S ].  Matches
    phys/threep.threep_one_derivative.  Returns complex [n_mom, T].

    One jitted kernel per nu computes ALL FOUR gamma_mu projections
    (the covariant derivatives and bilinears are the expensive part and
    are shared); mu only selects the returned row, so a 4x4 (mu, nu)
    sweep costs 4 kernel invocations, not 16.
    """
    from ..gammas import GAMMA
    gr, gi = _gamma_stack({m: GAMMA[m] for m in range(4)})
    sp = (src_pos[3], src_pos[2], src_pos[1])
    out = _onederiv_dispatch(bwd_pk, fwd_pk, u_pk, gr, gi, lat, momenta,
                             sp, nu)
    return _fetch_complex(out[int(mu)])


def threep_one_derivative_all_pk(bwd_pk: jax.Array, fwd_pk: jax.Array,
                                 u_pk: jax.Array, lat: Lattice,
                                 momenta: np.ndarray,
                                 src_pos=(0, 0, 0, 0)) -> dict:
    """The full 4x4 (gamma_mu, D_nu) sweep: {"der_g{mu}_D{nu}":
    complex [n_mom, T]} in 4 kernel launches (one per derivative
    direction) — the production path of run_threeptwop."""
    from ..gammas import GAMMA
    gr, gi = _gamma_stack({m: GAMMA[m] for m in range(4)})
    sp = (src_pos[3], src_pos[2], src_pos[1])
    out = {}
    for nu in range(4):
        all_mu = _onederiv_dispatch(bwd_pk, fwd_pk, u_pk, gr, gi, lat,
                                    momenta, sp, nu)
        for mu in range(4):
            out[f"der_g{mu}_D{nu}"] = _fetch_complex(all_mu[mu])
    return out
