"""Device-resident hadron contractions (packed-real, unrolled).

TPU-native contraction engine for the QKXTM two-point kernels (SURVEY.md
C23): the axon backend supports neither complex einsums nor small-minor-
axis layouts, so the per-site spin-color tensor algebra is *unrolled*
from the sparse gamma/epsilon tables into streaming vector ops over the
packed propagator planes — the same discipline as the Dslash kernels,
applied to Wick contractions.  phys/contract.py (host complex einsums)
remains the oracle.

Propagator device layout:
    ``[2(ri), 2(par), 4(snk s), 3(snk c), 4(src s), 3(src c), T, Z, S]``
f32, S = Y * X//2.  One "plane" (a fixed spin-color component) is the
[2par, T, Z, S] pair of real arrays — all small axes are unrolled, site
axes stream.

The proton evaluation is the factored diquark form (ops ~4k plane
products instead of ~80k for the raw 6-tensor sum):

  W[r,c,v,f]   = sum_{s,u} G[r,s] Sd[s,c,u,f] Gt[u,v]     (G = C g5)
  ta: A1[a,d]  = sum_{eps pairs, r, v} Su[r,b,v,e] W[r,c,v,f]
      ta       = sum proj[n,m] Su[m,a,n,d] A1[a,d]
  tb (per n,v): B[a,e] = sum_{eps pairs, r} Su[r,b,n,d] W[r,c,v,f]
      tb      += sum_m proj[n,m] Su[m,a,v,e] B[a,e]
  C2 density   = ta - tb
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import eo_to_full, full_to_eo
from ..gammas import CGAMMA5, EPS3, GAMMA5, GAMMA_T, PARITY_PLUS
from ..lattice import Lattice
from ..ops.layout import spinor_from_device, spinor_to_device

_G5D = np.real(np.diag(GAMMA5))


def _gbar(g: np.ndarray) -> np.ndarray:
    return GAMMA_T @ g.conj().T @ GAMMA_T


def _nz(mat, tol=1e-12):
    """[(i, j, coef)] of a small matrix."""
    m = np.asarray(mat)
    return [(i, j, complex(m[i, j])) for i in range(m.shape[0])
            for j in range(m.shape[1]) if abs(m[i, j]) > tol]


def _eps_pairs():
    """[(a, b, c, sign)] nonzeros of epsilon_abc."""
    e = np.asarray(EPS3)
    return [(a, b, c, float(np.real(e[a, b, c])))
            for a in range(3) for b in range(3) for c in range(3)
            if abs(e[a, b, c]) > 1e-12]


# --- packed-plane complex micro-ops ----------------------------------------

def _cmul(p, q):
    """complex plane product: p, q = (re, im) -> (re, im)."""
    return (p[0] * q[0] - p[1] * q[1], p[0] * q[1] + p[1] * q[0])


def _acc(acc, coef: complex, p):
    """acc += coef * p for (re, im) plane pairs; None starts a sum."""
    c = complex(coef)
    if c == 1:
        t = p
    elif c == -1:
        t = (-p[0], -p[1])
    elif c == 1j:
        t = (-p[1], p[0])
    elif c == -1j:
        t = (p[1], -p[0])
    else:
        t = (c.real * p[0] - c.imag * p[1], c.real * p[1] + c.imag * p[0])
    if acc is None:
        return t
    return (acc[0] + t[0], acc[1] + t[1])


# --- layout ----------------------------------------------------------------

def prop_to_device(prop_full: jax.Array, lat: Lattice,
                   dtype=jnp.float32) -> jax.Array:
    """[T,Z,Y,X,4,3,4,3] complex -> packed device layout (module doc)."""
    eo = full_to_eo(prop_full, lat)              # [2,T,Z,Y,Xh,4,3,4,3]
    dev = jnp.moveaxis(eo, (5, 6, 7, 8), (1, 2, 3, 4))
    T, Z = lat.Lt, lat.Lz
    S = lat.Ly * lat.Lx // 2
    dev = dev.reshape(2, 4, 3, 4, 3, T, Z, S)
    # [2ri, 2par, 4, 3, 4, 3, T, Z, S]
    return jnp.stack([jnp.real(dev), jnp.imag(dev)]).astype(dtype)


def density_to_full(dens_pk: jax.Array, lat: Lattice) -> np.ndarray:
    """[2ri, 2par, T, Z, S] -> complex [T, Z, Y, X] on the HOST (full
    site-layout complex arrays may not live on the axon TPU)."""
    d = np.asarray(jax.device_get(dens_pk))
    c = (d[0] + 1j * d[1]).astype(np.complex64)
    Y, Xh = lat.Ly, lat.Lx // 2
    eo = c.reshape(2, lat.Lt, lat.Lz, Y, Xh)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        return np.asarray(eo_to_full(jnp.asarray(eo), lat))


# --- contractions ----------------------------------------------------------

def proton_2pt_site_dev(su: jax.Array, sd: jax.Array,
                        proj: np.ndarray = PARITY_PLUS) -> jax.Array:
    """Projected proton correlator density, packed [2ri, 2par, T, Z, S].

    su/sd: packed device propagators (module doc).  Identical math to
    contract.proton_2pt_site (the CPU oracle) — Wick-contracted uud with
    G = C g5 diquark vertices and the given parity projector.
    """
    g_nz = _nz(CGAMMA5)                      # (r, s, G[r,s])
    gt_nz = _nz(_gbar(CGAMMA5))              # (u, v, Gt[u,v])
    pr_nz = _nz(proj)                        # (n, m, proj[n,m])
    eps = _eps_pairs()

    def SU(m, a, n, d):
        return (su[0, :, m, a, n, d], su[1, :, m, a, n, d])

    def SD(s, c, u, f):
        return (sd[0, :, s, c, u, f], sd[1, :, s, c, u, f])

    # ---- ta: A1[a,d] = sum_{eps pairs, r, v} Su[r,b,v,e] W[r,c,v,f]
    A1 = {}
    for (a, b, c, e1) in eps:
        for (d, e, f, e2) in eps:
            for (r, s, cg) in g_nz:
                for (u, v, cgt) in gt_nz:
                    coef = e1 * e2 * cg * cgt
                    p = _cmul(SU(r, b, v, e), SD(s, c, u, f))
                    A1[(a, d)] = _acc(A1.get((a, d)), coef, p)
    ta = None
    for (n, m, cp) in pr_nz:
        for (a, d), w in A1.items():
            ta = _acc(ta, cp, _cmul(SU(m, a, n, d), w))

    # ---- tb: per (n, v) build B[a,e], contract immediately
    tb = None
    # group projector nonzeros by n for the inner m-sum
    pr_by_n = {}
    for (n, m, cp) in pr_nz:
        pr_by_n.setdefault(n, []).append((m, cp))
    for n, m_list in pr_by_n.items():
        for (u, v, cgt) in gt_nz:
            B = {}
            for (a, b, c, e1) in eps:
                for (d, e, f, e2) in eps:
                    for (r, s, cg) in g_nz:
                        coef = e1 * e2 * cg * cgt
                        p = _cmul(SU(r, b, n, d), SD(s, c, u, f))
                        B[(a, e)] = _acc(B.get((a, e)), coef, p)
            for (m, cp) in m_list:
                for (a, e), w in B.items():
                    tb = _acc(tb, cp, _cmul(SU(m, a, v, e), w))

    return jnp.stack([ta[0] - tb[0], ta[1] - tb[1]])


def meson_2pt_site_dev(s1: jax.Array, s2: jax.Array,
                       gamma: np.ndarray) -> jax.Array:
    """- Tr[Gamma S2 Gammabar g5 S1^dag g5] density, packed layout."""
    gm_nz = _nz(gamma)
    gb_nz = _nz(_gbar(gamma))
    out = None
    for (m, r, cg) in gm_nz:
        for (v, n, cb) in gb_nz:
            coef = -cg * cb * _G5D[n] * _G5D[m]
            for a in range(3):
                for d in range(3):
                    p2 = (s2[0, :, r, a, v, d], s2[1, :, r, a, v, d])
                    p1c = (s1[0, :, m, a, n, d], -s1[1, :, m, a, n, d])
                    out = _acc(out, coef, _cmul(p2, p1c))
    return jnp.stack(out)


# --- high-level: density on device, momentum projection on host ------------

def _project_host(dens_pk, lat, momenta, src_pos):
    """host momentum projection of a device density (the density is tiny
    next to the propagators; complex einsums stay off the TPU)."""
    from .contract import project_momenta
    full = density_to_full(dens_pk, lat)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        return project_momenta(
            jnp.asarray(full), lat, momenta,
            src_pos=(src_pos[3], src_pos[2], src_pos[1]))


_DENS_JIT: dict = {}


def _on_cpu(*arrs) -> bool:
    return all(d.platform == "cpu" for a in arrs for d in a.devices())


def _dens_jit(kind: str, mat: np.ndarray):
    """jit cache for the unrolled density engines (keyed on the constant
    projector / gamma matrix): the axon TPU cannot dispatch the
    thousands of eager plane ops at speed, and jit also lets XLA fuse
    the whole Wick evaluation into a few HBM passes.  (On CPU the same
    jit takes minutes to compile the unrolled graph, so the CPU path
    stays eager — see proton_2pt_dev.)"""
    key = (kind, mat.tobytes())
    if key not in _DENS_JIT:
        if kind == "proton":
            _DENS_JIT[key] = jax.jit(
                lambda su, sd, proj=mat: proton_2pt_site_dev(su, sd, proj))
        else:
            _DENS_JIT[key] = jax.jit(
                lambda s1, s2, g=mat: meson_2pt_site_dev(s1, s2, g))
    return _DENS_JIT[key]


def proton_2pt_dev(su: jax.Array, sd: jax.Array, lat: Lattice,
                   momenta: np.ndarray, src_pos=(0, 0, 0, 0),
                   proj: np.ndarray = PARITY_PLUS) -> jax.Array:
    """[n_mom, T] projected proton two-point function; the contraction
    (jitted Wick engine) AND the momentum projection (C25) stream on the
    device — only the [n_mom, T] correlator crosses to the host."""
    from .threep_dev import project_momenta_pk
    if _on_cpu(su, sd):
        dens = proton_2pt_site_dev(su, sd, proj)
    else:
        dens = _dens_jit("proton", np.asarray(proj))(su, sd)
    return project_momenta_pk(dens, lat, momenta,
                              (src_pos[3], src_pos[2], src_pos[1]))


def neutron_2pt_dev(su: jax.Array, sd: jax.Array, lat: Lattice,
                    momenta: np.ndarray, src_pos=(0, 0, 0, 0),
                    proj: np.ndarray = PARITY_PLUS) -> jax.Array:
    """Neutron two-point function, device engine: the isospin mirror
    of the proton (swap u and d packed propagators; contract.neutron_2pt).
    """
    return proton_2pt_dev(sd, su, lat, momenta, src_pos=src_pos,
                          proj=proj)


def meson_2pt_dev(s1: jax.Array, s2: jax.Array, gamma: np.ndarray,
                  lat: Lattice, momenta: np.ndarray,
                  src_pos=(0, 0, 0, 0)) -> jax.Array:
    from .threep_dev import project_momenta_pk
    if _on_cpu(s1, s2):
        dens = meson_2pt_site_dev(s1, s2, gamma)
    else:
        dens = _dens_jit("meson", np.asarray(gamma))(s1, s2)
    return project_momenta_pk(dens, lat, momenta,
                              (src_pos[3], src_pos[2], src_pos[1]))
