"""High-level solve API: the TPU-native `invertQuda`.

Replaces the reference's interface layer for solves
(`lib/interface_quda.cpp:invertQuda` [U]; SURVEY.md C18, §4.2): builds
the precision trio (sloppy operator for the Krylov iteration, f64
packed-real operator for true residuals), runs even-odd preparation,
the mixed-precision solver with defect-correction restarts, and the
solution reconstruction.

Example:
    lat = Lattice((16, 16, 16, 32))
    res = solve_tm(u_pk, b_pk, lat, kappa=0.115, mu=0.05, tol=1e-10)
    x_full = res.x          # [2(parity), 2(ri), 4, 3, T, Z, S] f64
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .lattice import Lattice
from .operators import PackedTMOperatorPC
from .solvers.bicgstab import bicgstab
from .solvers.cg import _cg_cycle, CGResult
from .solvers.reductions import norm2


class SolveResult(NamedTuple):
    x: jax.Array          # [2(par), 2(ri), 4, 3, T, Z, S] in hp dtype
    relres: jax.Array     # certified true residual of Mhat x_e = bhat (f64)
    iters: jax.Array


def _refined_solve(pc_sloppy, pc_hp, u_s, u_hp, bhat_hp, *, tol, maxiter,
                   inner_tol, solver, x0=None):
    """Defect-correction loop: sloppy Krylov inner, f64 true residuals.

    u_s / u_hp are opaque operator operands (a gauge array, or the
    (gauge, clover...) tuple of PackedTMCloverOperatorPC).  x0: warm
    start (defect correction restarts exactly from any iterate — used
    to chunk very long solves into bounded XLA executions)."""
    bsq = norm2(bhat_hp)
    tol2 = (tol * tol) * bsq
    sdt = jax.tree_util.tree_leaves(u_s)[0].dtype

    def inner(r_s, budget):
        if solver == "bicgstab":
            res = bicgstab(lambda x: pc_sloppy.apply(u_s, x), r_s,
                           tol=inner_tol, maxiter=budget)
            return res.x, res.iters
        # CG on the normal equations
        bn = pc_sloppy.apply_dagger(u_s, r_s)
        dx, _, k = _cg_cycle(
            lambda x: pc_sloppy.apply_dagger(u_s, pc_sloppy.apply(u_s, x)),
            bn, jnp.zeros_like(bn),
            (inner_tol * inner_tol) * norm2(bn), budget)
        return dx, 2 * k + 1

    def cond(st):
        x, rsq, k, nref = st
        return jnp.logical_and(jnp.logical_and(rsq > tol2, k < maxiter),
                               nref < 40)

    def body(st):
        x, rsq, k, nref = st
        r_hp = bhat_hp - pc_hp.apply(u_hp, x)
        dx, used = inner(r_hp.astype(sdt), maxiter - k)
        x = x + dx.astype(x.dtype)
        r_new = bhat_hp - pc_hp.apply(u_hp, x)
        return (x, norm2(r_new), k + used + 2, nref + 1)

    if x0 is None:
        x0 = jnp.zeros_like(bhat_hp)
        rsq0 = bsq * jnp.float64(4.0)
    else:
        x0 = x0.astype(bhat_hp.dtype)
        rsq0 = norm2(bhat_hp - pc_hp.apply(u_hp, x0))
    st = (x0, rsq0, jnp.int32(0), jnp.int32(0))
    x, rsq, k, _ = jax.lax.while_loop(cond, body, st)
    return x, jnp.sqrt(rsq / jnp.maximum(bsq, 1e-300)), k


def make_clover_fields(u_pk: jax.Array, lat: Lattice, *, kappa: float,
                       mu: float, csw: float):
    """One-time clover construction for PackedTMCloverOperatorPC: the
    A blocks (both parities) and the twisted odd-parity inverses for
    both flavors, all packed (reference computeClover + cloverInvert
    [U]; SURVEY.md C4).  Returns (cl_pk, clinv_plus, clinv_minus)."""
    from .fields import ODD
    from .ops.clover import clover_blocks, clover_twist_inverse
    from .utils.packed import pack_clover, unpack_gauge
    u32 = u_pk.astype(jnp.float32)
    a = clover_blocks(unpack_gauge(u32), lat, kappa, csw)
    cl_pk = jnp.stack([pack_clover(a[0]), pack_clover(a[1])])
    clinv_p = pack_clover(clover_twist_inverse(a, kappa, mu, +1, ODD))
    clinv_m = pack_clover(clover_twist_inverse(a, kappa, mu, -1, ODD))
    return cl_pk, clinv_p, clinv_m


def solve_tm(u_pk: jax.Array, b_pk: jax.Array, lat: Lattice, *,
             kappa: float, mu: float, flavor: int = +1,
             tol: float = 1e-10, maxiter: int = 5000,
             inner_tol: float = 1e-5, solver: str = "cg",
             sloppy_dtype=jnp.float32, backend: str = "pallas",
             interpret: bool = False, csw: float = 0.0,
             clover=None, t_boundary: int = -1,
             hp_gauge: str = "float64",
             x0_e: jax.Array | None = None) -> SolveResult:
    """Solve the full (two-parity) twisted-mass(-clover) system M x = b.

    u_pk: packed gauge [4,2,3,3,2,T,Z,S] (any float dtype; cast as needed).
    b_pk: packed source [2(par), 2(ri), 4, 3, T, Z, S].
    solver: "cg" (normal equations) or "bicgstab" (direct on Mhat).
    csw != 0 solves the twisted-CLOVER system (BASELINE config 2); pass
    ``clover = make_clover_fields(...)`` to amortize the one-time clover
    construction across solves (built here otherwise).
    Residuals are certified with the f64 packed operator (SURVEY.md §8.3
    hard part #1); tol is on the *even-odd preconditioned* system.
    hp_gauge="float32" keeps the certification operator's gauge at f32
    (spinors stay f64): when the gauge is NATIVELY f32 this is exact —
    f32 entries promote exactly into the f64 hop products (same
    reasoning as mg/dsolve.solve_certified) — and it saves the 6.1 GB
    f64 gauge copy, which is what makes the 48^3x96 flagship volume
    fit one v5e comfortably.
    Do NOT use it to truncate a genuinely f64 gauge (ADVICE r3: that
    floors the certified residual at the f32 rounding, ~1e-7).
    x0_e: warm start for the even-parity Schur iterate (e.g. a previous
    SolveResult's x[0]) — lets callers chunk a very long solve into
    bounded XLA executions (the remote TPU worker kills executions
    running longer than ~minutes; see BASELINE.md round-5 crash record).
    """
    hp = jnp.float64
    hp_g = jnp.float64 if hp_gauge == "float64" else jnp.float32
    if csw != 0.0:
        from .operators import PackedTMCloverOperatorPC
        if clover is None:
            clover = make_clover_fields(u_pk, lat, kappa=kappa, mu=mu,
                                        csw=csw)
        pc_s = PackedTMCloverOperatorPC(lat, kappa=kappa, mu=mu, csw=csw,
                                        flavor=flavor, backend=backend,
                                        interpret=interpret,
                                        t_boundary=t_boundary)
        pc_hp = PackedTMCloverOperatorPC(lat, kappa=kappa, mu=mu, csw=csw,
                                         flavor=flavor, backend="xla")
        u_s = jax.tree_util.tree_map(
            lambda a: a.astype(sloppy_dtype), (u_pk, *clover))
        u_hp = jax.tree_util.tree_map(
            lambda a: a.astype(hp_g), (u_pk, *clover))
    else:
        pc_s = PackedTMOperatorPC(lat, kappa=kappa, mu=mu, flavor=flavor,
                                  backend=backend, interpret=interpret,
                                  t_boundary=t_boundary)
        pc_hp = PackedTMOperatorPC(lat, kappa=kappa, mu=mu, flavor=flavor,
                                   backend="xla")
        u_s = u_pk.astype(sloppy_dtype)
        u_hp = u_pk.astype(hp_g)
    b_hp = b_pk.astype(hp)

    bhat = pc_hp.prepare(u_hp, b_hp)
    x_e, relres, iters = _refined_solve(
        pc_s, pc_hp, u_s, u_hp, bhat, tol=tol, maxiter=maxiter,
        inner_tol=inner_tol, solver=solver, x0=x0_e)
    x = pc_hp.reconstruct(u_hp, x_e, b_hp)
    return SolveResult(x=x, relres=relres, iters=iters)


def solve_tm_sharded(op_s, op_hp, fields_s, fields_hp, b_pk: jax.Array,
                     *, tol: float = 1e-10, maxiter: int = 5000,
                     inner_tol: float = 1e-5,
                     solver: str = "cg") -> SolveResult:
    """Mixed-precision solve of the full TM(-clover) system on a
    MULTI-CHIP mesh (the config-5 sharded solve path; reference:
    `invertQuda` under `mpirun --gridsize` [U], SURVEY.md §4.2/§6.8).

    op_s: parallel.sharded.ShardedTMOperatorPC or
    ShardedTMCloverOperatorPC (the sloppy iteration operator, fused
    kernels); op_hp: its dtype-generic twin for the f64 certification
    (overlap=True, backend="xla" — the Pallas kernel computes in f32).
    fields_s / fields_hp: their operand pytrees (extended gauge
    [+ clover]) in sloppy / f64 dtypes; b_pk: sharded packed source
    [2(par), 2(ri), 4, 3, T, Z, S].
    """
    hp = jnp.float64
    b_hp = b_pk.astype(hp)
    bhat = op_hp.prepare(fields_hp, b_hp)
    x_e, relres, iters = _refined_solve(
        op_s, op_hp, fields_s, fields_hp, bhat, tol=tol, maxiter=maxiter,
        inner_tol=inner_tol, solver=solver)
    x = op_hp.reconstruct(fields_hp, x_e, b_hp)
    return SolveResult(x=x, relres=relres, iters=iters)


def solve_ndeg_tm_sharded(op_s, op_hp, fields_s, fields_hp,
                          b_pk: jax.Array, *, tol: float = 1e-10,
                          maxiter: int = 5000,
                          inner_tol: float = 1e-5) -> SolveResult:
    """Multi-chip twin of solve_ndeg_tm: mixed-precision solve of the
    full NON-DEGENERATE doublet system on a LatticeMesh (reference: the
    heavy s/c `invertQuda` calls under `mpirun --gridsize` [U]).

    op_s / op_hp: parallel.sharded.ShardedNdegTMOperatorPC (sloppy
    iteration operator / dtype-generic f64 certification twin,
    overlap=True + backend="xla" for the latter); b_pk: sharded packed
    doublet [2(fl), 2(par), 2(ri), 4, 3, T, Z, S].  The solver is CG on
    the normal equations (Mhat_nd is gamma5-tau1-Hermitian, not
    Hermitian) — the same defect-correction structure as solve_tm, so
    this delegates to it.
    """
    return solve_tm_sharded(op_s, op_hp, fields_s, fields_hp, b_pk,
                            tol=tol, maxiter=maxiter,
                            inner_tol=inner_tol, solver="cg")


def solve_ndeg_tm(u_pk: jax.Array, b_pk: jax.Array, lat: Lattice, *,
                  kappa: float, mubar: float, epsbar: float,
                  tol: float = 1e-10, maxiter: int = 5000,
                  inner_tol: float = 1e-5, sloppy_dtype=jnp.float32,
                  backend: str = "pallas", interpret: bool = False,
                  t_boundary: int = -1) -> SolveResult:
    """Solve the full NON-DEGENERATE twisted-mass doublet system
    M_nd chi = b (heavy s/c pair; reference
    `dslash_ndeg_twisted_mass.cu` solves via `invertQuda` with
    QUDA_TWIST_NONDEG_DOUBLET [U]; SURVEY.md C5).

    b_pk: packed doublet [2(flavor), 2(par), 2(ri), 4, 3, T, Z, S].
    Same mixed-precision defect-correction structure as solve_tm (CG on
    the normal equations of the even-odd Schur complement; f64
    certification).
    """
    from .operators import PackedNdegTMOperatorPC
    hp = jnp.float64
    pc_s = PackedNdegTMOperatorPC(lat, kappa=kappa, mubar=mubar,
                                  epsbar=epsbar, backend=backend,
                                  interpret=interpret,
                                  t_boundary=t_boundary)
    pc_hp = PackedNdegTMOperatorPC(lat, kappa=kappa, mubar=mubar,
                                   epsbar=epsbar, backend="xla")
    u_s = u_pk.astype(sloppy_dtype)
    u_hp = u_pk.astype(hp)
    b_hp = b_pk.astype(hp)
    bhat = pc_hp.prepare(u_hp, b_hp)
    x_e, relres, iters = _refined_solve(
        pc_s, pc_hp, u_s, u_hp, bhat, tol=tol, maxiter=maxiter,
        inner_tol=inner_tol, solver="cg")
    x = pc_hp.reconstruct(u_hp, x_e, b_hp)
    return SolveResult(x=x, relres=relres, iters=iters)


def full_system_relres(u_pk: jax.Array, b_pk: jax.Array, x_pk: jax.Array,
                       lat: Lattice, *, kappa: float, mu: float,
                       flavor: int = +1, csw: float = 0.0,
                       clover_pk: jax.Array | None = None) -> float:
    """Certified f64 relative residual |b - M x| / |b| of the FULL
    (two-parity) TM(-clover) system on packed fields
    [2(par), 2(ri), 4, 3, T, Z, S].

    The verification operator the CLI reports against (reference: the
    final true-residual check in `interface_quda.cpp:invertQuda` [U]);
    honors csw so a twisted-clover solve is certified against the
    twisted-CLOVER operator, never silently the plain-TM one.
    clover_pk: packed A blocks [2par, 2ri, 2chir, 6, 6, T, Z, S] (built
    here from u_pk when csw != 0 and not given).
    """
    from .mg.device import DeviceFineCloverLevel, DeviceFineLevel
    u32 = u_pk.astype(jnp.float32)
    if csw != 0.0:
        if clover_pk is None:
            from .ops.clover import clover_blocks
            from .utils.packed import pack_clover, unpack_gauge
            a = clover_blocks(unpack_gauge(u32), lat, kappa, csw)
            clover_pk = jnp.stack([pack_clover(a[0]), pack_clover(a[1])])
        lv = DeviceFineCloverLevel(lat, u32, clover_pk, kappa, mu,
                                   csw=csw, flavor=flavor, backend="xla")
    else:
        lv = DeviceFineLevel(lat, u32, kappa, mu, flavor, backend="xla")
    b64 = jnp.swapaxes(b_pk.astype(jnp.float64), 0, 1)
    x64 = jnp.swapaxes(x_pk.astype(jnp.float64), 0, 1)

    @jax.jit
    def rel(lvl, x, b):
        r = b - lvl.apply(x)
        from .utils import pkalg as pkg
        return jnp.sqrt(pkg.norm2(r, dtype=jnp.float64) /
                        jnp.maximum(pkg.norm2(b, dtype=jnp.float64),
                                    1e-300))

    return float(rel(lv, x64, b64))


class EigCGSolver:
    """Stateful incremental-eigCG solver for right-hand-side SEQUENCES
    (the 12-column propagator workload; reference
    `QUDA_INC_EIGCG_INVERTER` [U], SURVEY.md C11): each solve runs
    deflated CG on the even-odd normal operator, harvests low eigenpairs
    of M^dag M (solvers/eigcg.py), and grows a deflation space that cuts
    the iteration count of every subsequent column.  The f64 defect
    correction around the f32 inner solves certifies the true residual
    (same discipline as solve_tm).

    One instance per (gauge, flavor) — the deflation space belongs to
    that operator.
    """

    def __init__(self, u_pk: jax.Array, lat: Lattice, *, kappa: float,
                 mu: float, flavor: int = +1, nev: int = 8, m: int = 24,
                 max_space: int = 96, backend: str = "pallas",
                 interpret: bool = False, t_boundary: int = -1):
        self.lat = lat
        self.nev, self.m, self.max_space = nev, m, max_space
        self.pc32 = PackedTMOperatorPC(lat, kappa=kappa, mu=mu,
                                       flavor=flavor, backend=backend,
                                       interpret=interpret,
                                       t_boundary=t_boundary)
        self.pc_hp = PackedTMOperatorPC(lat, kappa=kappa, mu=mu,
                                        flavor=flavor, backend="xla")
        self.u32 = u_pk.astype(jnp.float32)
        self.u_hp = u_pk.astype(jnp.float64)
        self._init_jits()

    def _init_jits(self):
        from .solvers.eigcg import EigCGSpace
        self._normal = jax.jit(self.pc32.normal)
        self._mdag = jax.jit(self.pc32.apply_dagger)
        self._prep = jax.jit(self.pc_hp.prepare)
        self._recon = jax.jit(self.pc_hp.reconstruct)

        @jax.jit
        def _resid(u_hp, x, bhat):
            r = bhat - self.pc_hp.apply(u_hp, x)
            return r, norm2(r)

        self._resid = _resid
        self.space = EigCGSpace.empty()

    def _apply_a(self, v):
        return self._normal(self.u32, v)

    def solve(self, b_pk: jax.Array, *, tol: float = 1e-10,
              inner_tol: float = 1e-5, maxiter: int = 2000,
              max_refine: int = 10) -> SolveResult:
        from .solvers.eigcg import eigcg
        b_hp = b_pk.astype(jnp.float64)
        bhat = self._prep(self.u_hp, b_hp)
        bsq = float(norm2(bhat))
        x = jnp.zeros_like(bhat)
        total = 0
        rel = 1.0
        for _ in range(max_refine):
            r, rsq = self._resid(self.u_hp, x, bhat)
            rel = (float(rsq) / max(bsq, 1e-300)) ** 0.5
            if rel <= tol:
                break
            rhs32 = self._mdag(self.u32, r.astype(jnp.float32))
            res = eigcg(self._apply_a, rhs32, nev=self.nev, m=self.m,
                        tol=inner_tol, maxiter=maxiter, space=self.space)
            self.space.absorb(self._apply_a, res.ritz,
                              max_k=self.max_space)
            total += res.iters
            x = x + res.x.astype(jnp.float64)
        else:  # max_refine exhausted: certify the final iterate
            _, rsq = self._resid(self.u_hp, x, bhat)
            rel = (float(rsq) / max(bsq, 1e-300)) ** 0.5
        x_full = self._recon(self.u_hp, x, b_hp)
        return SolveResult(x=x_full, relres=jnp.asarray(rel),
                           iters=jnp.asarray(total))


class ShardedEigCGSolver(EigCGSolver):
    """Incremental eigCG over a multi-chip LatticeMesh (SURVEY.md C20:
    the reference ran eigCG under full MPI decomposition [U]
    lib/inv_eigcg_quda.cpp; here the operator applies are the shard_map
    sharded TM operator and every field — iterates, residuals, the
    harvested deflation basis — carries the mesh sharding end to end).

    eigCG's host side is representation-agnostic (solvers/eigcg.py works
    through apply_a + packed-real dots, which GSPMD partitions), so the
    multi-chip form differs from the single-chip one only in which
    operator pair it binds.  Pass mesh-sharded sources (LatticeMesh
    sharding on the trailing (T, Z, S) axes) to :meth:`solve`.
    """

    def __init__(self, u_pk: jax.Array, lat: Lattice, lmesh, *,
                 kappa: float, mu: float, flavor: int = +1, nev: int = 8,
                 m: int = 24, max_space: int = 96, backend: str = "xla",
                 overlap: bool | None = None):
        import dataclasses as _dc

        from .parallel.sharded import ShardedTMOperatorPC
        self.lat = lat
        self.nev, self.m, self.max_space = nev, m, max_space
        if overlap is None:
            # xla interior IS the overlap form; y-sharding has no fused
            # halo mode (same policy as cli.common._static_policy)
            overlap = backend == "xla" or lmesh.ny > 1
        self.pc32 = ShardedTMOperatorPC(lat, lmesh, kappa=kappa, mu=mu,
                                        flavor=flavor, backend=backend,
                                        overlap=overlap)
        self.pc_hp = _dc.replace(self.pc32, backend="xla", overlap=True)
        # Shard the gauge at its NATIVE dtype and only then derive the
        # f32 sloppy copy: truncating to f32 before building u_hp would
        # floor the f64 defect-correction/certification residual at the
        # f32 rounding of the gauge (~1e-7) even when tol is tighter
        # (matches the single-chip EigCGSolver, which keeps the
        # full-precision gauge for the certification operator).
        u_ext_hp = self.pc32.extend_gauge(
            lmesh.shard_gauge(u_pk)).astype(jnp.float64)
        self.u32 = u_ext_hp.astype(jnp.float32)
        self.u_hp = u_ext_hp
        self._init_jits()


def setup_multigrid(u_pk: jax.Array, lat: Lattice, *, kappa: float,
                    mu: float, flavor: int = +1, csw: float = 0.0,
                    clover_pk: jax.Array | None = None, params=None,
                    backend: str = "pallas", interpret: bool = False,
                    verbose: bool = False):
    """Build the device-resident MG hierarchy (the TPU-native
    `newMultigridQuda` [U]; SURVEY.md §4.3).  Reuse the returned object
    across solves — setup dominates a single solve's cost.

    csw != 0 coarsens the twisted-clover operator; pass `clover_pk`
    (packed A blocks, both parities: stack of utils.packed.pack_clover
    over CloverData.a_blocks) to skip recomputing the clover term.
    """
    from .mg.device import DeviceFineCloverLevel, DeviceFineLevel
    from .mg.dsolve import DeviceMG, DeviceMGParams
    u32 = u_pk.astype(jnp.float32)
    if csw != 0.0:
        if clover_pk is None:
            from .ops.clover import clover_blocks
            from .utils.packed import pack_clover, unpack_gauge
            a = clover_blocks(unpack_gauge(u32), lat, kappa, csw)
            clover_pk = jnp.stack([pack_clover(a[0]), pack_clover(a[1])])
        fine = DeviceFineCloverLevel(lat, u32, clover_pk, kappa, mu,
                                     csw=csw, flavor=flavor,
                                     backend=backend, interpret=interpret)
    else:
        fine = DeviceFineLevel(lat, u32, kappa, mu, flavor,
                               backend=backend, interpret=interpret)
    return DeviceMG(fine, params or DeviceMGParams(), verbose=verbose)


def solve_tm_mg(mg, b_pk: jax.Array, *, tol: float = 1e-10,
                inner_tol: float | None = None, maxiter: int = 200,
                verbose: bool = False, hp: str = "float64") -> SolveResult:
    """MG-preconditioned solve of the *full* (two-parity) TM system
    M x = b on the device hierarchy from :func:`setup_multigrid`.

    b_pk: packed source [2(par), 2(ri), 4, 3, T, Z, S]; returns x in the
    same parity-first layout (f64), with the certified true residual.
    hp="df64" certifies with the on-chip double-single operator (for
    volumes where the emulated-f64 fine operator exceeds HBM).
    """
    # pass the swapped source WITHOUT a local binding: at HBM-bound
    # volumes every extra live fine field matters, and solve_certified
    # frees its own reference once the hp system is formed
    x, relres, iters = mg.solve_certified(
        jnp.swapaxes(b_pk.astype(jnp.float32), 0, 1),
        tol=tol, inner_tol=inner_tol, maxiter=maxiter,
        verbose=verbose, hp=hp)
    return SolveResult(x=jnp.swapaxes(x, 0, 1), relres=relres,
                       iters=iters)


def solve_tm_mg_batch(mg, b_pks: jax.Array, *, tol: float = 1e-10,
                      inner_tol: float | None = None, maxiter: int = 200,
                      verbose: bool = False) -> SolveResult:
    """Batched multi-RHS MG solve: the 12 propagator columns as ONE
    vmapped GCR stream (SURVEY.md §8.4, the TPU win over the reference's
    sequential solves; mg/dsolve.DeviceMG.solve_certified_batch).

    b_pks: [n_rhs, 2(par), 2(ri), 4, 3, T, Z, S].  Returns SolveResult
    with x [n_rhs, 2(par), ...] f64 and per-RHS certified relres.
    """
    b_mg = jnp.swapaxes(b_pks.astype(jnp.float32), 1, 2)
    x, relres, iters = mg.solve_certified_batch(
        b_mg, tol=tol, inner_tol=inner_tol, maxiter=maxiter,
        verbose=verbose)
    return SolveResult(x=jnp.swapaxes(x, 1, 2), relres=relres,
                       iters=iters)


def solve_tm_batch(u_pk: jax.Array, b_pks: jax.Array, lat: Lattice,
                   **kw) -> SolveResult:
    """Batched multi-RHS mixed-precision solve: vmap of solve_tm over a
    leading RHS axis (one traced iteration stream, per-RHS scalars; the
    inner lax.while_loops run until every column converges).

    b_pks: [n_rhs, 2(par), 2(ri), 4, 3, T, Z, S]; kwargs as solve_tm.
    """
    clover = kw.pop("clover", None)
    if kw.get("csw", 0.0) != 0.0 and clover is None:
        clover = make_clover_fields(u_pk, lat, kappa=kw["kappa"],
                                    mu=kw["mu"], csw=kw["csw"])

    def one(b_pk):
        return solve_tm(u_pk, b_pk, lat, clover=clover, **kw)

    return jax.vmap(one)(b_pks)


def solve_tm_musweep(u_pk: jax.Array, b_pk: jax.Array, lat: Lattice, *,
                     kappa: float, mu_list, tol: float = 1e-8,
                     maxiter: int = 4000, backend: str = "pallas",
                     lmesh=None):
    """Twisted-mass quark-MASS SWEEP: M(mu_i) x_i = b for every mu from
    ONE multi-shift CG Krylov space.

    gamma5-hermiticity of the Wilson part gives the exact identity

        M(mu)^dag M(mu) = M_W^dag M_W + (2 kappa mu)^2

    (the cross terms cancel: M_W^dag g5 = g5 M_W), and the same holds
    for the LEFT normal operator M(mu) M(mu)^dag = M_W M_W^dag +
    (2 kappa mu)^2 — so the normal equations of ALL masses are SHIFTS
    of one Hermitian PD operator: one Krylov space, two hop applies per
    iteration for any number of masses (the reference's
    `inv_multi_cg_quda.cpp` mass-tuning use case [U]; SURVEY.md C11).
    Solve (M_W M_W^dag + sigma_i) y_i = b, then
    x_i = M(mu_i)^dag y_i = g5 M(-mu_i) g5 y_i.

    u_pk [4,2,3,3,2,T,Z,S]; b_pk solver layout [2par, 2ri, 4, 3, T, Z,
    S].  Returns (xs [n_mu, *b_pk.shape] f32 in mu_list order, relres
    [n_mu] f64 CERTIFIED true residuals |b - M(mu_i) x_i| / |b|,
    iters).  The iterated multishift tolerance is what `tol` controls;
    the returned residuals are the independent f64 certificates.

    lmesh: a parallel.mesh.LatticeMesh runs the sweep MULTI-CHIP — the
    matvec goes through mg.shard.ShardedFineLevel (per-shard kernels +
    overlap halo repairs), the Krylov scalars auto-psum across shards;
    same one-Krylov-space algebra (reference `inv_multi_cg_quda.cpp`
    under --gridsize [U]).
    """
    from functools import partial

    from .mg.device import DeviceFineLevel
    from .operators import _G5_DIAG
    from .solvers.multishift import multishift_cg

    mu_list = tuple(float(m) for m in mu_list)
    order = sorted(range(len(mu_list)), key=lambda i: mu_list[i] ** 2)
    shifts = tuple((2.0 * kappa * mu_list[i]) ** 2 for i in order)

    if lmesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from .mg.shard import ShardedFineLevel
        level0 = ShardedFineLevel.build(
            lat, lmesh, u_pk.astype(jnp.float32), kappa, 0.0,
            backend=backend)
        # solver layout [2par, 2ri, 4, 3, T, Z, S]: one leading axis
        # over the rank-6 spinor spec
        b_pk = jax.device_put(b_pk, NamedSharding(
            lmesh.mesh, P(None, *lmesh.spinor_spec())))
    else:
        level0 = DeviceFineLevel(lat, u_pk.astype(jnp.float32), kappa,
                                 mu=0.0, backend=backend)

    @partial(jax.jit, static_argnames=("shifts_", "mus_", "tol_",
                                       "maxiter_"))
    def _sweep(level, b_a, shifts_, mus_, tol_, maxiter_):
        g5 = jnp.asarray(_G5_DIAG, jnp.float32).reshape(1, 1, 4, 1, 1,
                                                        1, 1)

        def matvec(v):  # M_W M_W^dag = M g5 M g5  (mu = 0): the x =
            # M^dag y substitution needs the LEFT normal operator,
            # M(mu) M(mu)^dag = M_W M_W^dag + (2 kappa mu)^2 —
            # also exactly shifted (the g5 cross terms cancel)
            return level.apply(g5 * level.apply(g5 * v))

        b_t = jnp.swapaxes(b_a.astype(jnp.float32), 0, 1)
        res = multishift_cg(matvec, b_t, shifts_, tol=tol_,
                            maxiter=maxiter_)
        xs = []
        for i, mu_i in enumerate(mus_):
            lv = dataclasses.replace(level, mu=-mu_i)
            x_t = g5 * lv.apply(g5 * res.xs[i])
            xs.append(jnp.swapaxes(x_t, 0, 1))
        return jnp.stack(xs), res.iters

    mus_sorted = tuple(mu_list[i] for i in order)
    xs_sorted, iters = _sweep(level0, b_pk, shifts, mus_sorted, tol,
                              maxiter)
    inv = [0] * len(order)
    for pos, i in enumerate(order):
        inv[i] = pos
    xs = jnp.stack([xs_sorted[inv[i]] for i in range(len(mu_list))])
    relres = jnp.stack([
        jnp.asarray(full_system_relres(u_pk, b_pk, xs[i], lat,
                                       kappa=kappa, mu=mu_list[i]))
        for i in range(len(mu_list))])
    return xs, relres, iters
