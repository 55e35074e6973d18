"""Run configuration: frozen dataclasses + YAML (the QUDA param structs).

Replaces the reference's QudaGaugeParam / QudaInvertParam /
QudaMultigridParam / qudaQKXTMinfo four-way split ([U] include/quda.h;
SURVEY.md §6.6) with the same factorization: gauge/action, solver, MG,
and physics-measurement parameter groups, loadable from YAML.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional

try:
    import yaml
except Exception:  # pragma: no cover
    yaml = None


@dataclass(frozen=True)
class GaugeParams:
    dims: tuple[int, int, int, int] = (8, 8, 8, 16)  # (Lx, Ly, Lz, Lt)
    config_file: Optional[str] = None    # ILDG/LIME path; None = random
    random_seed: int = 0
    antiperiodic_t: bool = True
    plaquette_check: Optional[float] = None  # expected plaquette (load chk)
    #: ENSEMBLE mode (the reference's per-config production scripting
    #: folded into ONE persistent process so XLA compiles amortize —
    #: setup re-runs per config at warm cost, ~3% of cold): a list of
    #: ILDG paths, or of random seeds for demo/benchmark runs.  The
    #: physics programs loop members; per-member HDF5 outputs get
    #: '.<tag>' inserted before the suffix.
    config_files: tuple = ()
    random_seeds: tuple = ()
    #: gauge fixing applied to the loaded field before boundary phases
    #: (reference gaugeFixingOVR interface / lib/gauge_fix_ovr.cu [U],
    #: SURVEY.md C16): "" = none, "landau" | "coulomb" = checkerboard
    #: overrelaxation (ops/gauge_fix.py).  Gauge-invariant observables
    #: (plaquette, baryon 2pt/3pt, loops) are unchanged; fixing matters
    #: for gauge-variant analyses (e.g. momentum sources, NPR vertices).
    fix: str = ""
    fix_sweeps: int = 200
    fix_tol: float = 1e-9
    #: quenched heatbath gauge source (ops/heatbath.py): beta != None
    #: thermalizes a Wilson-action SU(3) field in-process instead of
    #: reading a file / using a random (infinite-temperature) field.
    #: The environment has no network access to real ensembles, so this
    #: is the in-repo source of *structured* gauge fields — the regime
    #: adaptive MG exists for.  random_seed (or random_seeds ensemble
    #: members) seeds the Markov chain.
    heatbath_beta: Optional[float] = None
    heatbath_sweeps: int = 200
    #: heatbath ENSEMBLE mode (n_cfg > 1): members come from ONE Markov
    #: chain — thermalize heatbath_sweeps once, then take a member every
    #: heatbath_skip compound sweeps (ops/heatbath.generate_ensemble) —
    #: not per-member cold restarts.  Each member is written to ILDG
    #: under heatbath_dir (default: '<output dir>/ensemble') and re-read
    #: through the LIME reader with a plaquette check, so the ensemble
    #: path exercises the full C28 write/read round-trip in production.
    heatbath_n_cfg: int = 1
    heatbath_skip: int = 20
    heatbath_dir: str = ""


@dataclass(frozen=True)
class ActionParams:
    kappa: float = 0.12
    mu: float = 0.05
    csw: float = 0.0                     # 0 = plain twisted mass
    #: non-degenerate (heavy s/c) doublet: epsbar != 0 selects the
    #: ndeg operator M_nd = 1 + 2 i kappa mubar g5 tau3 + 2 kappa
    #: epsbar tau1 - kappa D (run_invert path)
    mubar: float = 0.0
    epsbar: float = 0.0
    #: quark-mass sweep: non-empty = solve M(mu_i) x_i = b for every
    #: mu from ONE multi-shift CG Krylov space (run_invert path;
    #: solve.solve_tm_musweep — the exact TM shift identity
    #: M(mu)^dag M(mu) = M_W^dag M_W + (2 kappa mu)^2)
    mu_list: tuple = ()


@dataclass(frozen=True)
class SolverParams:
    tol: float = 1e-10
    maxiter: int = 5000
    inner_tol: float = 1e-5
    solver: str = "cg"                   # cg | bicgstab
    sloppy_dtype: str = "float32"        # float32 | bfloat16
    backend: str = "pallas"              # pallas | xla
    #: propagator columns solved per batched multi-RHS call (1 =
    #: sequential).  Memory scales ~ rhs_batch * (2 + 2*gcr_restart)
    #: fine spinors for the MG path; 12 fits a v5e at 16^3x32 and below.
    #: At 32^3x64 with BOTH flavor hierarchies resident (the 2pt/3pt
    #: programs) use 3 — 6 compiles to 19.1 GB vs the 15.75 GB HBM
    #: (measured OOM).
    rhs_batch: int = 12
    #: automatic gate for the NON-MG batched propagator path: the first
    #: column solves sequentially, and if its iteration count exceeds
    #: this the remaining columns run in rhs_batch_gate_chunk-sized
    #: batches instead of rhs_batch-wide ones.  Measured (BASELINE.md
    #: round 5): per-lockstep-iteration cost 0.39/0.39/0.66/3.31 ms at
    #: n_rhs = 1/2/4/12 in the ~7000-iteration regime — wide batches
    #: collapse superlinearly (n=4 is the sweet spot at 0.166
    #: ms/RHS-iter) while at ~300 iterations n=12 gains 1.9x.  The
    #: MG-batched path is unaffected.  0 disables the gate.
    rhs_batch_gate_iters: int = 1500
    rhs_batch_gate_chunk: int = 4
    #: multi-chip Dslash communication policy (reference dslash_policy
    #: autotune, SURVEY.md C7): "fused" = halo-exchange + fused kernel,
    #: "overlap" = interior/exterior split with slab repairs, "auto" =
    #: time both on the production mesh and cache the winner
    #: (utils/tune.tune_comm_policy).  Ignored off-mesh; backend "xla"
    #: always uses the overlap form (its interior is the sharded XLA
    #: stencil).
    comm_policy: str = "auto"            # auto | fused | overlap


@dataclass(frozen=True)
class MGParamsCfg:
    enabled: bool = False
    #: "near_critical" rebases every unset key below on the tuned
    #: near-kappa_c recipe (mg/dsolve.DeviceMGParams.near_critical:
    #: CG-NE setup 300, n_vec 16, restart 24, bf16 smoother + coarse
    #: links, coarse GCR 24 — the BASELINE.md 1.29x-over-CG row; pair
    #: it with solver.inner_tol: 1e-7).  Explicit YAML keys win.
    preset: Optional[str] = None
    n_vec: tuple[int, ...] = (16,)
    block: tuple = ((4, 4, 4, 4),)
    setup_iters: int = 60
    smoother_iters: int = 4
    coarse_tol: float = 0.25
    coarse_maxiter: int = 32
    #: flexible-GCR restart length of the outer MG-preconditioned solve
    restart: int = 8
    mu_factor: float = 6.0
    #: fine-level null-vector setup: "bicgstab" or "cgne" (CG on the
    #: normal operator via the g5-flavor trick — the near-kappa_c
    #: choice; see mg/dsolve.DeviceMGParams.setup_solver)
    setup_solver: str = "bicgstab"
    #: "bfloat16" runs the fine-level smoother on a bf16 twin
    smoother_dtype: str = "float32"
    #: "bfloat16" stores coarse-level links in bf16 (fields/accumulation
    #: stay f32) — halves the dominant V-cycle traffic; see
    #: mg/dsolve.DeviceMGParams.coarse_dtype
    coarse_dtype: str = "float32"
    #: "bfloat16" stores the outer GCR direction buffers / the transfer
    #: null vectors in bf16 — HBM-bound volumes (32^3x64 on one v5e
    #: needs both + restart <= 16; BASELINE.md round 5)
    gcr_dtype: str = "float32"
    vec_dtype: str = "float32"
    vec_outfile: Optional[str] = None    # null-vector dump (checkpoint)
    vec_infile: Optional[str] = None


#: MGParamsCfg key values the "near_critical" preset rebases on
#: (mirrors DeviceMGParams.near_critical; coarse_maxiter <-> coarse_iters)
MG_PRESETS = {
    "near_critical": dict(
        n_vec=(16,), block=((4, 4, 4, 4),), setup_iters=300,
        smoother_iters=4, coarse_maxiter=24, restart=24, mu_factor=6.0,
        setup_solver="cgne", smoother_dtype="bfloat16",
        coarse_dtype="bfloat16"),
}


@dataclass(frozen=True)
class PhysicsParams:
    source_positions: tuple = ((0, 0, 0, 0),)
    t_sinks: tuple[int, ...] = ()        # required by run_threeptwop
    projectors: tuple[str, ...] = ("P+",)
    #: nucleons measured by run_threeptwop (the reference computes both
    #: proton and neutron 3pt; the neutron is the isospin mirror of the
    #: proton Wick engine with u <-> d swapped)
    baryons: tuple[str, ...] = ("proton",)
    momenta: tuple = ((0, 0, 0),)
    #: fixed sink momentum p' for the sequential sources (reference
    #: seqSourceFixSink momentum projection at the sink; q = p' - p)
    sink_momentum: tuple = (0, 0, 0)
    #: if set, physics.momenta is GENERATED as every integer 3-vector
    #: with n.n <= mom_max_sq (the reference enumerates dense momentum
    #: sets for loop/form-factor analyses and projects them via cuFFT;
    #: large lists automatically take the on-device FFT projection)
    mom_max_sq: Optional[int] = None
    #: meson two-point channels (gammas.MESON_CHANNELS names — the
    #: reference's ten-meson set); same Gamma at source and sink
    meson_channels: tuple[str, ...] = ("pion",)
    #: gauge smearing for the Gaussian-smearing links: ape (reference
    #: default, performAPEnStep) or stout (performSTOUTnStep)
    smear_type: str = "ape"
    smear_alpha_ape: float = 0.5
    smear_n_ape: int = 10
    smear_rho_stout: float = 0.1
    smear_alpha_gauss: float = 4.0
    smear_n_gauss: int = 30
    n_noise: int = 12
    tsm_cheap: int = 0                   # cheap truncated solves (0 = off)
    tsm_maxiter_cheap: int = 50
    tsm_tol: float = 1e-3                # truncated-solve tolerance
    n_deflate: int = 0
    #: dump/reload the deflation eigenpairs (reference QKXTM_Deflation
    #: eigenvector read/write [U]; SURVEY.md §6.4c) — .npz paths
    eig_outfile: Optional[str] = None
    eig_infile: Optional[str] = None
    dilute_t: int = 1                    # time-dilution classes (1 = off)
    dilute_sc: bool = False              # full spin-color dilution (12x)
    output: str = "results.h5"


@dataclass(frozen=True)
class MeshParams:
    """Multi-chip domain decomposition (the reference's --gridsize
    [U] SURVEY.md §6.8): lattice T, Z and Y axes over the device mesh
    (X stays on-chip — it is the TPU lane axis).  ny > 1 requires the
    interior/exterior overlap comm policy; MG works on y meshes as
    long as the first block's y extent divides the local Y (aggregates
    must stay shard-local — validated at load)."""
    nt: int = 1
    nz: int = 1
    ny: int = 1


@dataclass(frozen=True)
class RunConfig:
    gauge: GaugeParams = field(default_factory=GaugeParams)
    action: ActionParams = field(default_factory=ActionParams)
    solver: SolverParams = field(default_factory=SolverParams)
    mg: MGParamsCfg = field(default_factory=MGParamsCfg)
    physics: PhysicsParams = field(default_factory=PhysicsParams)
    mesh: MeshParams = field(default_factory=MeshParams)


class ConfigError(ValueError):
    """Raised at load time for invalid run configurations (the
    reference's `*_invalid` param-struct validation discipline,
    SURVEY.md §6.6): every constraint that would otherwise surface as a
    bare assert deep inside MG/mesh setup fails HERE with an actionable
    message, before any expensive work starts."""


def validate_config(cfg: "RunConfig") -> None:
    def err(msg):
        raise ConfigError(msg)

    dims = tuple(cfg.gauge.dims)
    if len(dims) != 4:
        err(f"gauge.dims must be 4 numbers (Lx, Ly, Lz, Lt), got {dims}")
    if any(d <= 0 or d % 2 for d in dims):
        err(f"gauge.dims must be positive and even (even-odd layout + "
            f"parity masks), got {dims}")
    lx, ly, lz, lt = dims

    if cfg.solver.solver not in ("cg", "bicgstab", "eigcg"):
        err(f"solver.solver must be cg | bicgstab | eigcg, "
            f"got {cfg.solver.solver!r}")
    if cfg.solver.sloppy_dtype not in ("float32", "bfloat16"):
        err(f"solver.sloppy_dtype must be float32 | bfloat16, "
            f"got {cfg.solver.sloppy_dtype!r}")
    if cfg.solver.backend not in ("pallas", "xla"):
        err(f"solver.backend must be pallas | xla, "
            f"got {cfg.solver.backend!r}")
    for fld in ("smoother_dtype", "coarse_dtype", "gcr_dtype",
                "vec_dtype"):
        v = getattr(cfg.mg, fld)
        if v not in ("float32", "bfloat16"):
            err(f"mg.{fld} must be float32 | bfloat16, got {v!r}")
    if cfg.solver.comm_policy not in ("auto", "fused", "overlap"):
        err(f"solver.comm_policy must be auto | fused | overlap, "
            f"got {cfg.solver.comm_policy!r}")
    from ..gammas import MESON_CHANNELS
    bad = [c for c in cfg.physics.meson_channels
           if c not in MESON_CHANNELS]
    if bad:
        err(f"physics.meson_channels: unknown {bad!r}; known: "
            f"{sorted(MESON_CHANNELS)}")
    if cfg.physics.smear_type not in ("ape", "stout"):
        err(f"physics.smear_type must be ape | stout, "
            f"got {cfg.physics.smear_type!r}")
    if len(cfg.physics.sink_momentum) != 3:
        err(f"physics.sink_momentum must be a 3-vector, "
            f"got {cfg.physics.sink_momentum}")
    for b in cfg.physics.baryons:
        if b not in ("proton", "neutron"):
            err(f"physics.baryons entries must be proton | neutron, "
                f"got {b!r}")
    if cfg.gauge.fix not in ("", "landau", "coulomb"):
        err(f"gauge.fix must be '' | landau | coulomb, "
            f"got {cfg.gauge.fix!r}")
    if cfg.gauge.config_files and cfg.gauge.random_seeds:
        err("gauge.config_files and gauge.random_seeds are exclusive "
            "ensemble modes — set one")
    if cfg.gauge.config_file and (cfg.gauge.config_files
                                  or cfg.gauge.random_seeds):
        err("gauge.config_file is the single-config mode; use ONLY "
            "gauge.config_files / gauge.random_seeds for ensembles")
    if cfg.gauge.heatbath_beta is not None:
        if cfg.gauge.config_file or cfg.gauge.config_files:
            err("gauge.heatbath_beta generates the gauge in-process — "
                "exclusive with config_file(s)")
        if cfg.gauge.heatbath_beta <= 0:
            err(f"gauge.heatbath_beta must be > 0, "
                f"got {cfg.gauge.heatbath_beta}")
        if cfg.gauge.heatbath_sweeps <= 0:
            err("gauge.heatbath_sweeps must be > 0")
        if cfg.gauge.heatbath_n_cfg < 1:
            err("gauge.heatbath_n_cfg must be >= 1")
        if cfg.gauge.heatbath_n_cfg > 1:
            if cfg.gauge.heatbath_skip <= 0:
                err("gauge.heatbath_skip must be > 0 in ensemble mode")
            if cfg.gauge.random_seeds:
                err("gauge.heatbath_n_cfg ensemble (one Markov chain) is "
                    "exclusive with gauge.random_seeds (per-seed fields)")
    if cfg.action.mu_list:
        if (cfg.action.csw != 0.0 or cfg.action.epsbar != 0.0
                or cfg.mg.enabled or cfg.solver.solver != "cg"):
            err("action.mu_list (multishift mass sweep) supports the "
                "plain twisted-mass operator with solver: cg — unset "
                "csw/epsbar/mg or drop mu_list (mesh is fine: the "
                "sweep runs through the sharded fine level)")
    if not (0.0 < cfg.solver.tol < 1.0):
        err(f"solver.tol must be in (0, 1), got {cfg.solver.tol}")
    if cfg.solver.maxiter <= 0:
        err(f"solver.maxiter must be positive, got {cfg.solver.maxiter}")
    if cfg.solver.rhs_batch < 1:
        err(f"solver.rhs_batch must be >= 1, got {cfg.solver.rhs_batch}")
    if cfg.action.csw != 0.0 and cfg.solver.solver == "eigcg":
        err("solver.solver: eigcg supports the plain twisted-mass "
            "operator only; with action.csw != 0 use mg.enabled or "
            "solver: cg/bicgstab")
    if cfg.action.epsbar != 0.0:
        t = 2.0 * cfg.action.kappa * cfg.action.mubar
        e = 2.0 * cfg.action.kappa * cfg.action.epsbar
        if 1.0 + t * t - e * e <= 0.0:
            err(f"ndeg doublet needs 1 + (2 k mubar)^2 > (2 k epsbar)^2 "
                f"for the site-term inverse; got mubar="
                f"{cfg.action.mubar}, epsbar={cfg.action.epsbar}")
        if cfg.mg.enabled or cfg.solver.solver == "eigcg" \
                or cfg.action.csw != 0.0:
            err("the ndeg doublet path (action.epsbar != 0) supports "
                "the plain mixed-precision CG solver only (no mg/eigcg/"
                "csw yet)")

    if cfg.mg.enabled:
        if len(cfg.mg.n_vec) != len(cfg.mg.block):
            err(f"mg.n_vec ({len(cfg.mg.n_vec)} entries) and mg.block "
                f"({len(cfg.mg.block)} entries) must list one entry per "
                f"coarsening level")
        ds = [lt, lz, ly, lx]           # (T, Z, Y, X) extents per level
        for depth, blk in enumerate(cfg.mg.block):
            if len(blk) != 4:
                err(f"mg.block[{depth}] must be (bt, bz, by, bx), "
                    f"got {blk}")
            bt, bz, by, bx = blk
            if depth == 0 and bx % 2:
                err(f"mg.block[0] x-extent must be even (eo packing), "
                    f"got bx={bx}")
            for name, d, b in zip("tzyx", ds, blk):
                if b <= 0 or d % b:
                    err(f"mg.block[{depth}] {name}-extent {b} must "
                        f"divide the level-{depth} lattice extent {d} "
                        f"(lattice {dims}, blocks {cfg.mg.block})")
            ds = [d // b for d, b in zip(ds, blk)]
        if any(nv <= 0 for nv in cfg.mg.n_vec):
            err(f"mg.n_vec entries must be positive, got {cfg.mg.n_vec}")

    for pos in cfg.physics.source_positions:
        if len(pos) != 4:
            err(f"physics.source_positions entries must be "
                f"(t, z, y, x), got {pos}")
        t, z, y, x = pos
        if not (0 <= t < lt and 0 <= z < lz and 0 <= y < ly
                and 0 <= x < lx):
            err(f"source position {pos} (t,z,y,x) outside lattice "
                f"(T,Z,Y,X) = {(lt, lz, ly, lx)}")
    for ts in cfg.physics.t_sinks:
        if not 0 <= ts < lt:
            err(f"physics.t_sinks entry {ts} outside 0..{lt - 1}")
    for q in cfg.physics.momenta:
        if len(q) != 3:
            err(f"physics.momenta entries must be 3-vectors, got {q}")
    from ..gammas import PROJECTORS
    for p in cfg.physics.projectors:
        if p not in PROJECTORS:
            err(f"physics.projectors entries must be one of "
                f"{sorted(PROJECTORS)}, got {p!r}")
    if cfg.physics.tsm_cheap < 0 or cfg.physics.n_deflate < 0 \
            or cfg.physics.n_noise <= 0:
        err(f"physics noise counts must be sane: n_noise "
            f"{cfg.physics.n_noise} > 0, tsm_cheap "
            f"{cfg.physics.tsm_cheap} >= 0, n_deflate "
            f"{cfg.physics.n_deflate} >= 0")
    if not 1 <= cfg.physics.dilute_t <= lt:
        err(f"physics.dilute_t must be in 1..Lt = {lt}, "
            f"got {cfg.physics.dilute_t}")

    nt, nz, ny = cfg.mesh.nt, cfg.mesh.nz, cfg.mesh.ny
    if nt < 1 or nz < 1 or ny < 1:
        err(f"mesh.nt/nz/ny must be >= 1, got ({nt}, {nz}, {ny})")
    if nt > 1 or nz > 1 or ny > 1:
        if lt % nt or (lt // nt) % 2:
            err(f"mesh.nt = {nt} must divide Lt = {lt} with an even "
                f"local extent (eo parity masks are per-shard)")
        if lz % nz or (nz > 1 and (lz // nz) % 2):
            err(f"mesh.nz = {nz} must divide Lz = {lz} with an even "
                f"local extent")
        if ly % ny or (ny > 1 and (ly // ny) % 2):
            err(f"mesh.ny = {ny} must divide Ly = {ly} with an even "
                f"local extent")
        if ny > 1 and cfg.solver.comm_policy == "fused":
            err("mesh.ny > 1 needs the interior/exterior overlap "
                "engine: set solver.comm_policy to overlap or auto "
                "(there is no fused halo_y kernel mode)")
        if cfg.mg.enabled:
            bt = cfg.mg.block[0][0]
            bz = cfg.mg.block[0][1]
            by = cfg.mg.block[0][2]
            if (lt // nt) % bt:
                err(f"sharded MG needs the local T extent {lt // nt} "
                    f"divisible by the t-block {bt} (aggregates must "
                    f"stay shard-local)")
            if nz > 1 and (lz // nz) % bz:
                err(f"sharded MG needs the local Z extent {lz // nz} "
                    f"divisible by the z-block {bz}")
            if ny > 1 and (ly // ny) % by:
                err(f"sharded MG needs the local Y extent {ly // ny} "
                    f"divisible by the y-block {by}")


def _tupleize(v):
    if isinstance(v, list):
        return tuple(_tupleize(x) for x in v)
    return v


def _apply_mg_preset(raw_mg: dict) -> dict:
    """Merge a named preset under the user's explicit mg keys."""
    preset = raw_mg.get("preset")
    if not preset:
        return raw_mg
    if preset not in MG_PRESETS:
        raise ConfigError(
            f"unknown mg.preset {preset!r}; known: "
            f"{sorted(MG_PRESETS)}")
    return {**MG_PRESETS[preset], **raw_mg}


def _build(cls, d: dict):
    kw = {}
    for f_ in dataclasses.fields(cls):
        if f_.name in d:
            kw[f_.name] = _tupleize(d[f_.name])
    return cls(**kw)


def load_config(path: str) -> RunConfig:
    assert yaml is not None, "pyyaml unavailable"
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    cfg = RunConfig(
        gauge=_build(GaugeParams, raw.get("gauge", {})),
        action=_build(ActionParams, raw.get("action", {})),
        solver=_build(SolverParams, raw.get("solver", {})),
        mg=_build(MGParamsCfg, _apply_mg_preset(raw.get("mg", {}))),
        physics=_build(PhysicsParams, raw.get("physics", {})),
        mesh=_build(MeshParams, raw.get("mesh", {})),
    )
    if cfg.physics.mom_max_sq is not None:
        q2 = int(cfg.physics.mom_max_sq)
        if q2 < 0:
            raise ConfigError(f"physics.mom_max_sq must be >= 0, got {q2}")
        if raw.get("physics", {}).get("momenta") is not None:
            raise ConfigError(
                "physics.momenta and physics.mom_max_sq are exclusive")
        nmax = int(q2 ** 0.5)
        moms = tuple(
            (nx, ny, nz)
            for nx in range(-nmax, nmax + 1)
            for ny in range(-nmax, nmax + 1)
            for nz in range(-nmax, nmax + 1)
            if nx * nx + ny * ny + nz * nz <= q2)
        cfg = dataclasses.replace(
            cfg, physics=dataclasses.replace(cfg.physics, momenta=moms))
    validate_config(cfg)
    return cfg
