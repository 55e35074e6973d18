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


@dataclass(frozen=True)
class ActionParams:
    kappa: float = 0.12
    mu: float = 0.05
    csw: float = 0.0                     # 0 = plain twisted mass


@dataclass(frozen=True)
class SolverParams:
    tol: float = 1e-10
    maxiter: int = 5000
    inner_tol: float = 1e-5
    solver: str = "cg"                   # cg | bicgstab
    sloppy_dtype: str = "float32"        # float32 | bfloat16
    backend: str = "pallas"              # pallas | xla


@dataclass(frozen=True)
class MGParamsCfg:
    enabled: bool = False
    n_vec: tuple[int, ...] = (16,)
    block: tuple = ((4, 4, 4, 4),)
    setup_iters: int = 60
    smoother_iters: int = 4
    coarse_tol: float = 0.25
    coarse_maxiter: int = 32
    mu_factor: float = 6.0
    vec_outfile: Optional[str] = None    # null-vector dump (checkpoint)
    vec_infile: Optional[str] = None


@dataclass(frozen=True)
class PhysicsParams:
    source_positions: tuple = ((0, 0, 0, 0),)
    t_sinks: tuple[int, ...] = (8,)
    projectors: tuple[str, ...] = ("P+",)
    momenta: tuple = ((0, 0, 0),)
    smear_alpha_ape: float = 0.5
    smear_n_ape: int = 10
    smear_alpha_gauss: float = 4.0
    smear_n_gauss: int = 30
    n_noise: int = 12
    tsm_cheap: int = 0                   # 0 = plain estimator
    tsm_maxiter_cheap: int = 50
    n_deflate: int = 0
    output: str = "results.h5"


@dataclass(frozen=True)
class RunConfig:
    gauge: GaugeParams = field(default_factory=GaugeParams)
    action: ActionParams = field(default_factory=ActionParams)
    solver: SolverParams = field(default_factory=SolverParams)
    mg: MGParamsCfg = field(default_factory=MGParamsCfg)
    physics: PhysicsParams = field(default_factory=PhysicsParams)


def _tupleize(v):
    if isinstance(v, list):
        return tuple(_tupleize(x) for x in v)
    return v


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
    return RunConfig(
        gauge=_build(GaugeParams, raw.get("gauge", {})),
        action=_build(ActionParams, raw.get("action", {})),
        solver=_build(SolverParams, raw.get("solver", {})),
        mg=_build(MGParamsCfg, raw.get("mg", {})),
        physics=_build(PhysicsParams, raw.get("physics", {})),
    )
