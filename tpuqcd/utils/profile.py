"""Analytic-flops performance reporting (the TimeProfile equivalent).

The reference counts kernel flops analytically and reports GFLOP/s per
solve ([U] include/timer.h, solver gflops reports; SURVEY.md §6.1); this
module provides the same accounting for the BASELINE metric
"Dslash GFLOP/s/chip" plus simple phase timers.  jax.profiler traces
remain available for deep dives.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict

#: analytic flop counts per lattice site (BASELINE.md Tier 2)
FLOPS_WILSON_DSLASH = 1320
FLOPS_TM_DSLASH = 1392
FLOPS_CLOVER_APPLY = 504


class Profile:
    """Phase timers + flop counters; print at the end like endQuda."""

    def __init__(self):
        self.times = defaultdict(float)
        self.flops = defaultdict(float)

    @contextlib.contextmanager
    def phase(self, name: str, flops: float = 0.0):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.times[name] += dt
            self.flops[name] += flops

    def add_flops(self, name: str, flops: float):
        self.flops[name] += flops

    def report(self) -> str:
        lines = ["phase                          time[s]    GFLOP/s"]
        for k in sorted(self.times):
            t = self.times[k]
            gf = self.flops[k] / t / 1e9 if t > 0 and self.flops[k] else 0.0
            lines.append(f"{k:<30} {t:8.3f} {gf:10.1f}")
        return "\n".join(lines)


def dslash_flops(lat, n_applies: int, tm: bool = True,
                 parity: bool = True) -> float:
    sites = lat.half_volume if parity else lat.volume
    per = FLOPS_TM_DSLASH if tm else FLOPS_WILSON_DSLASH
    return float(per * sites * n_applies)


def solve_flops(lat, iters: int, tm: bool = True) -> float:
    """CG-on-normal-equations accounting: 4 parity dslash per matvec-pair
    iteration plus ~6 axpy-class passes (negligible next to dslash)."""
    return dslash_flops(lat, 4 * int(iters), tm=tm, parity=True)
