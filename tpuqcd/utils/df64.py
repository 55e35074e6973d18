"""Double-single ("df64") arithmetic: ~49-bit precision from f32 pairs.

The TPU VPU has no fast f64 datapath; XLA *emulates* f64, but its
emulation materializes f64 buffers (2x f32) and promotes every operand —
at the 48^3x96 flagship volume the f64 certification operator alone was
measured at 15.8-16.2 GiB of HBM (BASELINE.md round 4), which does not
fit one v5e.  This module implements the classical double-single
representation instead: a value is an UNEVALUATED SUM hi + lo of two
f32s with |lo| <= ulp(hi)/2, giving ~2^-48 relative accuracy — enough
headroom for certifying 1e-10 true residuals — while every operand
stays f32 (the gauge field in particular is NOT promoted; f32 entries
enter the error-free products exactly).

Algorithms are the standard error-free transformations (Dekker 1971,
Knuth TAOCP 4.2.2, and the dsfun/QD library formulations used by the
GPU lattice-QCD generation before fp64 hardware): two_sum, Veltkamp
splitting, two_prod.  Correctness relies only on IEEE round-to-nearest
f32 add/sub/mul — XLA HLO preserves per-op rounding (no automatic FMA
contraction or float reassociation), verified by tests/test_df64.py
against native f64 on CPU.

A df64 array is a plain tuple ``(hi, lo)`` of same-shape f32 arrays
(pytree-friendly; travels through jit/vmap/scan unchanged).

Role in the framework: the high-precision residual path of the
defect-correction solvers (SURVEY.md §8.3 hard part #1 — the plan's
original mechanism; reference: f64 reliable-update residuals in
`inv_cg_quda.cpp` / `interface_quda.cpp` [U]).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

#: Veltkamp split constant for f32 (2^12 + 1): splits a 24-bit mantissa
#: into two 12-bit halves whose pairwise products are exact in f32.
_SPLIT = np.float32(4097.0)


# --- error-free transformations (elementwise, f32) -------------------------

def two_sum(a, b):
    """s + e == a + b exactly, s = fl(a + b).  6 flops, no branches."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def quick_two_sum(a, b):
    """two_sum assuming |a| >= |b| (3 flops)."""
    s = a + b
    e = b - (s - a)
    return s, e


def split(a):
    """a == h + l with h, l having <=12-bit mantissas (Veltkamp)."""
    c = _SPLIT * a
    h = c - (c - a)
    return h, a - h


def two_prod(a, b):
    """p + e == a * b exactly, p = fl(a * b) (Dekker, no FMA needed)."""
    p = a * b
    ah, al = split(a)
    bh, bl = split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


# --- df64 construction / conversion ---------------------------------------

def scalar(v: float):
    """Python/np float64 -> df64 scalar pair (np.float32 hi, lo)."""
    hi = np.float32(v)
    lo = np.float32(np.float64(v) - np.float64(hi))
    return hi, lo


def from_f32(x):
    return x, jnp.zeros_like(x)


def from_f64(x):
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(jnp.float64)).astype(jnp.float32)
    return hi, lo


def to_f64(a):
    return a[0].astype(jnp.float64) + a[1].astype(jnp.float64)


def hi(a):
    """Best f32 approximation (hi already rounds hi+lo to f32)."""
    return a[0]


# --- df64 arithmetic (operands: df64 pairs unless suffixed _f) -------------

def add(a, b):
    """df64 + df64 (Knuth-style, ~11 flops)."""
    s, e = two_sum(a[0], b[0])
    e = e + (a[1] + b[1])
    return quick_two_sum(s, e)


def add_f(a, x):
    """df64 + f32 array/scalar."""
    s, e = two_sum(a[0], x)
    e = e + a[1]
    return quick_two_sum(s, e)


def neg(a):
    return -a[0], -a[1]


def sub(a, b):
    return add(a, neg(b))


def mul_f(a, x):
    """df64 * f32 array/scalar (x exact in f32)."""
    p, e = two_prod(a[0], x)
    e = e + a[1] * x
    return quick_two_sum(p, e)


def mul(a, b):
    """df64 * df64."""
    p, e = two_prod(a[0], b[0])
    e = e + (a[0] * b[1] + a[1] * b[0])
    return quick_two_sum(p, e)


def mul_s(a, s):
    """df64 array * df64 SCALAR pair (e.g. from :func:`scalar`)."""
    return mul(a, (jnp.asarray(s[0], a[0].dtype),
                   jnp.asarray(s[1], a[0].dtype)))


def norm2_f64(a):
    """sum |hi + lo|^2 accumulated in (XLA-emulated) f64 — a scalar
    reduction, so no f64 field is ever materialized."""
    v = to_f64(a)
    return jnp.sum(v * v)
