"""tpuqcd — a TPU-native lattice QCD framework.

From-scratch re-design of the capabilities of the
ETMC-QUDA/quda-QKXTM-Multigrid-PlugIn stack (QUDA twisted-mass multigrid
solvers + the QKXTM physics layer) for TPU: JAX/XLA/pjit for
orchestration and sharding, Pallas for the hot stencil/contraction
kernels, ICI collectives for the lattice halo exchange.  See SURVEY.md at
the repo root for the component-by-component mapping to the reference.

x64 note: we enable jax_enable_x64 at import.  TPUs have no fast fp64 —
all *field* arithmetic is explicitly f32/bf16 — but solver scalar
bookkeeping and rare true-residual recomputations use (emulated) f64,
replacing the reference's fp64 reduction accumulators (SURVEY.md §8.3
hard part #1).
"""
import os as _os

import jax as _jax

_jax.config.update("jax_enable_x64", True)

# Persistent XLA compilation cache (the reference's tunecache.tsv role,
# SURVEY.md C14/X1): enabled by the CLI entry points for NON-CPU runs
# only (cli/common.py).  Do NOT enable it here at import time: XLA:CPU
# AOT executables are host-CPU-feature-sensitive and reloading an entry
# written on a different machine SEGFAULTS (observed: cache written on
# an AVX512/prefer-no-scatter host crashed test_mg_batched on this VM
# inside compilation_cache.get_executable_and_time).  Library users on
# an accelerator can opt in with TPUQCD_COMPILE_CACHE=1 or by setting
# JAX_COMPILATION_CACHE_DIR themselves.
if _os.environ.get("TPUQCD_COMPILE_CACHE"):
    if _jax.config.jax_compilation_cache_dir is None:
        _d = _os.path.join(
            _os.environ.get("TPUQCD_RESOURCE_PATH",
                            _os.path.expanduser("~/.cache/tpuqcd")),
            "xla_cache")
        _os.makedirs(_d, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _d)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs",
                           1.0)

from .lattice import Lattice  # noqa: E402,F401
from . import gammas, su3, fields, operators  # noqa: E402,F401

__version__ = "0.1.0"
