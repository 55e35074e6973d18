"""Background gauge-configuration read-ahead for ensemble runs.

The reference's production scripting streams one ILDG configuration per
process, paying the disk read on the critical path every time ([U]
CalcMG_* driver scripts; SURVEY.md §4.1).  In tpuqcd's single-process
ensemble mode (cli/common.ensemble_members) the NEXT member's gauge
file is read on a background thread while the TPU computes the current
member — disk IO releases the GIL, so this overlaps even on a 1-core
host, and the parse itself runs through the native one-pass C++ ingest
(native/ildg_layout.cpp) where available.

Usage: `prefetch(path)` as early as possible; `take(path)` where the
read result is needed — it joins the thread if still running, or falls
through to a synchronous read if the path was never prefetched.
"""
from __future__ import annotations

import threading

_lock = threading.Lock()
_pending: dict = {}     # path -> (thread, box)


def prefetch(path: str) -> None:
    """Start reading `path` on a background thread (idempotent)."""
    with _lock:
        if path in _pending:
            return
        box: dict = {}

        def work():
            from .lime import read_ildg_gauge
            try:
                box["result"] = read_ildg_gauge(path)
            except BaseException as e:          # surfaced at take()
                box["error"] = e

        t = threading.Thread(target=work, name=f"ildg-prefetch:{path}",
                             daemon=True)
        _pending[path] = (t, box)
        t.start()


def take(path: str):
    """Return (u_full, Lattice) for `path`: the prefetched result if
    one is in flight (joining it), else a synchronous read."""
    with _lock:
        entry = _pending.pop(path, None)
    if entry is None:
        from .lime import read_ildg_gauge
        return read_ildg_gauge(path)
    t, box = entry
    t.join()
    if "error" in box:
        raise box["error"]
    return box["result"]
