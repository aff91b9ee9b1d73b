"""Phase-scoped wall timers — the `profile` feature analogue.

The reference wraps every prover phase in ark-std start_timer!/end_timer!
scopes (prover.rs:223-792, Cargo.toml:103).  Here: nested wall-clock scopes
printed to stderr when HALO2_TPU_PROFILE=1 (or `enable()` is called).
"""

from __future__ import annotations

import os
import sys
import time
from contextlib import contextmanager

_enabled = os.environ.get("HALO2_TPU_PROFILE", "") == "1"
_depth = 0


def enable(on: bool = True):
    global _enabled
    _enabled = on


@contextmanager
def span(name: str):
    global _depth
    if not _enabled:
        yield
        return
    t0 = time.time()
    _depth += 1
    try:
        yield
    finally:
        _depth -= 1
        print(f"[halo2_tpu]{'·' * _depth} {name}: {(time.time()-t0)*1000:.1f} ms",
              file=sys.stderr, flush=True)


def phase_marker():
    """Sequential phase timing: pm = phase_marker(); ...; pm("phase name")
    prints the time since the previous mark (when profiling is enabled)."""
    state = {"t": time.time()}

    def mark(name: str):
        now = time.time()
        if _enabled:
            print(f"[halo2_tpu] {name}: {(now - state['t'])*1000:.1f} ms",
                  file=sys.stderr, flush=True)
        state["t"] = now

    return mark
