"""Profiling: hierarchical phase timers + counters — the `profile` feature
analogue.

The reference wraps every prover phase in ark-std start_timer!/end_timer!
scopes (prover.rs:223-792, Cargo.toml:103), giving a nested timing tree,
and reports cache hit ratios (logup/prover.rs:176-179).  Here:

  * `span(name)` / `phase_marker()` — nested scopes, streamed to stderr
    when HALO2_TPU_PROFILE=1 and accumulated into a TREE (report() prints
    it with totals, counts and percentages).
  * HALO2_TPU_PROFILE_SYNC=1 — drain the device queue at every span exit
    before taking the time, so phases are charged their DEVICE time
    instead of just dispatch latency (XLA dispatch is async: without this
    a phase that enqueues work is charged ~0 and some later host-read
    phase absorbs it — the attribution skew BASELINE.md r2 admitted).
    Syncing serializes dispatch with compute, so total wall-clock rises;
    use it to ATTRIBUTE, not to measure end-to-end.
  * `incr(name)` / `counters` — metrics registry (MSM/NTT call counts
    etc.); report() prints them.
"""

from __future__ import annotations

import os
import sys
import time
from contextlib import contextmanager

_enabled = os.environ.get("HALO2_TPU_PROFILE", "") == "1"
_sync = os.environ.get("HALO2_TPU_PROFILE_SYNC", "") == "1"


class _Node:
    __slots__ = ("name", "total", "count", "children")

    def __init__(self, name):
        self.name = name
        self.total = 0.0
        self.count = 0
        self.children: dict[str, _Node] = {}

    def child(self, name):
        node = self.children.get(name)
        if node is None:
            node = self.children[name] = _Node(name)
        return node


_root = _Node("total")
_stack = [_root]
counters: dict[str, float] = {}


def enable(on: bool = True, sync: bool | None = None):
    global _enabled, _sync
    _enabled = on
    if sync is not None:
        _sync = sync


def incr(name: str, v: float = 1):
    counters[name] = counters.get(name, 0) + v


def _drain_device():
    """Device-queue sync point: TPU executes programs in FIFO order per
    device, so a host read of a freshly enqueued trivial program implies
    everything enqueued before it has completed.  (block_until_ready alone
    is unreliable over the axon tunnel — see bench.py.)"""
    try:
        import jax
        import jax.numpy as jnp
        import numpy as np
        np.asarray(jnp.zeros((1,), jnp.uint32) + 0)
    except Exception:
        pass


@contextmanager
def span(name: str):
    if not _enabled:
        yield
        return
    node = _stack[-1].child(name)
    _stack.append(node)
    if _sync:
        _drain_device()
    t0 = time.time()
    try:
        yield
    finally:
        if _sync:
            _drain_device()
        dt = time.time() - t0
        node.total += dt
        node.count += 1
        _stack.pop()
        print(f"[halo2_tpu]{'·' * (len(_stack) - 1)} {name}: {dt*1000:.1f} ms",
              file=sys.stderr, flush=True)


def phase_marker(scope: str = "prover"):
    """Sequential phase timing: pm = phase_marker(); ...; pm("phase name")
    prints + records the time since the previous mark (when enabled)."""
    state = {"t": time.time()}
    parent = _stack[-1].child(scope) if _enabled else None

    def mark(name: str):
        if not _enabled:
            return
        if _sync:
            _drain_device()
        now = time.time()
        dt = now - state["t"]
        node = parent.child(name)
        node.total += dt
        node.count += 1
        parent.total += dt
        print(f"[halo2_tpu] {name}: {dt*1000:.1f} ms",
              file=sys.stderr, flush=True)
        state["t"] = now

    return mark


def report(file=None) -> str:
    """Render the accumulated timer tree + counters (and print it)."""
    out = []

    def walk(node, depth, parent_total):
        pct = (f" ({100 * node.total / parent_total:.0f}%)"
               if parent_total else "")
        out.append(f"{'  ' * depth}{node.name}: {node.total*1000:.1f} ms"
                   f" x{node.count}{pct}")
        for ch in node.children.values():
            walk(ch, depth + 1, node.total)

    for ch in _root.children.values():
        walk(ch, 0, 0.0)
    if counters:
        out.append("counters: " + ", ".join(
            f"{k}={v:g}" for k, v in sorted(counters.items())))
    text = "\n".join(out)
    print(text, file=file or sys.stderr, flush=True)
    return text


def reset():
    global _root, _stack
    _root = _Node("total")
    _stack = [_root]
    counters.clear()
