"""Real-TPU regression probes (set HALO2_TPU_RUN_TPU=1 to enable).

Guards the XLA:TPU miscompile class fixed in round 4: when the trailing
elementwise multiply fused into the chunked Kate division's suffix-scan
output reassembly, quotient indices >= n/2 were corrupted — but ONLY for
n >= 2^21 and ONLY on the real TPU backend (the CPU tiers compile a
different fusion and pass regardless), so a compiler upgrade could
silently regress k>=21 proofs with no CPU-visible signal.  The
`optimization_barrier` in poly/arith.py kate_division is the fix; these
probes are the only tier that can catch its removal or a new instance of
the same fusion bug.

The session conftest pins JAX to the virtual CPU mesh process-wide, so
the probes run examples/probe_k22.py in a SUBPROCESS with a clean
platform environment (the ambient sitecustomize then selects the axon
TPU).  Each probe checks three identities at size 2^k:

  A  NTT round-trip:  inverse(forward(x)) == x
  B  KZG identity:    commit(coeffs) == commit_lagrange(forward(coeffs))
  C  Kate identity:   p(z) - p(b) == kate(p, b)(z) * (z - b)

Cold compile through the axon tunnel is tens of minutes for the 2^22
shapes; the persistent cache (.jax_cache_tpu/) makes reruns minutes.
A recorded green run is referenced in BASELINE.md (round 5).
"""

import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    os.environ.get("HALO2_TPU_RUN_TPU") != "1",
    reason="real-TPU probe: set HALO2_TPU_RUN_TPU=1 in a session with "
           "TPU access")


def _tpu_env(k):
    """Subprocess environment: drop the CPU pins the test session set so
    the ambient sitecustomize re-selects the axon TPU backend."""
    env = {kk: v for kk, v in os.environ.items()
           if kk not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    env["K"] = str(k)
    return env


@pytest.mark.parametrize("k", [21, 22])
def test_large_n_identities_on_tpu(k):
    """A/B/C identities at 2^21 and 2^22 — the exact sizes where the
    round-4 miscompile manifested (2^20 was always correct)."""
    proc = subprocess.run(
        [sys.executable, os.path.join(_REPO, "examples", "probe_k22.py")],
        env=_tpu_env(k), cwd=_REPO, capture_output=True, text=True,
        timeout=3600)
    sys.stdout.write(proc.stdout)
    assert proc.returncode == 0, (
        f"TPU probe failed at 2^{k}:\n{proc.stdout}\n{proc.stderr[-2000:]}")
    assert "FAIL" not in proc.stdout
