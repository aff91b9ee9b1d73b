"""2^22-size primitive probes — the regression guard for the XLA:TPU
miscompile class fixed in round 4 (fused scan+multiply corrupting the top
half of large Kate quotients at n >= 2^21; see ntt/kate history).  These
identities only exercise the buggy fusion shapes at n >= 2^21 on REAL TPU,
so no CPU test tier can cover them; tests/test_tpu_probes.py runs this
script on the axon device when HALO2_TPU_RUN_TPU=1.

  A  NTT round-trip at 2^k: inverse(forward(x)) == x
  B  KZG identity at 2^k: commit(coeffs) == commit_lagrange(forward(coeffs))
     (covers MSM + NTT + SRS consistency in one check)
  C  Kate identity at 2^k: q = kate(p, b); then p(z) - p(b) == q(z)*(z-b)
     at a random z (covers the chunked kate + eval powers at size)

Exit status 0 iff all three identities hold.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import jax.numpy as jnp

from halo2_tpu.fields.bn254 import Fr
from halo2_tpu.ntt.ntt import get_ntt
from halo2_tpu.poly.arith import eval_poly, kate_division
from halo2_tpu.poly.commitment import Params
from halo2_tpu.curves import g1


def log(*a):
    print(*a, flush=True)


def main():
    k = int(os.environ.get("K", "22"))
    n = 1 << k
    rs = np.random.RandomState(0)

    # CANONICAL inputs (random 16-bit limb planes are NOT field elements:
    # bitwise comparisons then fail spuriously — the first version of this
    # probe made exactly that mistake)
    vals = rs.randint(0, 1 << 62, size=(1, n)).astype(np.uint64)
    x = Fr.encode_u64_dev(vals)[:, 0, :]
    ntt = get_ntt(k)
    rt = ntt.inverse(ntt.forward(x))
    ok_a = bool(jnp.array_equal(rt, x))
    log(f"A ntt roundtrip 2^{k}: {'OK' if ok_a else 'FAIL'}")

    # B: KZG identity
    params = Params.unsafe_setup(k, seed=7)
    coeffs = x
    lag = ntt.forward(coeffs)
    c1 = params.commit(coeffs)
    c2 = params.commit_lagrange(lag)
    a1 = g1.decode_points(jnp.stack(g1.to_affine(
        tuple(c[:, None] for c in c1))))[0]
    a2 = g1.decode_points(jnp.stack(g1.to_affine(
        tuple(c[:, None] for c in c2))))[0]
    log(f"B kzg identity 2^{k}: {'OK' if a1 == a2 else f'FAIL {a1} vs {a2}'}")

    # C: kate identity
    b = 123456789987654321 % Fr.p
    z = 555555555555555555 % Fr.p
    q = kate_division(coeffs, b)
    p_z = eval_poly(coeffs, z)
    p_b = eval_poly(coeffs, b)
    q_z = eval_poly(q, z)
    lhs = (p_z - p_b) % Fr.p
    rhs = q_z * ((z - b) % Fr.p) % Fr.p
    ok_c = lhs == rhs
    log(f"C kate identity 2^{k}: {'OK' if ok_c else 'FAIL'}")
    return ok_a and (a1 == a2) and ok_c


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
