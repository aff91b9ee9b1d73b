"""Vanishing argument (prover side).

Mirrors /root/reference/halo2_proofs/src/plonk/vanishing/prover.rs:
  * random blinding polynomial committed before y (product-of-randoms
    construction approximated by direct uniform sampling — the reference's
    product construction is an entropy-hygiene detail, prover.rs:41-68)
  * construct: divide h by t(X) on the coset, extended iFFT, split into
    n-sized pieces, commit each (prover.rs:71-110)
  * evaluate: fold pieces by x^n, evaluate random poly (prover.rs:112-134)
"""

from __future__ import annotations

import jax.numpy as jnp

from halo2_tpu.curves import g1
from halo2_tpu.fields.bn254 import Fr
from halo2_tpu.poly.arith import eval_poly
from halo2_tpu.poly.domain import Polynomial
from halo2_tpu.utils.jitutil import maybe_jit

P = Fr.p
F = Fr.raw


def _commit_coeff_affine(params, coeffs):
    proj = params.commit(coeffs)
    aff = g1.to_affine(tuple(c[:, None] for c in proj))
    return g1.decode_points(jnp.stack(aff))[0]


class VanishingProver:
    def __init__(self, params, domain, rng):
        self.params = params
        self.domain = domain
        self.random_poly = jnp.asarray(self._random_coeffs(rng, domain.n))
        self.random_commitment = _commit_coeff_affine(params, self.random_poly)

    @staticmethod
    def _random_coeffs(rng, n: int):
        """(16, n) Montgomery limbs of n uniform-mod-p blinding coeffs.

        Per coefficient: 64 random bytes, split as lo||hi and each half
        masked to 253 bits (< p, so the device encoder's precondition
        holds), combined ON DEVICE as lo + hi*2^253 mod p.  The sum is
        uniform over [0, 2^506) before reduction, so the mod-p bias is
        O(2^-253) — matching the reference's uniform sampling
        (vanishing/prover.rs:41-68) rather than the earlier [0, 2^253)
        truncation that left ~1/3 of Fr unreachable.  Cost: one
        rng.randbytes call, one device mul+add — no host bigint loop."""
        import numpy as np
        # chunked draw: one randbytes call of n*64 bytes overflows
        # getrandbits' C-int bit count at n = 2^22
        chunk = 1 << 24
        blob = b"".join(rng.randbytes(min(chunk, n * 64 - off))
                        for off in range(0, n * 64, chunk))
        arr = np.frombuffer(blob, dtype=np.uint8)
        arr = arr.reshape(2 * n, 32).copy()    # [lo_0..lo_{n-1}, hi_0..]
        arr[:, 31] &= 0x1F                     # 253-bit halves: < p always
        both = Fr.encode_le_bytes_dev(arr.tobytes(), 2 * n)
        lo, hi = both[:, :n], both[:, n:]
        shift = jnp.asarray(Fr.encode_scalar(pow(2, 253, P)))

        @maybe_jit
        def combine(lo, hi, shift):
            return F.add(lo, F.mul(hi, shift[:, None]))

        return combine(lo, hi, shift)

    def construct(self, h_ext, mesh=None, axis="x"):
        """h numerator on extended coset -> (pieces (16, qd, n), commitments).
        With a mesh, the extended iNTT runs as the distributed four-step
        transform (domain.extended_to_coeff mesh path)."""
        domain = self.domain
        h = domain.divide_by_vanishing_poly(Polynomial(h_ext, "extended"))
        h_coeff = domain.extended_to_coeff(h, mesh=mesh, axis=axis)  # (16, n*qd)
        qd = domain.quotient_poly_degree
        pieces = h_coeff.reshape(16, qd, domain.n)
        # all piece MSMs dispatch async; ONE batched to_affine + host decode
        from halo2_tpu.curves import g1 as _g1
        import jax.numpy as _jnp
        import numpy as _np
        projs = []
        if domain.n >= (1 << 22):
            _np.asarray(pieces[0, 0, :1])   # retire the iNTT before MSMs
        for i in range(qd):
            proj = self.params.commit(pieces[:, i, :])
            projs.append(proj)
            if domain.n >= (1 << 22) and i >= 1:
                # bound in-flight piece MSMs to TWO: at 2^22 each scan
                # group's working set is multi-GiB and async dispatch of
                # all qd together OOMed the warm k=22 re-prove; full
                # serialization wasted the dispatch gap — draining piece
                # i-1 while piece i's scan runs double-buffers them
                # (VERDICT r4 #3; a tiny host read forces completion,
                # block_until_ready returns early through the axon tunnel)
                _np.asarray(projs[i - 1][0][:1])
        stacked = tuple(_jnp.stack([p[i] for p in projs], axis=1)
                        for i in range(3))
        commitments = _g1.decode_points(_jnp.stack(_g1.to_affine(stacked)))
        return pieces, commitments

    def fold_h(self, pieces, xn: int):
        """h_poly = fold pieces by x^n (vanishing/prover.rs:112-134)."""
        xn_l = jnp.asarray(Fr.encode_scalar(xn))

        @maybe_jit
        def fold(pieces, xn_l):
            qd = pieces.shape[1]
            acc = pieces[:, qd - 1, :]
            for i in range(qd - 2, -1, -1):
                acc = F.add(F.mul(acc, xn_l[:, None]), pieces[:, i, :])
            return acc

        return fold(pieces, xn_l)

    def evaluate(self, pieces, x: int, xn: int):
        """h_poly = fold pieces by x^n; returns (h_poly coeffs, random_eval)."""
        h_poly = self.fold_h(pieces, xn)
        random_eval = eval_poly(self.random_poly, x)
        return h_poly, random_eval
