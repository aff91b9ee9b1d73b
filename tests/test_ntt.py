"""NTT correctness vs naive host-side DFT over Fr."""

import random

import jax.numpy as jnp
import pytest

from halo2_tpu.fields.bn254 import Fr
from halo2_tpu.ntt import NTT

rng = random.Random(7)
P = Fr.p


def naive_dft(coeffs, omega):
    n = len(coeffs)
    return [
        sum(c * pow(omega, i * j, P) for j, c in enumerate(coeffs)) % P
        for i in range(n)
    ]


@pytest.mark.parametrize("log_n", [0, 1, 3, 6, 10])
def test_forward_matches_naive(log_n):
    n = 1 << log_n
    ntt = NTT(log_n)
    xs = [rng.randrange(P) for _ in range(n)]
    a = jnp.asarray(Fr.encode(xs))
    got = Fr.decode(ntt.forward(a))
    assert got == naive_dft(xs, ntt.omega)


@pytest.mark.parametrize("log_n", [1, 4, 12])
def test_roundtrip(log_n):
    n = 1 << log_n
    ntt = NTT(log_n)
    xs = [rng.randrange(P) for _ in range(n)]
    a = jnp.asarray(Fr.encode(xs))
    back = Fr.decode(ntt.inverse(ntt.forward(a)))
    assert back == xs


def test_inverse_nodiv():
    log_n = 5
    n = 1 << log_n
    ntt = NTT(log_n)
    xs = [rng.randrange(P) for _ in range(n)]
    a = jnp.asarray(Fr.encode(xs))
    nodiv = Fr.decode(ntt.inverse_nodiv(ntt.forward(a)))
    assert nodiv == [x * n % P for x in xs]


def test_custom_omega_coset_consistency():
    # NTT with omega^2 over half domain == even-index subsampling property:
    # eval(poly, w^(2i)) for poly of degree < n/2
    log_n = 6
    ntt = NTT(log_n)
    half = NTT(log_n - 1, omega=ntt.omega * ntt.omega % P)
    xs = [rng.randrange(P) for _ in range(1 << (log_n - 1))]
    a = jnp.asarray(Fr.encode(xs))
    evals_half = Fr.decode(half.forward(a))
    full = naive_dft(xs + [0] * (1 << (log_n - 1)), ntt.omega)
    assert evals_half == full[::2]


@pytest.mark.parametrize("log_n,chunks_log", [(6, 2), (10, 3), (11, 3)])
def test_inverse_streamed_bit_identical(log_n, chunks_log):
    """The chunked streaming inverse (large-domain memory-relief path)
    must be BIT-identical to the monolithic transform."""
    ntt = NTT(log_n)
    xs = [rng.randrange(P) for _ in range(1 << log_n)]
    a = jnp.asarray(Fr.encode(xs))
    mono = ntt.inverse_nodiv(a)
    streamed = ntt.inverse_streamed_nodiv(a, chunks_log=chunks_log)
    import numpy as np
    assert np.array_equal(np.asarray(mono), np.asarray(streamed))
