"""Field-layer differential tests: jnp limb arithmetic vs Python big-int
golden model (the analogue of the reference's reliance on `pairing_bn256`
being correct; here WE are the field implementation, so we test exhaustively
against exact integer arithmetic)."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from halo2_tpu.fields import limbs as lb
from halo2_tpu.fields.bn254 import Fr, Fq, FR_MODULUS, FR_ROOT_OF_UNITY

rng = random.Random(0xC0FFEE)


def rand_ints(n, p):
    return [rng.randrange(p) for _ in range(n)]


@pytest.mark.parametrize("F", [Fr, Fq], ids=["Fr", "Fq"])
def test_roundtrip(F):
    xs = rand_ints(17, F.p) + [0, 1, F.p - 1]
    enc = F.encode(xs)
    assert F.decode(enc) == [x % F.p for x in xs]


@pytest.mark.parametrize("F", [Fr, Fq], ids=["Fr", "Fq"])
def test_add_sub_neg(F):
    n = 64
    xs, ys = rand_ints(n, F.p), rand_ints(n, F.p)
    a, b = jnp.asarray(F.encode(xs)), jnp.asarray(F.encode(ys))
    assert F.decode(F.add(a, b)) == [(x + y) % F.p for x, y in zip(xs, ys)]
    assert F.decode(F.sub(a, b)) == [(x - y) % F.p for x, y in zip(xs, ys)]
    assert F.decode(F.neg(a)) == [(-x) % F.p for x in xs]
    # edge: zero stays zero under neg
    z = jnp.asarray(F.encode([0, F.p - 1]))
    assert F.decode(F.neg(z)) == [0, 1]


@pytest.mark.parametrize("F", [Fr, Fq], ids=["Fr", "Fq"])
def test_mul(F):
    n = 64
    xs, ys = rand_ints(n, F.p), rand_ints(n, F.p)
    xs[:3] = [0, 1, F.p - 1]
    ys[:3] = [F.p - 1, F.p - 1, F.p - 1]
    a, b = jnp.asarray(F.encode(xs)), jnp.asarray(F.encode(ys))
    got = F.decode(F.mul(a, b))
    assert got == [(x * y) % F.p for x, y in zip(xs, ys)]


def test_mul_wide_exact():
    xs, ys = rand_ints(16, 1 << 256), rand_ints(16, 1 << 256)
    a = jnp.asarray(lb.ints_to_limbs_np(xs))
    b = jnp.asarray(lb.ints_to_limbs_np(ys))
    wide = lb.mul_wide(a, b)
    got = lb.limbs_to_ints(np.asarray(wide))
    assert got == [x * y for x, y in zip(xs, ys)]


@pytest.mark.parametrize("F", [Fr, Fq], ids=["Fr", "Fq"])
def test_inv_and_pow(F):
    xs = rand_ints(8, F.p)
    xs[0] = 1
    a = jnp.asarray(F.encode(xs))
    inv = F.inv(a)
    assert F.decode(inv) == [pow(x, F.p - 2, F.p) for x in xs]
    sq = F.pow_static(a, 5)
    assert F.decode(sq) == [pow(x, 5, F.p) for x in xs]


def test_batch_inverse_with_zeros():
    F = Fr
    xs = rand_ints(33, F.p)
    xs[5] = 0
    xs[17] = 0
    a = jnp.asarray(F.encode(xs))
    inv = F.batch_inverse(a)
    expect = [pow(x, F.p - 2, F.p) if x else 0 for x in xs]
    assert F.decode(inv) == expect


def test_mont_form_constants():
    # root of unity has order 2**28 exactly
    w = FR_ROOT_OF_UNITY
    assert pow(w, 1 << 28, FR_MODULUS) == 1
    assert pow(w, 1 << 27, FR_MODULUS) != 1


def test_jit_and_broadcast():
    F = Fr
    xs = rand_ints(16, F.p)
    a = jnp.asarray(F.encode(xs))
    c = jnp.asarray(F.encode_scalar(3))[:, None]
    f = jax.jit(lambda u, v: F.mul(u, v))
    assert F.decode(f(a, c)) == [(x * 3) % F.p for x in xs]


def test_2d_batch():
    F = Fr
    xs = rand_ints(24, F.p)
    a = jnp.asarray(F.encode(xs)).reshape(16, 4, 6)
    b = jnp.asarray(F.encode(xs[::-1])).reshape(16, 4, 6)
    got = np.asarray(F.mul(a, b)).reshape(16, 24)
    expect = [(x * y) % F.p for x, y in zip(xs, xs[::-1])]
    assert F.decode(got) == expect
