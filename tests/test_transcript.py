"""Transcript: write/read symmetry, point codec, challenge determinism."""

import random

import pytest

from halo2_tpu.curves import host
from halo2_tpu.transcript import (
    Blake2bRead,
    Blake2bWrite,
    point_from_bytes,
    point_to_bytes,
)

rng = random.Random(99)


def test_point_codec_roundtrip():
    for _ in range(8):
        p = host.random_point(rng)
        assert point_from_bytes(point_to_bytes(p)) == p
    assert point_from_bytes(point_to_bytes(None)) is None


def test_write_read_symmetry():
    pts = [host.random_point(rng) for _ in range(3)]
    scalars = [rng.randrange(host.R) for _ in range(3)]

    w = Blake2bWrite()
    w.write_point(pts[0])
    c1 = w.squeeze_challenge()
    w.write_scalar(scalars[0])
    w.write_point(pts[1])
    c2 = w.squeeze_challenge()
    w.write_scalar(scalars[1])
    w.write_point(pts[2])
    w.write_scalar(scalars[2])
    c3 = w.squeeze_challenge()
    proof = w.finalize()
    assert len(proof) == 3 * 32 + 3 * 32

    r = Blake2bRead(proof)
    assert r.read_point() == pts[0]
    assert r.squeeze_challenge() == c1
    assert r.read_scalar() == scalars[0]
    assert r.read_point() == pts[1]
    assert r.squeeze_challenge() == c2
    assert r.read_scalar() == scalars[1]
    assert r.read_point() == pts[2]
    assert r.read_scalar() == scalars[2]
    assert r.squeeze_challenge() == c3
    r.assert_exhausted()


def test_challenges_differ_by_absorbed_data():
    w1, w2 = Blake2bWrite(), Blake2bWrite()
    p = host.random_point(rng)
    w1.write_point(p)
    w2.write_point(host.double(p))
    assert w1.squeeze_challenge() != w2.squeeze_challenge()
    # squeezing twice in a row gives different values (prefix re-absorbed)
    a = w1.squeeze_challenge()
    b = w1.squeeze_challenge()
    assert a != b


def test_invalid_point_rejected():
    # find an x with x^3 + 3 a non-residue
    x = 2
    while pow(x * x * x + 3, (host.Q - 1) // 2, host.Q) == 1:
        x += 1
    with pytest.raises(ValueError):
        point_from_bytes(x.to_bytes(32, "little"))
    # x >= q also rejected
    with pytest.raises(ValueError):
        point_from_bytes((host.Q).to_bytes(32, "little"))
