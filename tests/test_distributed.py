"""Distributed four-step NTT on a virtual 8-device CPU mesh vs single-chip."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as Pspec

from halo2_tpu.fields.bn254 import Fr
from halo2_tpu.ntt import NTT
from halo2_tpu.ntt.distributed import DistNTT

rng = random.Random(11)


@pytest.fixture(scope="module")
def mesh():
    devs = np.array(jax.devices()[:8])
    return Mesh(devs, ("x",))


@pytest.mark.parametrize("log_n", [8, 10])
def test_dist_ntt_matches_single(mesh, log_n):
    n = 1 << log_n
    xs = [rng.randrange(Fr.p) for _ in range(n)]
    a = jnp.asarray(Fr.encode(xs))
    single = Fr.decode(NTT(log_n).forward(a))
    dist = DistNTT(log_n, mesh)
    got = Fr.decode(np.asarray(dist.forward(a)))
    assert got == single


@pytest.mark.parametrize("log_n", [8, 10])
def test_dist_ntt_inverse_matches_single(mesh, log_n):
    """Batched distributed inverse (step-7 prover path under use_mesh)
    must be BYTE-identical to the single-chip inverse, divisor included."""
    n = 1 << log_n
    cols = [[rng.randrange(Fr.p) for _ in range(n)] for _ in range(2)]
    a = jnp.stack([jnp.asarray(Fr.encode(c)) for c in cols], axis=1)
    single = np.asarray(NTT(log_n).inverse(a))
    dist = DistNTT(log_n, mesh)
    got = np.asarray(dist.inverse(a))
    assert np.array_equal(got, single)
    # nodiv variant: differs from `inverse` exactly by the 1/n factor
    nodiv = np.asarray(dist.inverse_nodiv(a))
    assert np.array_equal(nodiv, np.asarray(NTT(log_n).inverse_nodiv(a)))


def test_dist_ntt_sharded_input(mesh):
    log_n = 9
    n = 1 << log_n
    xs = [rng.randrange(Fr.p) for _ in range(n)]
    a = jnp.asarray(Fr.encode(xs))
    dist = DistNTT(log_n, mesh)
    # pre-shard input on the column axis of the (n1, n2) view
    a3 = a.reshape(16, dist.n1, dist.n2)
    a_sharded = jax.device_put(a3, NamedSharding(mesh, Pspec(None, None, "x")))
    got = Fr.decode(np.asarray(dist.forward(a_sharded.reshape(16, n))))
    assert got == Fr.decode(NTT(log_n).forward(a))


def test_msm_sharded_matches_host(mesh):
    """Sharded MSM over the 8-device mesh == host golden model."""
    from halo2_tpu.curves import g1, host
    from halo2_tpu.msm.distributed import msm_sharded

    n = 2048
    r = random.Random(0xA11)
    pts = [host.random_point(r) for _ in range(n)]
    scalars = [r.randrange(Fr.p) for _ in range(n)]
    # degenerate digits in one shard: all-equal scalars in a stretch
    scalars[256:512] = [scalars[256]] * 256
    dev_pts = g1.encode_points(pts)
    dev_scal = jnp.asarray(Fr.encode(scalars))
    proj = msm_sharded((dev_pts[0], dev_pts[1]), dev_scal, mesh)
    got = g1.decode_points(
        jnp.stack(g1.to_affine(tuple(p[:, None] for p in proj))))[0]
    assert got == host.msm(pts, scalars)


def test_msm_sharded_bounded_bits(mesh):
    from halo2_tpu.curves import g1, host
    from halo2_tpu.msm.distributed import msm_sharded

    n = 1024
    r = random.Random(0xB22)
    pts = [host.random_point(r) for _ in range(n)]
    scalars = [r.randrange(1 << 16) for _ in range(n)]
    dev_pts = g1.encode_points(pts)
    dev_scal = jnp.asarray(Fr.encode(scalars))
    proj = msm_sharded((dev_pts[0], dev_pts[1]), dev_scal, mesh, max_bits=16)
    got = g1.decode_points(
        jnp.stack(g1.to_affine(tuple(p[:, None] for p in proj))))[0]
    assert got == host.msm(pts, scalars)


@pytest.fixture(scope="module")
def mesh2d():
    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    return Mesh(devs, ("dcn", "ici"))


def test_msm_sharded_2d_mesh(mesh2d):
    """2-D (DCN x ICI) mesh: points shard over all 8 devices, window totals
    reduce over the inner ICI axis first, then the outer DCN axis — only W
    reduced window points cross the outer axis (SURVEY §2.20 communication
    backend row)."""
    from halo2_tpu.curves import g1, host
    from halo2_tpu.msm.distributed import msm_sharded

    n = 2048
    r = random.Random(0xD2D)
    pts = [host.random_point(r) for _ in range(n)]
    scalars = [r.randrange(Fr.p) for _ in range(n)]
    dev_pts = g1.encode_points(pts)
    dev_scal = jnp.asarray(Fr.encode(scalars))
    proj = msm_sharded((dev_pts[0], dev_pts[1]), dev_scal, mesh2d,
                       axis=("dcn", "ici"))
    got = g1.decode_points(jnp.stack(g1.to_affine(
        tuple(c[:, None] for c in proj))))[0]
    want = host.msm(pts, scalars)
    assert got == want


def test_dist_ntt_dcn_batched(mesh2d):
    """Column-batched NTT on a 2-D mesh: the batch (column) dim shards over
    the outer DCN axis, each group runs the four-step transform with its
    all_to_all confined to the inner ICI axis — no cross-DCN collective in
    the transform at all."""
    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map

    log_n = 8
    n = 1 << log_n
    C = 4  # batch columns, sharded 2-way over dcn
    xs = [[rng.randrange(Fr.p) for _ in range(n)] for _ in range(C)]
    a = jnp.stack([jnp.asarray(Fr.encode(col)) for col in xs], axis=1)
    dist = DistNTT(log_n, mesh2d, axis="ici")

    def local(a_loc):
        # a_loc: (16, C/2, n) — this dcn group's columns, replicated on ici;
        # slice this ici-device's columns of the (n1, n2) view and transform
        x_loc = dist.local_slice_from_flat(a_loc)
        return dist.local_forward(x_loc)

    body = jax.jit(shard_map(
        local, mesh=mesh2d,
        in_specs=(Pspec(None, "dcn", None),),
        out_specs=Pspec(None, "dcn", "ici"),
        check_vma=False))
    got = np.asarray(body(a)).reshape(16, C, n)
    for ci in range(C):
        want = Fr.decode(NTT(log_n).forward(a[:, ci, :]))
        assert Fr.decode(got[:, ci, :]) == want
