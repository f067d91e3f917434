"""Sharded Pippenger MSM on a virtual 8-device CPU mesh == host.

Covers both mesh axes: `points` (data parallel over MSM entries) and
`windows` (Pippenger windows tensor-parallel, SURVEY.md §2c row 3).
"""

import random

import jax
import pytest

from curdleproofs_tpu.backend import HostBackend
from curdleproofs_tpu.constants import R
from curdleproofs_tpu.host.rng import StdRng
from curdleproofs_tpu.parallel.sharded_msm import make_msm_mesh, sharded_msm

rnd = random.Random(7)


@pytest.fixture(scope="module")
def points64():
    rng = StdRng.seed_from_u64(11)
    return [rng.rand_g1() for _ in range(64)]


def test_mesh_has_8_virtual_devices():
    assert len(jax.devices()) == 8


def test_sharded_msm_matches_host(points64):
    scalars = [rnd.randrange(R) for _ in range(64)]
    mesh = make_msm_mesh(8)
    got = sharded_msm(points64, scalars, mesh)
    assert got == HostBackend().msm(points64, scalars)


def test_sharded_msm_window_axis(points64):
    """points x windows grid: 4 point shards x 2 window shards."""
    scalars = [rnd.randrange(R) for _ in range(64)]
    mesh = make_msm_mesh(8, n_window_shards=2)
    assert mesh.devices.shape == (4, 2)
    got = sharded_msm(points64, scalars, mesh)
    assert got == HostBackend().msm(points64, scalars)


def test_sharded_msm_ragged_and_small(points64):
    pts = points64[:11]
    scalars = [rnd.randrange(R) for _ in range(11)]
    mesh = make_msm_mesh(8)
    got = sharded_msm(pts, scalars, mesh)
    assert got == HostBackend().msm(pts, scalars)


def test_sharded_msm_on_sub_mesh(points64):
    scalars = [rnd.randrange(R) for _ in range(64)]
    mesh = make_msm_mesh(4)
    got = sharded_msm(points64, scalars, mesh)
    assert got == HostBackend().msm(points64, scalars)


def test_sharded_msm_non_pow2_points_axis(points64):
    """Dp=6 exercises the host-combine fallback (the on-device ppermute
    butterfly needs a power-of-2 points axis)."""
    scalars = [rnd.randrange(R) for _ in range(64)]
    mesh = make_msm_mesh(6)
    assert mesh.devices.shape == (6, 1)
    got = sharded_msm(points64, scalars, mesh)
    assert got == HostBackend().msm(points64, scalars)
