"""Host-planned device Pippenger MSM vs the golden model."""

import random

import pytest

from curdleproofs_tpu.backend import PurePythonBackend
from curdleproofs_tpu.constants import R
from curdleproofs_tpu.host.g1 import G1
from curdleproofs_tpu.host.rng import StdRng
from curdleproofs_tpu.ops.msm_pippenger import build_plan, msm_pippenger

rnd = random.Random(3)


def test_pippenger_device_matches_host():
    rng = StdRng.seed_from_u64(4)
    pts = [rng.rand_g1() for _ in range(40)]
    ss = [rnd.randrange(R) for _ in range(38)] + [0, 1]
    got = msm_pippenger(pts, ss, c=5)
    want = PurePythonBackend().msm(pts, ss)
    assert got == want


def test_pippenger_with_infinity_points():
    rng = StdRng.seed_from_u64(6)
    pts = [rng.rand_g1() for _ in range(6)] + [G1.infinity(), G1.infinity()]
    ss = [rnd.randrange(R) for _ in range(8)]
    assert msm_pippenger(pts, ss, c=5) == PurePythonBackend().msm(pts, ss)


def test_build_plan_shape_and_coverage():
    ss = [rnd.randrange(R) for _ in range(64)]
    plan = build_plan(ss, 64, 6)
    windows = (255 + 5) // 6
    assert plan.shape[0] == windows and plan.shape[1] == 63
    # every nonzero digit occurrence appears exactly once in the plan
    import numpy as np

    total_nonzero = sum(
        1 for s in ss for w in range(windows)
        if (s >> (6 * w)) & 63)
    assert int((plan < 64).sum()) == total_nonzero
