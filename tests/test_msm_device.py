"""Fixed-shape device MSM (ops/msm_device.py) vs the golden model.

Runs the XLA scan path on the CPU test mesh (the single-pallas-call fold path
is exercised on real TPU by bench.py; both share the plan and combine code).
"""

import random

import numpy as np

from curdleproofs_tpu.backend import PurePythonBackend
from curdleproofs_tpu.constants import R
from curdleproofs_tpu.host.g1 import G1
from curdleproofs_tpu.host.rng import StdRng
from curdleproofs_tpu.ops.msm_device import (
    build_plan_glv, msm_device, pick_window_device,
)

rnd = random.Random(3)


def test_msm_device_matches_host():
    rng = StdRng.seed_from_u64(4)
    for n, c in ((7, 6), (40, None), (130, 8)):
        pts = [rng.rand_g1() for _ in range(n)]
        ss = [rnd.randrange(R) for _ in range(n)]
        ss[0] = 0
        ss[1] = 1
        ss[-1] = R - 1
        pts[2] = G1.infinity()
        if n > 20:
            pts[5] = pts[6]  # duplicate base
            ss[5] = ss[6]
        got = msm_device(pts, ss, c=c)
        want = PurePythonBackend().msm(pts, ss)
        assert got == want, f"n={n} c={c}"


def test_plan_glv_covers_every_entry_once():
    ss = [rnd.randrange(R) for _ in range(50)]
    c = pick_window_device(50)
    plan = build_plan_glv(ss, 50, c)
    sentinel = 4 * 50
    # non-sentinel plan cells land only in weighted slots, each slot capped
    live_cells = plan.plan < sentinel
    per_slot = live_cells.sum(axis=0)
    assert (per_slot[plan.slot_weight == 0] == 0).all()
    assert int(per_slot.max()) <= plan.plan.shape[0]
    # reconstruct the MSM value from the plan alone (host-side semantics)
    from curdleproofs_tpu.host import glv

    total = 0
    for s in np.nonzero(plan.slot_weight)[0]:
        w = int(plan.slot_window[s])
        weight = int(plan.slot_weight[s])
        for t in range(plan.plan.shape[0]):
            idx = int(plan.plan[t, s])
            if idx == sentinel:
                continue
            half, sign = idx % (2 * 50), idx >= 2 * 50
            pt, is_k2 = half % 50, half >= 50
            coeff = weight << (c * w)
            if sign:
                coeff = -coeff
            if is_k2:
                coeff *= glv.LAMBDA
            total += coeff * (1 << (pt * 3))  # toy "point" = 2^(3*pt)
    want = sum((s % R) * (1 << (p * 3)) for p, s in enumerate(ss))
    assert total % R == want % R
