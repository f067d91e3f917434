"""On-device Pippenger MSM (ops/msm_device.py) vs the golden host model.

Runs the jnp path on the CPU test mesh (the Pallas fold/suffix kernels are
exercised on real TPU by bench.py and the `-m tpu` KAT tier; both share the
whole plan/merge/reduction program).
"""

import random

from curdleproofs_tpu.backend import PurePythonBackend
from curdleproofs_tpu.constants import R
from curdleproofs_tpu.host.g1 import G1
from curdleproofs_tpu.host.rng import StdRng
from curdleproofs_tpu.ops.msm_device import (
    DeviceBases, msm_device, pick_params, prepare_bases,
)

rnd = random.Random(3)


def test_msm_device_matches_host():
    # c=16 end-to-end lives in the `-m tpu` tier: its 2^19 dense buckets are
    # minutes of jnp fallback on CPU but ~50 ms of Pallas on hardware.
    rng = StdRng.seed_from_u64(4)
    for n, c in ((7, 8), (40, None), (130, 8)):
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


def test_msm_device_adversarial_digit_skew():
    """All-equal scalars put every entry of a window into ONE bucket — the
    deepest slot-merge case (the while_loop must iterate log2(n/T) rounds)."""
    rng = StdRng.seed_from_u64(9)
    n = 96
    pts = [rng.rand_g1() for _ in range(n)]
    s = rnd.randrange(R)
    ss = [s] * n
    got = msm_device(pts, ss, c=8)
    want = PurePythonBackend().msm(pts, ss)
    assert got == want


def test_msm_device_no_dead_tail_regression():
    """Exact power-of-two n with fully-live top-window digits: the plan
    gather once clipped out-of-run rows onto the LAST sorted entry, whose
    slot id matched, silently double-counting it (caught at n=64/128)."""
    for n in (64, 128):
        rnd2 = random.Random(7)
        rng = StdRng.seed_from_u64(11)
        pts = [rng.rand_g1() for _ in range(n)]
        ss = [rnd2.randrange(R) for _ in range(n)]
        got = msm_device(pts, ss, c=8)
        want = PurePythonBackend().msm(pts, ss)
        assert got == want, f"n={n}"


def test_msm_device_all_zero_and_tiny():
    rng = StdRng.seed_from_u64(11)
    pts = [rng.rand_g1() for _ in range(5)]
    assert msm_device(pts, [0] * 5) == G1.infinity()
    assert msm_device([], []) == G1.infinity()
    assert msm_device(pts[:1], [3]) == pts[0].mul(3)


def test_device_bases_reuse():
    rng = StdRng.seed_from_u64(12)
    pts = [rng.rand_g1() for _ in range(33)]
    bases = prepare_bases(pts)
    assert prepare_bases(pts) is bases  # id-cache hit
    assert isinstance(bases, DeviceBases)
    ss1 = [rnd.randrange(R) for _ in range(33)]
    ss2 = [rnd.randrange(R) for _ in range(33)]
    host = PurePythonBackend()
    assert msm_device(bases, ss1) == host.msm(pts, ss1)
    assert msm_device(bases, ss2) == host.msm(pts, ss2)


def test_signed_digits_recode():
    """sum_w d_w 2^(cw) == scalar and |d_w| <= 2^(c-1), for both window
    widths (this is the only c-dependent stage of the pipeline)."""
    import jax.numpy as jnp
    import numpy as np

    from curdleproofs_tpu.ops.msm_device import (
        _scalars_to_limbs, _signed_digits,
    )

    ss = [rnd.randrange(R) for _ in range(17)] + [0, 1, R - 1, R >> 1]
    n = len(ss)
    limbs = jnp.asarray(_scalars_to_limbs(ss, n))
    for c in (8, 16):
        d = np.asarray(_signed_digits(limbs, n, c)).astype(np.int64)
        assert np.abs(d).max() <= 1 << (c - 1)
        for i, s in enumerate(ss):
            val = sum(int(d[w, i]) << (c * w) for w in range(d.shape[0]))
            assert val == s, f"c={c} scalar {i}"


def test_pick_params_shape_families():
    p = pick_params(1 << 16)
    assert p.c == 8 and p.s_pad % 512 == 0 and p.t_rows % 8 == 0
    assert pick_params(1 << 19).c == 16
    # quarter-pow2 padding keeps the family count small
    assert pick_params(1000).n == pick_params(1024).n
