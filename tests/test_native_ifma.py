"""IFMA (AVX512 radix-2^52) native paths vs the scalar native/Python paths.

The IFMA engine powers the MSM bucket phase, the fold/batch-mul ladders and
the bucket chains (host/native/ifma52.h + bls12_381.cpp). These tests pin:
- the engine self-test (montmul8/add8/sub8/neg8 vs the scalar ADX path),
- MSM / fold / batch-mul equivalence against the pure-Python group law,
  including infinity points, duplicate bases, tiny and boundary scalars.

Skipped wholesale when the native library or IFMA is unavailable (the
protocol tests still cover the scalar fallbacks there).
"""

import ctypes
import random

import pytest

from curdleproofs_tpu.constants import R
from curdleproofs_tpu.host import native
from curdleproofs_tpu.host.g1 import G1, GENERATOR

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable")


def _ifma_available() -> bool:
    lib = native.lib()
    try:
        lib.cp_ifma_available.restype = ctypes.c_int
        return bool(lib.cp_ifma_available())
    except AttributeError:
        return False


def _rand_pt(rng: random.Random) -> G1:
    return GENERATOR.mul(rng.randrange(1, R))


def test_ifma_selftest():
    if not _ifma_available():
        pytest.skip("no AVX512-IFMA on this host")
    lib = native.lib()
    lib.cp_ifma_selftest.restype = ctypes.c_int
    assert lib.cp_ifma_selftest() == 0


def test_msm_glv_matches_python():
    rng = random.Random(1234)
    for n in (32, 33, 64, 257):
        pts = [_rand_pt(rng) for _ in range(n)]
        ss = [rng.randrange(R) for _ in range(n)]
        ss[0] = 0
        ss[1] = 1
        ss[2] = R - 1
        pts[3] = G1.infinity()
        pts[5] = pts[6]          # duplicate base -> forced bucket doubles
        ss[5] = ss[6]
        acc = G1.infinity()
        for p, s in zip(pts, ss):
            acc = acc.add(p.mul(s))
        assert native.msm(pts, ss) == acc


def test_fold_and_batch_mul_match_python():
    rng = random.Random(99)
    for n in (5, 8, 16, 33):
        left = [_rand_pt(rng) for _ in range(n)]
        right = [_rand_pt(rng) for _ in range(n)]
        left[0] = G1.infinity()
        right[-1] = G1.infinity()
        for gamma in (0, 1, 2, R - 1, rng.randrange(R)):
            want = [l.add(r.mul(gamma)) for l, r in zip(left, right)]
            assert native.fold_glv(left, right, gamma) == want
        k = rng.randrange(R)
        assert native.batch_mul_glv(right, k) == [p.mul(k) for p in right]


def test_batch_mul_each_matches_python():
    rng = random.Random(7)
    for n in (4, 9, 24):
        pts = [_rand_pt(rng) for _ in range(n)]
        ss = [rng.randrange(R) for _ in range(n)]
        ss[0] = 0
        pts[1] = G1.infinity()
        want = [p.mul(s) for p, s in zip(pts, ss)]
        assert native.batch_mul_each_glv(pts, ss) == want


def test_scalar_fallback_paths_match(monkeypatch):
    """CP_NO_IFMA routes the native calls through the scalar C++ paths;
    results must be identical (covers machines without AVX512-IFMA)."""
    if not _ifma_available():
        pytest.skip("no AVX512-IFMA on this host (fallback is the only path)")
    rng = random.Random(77)
    n = 40
    pts = [_rand_pt(rng) for _ in range(n)]
    ss = [rng.randrange(R) for _ in range(n)]
    left = [_rand_pt(rng) for _ in range(n)]
    gamma = rng.randrange(R)
    with_ifma = (native.msm(pts, ss),
                 native.fold_glv(left, pts, gamma),
                 native.batch_mul_each_glv(pts, ss),
                 native.msm_many([(pts[:20], ss[:20]), (pts[20:], ss[20:])]))
    monkeypatch.setenv("CP_NO_IFMA", "1")
    without = (native.msm(pts, ss),
               native.fold_glv(left, pts, gamma),
               native.batch_mul_each_glv(pts, ss),
               native.msm_many([(pts[:20], ss[:20]), (pts[20:], ss[20:])]))
    assert with_ifma == without


def test_batch_to_affine_matches_python():
    rng = random.Random(42)
    pts = [_rand_pt(rng) for _ in range(20)]
    pts[3] = G1.infinity()
    got = native.batch_to_affine(pts)
    for p, a in zip(pts, got):
        if p.z == 0:
            assert a is None
        else:
            assert a == p.to_affine()


def test_msm_scatter_degenerate_distributions():
    """Stress the scatter bucket phase's conflict machinery: identical
    scalars force every window's entries into ONE slot (maximal overflow,
    exercising the counting-sort + pair-tree drain), P/-P pairs force
    cancellation lanes, and same-base-same-scalar repeats force doubling
    lanes inside the overflow tree."""
    rng = random.Random(77)

    # all-identical scalars: worst-case hot slots in every window
    for n in (64, 300):
        pts = [_rand_pt(rng) for _ in range(n)]
        s = rng.randrange(1, R)
        want = G1.infinity()
        for p in pts:
            want = want.add(p)
        assert native.msm(pts, [s] * n) == want.mul(s)

    # half the points are the negations of the other half, same scalars:
    # every bucket collapses to infinity through the cancel path
    pts = [_rand_pt(rng) for _ in range(40)]
    negs = [p.neg() for p in pts]
    s = rng.randrange(1, R)
    assert native.msm(pts + negs, [s] * 80).is_infinity()

    # one repeated point with one repeated scalar: deep doubling chains
    p = _rand_pt(rng)
    s = rng.randrange(1, R)
    assert native.msm([p] * 100, [s] * 100) == p.mul(100 * s % R)

    # mixture: repeats + infinities + zero scalars + tiny scalars
    pts = [_rand_pt(rng) for _ in range(20)]
    pts = pts * 10
    ss = [rng.randrange(R) for _ in range(100)] + [0] * 50 + \
        [rng.randrange(4) for _ in range(50)]
    pts[7] = G1.infinity()
    acc = G1.infinity()
    for q, x in zip(pts, ss):
        acc = acc.add(q.mul(x))
    assert native.msm(pts, ss) == acc
