"""Validated-decompress cache + raw-scalar MSM path.

The cache (host/serde.py) may only ever serve points whose curve AND
subgroup validation passed — a wrong cache entry would be a soundness bug,
so both the hit path and the must-not-cache-failures path are pinned here.
The raw-scalar MSM path (msm_scalars_raw / Backend.msm_raw) must agree with
the int-scalar engine bit for bit.
"""

import pytest

from curdleproofs_tpu.backend import HostBackend
from curdleproofs_tpu.host import serde
from curdleproofs_tpu.host.g1 import GENERATOR
from curdleproofs_tpu.host.rng import StdRng
from curdleproofs_tpu.host.serde import (
    SerializationError, deferred_subgroup_checks, g1_from_bytes,
    g1_from_bytes_batch, g1_to_bytes,
)


@pytest.fixture(autouse=True)
def _fresh_cache():
    serde._CACHE.clear()
    yield
    serde._CACHE.clear()


def test_cache_hit_returns_equal_point():
    rng = StdRng.seed_from_u64(11)
    pts = [rng.rand_g1() for _ in range(8)]
    bufs = [g1_to_bytes(p) for p in pts]
    first = g1_from_bytes_batch(bufs)          # eager validation -> cached
    assert serde._CACHE
    second = g1_from_bytes_batch(bufs)
    for a, b in zip(first, second):
        assert a is b                          # served from cache
    for p, a in zip(pts, first):
        assert p == a


def test_deferred_path_caches_only_after_check_passes():
    rng = StdRng.seed_from_u64(12)
    bufs = [g1_to_bytes(rng.rand_g1()) for _ in range(6)]
    with deferred_subgroup_checks():
        g1_from_bytes_batch(bufs)
        # inside the context nothing is validated yet -> nothing cached
        assert not serde._CACHE
    assert len(serde._CACHE) == 6              # populated at context exit


def test_failed_subgroup_check_is_never_cached():
    # x of a curve point OUTSIDE the prime-order subgroup: search x by
    # incrementing until on-curve, then reject if it lands in G1 (cofactor
    # ~2^125 makes that essentially impossible)
    from curdleproofs_tpu.host.g1 import get_ys_from_x

    x = 5
    while True:
        ys = get_ys_from_x(x)
        if ys is not None:
            break
        x += 1
    buf = bytearray(x.to_bytes(48, "big"))
    buf[0] |= 0x80
    buf = bytes(buf)
    for attempt in range(2):                   # second attempt re-validates
        with pytest.raises(SerializationError):
            with deferred_subgroup_checks():
                g1_from_bytes_batch([buf] * 4)
        assert buf not in serde._CACHE
    with pytest.raises(SerializationError):
        g1_from_bytes(buf)                     # eager path rejects too
    assert buf not in serde._CACHE


def test_cache_disabled_by_env(monkeypatch):
    monkeypatch.setenv("CP_NO_DECOMPRESS_CACHE", "1")
    g1_from_bytes(g1_to_bytes(GENERATOR))
    assert not serde._CACHE


def test_msm_raw_matches_int_engine():
    rng = StdRng.seed_from_u64(13)
    b = HostBackend()
    for n in (2, 5, 31, 32, 40, 200):          # spans the Straus/GLV cutoff
        pts = [rng.rand_g1() for _ in range(n)]
        ss = [rng.rand_fr() for _ in range(n)]
        sb = b"".join(s.to_bytes(32, "little") for s in ss)
        assert b.msm(pts, ss) == b.msm_raw(pts, sb)


def test_accumulator_raw_dedup_matches_int_dedup(monkeypatch):
    from curdleproofs_tpu import msm_accumulator as ma

    rng = StdRng.seed_from_u64(14)
    bases = [rng.rand_g1() for _ in range(400)]
    xs1 = [rng.rand_fr() for _ in range(400)]
    xs2 = [rng.rand_fr() for _ in range(400)]

    def build():                               # 900 terms: > _NATIVE_DEDUP_MIN
        acc = ma.MsmAccumulator()
        r = StdRng.seed_from_u64(99)           # same random factors
        acc.accumulate_zero(xs1, bases, r)
        acc.accumulate_zero(xs2, bases, r)     # same base list -> dedup
        acc.accumulate_zero(xs1[:100], bases[:100], r)
        return acc

    # int reference through the python dict merge (force it via threshold)
    monkeypatch.setattr(ma, "_NATIVE_DEDUP_MIN", 10**9)
    pts_i, ints = build()._dedup()
    monkeypatch.setattr(ma, "_NATIVE_DEDUP_MIN", 768)
    pts_r, raw = build().dedup_raw()
    assert [id(p) for p in pts_i] == [id(p) for p in pts_r]
    if isinstance(raw, (bytes, bytearray)):    # native runtime present
        got = [int.from_bytes(raw[i * 32:(i + 1) * 32], "little")
               for i in range(len(pts_r))]
        assert got == ints
