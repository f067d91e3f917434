"""Grouped device MSM (ops/msm_grouped.py): many small MSMs in one dispatch
must equal per-relation host MSMs — including indirect columns, negatives-
heavy digits, shared bases across relations, and dead padding."""

import random

import pytest

from curdleproofs_tpu.backend import HostBackend
from curdleproofs_tpu.constants import R
from curdleproofs_tpu.host.rng import StdRng
from curdleproofs_tpu.ops.msm_device import DeviceBases
from curdleproofs_tpu.ops.msm_grouped import grouped_msm

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def pool():
    rng = StdRng.seed_from_u64(7)
    return [rng.rand_g1() for _ in range(64)]


def _host(points, scalars):
    return HostBackend().msm(points, scalars)


def test_grouped_matches_host(pool):
    rnd = random.Random(3)
    bases = DeviceBases(pool)
    rels = []
    for i in range(5):
        w = rnd.randrange(3, len(pool))
        cols = rnd.sample(range(len(pool)), w)
        ss = [rnd.randrange(R) for _ in range(w)]
        rels.append((cols, ss))
    got = grouped_msm(bases, rels)
    for (cols, ss), g in zip(rels, got):
        want = _host([pool[c] for c in cols], ss)
        assert g.to_affine() == want.to_affine()


def test_grouped_edge_scalars(pool):
    bases = DeviceBases(pool)
    n = 8
    cols = list(range(n))
    rels = [
        (cols, [0] * n),                      # all-zero -> infinity
        (cols, [1] * n),                      # plain sum
        (cols, [R - 1] * n),                  # -1 everywhere (negatives path)
        (cols, [8] * n),                      # digit exactly at half (8)
        (cols, [(1 << 252) + 7] * n),         # top-window + carry absorption
        ([3] * n, [5] * n),                   # repeated base in one relation
    ]
    got = grouped_msm(bases, rels)
    for (cc, ss), g in zip(rels, got):
        want = _host([pool[c] for c in cc], ss)
        assert g.to_affine() == want.to_affine()


def test_grouped_single_and_empty_relations(pool):
    bases = DeviceBases(pool)
    got = grouped_msm(bases, [([0], [12345]), ([1, 2], [1, R - 2])])
    assert got[0].to_affine() == pool[0].mul(12345).to_affine()
    want = pool[1].add(pool[2].mul(R - 2))
    assert got[1].to_affine() == want.to_affine()
    assert grouped_msm(bases, []) == []


def test_table_mode_matches_host(pool):
    """Dense table path (precomputed d*P multiples, streaming fold) must
    equal per-relation host MSMs on the same adversarial shapes as the
    slot path — including negatives, repeats, top-window carries and the
    d=8 table edge."""
    from curdleproofs_tpu.ops.msm_grouped import (
        DeviceBasesTable, grouped_msm_table,
    )

    rnd = random.Random(5)
    table = DeviceBasesTable(DeviceBases(pool))
    n = 12
    cols = list(range(n))
    rels = [
        (cols, [rnd.randrange(R) for _ in range(n)]),
        (cols, [0] * n),
        (cols, [R - 1] * n),                  # negatives everywhere
        (cols, [8] * n),                      # digit exactly 8 (max multiple)
        (cols, [(1 << 252) + 7] * n),         # top-window carry
        ([3] * n, [5] * n),                   # repeated base (P+P inside fold)
        ([7], [1 << 254]),                    # short relation + padding
    ]
    got = grouped_msm_table(table, rels)
    for (cc, ss), g in zip(rels, got):
        want = _host([pool[c] for c in cc], ss)
        assert g.to_affine() == want.to_affine()
    assert grouped_msm_table(table, []) == []
