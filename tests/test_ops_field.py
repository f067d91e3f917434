"""Device limb arithmetic vs the host golden model (random + edge cases)."""

import random

import jax
import jax.numpy as jnp
import numpy as np

from curdleproofs_tpu.constants import Q
from curdleproofs_tpu.host.g1 import G1, GENERATOR
from curdleproofs_tpu.ops.field import FQ
from curdleproofs_tpu.ops.g1_ops import (
    g1_add, g1_double, g1_select, points_from_device,
    points_to_device,
)
from curdleproofs_tpu.ops.limbs import FQ_LIMBS, ints_to_limbs, limbs_to_ints

rnd = random.Random(1234)

# jit everything once: eager mode would compile thousands of individual limb ops
fq_add = jax.jit(FQ.add)
fq_sub = jax.jit(FQ.sub)
fq_neg = jax.jit(FQ.neg)
fq_mul = jax.jit(FQ.mul)
fq_mul12 = jax.jit(lambda a: FQ.mul_const(a, 12))
j_add = jax.jit(g1_add)
j_double = jax.jit(g1_double)
j_select = jax.jit(g1_select)


def _vals(n):
    vals = [rnd.randrange(Q) for _ in range(n - 4)]
    return vals + [0, 1, Q - 1, Q // 2]


def _dev(vals):
    # limb-major [24, B]
    return jnp.asarray(ints_to_limbs([FQ.to_mont(v) for v in vals], FQ_LIMBS).T)


def _host(arr):
    return [FQ.from_mont(v) for v in limbs_to_ints(np.asarray(arr).T)]


def test_fq_add_sub_neg_mul():
    n = 32
    a, b = _vals(n), list(reversed(_vals(n)))
    da, db = _dev(a), _dev(b)

    assert _host(fq_add(da, db)) == [(x + y) % Q for x, y in zip(a, b)]
    assert _host(fq_sub(da, db)) == [(x - y) % Q for x, y in zip(a, b)]
    assert _host(fq_neg(da)) == [(Q - x) % Q if x else 0 for x in a]
    assert _host(fq_mul(da, db)) == [x * y % Q for x, y in zip(a, b)]
    assert _host(fq_mul12(da)) == [x * 12 % Q for x in a]


def test_fq_mul_stress():
    n = 256
    a = [rnd.randrange(Q) for _ in range(n)]
    b = [rnd.randrange(Q) for _ in range(n)]
    got = _host(fq_mul(_dev(a), _dev(b)))
    assert got == [x * y % Q for x, y in zip(a, b)]


def test_g1_roundtrip_and_add():
    pts = [GENERATOR.mul(k) for k in [1, 2, 3, 12345]] + [G1.infinity()]
    dev = points_to_device(pts)
    back = points_from_device(dev)
    assert back == pts

    # pairwise adds including infinity operands
    qs = [GENERATOR.mul(k) for k in [7, 11, 13, 17]] + [GENERATOR]
    dq = points_to_device(qs)
    got = points_from_device(j_add(dev, dq))
    assert got == [p.add(q) for p, q in zip(pts, qs)]


def test_g1_double_and_exceptional_cases():
    g = GENERATOR
    pts = [g, g.mul(5), G1.infinity()]
    dev = points_to_device(pts)
    got = points_from_device(j_double(dev))
    assert got == [p.double() for p in pts]

    # P + P (doubling through add), P + (-P) (cancellation), inf + inf
    ps = [g, g.mul(9), G1.infinity()]
    qs = [g, g.mul(9).neg(), G1.infinity()]
    got = points_from_device(j_add(points_to_device(ps), points_to_device(qs)))
    assert got == [p.add(q) for p, q in zip(ps, qs)]


def test_g1_select():
    a = points_to_device([GENERATOR, GENERATOR.mul(2)])
    b = points_to_device([G1.infinity(), GENERATOR.mul(3)])
    got = points_from_device(j_select(jnp.asarray([True, False]), a, b))
    assert got == [GENERATOR, GENERATOR.mul(3)]
