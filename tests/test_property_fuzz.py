"""Property-based fuzzing (hypothesis) over the arithmetic substrate.

The reference relies on arkworks' own test suites for field/curve laws;
here the first-party layers get fuzzed directly: device limb field vs the
python-int golden model, signed-digit recode, serde round-trips, and host
group laws.  Deterministic profile (derandomize) keeps CI stable.
"""

import jax.numpy as jnp
import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from curdleproofs_tpu.constants import Q, R
from curdleproofs_tpu.host.g1 import G1
from curdleproofs_tpu.host.rng import StdRng
from curdleproofs_tpu.host.serde import fr_from_bytes, fr_to_bytes, g1_from_bytes, g1_to_bytes
from curdleproofs_tpu.ops.field import FQ
from curdleproofs_tpu.ops.limbs import FQ_LIMBS, ints_to_limbs, limbs_to_ints

cfg = settings(max_examples=30, deadline=None, derandomize=True,
               suppress_health_check=[HealthCheck.too_slow])

fq_el = st.integers(min_value=0, max_value=Q - 1)
fr_el = st.integers(min_value=0, max_value=R - 1)


def _dev(xs):
    return jnp.asarray(ints_to_limbs([FQ.to_mont(x) for x in xs], FQ_LIMBS).T)


def _host(arr):
    return [FQ.from_mont(v) for v in limbs_to_ints(np.asarray(arr).T)]


@cfg
@given(st.lists(fq_el, min_size=1, max_size=8),
       st.lists(fq_el, min_size=1, max_size=8))
def test_fq_field_laws_vs_python(xs, ys):
    n = min(len(xs), len(ys))
    xs, ys = xs[:n], ys[:n]
    a, b = _dev(xs), _dev(ys)
    assert _host(FQ.mul(a, b)) == [x * y % Q for x, y in zip(xs, ys)]
    assert _host(FQ.add(a, b)) == [(x + y) % Q for x, y in zip(xs, ys)]
    assert _host(FQ.sub(a, b)) == [(x - y) % Q for x, y in zip(xs, ys)]
    assert _host(FQ.neg(a)) == [(-x) % Q for x in xs]


@cfg
@given(st.lists(fr_el, min_size=1, max_size=6), st.integers(8, 16))
def test_signed_digits_reconstruct(ss, c_raw):
    from curdleproofs_tpu.ops.msm_device import _scalars_to_limbs, _signed_digits

    c = 8 if c_raw < 12 else 16
    limbs = jnp.asarray(_scalars_to_limbs(ss, len(ss)))
    d = np.asarray(_signed_digits(limbs, len(ss), c)).astype(np.int64)
    assert np.abs(d).max(initial=0) <= 1 << (c - 1)
    for i, s in enumerate(ss):
        assert sum(int(d[w, i]) << (c * w) for w in range(d.shape[0])) == s


@cfg
@given(fr_el)
def test_fr_serde_roundtrip(v):
    assert fr_from_bytes(fr_to_bytes(v)) == v


@cfg
@given(st.integers(0, 2**64 - 1), fr_el, fr_el)
def test_g1_group_laws_and_serde(seed, s1, s2):
    rng = StdRng.seed_from_u64(seed)
    p = rng.rand_g1()
    q = rng.rand_g1()
    # commutativity / associativity spot identities
    assert p.add(q) == q.add(p)
    assert p.add(p) == p.double()
    assert p.add(G1.infinity()) == p
    assert p.add(p.neg()).is_infinity()
    # scalar distributivity
    assert p.mul(s1).add(p.mul(s2)) == p.mul((s1 + s2) % R)
    # compressed codec round-trip
    assert g1_from_bytes(g1_to_bytes(p)) == p
    assert g1_from_bytes(g1_to_bytes(G1.infinity())) == G1.infinity()


@cfg
@given(st.lists(st.one_of(
    st.lists(fr_el, max_size=5),
    st.lists(fr_el, max_size=5).map(
        lambda xs: b"".join(x.to_bytes(32, "little") for x in xs)),
), max_size=6), st.lists(fr_el, max_size=3))
def test_frvec_raw_int_duality(parts, tail):
    """FrVec over arbitrary int-list / raw-block / nested compositions:
    to_raw and to_ints agree, concatenation and length law hold."""
    from curdleproofs_tpu.util import FrVec

    v = FrVec(*parts)
    n = sum(len(p) // 32 if isinstance(p, bytes) else len(p) for p in parts)
    assert len(v) == n
    ints = v.to_ints()
    raw = v.to_raw()
    assert len(ints) == n and len(raw) == 32 * n
    assert [int.from_bytes(raw[i * 32:(i + 1) * 32], "little")
            for i in range(n)] == ints
    w = FrVec(v, tail) + tail            # nested + appended + __add__
    assert len(w) == n + 2 * len(tail)
    assert w.to_ints() == ints + tail + tail
    assert w.to_raw() == raw + 2 * b"".join(
        t.to_bytes(32, "little") for t in tail)
