

def test_verification_scalar_products_match_bitstring():
    import random

    from curdleproofs_tpu.constants import R
    from curdleproofs_tpu.util import (
        get_verification_scalars_bitstring, verification_scalar_products,
    )

    rnd = random.Random(5)
    for logn in (1, 3, 8):
        n = 1 << logn
        ch = [rnd.randrange(1, R) for _ in range(logn)]
        bitstring = get_verification_scalars_bitstring(n, logn)
        want = []
        for i in range(n):
            s = 1
            for j in bitstring[i]:
                s = s * ch[j] % R
            want.append(s)
        assert verification_scalar_products(ch, n) == want


def test_scaled_verification_products_native_vs_python():
    """The fused native chain (cp_fr_vsp) must agree with the pure-python
    composition for every flag combination, including the n-not-full edge
    (n < 2^logn never occurs in the protocol but the kernel is total)."""
    import random

    from curdleproofs_tpu.constants import R
    from curdleproofs_tpu.util import (
        scaled_verification_products, verification_scalar_products,
    )

    rnd = random.Random(11)
    for logn in (1, 4, 6):
        n = 1 << logn
        ch = [rnd.randrange(1, R) for _ in range(logn)]
        s = verification_scalar_products(ch, n)
        cmul = rnd.randrange(1, R)
        mv = [rnd.randrange(R) for _ in range(n)]
        for use_c in (None, cmul):
            for use_m in (None, mv):
                for neg in (False, True):
                    want = list(s)
                    if use_c is not None:
                        want = [use_c * v % R for v in want]
                    if use_m is not None:
                        want = [a * b % R for a, b in zip(want, use_m)]
                    if neg:
                        want = [-v % R for v in want]
                    got = scaled_verification_products(
                        ch, n, cmul=use_c, mulvec=use_m, neg=neg)
                    assert got == want, (logn, use_c is not None,
                                         use_m is not None, neg)


def test_fr_power_vector_and_scale_native():
    import random

    from curdleproofs_tpu.constants import R
    from curdleproofs_tpu.host import native
    from curdleproofs_tpu.util import fr_power_vector

    rnd = random.Random(13)
    base = rnd.randrange(1, R)
    n = 37
    want, acc = [], 1
    for _ in range(n):
        acc = acc * base % R
        want.append(acc)
    assert fr_power_vector(base, n) == want
    assert fr_power_vector(base, 0) == []
    # zero and one edge cases round-trip the Montgomery domain correctly
    assert fr_power_vector(0, 3) == [0, 0, 0]
    assert fr_power_vector(1, 3) == [1, 1, 1]

    if native.available():
        rf = rnd.randrange(1, R)
        xs = [0, 1, R - 1] + [rnd.randrange(R) for _ in range(61)]
        assert native.fr_scale(rf, xs) == [rf * x % R for x in xs]


def test_msm_accumulator_native_dedup_matches_python():
    """The fused native dedup (cp_fr_scale_accum + per-list key memo) must
    merge identically to the python dict path, including shared base lists
    across relations and repeated bases within one relation."""
    import random

    from curdleproofs_tpu.constants import R
    from curdleproofs_tpu.host import native
    from curdleproofs_tpu.host.g1 import g1_generator
    from curdleproofs_tpu.host.rng import StdRng
    from curdleproofs_tpu.msm_accumulator import MsmAccumulator

    if not native.available():
        return
    rng = StdRng.seed_from_u64(9)
    rnd = random.Random(9)
    g = g1_generator()
    shared = [g.mul(rnd.getrandbits(100)) for _ in range(8)]
    acc = MsmAccumulator()
    for _ in range(5):
        fresh = [g.mul(rnd.getrandbits(100)) for _ in range(3)]
        acc.accumulate_zero(
            [rnd.getrandbits(253) % R for _ in range(8)], shared, rng)
        # repeated base inside one relation: shared[0] twice
        acc.accumulate_zero(
            [rnd.getrandbits(253) % R for _ in range(5)],
            fresh + [shared[0], shared[0]], rng)

    b_nat, s_nat = acc._dedup_native(native)
    scal, pt = {}, {}
    for rf, xs, Vs in acc._rels:
        for base, x in zip(Vs, [rf * x % R for x in xs]):
            k = id(base)
            if k in scal:
                scal[k] += x
            else:
                scal[k], pt[k] = x, base
    m_py = {k: v % R for k, v in scal.items()}
    assert {id(b): s for b, s in zip(b_nat, s_nat)} == m_py
    assert len(b_nat) == len(m_py)
