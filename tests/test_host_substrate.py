"""Host substrate tests: keccak, field, G1, serde golden vectors.

Golden anchors come from the reference test suite
(`/root/reference/src/whisk.rs:354-368`).
"""

import hashlib

from curdleproofs_tpu.constants import COFACTOR, Q, R
from curdleproofs_tpu.host.field import batch_inversion, fq_sqrt
from curdleproofs_tpu.host.g1 import G1, GENERATOR, get_point_from_x
from curdleproofs_tpu.host.keccak import keccak_f1600
from curdleproofs_tpu.host.serde import (
    fr_from_bytes, fr_from_le_bytes_mod_order, fr_to_bytes,
    g1_from_bytes, g1_to_bytes,
)

GENERATOR_COMPRESSED_HEX = (
    "97f1d3a73197d7942695638c4fa9ac0fc3688c4f9774b905a14e3a3f171bac58"
    "6c55e83ff97a1aeffb3af00adb22c6bb"
)


def _sha3_256_via_keccak_f(msg: bytes) -> bytes:
    """SHA3-256 built on our keccak_f1600 (rate 136, 0x06 padding)."""
    rate = 136
    state = bytearray(200)
    padded = bytearray(msg)
    padded.append(0x06)
    while len(padded) % rate:
        padded.append(0)
    padded[-1] |= 0x80
    for off in range(0, len(padded), rate):
        for i in range(rate):
            state[i] ^= padded[off + i]
        keccak_f1600(state)
    return bytes(state[:32])


def test_keccak_f1600_matches_hashlib_sha3():
    for msg in [b"", b"abc", b"x" * 200, bytes(range(256))]:
        assert _sha3_256_via_keccak_f(msg) == hashlib.sha3_256(msg).digest()


def test_field_basics():
    assert fq_sqrt(4) in (2, Q - 2)
    assert fq_sqrt(5) is None or pow(fq_sqrt(5), 2, Q) == 5
    vals = [1, 2, 12345, R - 1, 0, 99]
    invs = batch_inversion(vals, R)
    for v, iv in zip(vals, invs):
        if v:
            assert v * iv % R == 1
        else:
            assert iv == 0


def test_generator_on_curve_and_subgroup():
    assert GENERATOR.is_on_curve()
    assert GENERATOR.is_in_correct_subgroup()
    assert GENERATOR.mul_bigint(R).is_infinity()


def test_group_law():
    P = GENERATOR
    two_p = P.double()
    assert P.add(P) == two_p
    assert P.add(two_p) == P.mul(3)
    assert P.mul(5).add(P.mul(7)) == P.mul(12)
    assert P.mul(R - 1).add(P).is_infinity()
    assert (P - P).is_infinity()
    assert G1.infinity().add(P) == P
    # scalar mul distributes over cofactor clearing
    x = 12345678901234567890 % Q
    p = None
    while p is None:
        x = (x + 1) % Q
        p = get_point_from_x(x, True)
    cleared = p.mul_by_cofactor()
    assert cleared.is_in_correct_subgroup()


def test_g1_serde_generator_golden():
    # whisk.rs:364-368
    assert g1_to_bytes(GENERATOR).hex() == GENERATOR_COMPRESSED_HEX
    p = g1_from_bytes(bytes.fromhex(GENERATOR_COMPRESSED_HEX))
    assert p == GENERATOR


def test_g1_serde_infinity_and_roundtrip():
    inf = G1.infinity()
    b = g1_to_bytes(inf)
    assert b[0] == 0xC0 and not any(b[1:])
    assert g1_from_bytes(b).is_infinity()
    for k in [2, 3, 65537, R - 2]:
        p = GENERATOR.mul(k)
        assert g1_from_bytes(g1_to_bytes(p)) == p


def test_fr_serde_golden():
    # whisk.rs:354-362
    k_bytes = bytes.fromhex(
        "9ebde6d84a58debe5ef02c729366a76078a15a653aa6234aeab6996ce47f8d2a")
    k = fr_from_le_bytes_mod_order(k_bytes)
    assert fr_to_bytes(k) == k_bytes
    assert fr_from_bytes(k_bytes) == k


def test_cofactor_value():
    # r * cofactor * "trace-ish" sanity: cleared points have order r
    p = GENERATOR.mul_bigint(COFACTOR)
    assert p.is_in_correct_subgroup()
