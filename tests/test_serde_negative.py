"""Malformed-bytes rejection across the serde boundary (the reference's
SerializationError surface, whisk.rs:113-116 / ark-serialize validation)."""

import pytest

from curdleproofs_tpu.constants import R
from curdleproofs_tpu.curdleproofs import CurdleproofsProof, generate_crs
from curdleproofs_tpu.host.g1 import GENERATOR
from curdleproofs_tpu.host.rng import StdRng
from curdleproofs_tpu.host.serde import (
    SerializationError, fr_from_bytes, g1_from_bytes, g1_to_bytes,
)
from curdleproofs_tpu.util import shuffle_permute_and_commit_input
from curdleproofs_tpu.whisk import WhiskShuffleProof


def test_g1_codec_rejections():
    good = g1_to_bytes(GENERATOR)
    with pytest.raises(SerializationError):
        g1_from_bytes(good[:-1])                     # short buffer
    with pytest.raises(SerializationError):
        g1_from_bytes(bytes(48))                     # no compression flag
    bad_x = bytearray(good)
    bad_x[-1] ^= 0xFF                                # x likely off-curve
    try:
        g1_from_bytes(bytes(bad_x))
    except SerializationError:
        pass  # off-curve or bad x — either rejection is fine
    # malformed infinity: flag set but payload nonzero
    inf_bad = bytearray(48)
    inf_bad[0] = 0b1100_0000
    inf_bad[5] = 1
    with pytest.raises(SerializationError):
        g1_from_bytes(bytes(inf_bad))
    # low-order / non-subgroup x values must be rejected by the subgroup check
    # (cofactor ~ 2^125, so a random curve point is almost surely outside G1)


def test_deferred_subgroup_check_rejects():
    """The batched deferred-check path must reject out-of-subgroup points."""
    import curdleproofs_tpu.host.g1 as g1mod
    from curdleproofs_tpu.host.g1 import G1
    from curdleproofs_tpu.host.serde import deferred_subgroup_checks

    xx, h_pt = 1, None
    while h_pt is None:
        ys = g1mod.get_ys_from_x(xx)
        if ys:
            cand = G1.from_affine(xx, ys[0])
            if not cand.is_in_correct_subgroup():
                h_pt = cand
        xx += 1
    bad = bytearray(h_pt.to_affine()[0].to_bytes(48, "big"))
    bad[0] |= 0x80
    with pytest.raises(SerializationError):
        with deferred_subgroup_checks():
            g1_from_bytes(bytes(bad))
            for _ in range(5):
                g1_from_bytes(g1_to_bytes(GENERATOR))


def test_batch_decompress_rejects_bad_points():
    from curdleproofs_tpu.host.serde import g1_from_bytes_batch

    good = [g1_to_bytes(GENERATOR.mul(i + 1)) for i in range(6)]
    assert len(g1_from_bytes_batch(good)) == 6
    bad = bytearray(good[0])
    bad[0] &= 0x7F                                   # drop compression flag
    with pytest.raises(SerializationError):
        g1_from_bytes_batch(good[:3] + [bytes(bad)] + good[3:])


def test_fr_codec_rejections():
    with pytest.raises(SerializationError):
        fr_from_bytes(bytes(31))
    with pytest.raises(SerializationError):
        fr_from_bytes(R.to_bytes(32, "little"))      # not reduced


def _proof_bytes():
    rng = StdRng.seed_from_u64(3)
    ell = 28
    crs = generate_crs(ell)
    perm = list(range(ell))
    rng.shuffle(perm)
    k = rng.rand_fr()
    vr = [rng.rand_g1() for _ in range(ell)]
    vs = [rng.rand_g1() for _ in range(ell)]
    t, u, m, mb = shuffle_permute_and_commit_input(crs, vr, vs, perm, k, rng)
    proof = CurdleproofsProof.new(crs, vr, vs, t, u, m, perm, k, mb, rng)
    return crs, proof.serialize()


def test_proof_deserialize_rejects_truncation_and_corruption():
    crs, blob = _proof_bytes()
    log2n = crs.log2_n()
    # round-trips clean
    CurdleproofsProof.deserialize(blob, log2n)
    with pytest.raises((SerializationError, ValueError, IndexError)):
        CurdleproofsProof.deserialize(blob[:100], log2n)
    corrupted = bytearray(blob)
    corrupted[10] ^= 0xFF                            # inside the A point
    with pytest.raises(SerializationError):
        CurdleproofsProof.deserialize(bytes(corrupted), log2n)


def test_whisk_proof_deserialize_rejects_bad_sizes():
    crs, blob = _proof_bytes()
    wrapped = g1_to_bytes(GENERATOR) + blob          # M || proof
    WhiskShuffleProof.deserialize(wrapped, crs.log2_n())
    with pytest.raises((SerializationError, ValueError, IndexError)):
        WhiskShuffleProof.deserialize(wrapped[:-4], crs.log2_n())


def test_proof_deserialize_rejects_trailing_bytes():
    # /root/reference/src/whisk.rs:21-25 enforces exact sizes by array type;
    # oversized buffers are a consensus-surface divergence and must fail.
    crs, blob = _proof_bytes()
    with pytest.raises(SerializationError):
        CurdleproofsProof.deserialize(blob + b"\x00", crs.log2_n())


def test_whisk_boundary_exact_sizes():
    from curdleproofs_tpu.constants import TRACKER_PROOF_SIZE
    from curdleproofs_tpu.whisk import TrackerProof, whisk_shuffle_proof_size

    crs, blob = _proof_bytes()
    wrapped = g1_to_bytes(GENERATOR) + blob
    assert len(wrapped) == whisk_shuffle_proof_size(crs.log2_n())
    for bad in (wrapped + b"\x00", wrapped[:-1], b""):
        with pytest.raises(SerializationError):
            WhiskShuffleProof.deserialize(bad, crs.log2_n())

    tracker_blob = (g1_to_bytes(GENERATOR) * 2) + (1).to_bytes(32, "little")
    assert len(tracker_blob) == TRACKER_PROOF_SIZE
    TrackerProof.deserialize(tracker_blob)
    for bad in (tracker_blob + b"\x00", tracker_blob[:-1], b""):
        with pytest.raises(SerializationError):
            TrackerProof.deserialize(bad)
