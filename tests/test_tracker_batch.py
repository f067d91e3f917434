"""Batched tracker-opening verification (one accumulated MSM for many DLEQ
proofs) — equivalence with the single-proof path and offender identification."""

from curdleproofs_tpu.host.g1 import GENERATOR
from curdleproofs_tpu.host.rng import StdRng
from curdleproofs_tpu.host.serde import g1_to_bytes
from curdleproofs_tpu.whisk import (
    WhiskTracker, generate_whisk_tracker_proof, is_valid_whisk_tracker_proof,
    is_valid_whisk_tracker_proofs,
)


def _setup(n: int, seed: int = 21):
    rng = StdRng.seed_from_u64(seed)
    trackers, commitments, proofs = [], [], []
    for _ in range(n):
        k, r = rng.rand_fr(), rng.rand_fr()
        r_G = GENERATOR.mul(r)
        t = WhiskTracker(g1_to_bytes(r_G), g1_to_bytes(r_G.mul(k)))
        trackers.append(t)
        commitments.append(g1_to_bytes(GENERATOR.mul(k)))
        proofs.append(generate_whisk_tracker_proof(rng, t, k))
    return rng, trackers, commitments, proofs


def test_batch_accepts_valid_proofs():
    rng, trackers, commitments, proofs = _setup(12)
    assert is_valid_whisk_tracker_proofs(trackers, commitments, proofs, rng)
    # sanity: every proof also passes the single-proof path
    for t, c, p in zip(trackers, commitments, proofs):
        assert is_valid_whisk_tracker_proof(t, c, p)


def test_batch_rejects_and_identifies_offender():
    rng, trackers, commitments, proofs = _setup(8)
    # swap one proof's scalar response
    bad = bytearray(proofs[5])
    bad[96] ^= 1
    proofs[5] = bytes(bad)
    assert not is_valid_whisk_tracker_proofs(trackers, commitments, proofs,
                                             rng)
    verdicts = is_valid_whisk_tracker_proofs(trackers, commitments, proofs,
                                             rng, identify=True)
    assert verdicts == [i != 5 for i in range(8)]


def test_batch_rejects_wrong_commitment():
    rng, trackers, commitments, proofs = _setup(4)
    commitments[2], commitments[3] = commitments[3], commitments[2]
    verdicts = is_valid_whisk_tracker_proofs(trackers, commitments, proofs,
                                             rng, identify=True)
    assert verdicts == [True, True, False, False]
