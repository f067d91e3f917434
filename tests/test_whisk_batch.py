"""Byte-level whisk shuffle batch verification (chain-sync access pattern:
consecutive blocks chain post -> pre, all proofs share one accumulator MSM)."""

from curdleproofs_tpu.curdleproofs import generate_crs
from curdleproofs_tpu.host.g1 import GENERATOR
from curdleproofs_tpu.host.rng import StdRng
from curdleproofs_tpu.host.serde import g1_to_bytes
from curdleproofs_tpu.whisk import (
    WhiskTracker, generate_whisk_shuffle_proof, is_valid_whisk_shuffle_proofs,
)

ELL = 28


def _chain(n_blocks: int, seed: int = 31):
    rng = StdRng.seed_from_u64(seed)
    crs = generate_crs(ELL)
    trackers = []
    for _ in range(ELL):
        k, r = rng.rand_fr(), rng.rand_fr()
        r_G = GENERATOR.mul(r)
        trackers.append(WhiskTracker(g1_to_bytes(r_G),
                                     g1_to_bytes(r_G.mul(k))))
    shuffles = []
    for _ in range(n_blocks):
        post, proof = generate_whisk_shuffle_proof(rng, crs, trackers)
        shuffles.append((trackers, post, proof))
        trackers = post
    return rng, crs, shuffles


def test_whisk_batch_accepts_chain():
    rng, crs, shuffles = _chain(4)
    assert is_valid_whisk_shuffle_proofs(rng, crs, shuffles)


def test_whisk_batch_identifies_bad_block():
    rng, crs, shuffles = _chain(4)
    pre, post, proof = shuffles[2]
    bad = bytearray(proof)
    bad[-1] ^= 1                      # corrupt a scalar tail byte
    shuffles[2] = (pre, post, bytes(bad))
    assert not is_valid_whisk_shuffle_proofs(rng, crs, shuffles)
    verdicts = is_valid_whisk_shuffle_proofs(rng, crs, shuffles,
                                             identify=True)
    assert verdicts == [True, True, False, True]
