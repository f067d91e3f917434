"""Top-level shuffle argument tests (parity: `curdleproofs.rs:335-471`) plus the
whisk two-block consensus lifecycle (`whisk.rs:460-607`), at reduced sizes.
"""

import pytest

from curdleproofs_tpu.constants import N_BLINDERS
from curdleproofs_tpu.crs import CurdleproofsCrs
from curdleproofs_tpu.curdleproofs import CurdleproofsProof, generate_crs
from curdleproofs_tpu.errors import VerificationError
from curdleproofs_tpu.host.g1 import GENERATOR
from curdleproofs_tpu.host.rng import StdRng
from curdleproofs_tpu.host.serde import g1_to_bytes
from curdleproofs_tpu.util import get_permutation, shuffle_permute_and_commit_input
from curdleproofs_tpu.whisk import (
    WhiskTracker, from_bytes_fr, generate_whisk_shuffle_proof,
    generate_whisk_tracker_proof, is_valid_whisk_shuffle_proof,
    is_valid_whisk_tracker_proof, TRACKER_PROOF_SIZE,
)


def _setup(rng, N):
    ell = N - N_BLINDERS
    crs = generate_crs(ell)
    permutation = list(range(ell))
    rng.shuffle(permutation)
    k = rng.rand_fr()
    vec_R = [rng.rand_g1() for _ in range(ell)]
    vec_S = [rng.rand_g1() for _ in range(ell)]
    vec_T, vec_U, M, m_blinders = shuffle_permute_and_commit_input(
        crs, vec_R, vec_S, permutation, k, rng)
    return crs, permutation, k, vec_R, vec_S, vec_T, vec_U, M, m_blinders


def test_shuffle_argument_roundtrip():
    rng = StdRng.seed_from_u64(0)
    crs, perm, k, vec_R, vec_S, vec_T, vec_U, M, mb = _setup(rng, 32)
    proof = CurdleproofsProof.new(crs, vec_R, vec_S, vec_T, vec_U, M, perm,
                                  k, mb, rng)
    proof.verify(crs, vec_R, vec_S, vec_T, vec_U, M, rng)


def test_bad_shuffle_arguments():
    rng = StdRng.seed_from_u64(0)
    crs, perm, k, vec_R, vec_S, vec_T, vec_U, M, mb = _setup(rng, 32)
    ell = len(vec_R)
    proof = CurdleproofsProof.new(crs, vec_R, vec_S, vec_T, vec_U, M, perm,
                                  k, mb, rng)

    another_perm = list(range(ell))
    rng.shuffle(another_perm)

    with pytest.raises(VerificationError):  # swapped inputs
        proof.verify(crs, vec_S, vec_R, vec_T, vec_U, M, rng)

    with pytest.raises(VerificationError):  # different permutation on outputs
        proof.verify(crs, vec_R, vec_S, get_permutation(vec_T, another_perm),
                     get_permutation(vec_U, another_perm), M, rng)

    with pytest.raises(VerificationError):  # wrong permutation commitment
        proof.verify(crs, vec_R, vec_S, vec_T, vec_U, M.mul(k), rng)

    another_k = rng.rand_fr()
    with pytest.raises(VerificationError):  # different randomizer
        proof.verify(crs, vec_R, vec_S,
                     [t.mul(another_k) for t in vec_T],
                     [u.mul(another_k) for u in vec_U], M, rng)


def test_crs_json_roundtrip():
    crs = CurdleproofsCrs.generate_crs(16 - N_BLINDERS)
    crs2 = CurdleproofsCrs.from_json(crs.to_json())
    assert crs2.H_sum == crs.H_sum
    assert crs2.G_sum == crs.G_sum
    assert crs2.log2_n() == crs.log2_n()


# --- whisk consensus lifecycle (whisk.rs:460-607), at ell=12 -------------------

def _get_k_commitment(k):
    return g1_to_bytes(GENERATOR.mul(k))


def _compute_initial_k(index: int) -> int:
    return from_bytes_fr(index.to_bytes(8, "big"))


class _State:
    def __init__(self, proposer_tracker, proposer_k_commitment, shuffled_trackers):
        self.proposer_tracker = proposer_tracker
        self.proposer_k_commitment = proposer_k_commitment
        self.shuffled_trackers = shuffled_trackers


class _Block:
    pass


def _produce_block(crs, state, proposer_k, proposer_index):
    rng = StdRng.seed_from_u64(0)
    block = _Block()
    (block.whisk_post_shuffle_trackers,
     block.whisk_shuffle_proof) = generate_whisk_shuffle_proof(
        rng, crs, state.shuffled_trackers)

    is_first = state.proposer_tracker.r_G == g1_to_bytes(GENERATOR)
    if is_first:
        block.whisk_tracker = WhiskTracker.from_k(rng, proposer_k)
        block.whisk_k_commitment = _get_k_commitment(proposer_k)
        block.whisk_registration_proof = generate_whisk_tracker_proof(
            rng, block.whisk_tracker, proposer_k)
    else:
        block.whisk_registration_proof = bytes(TRACKER_PROOF_SIZE)
        block.whisk_tracker = WhiskTracker.from_k_r(1, 1)
        block.whisk_k_commitment = _get_k_commitment(1)

    k_prev = _compute_initial_k(proposer_index) if is_first else proposer_k
    block.whisk_opening_proof = generate_whisk_tracker_proof(
        rng, state.proposer_tracker, k_prev)
    return block


def _process_block(crs, state, block):
    rng = StdRng.seed_from_u64(0)
    assert is_valid_whisk_tracker_proof(
        state.proposer_tracker, state.proposer_k_commitment,
        block.whisk_opening_proof), "invalid whisk_opening_proof"
    assert is_valid_whisk_shuffle_proof(
        rng, crs, state.shuffled_trackers, block.whisk_post_shuffle_trackers,
        block.whisk_shuffle_proof), "invalid whisk_shuffle_proof"

    if state.proposer_tracker.r_G == g1_to_bytes(GENERATOR):
        assert is_valid_whisk_tracker_proof(
            block.whisk_tracker, block.whisk_k_commitment,
            block.whisk_registration_proof), "invalid whisk_registration_proof"
        state.proposer_tracker = block.whisk_tracker
        state.proposer_k_commitment = block.whisk_k_commitment


@pytest.mark.slow
def test_whisk_full_lifecycle():
    ell = 12
    rng = StdRng.seed_from_u64(0)
    crs = CurdleproofsCrs.generate_crs(ell)
    shuffled_trackers = [WhiskTracker.from_rand(rng) for _ in range(ell)]

    proposer_index = 15400
    proposer_initial_k = _compute_initial_k(proposer_index)

    state = _State(
        proposer_tracker=WhiskTracker.from_k_r(proposer_initial_k, 1),
        proposer_k_commitment=_get_k_commitment(proposer_initial_k),
        shuffled_trackers=shuffled_trackers,
    )
    proposer_k = rng.rand_fr()

    block_0 = _produce_block(crs, state, proposer_k, proposer_index)
    _process_block(crs, state, block_0)

    block_1 = _produce_block(crs, state, proposer_k, proposer_index)
    _process_block(crs, state, block_1)
