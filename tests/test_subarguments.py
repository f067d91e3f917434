"""Per-argument round-trip + negative tests, mirroring the reference's inline
test modules (SURVEY.md §4; e.g. `inner_product_argument.rs:363-447`).

Sizes are reduced from the reference's n=128 to keep the suite fast; the n=128
whisk golden test covers full-size behaviour.
"""

import pytest

from curdleproofs_tpu.commitments import GroupCommitment
from curdleproofs_tpu.constants import R
from curdleproofs_tpu.errors import VerificationError
from curdleproofs_tpu.grand_product import GrandProductProof
from curdleproofs_tpu.host.rng import StdRng
from curdleproofs_tpu.ipa import InnerProductProof
from curdleproofs_tpu.msm_accumulator import MsmAccumulator
from curdleproofs_tpu.same_msm import SameMultiscalarProof
from curdleproofs_tpu.same_permutation import SamePermutationProof
from curdleproofs_tpu.same_scalar import SameScalarProof
from curdleproofs_tpu.transcript import Transcript
from curdleproofs_tpu.util import (
    generate_blinders, get_permutation, inner_product, msm, sum_affine_points,
)


def _rand_points(rng, n):
    return [rng.rand_g1() for _ in range(n)]


def _expect_fail(acc):
    with pytest.raises(VerificationError):
        acc.verify()


def test_group_commitment_homomorphism():
    rng = StdRng.seed_from_u64(0)
    crs_G, crs_H, A, B = _rand_points(rng, 4)
    r_a, r_b = generate_blinders(rng, 2)
    cm_a = GroupCommitment.new(crs_G, crs_H, A, r_a)
    cm_b = GroupCommitment.new(crs_G, crs_H, B, r_b)
    cm_ab = GroupCommitment.new(crs_G, crs_H, A.add(B), (r_a + r_b) % R)
    assert cm_a + cm_b == cm_ab


def test_msm_accumulator():
    rng = StdRng.seed_from_u64(0)
    n = 4
    vec_B = _rand_points(rng, n)
    vec_a = generate_blinders(rng, n)
    B = msm(vec_B, vec_a)
    vec_D = _rand_points(rng, n)
    vec_c = generate_blinders(rng, n)
    D = msm(vec_D, vec_c)

    acc = MsmAccumulator()
    acc.accumulate_check(B, vec_a, vec_B, rng)
    acc.accumulate_check(D, vec_c, vec_D, rng)
    acc.verify()

    # negative: perturbed commitment
    acc = MsmAccumulator()
    acc.accumulate_check(B.add(vec_B[0]), vec_a, vec_B, rng)
    _expect_fail(acc)


def test_inner_product_argument():
    rng = StdRng.seed_from_u64(0)
    n = 32
    crs_G_vec = _rand_points(rng, n)
    vec_u = generate_blinders(rng, n)
    crs_G_prime_vec = [g.mul(u) for g, u in zip(crs_G_vec, vec_u)]
    crs_H = rng.rand_g1()

    vec_b = [rng.rand_fr() for _ in range(n)]
    vec_c = [rng.rand_fr() for _ in range(n)]
    z = inner_product(vec_b, vec_c)
    B = msm(crs_G_vec, vec_b)
    C = msm(crs_G_prime_vec, vec_c)

    t_prover = Transcript(b"IPA")
    proof = InnerProductProof.new(crs_G_vec, crs_G_prime_vec, crs_H, B, C, z,
                                  vec_b, vec_c, t_prover, rng)

    t_verifier = Transcript(b"IPA")
    acc = MsmAccumulator()
    proof.verify(crs_G_vec, crs_H, B, C, z, vec_u, t_verifier, acc, rng)
    acc.verify()

    # negative: wrong inner product result (surfaces only in the accumulator)
    t_verifier = Transcript(b"IPA")
    acc = MsmAccumulator()
    proof.verify(crs_G_vec, crs_H, B, C, (z + 1) % R, vec_u, t_verifier, acc, rng)
    _expect_fail(acc)

    # serde round-trip
    blob = proof.serialize()
    proof2, rest = InnerProductProof.deserialize(memoryview(blob), 5)
    assert len(rest) == 0
    assert proof2.serialize() == blob


def test_grand_product_argument():
    rng = StdRng.seed_from_u64(0)
    n, n_blinders = 32, 4
    ell = n - n_blinders
    crs_G_vec = _rand_points(rng, ell)
    crs_H_vec = _rand_points(rng, n_blinders)
    crs_U = rng.rand_g1()
    crs_G_sum = sum_affine_points(crs_G_vec)
    crs_H_sum = sum_affine_points(crs_H_vec)

    vec_b = [rng.rand_fr() for _ in range(ell)]
    vec_b_blinders = generate_blinders(rng, n_blinders)
    gprod_result = 1
    for b in vec_b:
        gprod_result = gprod_result * b % R
    B = msm(crs_G_vec, vec_b).add(msm(crs_H_vec, vec_b_blinders))

    t_prover = Transcript(b"gprod")
    proof = GrandProductProof.new(crs_G_vec, crs_H_vec, crs_U, B, gprod_result,
                                  vec_b, vec_b_blinders, t_prover, rng)

    t_verifier = Transcript(b"gprod")
    acc = MsmAccumulator()
    proof.verify(crs_G_vec, crs_H_vec, crs_U, crs_G_sum, crs_H_sum, B,
                 gprod_result, n_blinders, t_verifier, acc, rng)
    acc.verify()

    # negative: wrong grand product result
    t_verifier = Transcript(b"gprod")
    acc = MsmAccumulator()
    proof.verify(crs_G_vec, crs_H_vec, crs_U, crs_G_sum, crs_H_sum, B,
                 (gprod_result + 1) % R, n_blinders, t_verifier, acc, rng)
    _expect_fail(acc)

    # negative: wrong commitment to vec_b
    t_verifier = Transcript(b"gprod")
    acc = MsmAccumulator()
    proof.verify(crs_G_vec, crs_H_vec, crs_U, crs_G_sum, crs_H_sum,
                 B.mul(rng.rand_fr()), gprod_result, n_blinders, t_verifier,
                 acc, rng)
    _expect_fail(acc)


def test_same_permutation_argument():
    rng = StdRng.seed_from_u64(0)
    n, n_blinders = 32, 4
    ell = n - n_blinders
    crs_G_vec = _rand_points(rng, ell)
    crs_H_vec = _rand_points(rng, n_blinders)
    crs_U = rng.rand_g1()
    crs_G_sum = sum_affine_points(crs_G_vec)
    crs_H_sum = sum_affine_points(crs_H_vec)

    vec_a_blinders = generate_blinders(rng, n_blinders)
    vec_m_blinders = generate_blinders(rng, n_blinders)
    permutation = list(range(ell))
    rng.shuffle(permutation)
    vec_a = [rng.rand_fr() for _ in range(ell)]
    vec_a_permuted = get_permutation(vec_a, permutation)

    A = msm(crs_G_vec, vec_a_permuted).add(msm(crs_H_vec, vec_a_blinders))
    M = msm(crs_G_vec, [p % R for p in permutation]).add(
        msm(crs_H_vec, vec_m_blinders))

    t_prover = Transcript(b"sameperm")
    proof = SamePermutationProof.new(
        crs_G_vec, crs_H_vec, crs_U, A, M, vec_a, permutation,
        vec_a_blinders, vec_m_blinders, t_prover, rng)

    # verify twice to exercise accumulator reuse (reference does the same)
    for _ in range(2):
        t_verifier = Transcript(b"sameperm")
        acc = MsmAccumulator()
        proof.verify(crs_G_vec, crs_H_vec, crs_U, crs_G_sum, crs_H_sum,
                     A, M, vec_a, n_blinders, t_verifier, acc, rng)
        acc.verify()


def test_same_scalar_argument():
    rng = StdRng.seed_from_u64(0)
    crs_G_t, crs_G_u, crs_H, R_pt, S_pt = _rand_points(rng, 5)
    k, r_t, r_u = generate_blinders(rng, 3)

    cm_T = GroupCommitment.new(crs_G_t, crs_H, R_pt.mul(k), r_t)
    cm_U = GroupCommitment.new(crs_G_u, crs_H, S_pt.mul(k), r_u)

    t_prover = Transcript(b"same_scalar")
    proof = SameScalarProof.new(crs_G_t, crs_G_u, crs_H, R_pt, S_pt, cm_T,
                                cm_U, k, r_t, r_u, t_prover, rng)

    t_verifier = Transcript(b"same_scalar")
    proof.verify(crs_G_t, crs_G_u, crs_H, R_pt, S_pt, cm_T, cm_U, t_verifier)

    # negative: wrong commitment
    t_verifier = Transcript(b"same_scalar")
    with pytest.raises(VerificationError):
        proof.verify(crs_G_t, crs_G_u, crs_H, R_pt, S_pt, cm_U, cm_T, t_verifier)


def test_same_msm_argument():
    rng = StdRng.seed_from_u64(0)
    n = 32
    crs_G_vec = _rand_points(rng, n)
    vec_T = _rand_points(rng, n)
    vec_U = _rand_points(rng, n)
    vec_x = [rng.rand_fr() for _ in range(n)]

    A = msm(crs_G_vec, vec_x)
    Z_t = msm(vec_T, vec_x)
    Z_u = msm(vec_U, vec_x)

    t_prover = Transcript(b"same_msm")
    proof = SameMultiscalarProof.new(crs_G_vec, A, Z_t, Z_u, vec_T, vec_U,
                                     vec_x, t_prover, rng)

    t_verifier = Transcript(b"same_msm")
    acc = MsmAccumulator()
    proof.verify(crs_G_vec, A, Z_t, Z_u, vec_T, vec_U, t_verifier, acc, rng)
    acc.verify()

    # serde round-trip
    blob = proof.serialize()
    proof2, rest = SameMultiscalarProof.deserialize(memoryview(blob), 5)
    assert len(rest) == 0
    assert proof2.serialize() == blob
