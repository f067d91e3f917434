"""Lockstep batched prover (parallel/batch_prove.py) must produce proofs
BYTE-IDENTICAL to sequential `CurdleproofsProof.new` with the same RNGs —
the composite-scalar re-expression of every folding round is checked against
the reference round structure through full serialization equality, and the
proofs must also verify."""

import pytest

from curdleproofs_tpu.curdleproofs import CurdleproofsProof, generate_crs
from curdleproofs_tpu.host.rng import StdRng
from curdleproofs_tpu.parallel.batch_prove import ProveInstance, batch_prove
from curdleproofs_tpu.util import shuffle_permute_and_commit_input

pytestmark = pytest.mark.slow


def _instances(crs, ell, count, seed0=11):
    out = []
    for i in range(count):
        rng = StdRng.seed_from_u64(seed0 + i)
        vec_R = [rng.rand_g1() for _ in range(ell)]
        vec_S = [rng.rand_g1() for _ in range(ell)]
        permutation = list(range(ell))
        rng.shuffle(permutation)
        k = rng.rand_fr()
        vec_T, vec_U, M, vec_m_blinders = shuffle_permute_and_commit_input(
            crs, vec_R, vec_S, permutation, k, rng)
        out.append(ProveInstance(vec_R, vec_S, vec_T, vec_U, M,
                                 permutation, k, vec_m_blinders, rng))
    return out


@pytest.mark.parametrize("ell", [12, 28])
def test_batch_prove_matches_sequential(ell):
    crs = generate_crs(ell)
    insts = _instances(crs, ell, 3)

    # sequential twin: same seeds, fresh RNGs at the same draw position
    seq = []
    for i, inst in enumerate(_instances(crs, ell, 3)):
        seq.append(CurdleproofsProof.new(
            crs, inst.vec_R, inst.vec_S, inst.vec_T, inst.vec_U, inst.M,
            inst.permutation, inst.k, inst.vec_m_blinders, inst.rng))

    got = batch_prove(crs, insts)
    assert len(got) == 3
    for g, s in zip(got, seq):
        assert g.serialize() == s.serialize()


def test_batch_prove_proofs_verify():
    ell = 12
    crs = generate_crs(ell)
    insts = _instances(crs, ell, 2, seed0=77)
    proofs = batch_prove(crs, insts)
    vrng = StdRng.seed_from_u64(99)
    for inst, proof in zip(insts, proofs):
        proof.verify(crs, inst.vec_R, inst.vec_S, inst.vec_T, inst.vec_U,
                     inst.M, vrng)


def test_batch_prove_wave_split():
    """Waves must not change the bytes (residency split is transparent)."""
    ell = 12
    crs = generate_crs(ell)
    a = batch_prove(crs, _instances(crs, ell, 3, seed0=5))
    b = batch_prove(crs, _instances(crs, ell, 3, seed0=5), wave=2)
    assert [p.serialize() for p in a] == [p.serialize() for p in b]
