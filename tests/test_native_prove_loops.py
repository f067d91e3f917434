"""Native prover round loops == the Python folding loops, bit for bit.

The IPA and SameMsm provers run their whole folding recursion in one C++
call (`cp_ipa_prove_loop` / `cp_same_msm_prove_loop`), advancing the shared
strobe state. These tests pin that path against the pure-Python loop (the
spec): identical proof bytes AND identical transcript state afterwards.
Parity: inner_product_argument.rs:150-186, same_multiscalar_argument.rs:99-136.
"""

import pytest

from curdleproofs_tpu import ipa as ipa_mod
from curdleproofs_tpu import same_msm as sm_mod
from curdleproofs_tpu.constants import R
from curdleproofs_tpu.host import native
from curdleproofs_tpu.host.rng import StdRng
from curdleproofs_tpu.transcript import Transcript
from curdleproofs_tpu.util import msm

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


def _force_python(monkeypatch, name):
    monkeypatch.setattr(native, name, lambda *a, **k: None)


@pytest.mark.parametrize("n", [4, 8, 64, 256])
def test_ipa_native_loop_bit_identical(n, monkeypatch):
    def run():
        rng = StdRng.seed_from_u64(7)
        G = [rng.rand_g1() for _ in range(n)]
        Gp = [rng.rand_g1() for _ in range(n)]
        Hc = rng.rand_g1()
        c = [rng.rand_fr() for _ in range(n)]
        d = [rng.rand_fr() for _ in range(n)]
        z = sum(ci * di for ci, di in zip(c, d)) % R
        C = msm(G, c)
        D = msm(Gp, d)
        t = Transcript(b"ipa_native_loop_test")
        proof = ipa_mod.InnerProductProof.new(G, Gp, Hc, C, D, z, c, d, t,
                                              StdRng.seed_from_u64(1))
        return proof.serialize(), t.challenge_bytes(b"probe", 32)

    native_bytes, native_post = run()
    _force_python(monkeypatch, "ipa_prove_loop")
    py_bytes, py_post = run()
    assert native_bytes == py_bytes
    assert native_post == py_post


@pytest.mark.parametrize("n", [4, 8, 64, 256])
def test_same_msm_native_loop_bit_identical(n, monkeypatch):
    def run():
        rng = StdRng.seed_from_u64(9)
        G = [rng.rand_g1() for _ in range(n)]
        T = [rng.rand_g1() for _ in range(n)]
        U = [rng.rand_g1() for _ in range(n)]
        x = [rng.rand_fr() for _ in range(n)]
        A = msm(G, x)
        Zt = msm(T, x)
        Zu = msm(U, x)
        t = Transcript(b"same_msm_native_loop_test")
        proof = sm_mod.SameMultiscalarProof.new(G, A, Zt, Zu, T, U, x, t,
                                                StdRng.seed_from_u64(1))
        return proof.serialize(), t.challenge_bytes(b"probe", 32)

    native_bytes, native_post = run()
    _force_python(monkeypatch, "same_msm_prove_loop")
    py_bytes, py_post = run()
    assert native_bytes == py_bytes
    assert native_post == py_post


def test_native_loop_handles_infinity_bases(monkeypatch):
    """Identity points in the base vectors must fold/compress correctly."""
    n = 8
    from curdleproofs_tpu.host.g1 import G1

    def run():
        rng = StdRng.seed_from_u64(3)
        G = [rng.rand_g1() for _ in range(n)]
        T = [rng.rand_g1() for _ in range(n)]
        U = [rng.rand_g1() for _ in range(n)]
        T[2] = G1.infinity()
        U[5] = G1.infinity()
        x = [rng.rand_fr() for _ in range(n)]
        A = msm(G, x)
        Zt = msm(T, x)
        Zu = msm(U, x)
        t = Transcript(b"same_msm_inf_test")
        proof = sm_mod.SameMultiscalarProof.new(G, A, Zt, Zu, T, U, x, t,
                                                StdRng.seed_from_u64(1))
        return proof.serialize(), t.challenge_bytes(b"probe", 32)

    native_out = run()
    _force_python(monkeypatch, "same_msm_prove_loop")
    assert native_out == run()
