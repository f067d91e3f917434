"""Device MSM / batched scalar-mul kernels vs host golden model."""

import random

from curdleproofs_tpu.backend import HostBackend, use_backend
from curdleproofs_tpu.constants import R
from curdleproofs_tpu.host.g1 import G1
from curdleproofs_tpu.host.rng import StdRng
from curdleproofs_tpu.ops.backend import TpuBackend

rnd = random.Random(99)


def _points(n):
    rng = StdRng.seed_from_u64(5)
    return [rng.rand_g1() for _ in range(n)]


def test_device_msm_matches_host():
    n = 16
    pts = _points(n)
    scalars = [rnd.randrange(R) for _ in range(n - 2)] + [0, 1]
    host = HostBackend().msm(pts, scalars)
    dev = TpuBackend().msm(pts, scalars)
    assert dev == host


def test_device_msm_with_infinity_and_padding():
    pts = _points(5) + [G1.infinity()]  # n=6 pads to 8
    scalars = [rnd.randrange(R) for _ in range(6)]
    assert TpuBackend().msm(pts, scalars) == HostBackend().msm(pts, scalars)


def test_device_batch_mul():
    pts = _points(8)
    k = rnd.randrange(R)
    b = TpuBackend()
    assert b.batch_mul(pts, k) == [p.mul(k) for p in pts]


def test_device_batch_mul_each():
    pts = _points(8)
    ks = [rnd.randrange(R) for _ in range(6)] + [0, 1]
    b = TpuBackend()
    assert b.batch_mul_each(pts, ks) == [p.mul(k) for p, k in zip(pts, ks)]


def test_device_fold_points():
    left = _points(8)
    right = _points(8)
    gamma = rnd.randrange(R)
    b = TpuBackend()
    assert b.fold_points(left, right, gamma) == \
        [l.add(r.mul(gamma)) for l, r in zip(left, right)]


def test_protocol_on_tpu_backend():
    """End-to-end shuffle proof with the device backend, verified by host."""
    from curdleproofs_tpu.constants import N_BLINDERS
    from curdleproofs_tpu.curdleproofs import CurdleproofsProof, generate_crs
    from curdleproofs_tpu.util import shuffle_permute_and_commit_input

    ell = 16 - N_BLINDERS
    rng = StdRng.seed_from_u64(3)
    crs = generate_crs(ell)
    perm = list(range(ell))
    rng.shuffle(perm)
    k = rng.rand_fr()
    vec_R = _points(ell)
    vec_S = _points(ell)

    with use_backend(TpuBackend()):
        vec_T, vec_U, M, mb = shuffle_permute_and_commit_input(
            crs, vec_R, vec_S, perm, k, rng)
        proof = CurdleproofsProof.new(crs, vec_R, vec_S, vec_T, vec_U, M,
                                      perm, k, mb, rng)
    # verify on the host backend: device- and host-produced math must agree
    proof.verify(crs, vec_R, vec_S, vec_T, vec_U, M, rng)
