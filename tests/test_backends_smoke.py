"""Full prove+verify round trip under every backend flavor.

The protocol layer is backend-agnostic (backend.py); this pins that every
backend implements the complete interface (msm, batch_mul, batch_mul_each,
fold_points, msm_many, fold_points_each) with identical semantics.
"""

import pytest

from curdleproofs_tpu.backend import (
    HostBackend, PurePythonBackend, use_backend,
)
from curdleproofs_tpu.curdleproofs import CurdleproofsProof, generate_crs
from curdleproofs_tpu.host.rng import StdRng
from curdleproofs_tpu.ops.backend import HybridBackend, TpuBackend
from curdleproofs_tpu.util import shuffle_permute_and_commit_input


@pytest.mark.parametrize("backend_cls", [
    HostBackend, PurePythonBackend, HybridBackend, TpuBackend,
])
def test_round_trip_every_backend(backend_cls):
    rng = StdRng.seed_from_u64(1)
    ell = 12
    crs = generate_crs(ell)
    perm = list(range(ell))
    rng.shuffle(perm)
    k = rng.rand_fr()
    vec_R = [rng.rand_g1() for _ in range(ell)]
    vec_S = [rng.rand_g1() for _ in range(ell)]
    T, U, M, mb = shuffle_permute_and_commit_input(
        crs, vec_R, vec_S, perm, k, rng)
    with use_backend(backend_cls()):
        proof = CurdleproofsProof.new(crs, vec_R, vec_S, T, U, M, perm, k,
                                      mb, rng)
        proof.verify(crs, vec_R, vec_S, T, U, M, rng)


def test_msm_raw_every_backend():
    """msm_raw (canonical 32B-LE scalars) matches msm on every backend; the
    hybrid path must route sub-threshold sizes to the host engine."""
    rng = StdRng.seed_from_u64(4)
    n = 48
    pts = [rng.rand_g1() for _ in range(n)]
    ss = [rng.rand_fr() for _ in range(n)]
    sb = b"".join(s.to_bytes(32, "little") for s in ss)
    expect = HostBackend().msm(pts, ss)
    for backend_cls in (HostBackend, PurePythonBackend, HybridBackend):
        b = backend_cls()
        assert b.msm_raw(pts, sb) == expect, backend_cls.__name__
    hb = HybridBackend()
    hb.msm_raw(pts, sb)
    assert hb.last_msm_engine == "host"  # n < device threshold
