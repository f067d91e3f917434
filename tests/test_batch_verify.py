"""Batched verification: shared-accumulator semantics + sharded final MSM."""

import pytest

from curdleproofs_tpu.constants import N_BLINDERS
from curdleproofs_tpu.curdleproofs import CurdleproofsProof, generate_crs
from curdleproofs_tpu.host.rng import StdRng
from curdleproofs_tpu.parallel.batch_verify import ShuffleInstance, batch_verify
from curdleproofs_tpu.parallel.sharded_msm import make_msm_mesh
from curdleproofs_tpu.util import shuffle_permute_and_commit_input


@pytest.fixture(scope="module")
def batch():
    rng = StdRng.seed_from_u64(0)
    ell = 16 - N_BLINDERS
    crs = generate_crs(ell)
    instances, proofs = [], []
    for _ in range(3):
        perm = list(range(ell))
        rng.shuffle(perm)
        k = rng.rand_fr()
        vec_R = [rng.rand_g1() for _ in range(ell)]
        vec_S = [rng.rand_g1() for _ in range(ell)]
        vec_T, vec_U, M, mb = shuffle_permute_and_commit_input(
            crs, vec_R, vec_S, perm, k, rng)
        proofs.append(CurdleproofsProof.new(crs, vec_R, vec_S, vec_T, vec_U,
                                            M, perm, k, mb, rng))
        instances.append(ShuffleInstance(vec_R, vec_S, vec_T, vec_U, M))
    return crs, instances, proofs, rng


def test_batch_verify_valid(batch):
    crs, instances, proofs, rng = batch
    assert batch_verify(crs, instances, proofs, rng) is True


def test_batch_verify_detects_one_bad(batch):
    crs, instances, proofs, rng = batch
    bad = ShuffleInstance(instances[1].vec_S, instances[1].vec_R,
                          instances[1].vec_T, instances[1].vec_U,
                          instances[1].M)
    tampered = [instances[0], bad, instances[2]]
    assert batch_verify(crs, tampered, proofs, rng) is False
    verdicts = batch_verify(crs, tampered, proofs, rng, identify=True)
    assert verdicts == [True, False, True]


def test_batch_verify_streamed(batch):
    """Streamed (chunked device-pipeline) path: same verdicts as the one-MSM
    path, chunk boundary exercised (3 proofs, chunk of 2)."""
    crs, instances, proofs, rng = batch
    assert batch_verify(crs, instances, proofs, rng, stream_chunk=2) is True
    bad = ShuffleInstance(instances[1].vec_S, instances[1].vec_R,
                          instances[1].vec_T, instances[1].vec_U,
                          instances[1].M)
    tampered = [instances[0], bad, instances[2]]
    assert batch_verify(crs, tampered, proofs, rng, stream_chunk=2) is False


def test_device_msm_stream_matches_host():
    """DeviceMsmStream chunk-splitting: sum of chunk MSMs == one MSM."""
    from curdleproofs_tpu.backend import HostBackend
    from curdleproofs_tpu.ops.msm_device import DeviceMsmStream

    rng = StdRng.seed_from_u64(9)
    pts = [rng.rand_g1() for _ in range(150)]
    ss = [rng.rand_fr() for _ in range(150)]
    stream = DeviceMsmStream(64)
    stream.add(pts[:100], ss[:100])   # oversized: splits into 64 + 36
    stream.add(pts[100:], ss[100:])
    expect = HostBackend().msm(pts, ss)
    assert stream.result() == expect

    # raw 32B-LE scalars (the fused-dedup layout) through the same splits
    sb = b"".join(s.to_bytes(32, "little") for s in ss)
    stream2 = DeviceMsmStream(64)
    stream2.add(pts[:100], sb[: 100 * 32])
    stream2.add(pts[100:], sb[100 * 32 :])
    assert stream2.result() == expect

    # async-worker mode (prep on a GIL-releasing thread) — same result
    stream3 = DeviceMsmStream(64, async_worker=True)
    stream3.add(pts[:100], ss[:100])
    stream3.add(pts[100:], ss[100:])
    assert stream3.result() == expect


@pytest.mark.slow
def test_batch_verify_sharded_mesh(batch):
    crs, instances, proofs, rng = batch
    mesh = make_msm_mesh(8)
    assert batch_verify(crs, instances, proofs, rng, mesh=mesh) is True


@pytest.mark.parametrize("rates,expect_f", [
    ({"host_ms": 1000.0, "device_warm_ms": 1.0, "fresh_prep_ms": 1.0}, 1.0),
    ({"host_ms": 1.0, "device_warm_ms": 500.0, "fresh_prep_ms": 500.0}, 0.0),
])
def test_streamed_split_extremes(batch, tmp_path, monkeypatch, rates,
                                 expect_f):
    """The measured cost model drives the device/host split: an all-device
    table and an all-host table both verify correctly (and reject tampering),
    and plan_split_fraction lands at the expected extreme."""
    import json

    import jax

    from curdleproofs_tpu.ops import msm_tune
    from curdleproofs_tpu.ops.msm_device import stream_params
    from curdleproofs_tpu.parallel.batch_verify import plan_split_fraction

    path = tmp_path / "tune.json"
    path.write_text(json.dumps({jax.default_backend(): {
        str(stream_params().n): {"c": stream_params().c, **rates}}}))
    monkeypatch.setenv("CURDLEPROOFS_TUNE", str(path))
    msm_tune._load_raw.cache_clear()
    try:
        f = plan_split_fraction()
        assert abs(f - expect_f) < 0.01, f
        crs, instances, proofs, rng = batch
        assert batch_verify(crs, instances, proofs, rng,
                            stream_chunk=2) is True
        bad = ShuffleInstance(instances[1].vec_S, instances[1].vec_R,
                              instances[1].vec_T, instances[1].vec_U,
                              instances[1].M)
        assert batch_verify(crs, [instances[0], bad, instances[2]], proofs,
                            rng, stream_chunk=2) is False
    finally:
        msm_tune._load_raw.cache_clear()
