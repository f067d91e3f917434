"""DeviceBases fast path: the native Montgomery-affine exporter must produce
bit-for-bit the same resident layout as the bigint reference path, including
infinity inputs and shape-family padding (VERDICT r2 item 1: fresh-base
uploads must be cheap enough for the device to serve the protocol)."""

import numpy as np
import pytest

from curdleproofs_tpu.backend import HostBackend
from curdleproofs_tpu.host import native
from curdleproofs_tpu.host.g1 import G1
from curdleproofs_tpu.host.rng import StdRng
from curdleproofs_tpu.ops import msm_device as md


@pytest.mark.skipif(not native.available(), reason="native runtime required")
def test_export_matches_bigint_path():
    rng = StdRng.seed_from_u64(11)
    # mix of affine-fresh, composite (z != 1 jacobian), and infinity points,
    # with a size that forces padding (61 -> pad 64)
    pts = ([rng.rand_g1() for _ in range(30)] + [G1.infinity()]
           + [rng.rand_g1().add(rng.rand_g1()) for _ in range(30)])
    db = md.DeviceBases(pts)
    padded = pts + [G1.infinity()] * (db.n - len(pts))
    ref = md._extend_packed(md.points_to_device(padded))
    for got, want in zip((db.ext_px, db.ext_py, db.ext_zb), ref):
        assert np.array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.skipif(not native.available(), reason="native runtime required")
def test_msm_device_over_exported_bases():
    rng = StdRng.seed_from_u64(12)
    pts = [rng.rand_g1() for _ in range(20)] + [G1.infinity()]
    ss = [rng.rand_fr() for _ in range(20)] + [rng.rand_fr()]
    assert md.msm_device(md.DeviceBases(pts), ss) == HostBackend().msm(pts, ss)
