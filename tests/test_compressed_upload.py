"""Compressed device upload: x + parity over the link, y rebuilt on device.

Validates the three layers separately on CPU:
- the 2-bit exponent digit chain against python pow() (instant),
- the native `export_mont_x` metadata against host affine coordinates,
- the full jnp ingest (sqrt chain + parity fix + identity lanes) against the
  uncompressed `export_mont_affine` ingest, bit for bit.
The Pallas sqrt kernel itself is KAT-gated on hardware
(tests/test_tpu_kernels.py) — it shares `_k_sqrt_candidate` with the jnp
path tested here.
"""

import numpy as np

from curdleproofs_tpu.constants import CURVE_B, Q
from curdleproofs_tpu.host import native
from curdleproofs_tpu.host.g1 import G1
from curdleproofs_tpu.host.rng import StdRng
from curdleproofs_tpu.ops.pallas_kernels import SQRT_DIGITS, _SQRT_E


def test_sqrt_digit_chain_matches_pow():
    assert _SQRT_E == (Q + 1) // 4
    u = 0x1234567890ABCDEF ** 5 % Q
    tab = [1, u, u * u % Q, pow(u, 3, Q)]
    acc = 1
    for d in SQRT_DIGITS:
        acc = pow(acc, 4, Q) * tab[d] % Q
    assert acc == pow(u, _SQRT_E, Q)
    # and that exponent IS a square root for quadratic residues
    y = pow(u, _SQRT_E, Q)
    if pow(u, (Q - 1) // 2, Q) == 1:
        assert y * y % Q == u


def test_ingest_compressed_matches_uncompressed():
    if not native.available():
        import pytest

        pytest.skip("native runtime unavailable")
    import jax.numpy as jnp

    from curdleproofs_tpu.ops.msm_device import (
        _ingest_compressed, _ingest_packed_mont,
    )

    rng = StdRng.seed_from_u64(9)
    pts = [rng.rand_g1() for _ in range(5)]
    # curve sanity for the constant the sqrt chain bakes in
    x_aff, y_aff = pts[0].to_affine()
    assert y_aff * y_aff % Q == (pow(x_aff, 3, Q) + CURVE_B) % Q
    pts += [G1.infinity(), pts[1].neg()]          # both parities + identity
    n = 64

    px, meta = native.export_mont_x(pts, n)
    got = _ingest_compressed(jnp.asarray(px), jnp.asarray(meta), pallas=False)

    upx, upy, uzb = native.export_mont_affine(pts, n)
    want = _ingest_packed_mont(jnp.asarray(upx), jnp.asarray(upy),
                               jnp.asarray(uzb))

    for g, w, name in zip(got, want, ("ext_px", "ext_py", "ext_zb")):
        assert np.array_equal(np.asarray(g), np.asarray(w)), name
