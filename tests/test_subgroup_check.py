"""Native endomorphism G1-membership test vs the python [r]P ground truth.

The native check is phi(P) + z^2*P == O (Scott, ePrint 2021/1130; the test
blst ships) — ~2.3x cheaper than the [r]P ladder it replaced.  Soundness
rests on no nonzero cofactor-torsion point T satisfying phi(T) = lambda*T,
so the adversarial cases here probe exactly that subspace: pure cofactor
components T = [r]P' for curve points P' outside G1.
"""

import ctypes
import random

import pytest

from curdleproofs_tpu.constants import R
from curdleproofs_tpu.host import native
from curdleproofs_tpu.host.g1 import G1, get_point_from_x
from curdleproofs_tpu.host.rng import StdRng

rnd = random.Random(99)

needs_native = pytest.mark.skipif(not native.available(),
                                  reason="native library unavailable")


def _native_flags(pts):
    lib = native.lib()
    flags = ctypes.create_string_buffer(len(pts))
    lib.cp_subgroup_check(native.pts_to_bytes(pts), len(pts), flags)
    return list(flags.raw)


def _curve_points_not_in_g1(count):
    out = []
    x = 7
    while len(out) < count:
        x += 1
        p = get_point_from_x(x, bool(rnd.getrandbits(1)))
        if p is None or p.is_in_correct_subgroup():
            continue
        out.append(p)
    return out


@needs_native
def test_subgroup_check_matches_python():
    rng = StdRng.seed_from_u64(21)
    good = [rng.rand_g1() for _ in range(9)]
    bad = _curve_points_not_in_g1(9)
    pts = good + bad + [G1.infinity()]
    rnd.shuffle(pts)
    want = [0 if p.is_in_correct_subgroup() else 1 for p in pts]
    assert _native_flags(pts) == want


@needs_native
def test_subgroup_check_rejects_pure_cofactor_torsion():
    """T = [r]P' has order dividing the cofactor h; these are the points an
    unsound endomorphism shortcut would wrongly admit."""
    torsion = [p.mul_bigint(R) for p in _curve_points_not_in_g1(10)]
    live = [t for t in torsion if not t.is_infinity()]
    assert live, "expected nonzero cofactor components"
    assert _native_flags(live) == [1] * len(live)
    # ...and scaled ones (random multiples keep the order in h)
    scaled = [t.mul_bigint(rnd.randrange(2, 1 << 64)) for t in live]
    scaled = [t for t in scaled if not t.is_infinity()]
    if scaled:
        assert _native_flags(scaled) == [1] * len(scaled)


@needs_native
def test_subgroup_check_scalar_fallback_matches():
    """CP_NO_IFMA exercises the 64-bit scalar twin of the 8-wide check."""
    import os
    import pathlib
    import subprocess
    import sys

    repo = str(pathlib.Path(__file__).resolve().parents[1])
    code = r"""
import ctypes, sys
sys.path.insert(0, %r)
from curdleproofs_tpu.host import native
from curdleproofs_tpu.host.g1 import G1
from curdleproofs_tpu.host.rng import StdRng
from curdleproofs_tpu.host.g1 import get_point_from_x
rng = StdRng.seed_from_u64(21)
good = [rng.rand_g1() for _ in range(3)]
bad = []
x = 7
while len(bad) < 3:
    x += 1
    p = get_point_from_x(x, False)
    if p is None or p.is_in_correct_subgroup():
        continue
    bad.append(p)
pts = good + bad + [G1.infinity()]
lib = native.lib()
flags = ctypes.create_string_buffer(len(pts))
lib.cp_subgroup_check(native.pts_to_bytes(pts), len(pts), flags)
want = bytes([0, 0, 0, 1, 1, 1, 0])
assert flags.raw == want, (flags.raw, want)
print("OK")
"""
    env = dict(os.environ, CP_NO_IFMA="1")
    r = subprocess.run([sys.executable, "-c", code % repo],
                       capture_output=True, text=True, env=env, timeout=300)
    assert r.returncode == 0 and "OK" in r.stdout, r.stderr[-2000:]
