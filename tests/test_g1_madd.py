"""Mixed complete addition `_k_g1_madd` (RCB16 algorithm 8, a = 0).

The in-kernel row math is shared verbatim between the Pallas kernels and the
jnp path (ops/field.py `mul_rows` & friends), so the mixed-add formula is
validated on CPU by running it on plain jnp rows — against the full complete
add (bit-for-bit: with Z2 = 1 every intermediate is the same canonical
residue) and against the host golden model, including the exceptional cases
completeness must cover (P = Q, P = -Q, P = infinity).
"""

import jax.numpy as jnp
import numpy as np

from curdleproofs_tpu.host.g1 import G1
from curdleproofs_tpu.host.rng import StdRng
from curdleproofs_tpu.ops.g1_ops import (
    PointsXYZ, _g1_add_jnp, points_from_device, points_to_device,
)
from curdleproofs_tpu.ops.limbs import FQ_LIMBS as L


def _rows(a):
    return [a[i] for i in range(L)]


def test_madd_matches_full_add_and_host():
    from curdleproofs_tpu.ops.pallas_kernels import _k_g1_madd

    rng = StdRng.seed_from_u64(7)
    ps = [rng.rand_g1() for _ in range(5)]
    qs = [rng.rand_g1() for _ in range(5)]
    # exceptional cases the complete formula must cover: doubling (P = Q),
    # inverse (P = -Q -> infinity), and accumulator at infinity
    ps += [qs[0], qs[1].neg(), G1.infinity()]
    qs += [qs[0], qs[1], qs[2]]
    dp = points_to_device(ps)
    dq = points_to_device(qs)

    got = _k_g1_madd((_rows(dp.x), _rows(dp.y), _rows(dp.z)),
                     (_rows(dq.x), _rows(dq.y)))
    madd = PointsXYZ(*(jnp.stack(c) for c in got))

    # every q is affine (z exactly one_mont), so the 11-mul mixed formula
    # computes the same canonical residues as the 12-mul full add
    full = _g1_add_jnp(dp, dq)
    for a, b in zip(madd, full):
        assert np.array_equal(np.asarray(a), np.asarray(b))

    for p, q, g in zip(ps, qs, points_from_device(madd)):
        assert g == p.add(q)
