"""Batched BLS12-381 G1 ops for TPU: branch-free complete projective formulas.

Points are (X, Y, Z) homogeneous-projective limb-major arrays [24, *batch] in
Montgomery form; infinity is (0 : 1 : 0). The complete addition/doubling
formulas (Renes–Costello–Batina 2016, algorithms 7/9 for a = 0) have no
exceptional cases, so they vectorise with zero control flow — the TPU-native
replacement for arkworks' branching Jacobian ops (`ark-ec`, SURVEY.md §2b).

When running on a real TPU, wide adds dispatch to the Pallas kernel
(ops/pallas_kernels.py, ~85x the lax-loop path); the jnp path remains the
portable fallback (CPU tests, odd shapes).
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import CURVE_B, Q
from ..host.field import batch_inversion
from ..host.g1 import G1
from .field import FQ
from .limbs import FQ_LIMBS, ints_to_limbs, limbs_to_ints

__all__ = ["PointsXYZ", "g1_add", "g1_double", "g1_select", "g1_infinity",
           "points_to_device", "points_from_device", "use_pallas"]

_B3 = 3 * CURVE_B  # 12


class PointsXYZ(NamedTuple):
    """A batch of projective points; each field is a [24, *batch] uint32 array."""
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray


def use_pallas() -> bool:
    """Dispatch wide point ops to the Pallas kernels? (real TPU only)."""
    env = os.environ.get("CURDLEPROOFS_USE_PALLAS")
    if env is not None:
        return env == "1"
    return jax.default_backend() in ("tpu", "axon")


def g1_infinity(batch_shape=()) -> PointsXYZ:
    return PointsXYZ(
        x=FQ.zeros(batch_shape),
        y=FQ.const(1, batch_shape),
        z=FQ.zeros(batch_shape),
    )


def _g1_add_jnp(p: PointsXYZ, q: PointsXYZ) -> PointsXYZ:
    """Complete addition, a = 0 (RCB16 algorithm 7). Handles P=Q, ±, infinity."""
    X1, Y1, Z1 = p
    X2, Y2, Z2 = q
    mul, add, sub, mc = FQ.mul, FQ.add, FQ.sub, FQ.mul_const

    t0 = mul(X1, X2)
    t1 = mul(Y1, Y2)
    t2 = mul(Z1, Z2)
    t3 = mul(add(X1, Y1), add(X2, Y2))
    t3 = sub(t3, add(t0, t1))
    t4 = mul(add(Y1, Z1), add(Y2, Z2))
    t4 = sub(t4, add(t1, t2))
    X3 = mul(add(X1, Z1), add(X2, Z2))
    Y3 = sub(X3, add(t0, t2))
    X3 = add(t0, t0)
    t0 = add(X3, t0)
    t2 = mc(t2, _B3)
    Z3 = add(t1, t2)
    t1 = sub(t1, t2)
    Y3 = mc(Y3, _B3)
    X3 = sub(mul(t3, t1), mul(t4, Y3))
    Y3 = add(mul(Y3, t0), mul(t1, Z3))
    Z3 = add(mul(Z3, t4), mul(t0, t3))
    return PointsXYZ(X3, Y3, Z3)


def g1_add(p: PointsXYZ, q: PointsXYZ) -> PointsXYZ:
    """Complete add; routes wide batches to the Pallas kernel on TPU."""
    if use_pallas():
        batch = jnp.broadcast_shapes(p.x.shape[1:], q.x.shape[1:])
        width = int(np.prod(batch)) if batch else 1
        if width >= 256:
            from .pallas_kernels import g1_add_pallas_flat

            return g1_add_pallas_flat(p, q, batch)
    return _g1_add_jnp(p, q)


def g1_double(p: PointsXYZ) -> PointsXYZ:
    """Complete doubling, a = 0 (RCB16 algorithm 9)."""
    X, Y, Z = p
    mul, add, sub, mc = FQ.mul, FQ.add, FQ.sub, FQ.mul_const

    t0 = mul(Y, Y)
    Z3 = add(t0, t0)
    Z3 = add(Z3, Z3)
    Z3 = add(Z3, Z3)
    t1 = mul(Y, Z)
    t2 = mul(Z, Z)
    t2 = mc(t2, _B3)
    X3 = mul(t2, Z3)
    Y3 = add(t0, t2)
    Z3 = mul(t1, Z3)
    t1 = add(t2, t2)
    t2 = add(t1, t2)
    t0 = sub(t0, t2)
    Y3 = mul(t0, Y3)
    Y3 = add(X3, Y3)
    t1 = mul(X, Y)
    X3 = mul(t0, t1)
    X3 = add(X3, X3)
    return PointsXYZ(X3, Y3, Z3)


def g1_select(cond, p: PointsXYZ, q: PointsXYZ) -> PointsXYZ:
    """Per-point select: cond has batch shape (no limb axis)."""
    c = cond[None]
    return PointsXYZ(jnp.where(c, p.x, q.x),
                     jnp.where(c, p.y, q.y),
                     jnp.where(c, p.z, q.z))


# --- host <-> device conversion ------------------------------------------------

@jax.jit
def _to_mont_device(x, y, z):
    """Canonical limb arrays -> Montgomery form on device (montmul by R^2)."""
    r2 = jnp.asarray(ints_to_limbs([FQ.mont_R2], FQ_LIMBS).T)  # [24, 1]
    return FQ.mul(x, r2), FQ.mul(y, r2), FQ.mul(z, r2)


def points_to_device(points: list[G1]) -> PointsXYZ:
    """Host G1 list -> limb-major projective Montgomery arrays [24, N].

    Normalises to affine on host (one batch inversion, native when available)
    and does the Montgomery form change on DEVICE — no per-point host bigint
    work beyond the byte repack.
    """
    affs = G1.batch_to_affine(points)
    xs = [0 if a is None else a[0] for a in affs]
    ys = [1 if a is None else a[1] for a in affs]
    zs = [0 if a is None else 1 for a in affs]
    x = jnp.asarray(ints_to_limbs(xs, FQ_LIMBS).T)
    y = jnp.asarray(ints_to_limbs(ys, FQ_LIMBS).T)
    z = jnp.asarray(ints_to_limbs(zs, FQ_LIMBS).T)
    return PointsXYZ(*_to_mont_device(x, y, z))


def points_from_device(p: PointsXYZ) -> list[G1]:
    """Limb-major device points [24, N] -> host G1 list."""
    xs = [FQ.from_mont(v) for v in limbs_to_ints(np.asarray(p.x).T)]
    ys = [FQ.from_mont(v) for v in limbs_to_ints(np.asarray(p.y).T)]
    zs = [FQ.from_mont(v) for v in limbs_to_ints(np.asarray(p.z).T)]
    out = []
    zinvs = batch_inversion(zs, Q)
    for x, y, z, zi in zip(xs, ys, zs, zinvs):
        if z == 0:
            out.append(G1.infinity())
        else:
            out.append(G1.from_affine(x * zi % Q, y * zi % Q))
    return out
