"""Batched scalar-mul / fold kernels (JAX) — double-and-add ladders.

These serve the O(n) one-scalar and per-point scalar-mul primitives
(`batch_mul`, `batch_mul_each`, `fold_points`) where every point gets the
full 255-bit ladder by construction — there is no Pippenger analogue.  The
MSM itself lives in ops/msm_device.py (the on-device Pippenger pipeline);
the v1 bit-serial MSM that used to live here is retired from every dispatch
path.

Layout: limb-major [24, ...] (see ops/field.py). Scalars arrive as bit
arrays; bit patterns are data, not shapes, so one compiled kernel serves all
scalars at a given N.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .g1_ops import PointsXYZ, g1_add, g1_double, g1_infinity, g1_select

__all__ = ["batch_mul_kernel", "batch_mul_each_kernel", "fold_kernel",
           "NBITS"]

NBITS = 255


def _inf_like(points: PointsXYZ, n: int) -> PointsXYZ:
    """Infinity batch whose mesh-varying type matches `points` (shard_map)."""
    zero = points.x[:, :1] * 0
    inf = g1_infinity((n,))
    return PointsXYZ(inf.x + zero, inf.y + zero, inf.z + zero)


def batch_mul_kernel(points: PointsXYZ, bits: jnp.ndarray) -> PointsXYZ:
    """[k * P for P in points] for ONE scalar given as [NBITS] bits."""
    n = points.x.shape[1]

    def step(acc, bit):
        acc = g1_double(acc)
        added = g1_add(acc, points)
        cond = jnp.broadcast_to(bit.astype(bool), (n,))
        return g1_select(cond, added, acc), None

    acc0 = _inf_like(points, n)
    acc, _ = lax.scan(step, acc0, bits[::-1])
    return acc


def batch_mul_each_kernel(points: PointsXYZ, bits: jnp.ndarray) -> PointsXYZ:
    """[k_i * P_i] with per-point scalars; bits: [N, NBITS]."""
    moved = jnp.moveaxis(bits, 1, 0)  # [NBITS, N]

    def step(acc, bit_col):
        acc = g1_double(acc)
        added = g1_add(acc, points)
        return g1_select(bit_col.astype(bool), added, acc), None

    n = points.x.shape[1]
    acc0 = _inf_like(points, n)
    acc, _ = lax.scan(step, acc0, moved[::-1])
    return acc


def fold_kernel(left: PointsXYZ, right: PointsXYZ, bits: jnp.ndarray) -> PointsXYZ:
    """left[i] + gamma * right[i]; gamma given as [NBITS] bits."""
    return g1_add(left, batch_mul_kernel(right, bits))


# --- jitted entry points (cached per shape) -----------------------------------

batch_mul_jit = jax.jit(batch_mul_kernel)
batch_mul_each_jit = jax.jit(batch_mul_each_kernel)
fold_jit = jax.jit(fold_kernel)
