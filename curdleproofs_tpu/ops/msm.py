"""Device multi-scalar multiplication and batched scalar-mul kernels (JAX).

This is the single hot primitive of the protocol (SURVEY.md §2b: every
commitment and the verifier's one deduped check funnel into it — the arkworks
`VariableBaseMSM` Pippenger equivalent).

TPU-native formulation: instead of Pippenger's scatter-shaped bucket
accumulation (hostile to XLA), the v1 kernel uses bit-decomposition with
masked tree reductions — for each of the 255 scalar bits, the sum of points
whose bit is set, computed as a [255, N]-batched branch-free tree reduction
(pure VPU shape, no sorting/scatter; the wide adds dispatch to the Pallas
kernel), then one Horner double-and-add ladder over the 255 partial sums.
Work is 255*N complete adds; the planned Pippenger upgrade (host-sorted
buckets + segmented sums) cuts this ~8x.

Layout: limb-major [24, ...] (see ops/field.py). Scalars arrive as bit
arrays; bit patterns are data, not shapes, so one compiled kernel serves all
scalars at a given N.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .g1_ops import PointsXYZ, g1_add, g1_double, g1_infinity, g1_select

__all__ = ["msm_kernel", "batch_mul_kernel", "batch_mul_each_kernel",
           "fold_kernel", "NBITS"]

NBITS = 255
# Max chunk of points reduced at once (bounds the [24, NBITS, CHUNK] live set).
_CHUNK = 4096


def _inf_like(points: PointsXYZ, n: int) -> PointsXYZ:
    """Infinity batch whose mesh-varying type matches `points` (shard_map)."""
    zero = points.x[:, :1] * 0
    inf = g1_infinity((n,))
    return PointsXYZ(inf.x + zero, inf.y + zero, inf.z + zero)


def _sl(p: PointsXYZ, sl) -> PointsXYZ:
    """Slice the trailing (batch) axes of every coordinate."""
    return PointsXYZ(p.x[(slice(None), *sl)], p.y[(slice(None), *sl)],
                     p.z[(slice(None), *sl)])


def _masked_bit_sums(points: PointsXYZ, bits: jnp.ndarray) -> PointsXYZ:
    """bits: [N, NBITS] -> S[j] = sum of points with bit j set; [24, NBITS]."""
    n = points.x.shape[1]
    mask = jnp.moveaxis(bits, 0, 1).astype(bool)[None]  # [1, NBITS, N]
    inf = g1_infinity(())
    cur = PointsXYZ(
        jnp.where(mask, points.x[:, None, :], inf.x[:, None, None]),
        jnp.where(mask, points.y[:, None, :], inf.y[:, None, None]),
        jnp.where(mask, points.z[:, None, :], inf.z[:, None, None]),
    )  # [24, NBITS, N]
    while n > 1:
        half = n // 2
        cur = g1_add(_sl(cur, (slice(None), slice(0, half))),
                     _sl(cur, (slice(None), slice(half, n))))
        n = half
    return PointsXYZ(cur.x[:, :, 0], cur.y[:, :, 0], cur.z[:, :, 0])


def _horner(bit_sums: PointsXYZ) -> PointsXYZ:
    """acc = sum_j 2^j S_j via MSB-first double-and-add over [24, NBITS]."""
    # scan needs the scanned axis leading: [NBITS, 24], MSB first
    rev = PointsXYZ(bit_sums.x[:, ::-1].T, bit_sums.y[:, ::-1].T,
                    bit_sums.z[:, ::-1].T)

    def step(acc, s):
        sx, sy, sz = s
        acc = g1_double(acc)
        acc = g1_add(acc, PointsXYZ(sx, sy, sz))
        return acc, None

    # derive from the data so the carry's mesh-varying type matches under
    # shard_map (g1_infinity alone is 'replicated')
    zero = bit_sums.x[:, 0] * 0
    inf = g1_infinity(())
    acc0 = PointsXYZ(inf.x + zero, inf.y + zero, inf.z + zero)
    acc, _ = lax.scan(step, acc0, tuple(rev))
    return acc


def msm_kernel(points: PointsXYZ, bits: jnp.ndarray) -> PointsXYZ:
    """MSM over [24, N] points with [N, NBITS] scalar bits -> single point.

    N must be a power of two (pad with infinity / zero bits).
    """
    n = points.x.shape[1]
    assert n & (n - 1) == 0, "pad N to a power of two"
    if n <= _CHUNK:
        sums = _masked_bit_sums(points, bits)
    else:
        n_chunks = n // _CHUNK

        def body(k, acc):
            pts = PointsXYZ(
                lax.dynamic_slice_in_dim(points.x, k * _CHUNK, _CHUNK, axis=1),
                lax.dynamic_slice_in_dim(points.y, k * _CHUNK, _CHUNK, axis=1),
                lax.dynamic_slice_in_dim(points.z, k * _CHUNK, _CHUNK, axis=1))
            b = lax.dynamic_slice_in_dim(bits, k * _CHUNK, _CHUNK, axis=0)
            return g1_add(acc, _masked_bit_sums(pts, b))

        zero = points.x[:, :1] * 0
        inf = g1_infinity((NBITS,))
        acc0 = PointsXYZ(inf.x + zero, inf.y + zero, inf.z + zero)
        sums = lax.fori_loop(0, n_chunks, body, acc0)
    return _horner(sums)


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

msm_jit = jax.jit(msm_kernel)
batch_mul_jit = jax.jit(batch_mul_kernel)
batch_mul_each_jit = jax.jit(batch_mul_each_kernel)
fold_jit = jax.jit(fold_kernel)
