"""Device multi-scalar multiplication and batched scalar-mul kernels (JAX).

This is the single hot primitive of the protocol (SURVEY.md §2b: every
commitment and the verifier's one deduped check funnel into it — the arkworks
`VariableBaseMSM` Pippenger equivalent).

TPU-native formulation: instead of Pippenger's scatter-shaped bucket
accumulation (hostile to XLA), the v1 kernel uses bit-decomposition with
masked tree reductions — for each of the 255 scalar bits, the sum of points
whose bit is set, computed as a [255, N]-batched branch-free tree reduction
(perfect VPU shape, no sorting/scatter), then one Horner double-and-add ladder
over the 255 partial sums. Work is 255*N complete adds; the planned Pippenger
upgrade (host-sorted buckets + segmented sums) cuts this ~8x.

Scalars arrive as bit arrays; exponent bit patterns are data, not shapes, so
one compiled kernel serves all scalars at a given N.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from .g1_ops import PointsXYZ, g1_add, g1_double, g1_infinity, g1_select

__all__ = ["msm_kernel", "batch_mul_kernel", "batch_mul_each_kernel",
           "fold_kernel", "NBITS"]

NBITS = 255
# Max chunk of points reduced at once (bounds the [NBITS, CHUNK] intermediate).
_CHUNK = 4096


def _masked_bit_sums(points: PointsXYZ, bits: jnp.ndarray) -> PointsXYZ:
    """bits: [N, NBITS] -> S[j] = sum of points with bit j set; returns [NBITS]."""
    n = points.x.shape[0]
    mask = jnp.moveaxis(bits, 0, 1).astype(bool)[..., None]  # [NBITS, N, 1]
    inf = g1_infinity(())  # [L]-shaped; broadcasts against [NBITS, N, L]
    cur = PointsXYZ(
        jnp.where(mask, points.x[None], inf.x),
        jnp.where(mask, points.y[None], inf.y),
        jnp.where(mask, points.z[None], inf.z),
    )  # [NBITS, N]
    while n > 1:
        half = n // 2
        cur = g1_add(
            PointsXYZ(cur.x[:, :half], cur.y[:, :half], cur.z[:, :half]),
            PointsXYZ(cur.x[:, half:], cur.y[:, half:], cur.z[:, half:]))
        n = half
    return PointsXYZ(cur.x[:, 0], cur.y[:, 0], cur.z[:, 0])  # [NBITS]


def _horner(bit_sums: PointsXYZ) -> PointsXYZ:
    """acc = sum_j 2^j S_j via MSB-first double-and-add over [NBITS] points."""
    rev = PointsXYZ(bit_sums.x[::-1], bit_sums.y[::-1], bit_sums.z[::-1])

    def step(acc, s):
        acc = g1_double(acc)
        acc = g1_add(acc, PointsXYZ(*s))
        return acc, None

    acc0 = g1_infinity(())
    acc, _ = lax.scan(step, acc0, tuple(rev))
    return acc


def msm_kernel(points: PointsXYZ, bits: jnp.ndarray) -> PointsXYZ:
    """MSM over [N] points with [N, NBITS] scalar bits -> single point.

    N must be a power of two (pad with infinity / zero bits).
    """
    n = points.x.shape[0]
    assert n & (n - 1) == 0, "pad N to a power of two"
    if n <= _CHUNK:
        sums = _masked_bit_sums(points, bits)
    else:
        n_chunks = n // _CHUNK

        def body(k, acc):
            sl = lambda a: lax.dynamic_slice_in_dim(a, k * _CHUNK, _CHUNK, axis=0)
            s = _masked_bit_sums(PointsXYZ(sl(points.x), sl(points.y),
                                           sl(points.z)), sl(bits))
            return g1_add(acc, s)

        sums = lax.fori_loop(0, n_chunks, body, g1_infinity((NBITS,)))
    return _horner(sums)


def batch_mul_kernel(points: PointsXYZ, bits: jnp.ndarray) -> PointsXYZ:
    """[k * P for P in points] for ONE scalar given as [NBITS] bits."""

    def step(acc, bit):
        acc = g1_double(acc)
        added = g1_add(acc, points)
        return g1_select(jnp.broadcast_to(bit.astype(bool), acc.x.shape[:-1]),
                         added, acc), None

    n = points.x.shape[0]
    acc0 = g1_infinity((n,))
    acc, _ = lax.scan(step, acc0, bits[::-1])
    return acc


def batch_mul_each_kernel(points: PointsXYZ, bits: jnp.ndarray) -> PointsXYZ:
    """[k_i * P_i] with per-point scalars; bits: [N, NBITS]."""
    moved = jnp.moveaxis(bits, 1, 0)  # [NBITS, N]

    def step(acc, bit_col):
        acc = g1_double(acc)
        added = g1_add(acc, points)
        return g1_select(bit_col.astype(bool), added, acc), None

    n = points.x.shape[0]
    acc0 = g1_infinity((n,))
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
