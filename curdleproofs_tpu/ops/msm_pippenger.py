"""Pippenger MSM on TPU via a host-built gather plan.

Pippenger's bucket accumulation is a scatter, which XLA can't vectorise. But
the scalars are host-visible, so the host (numpy) precomputes, per window, a
dense gather plan: for every bucket, the indices of the points that land in it
(padded with an infinity sentinel to the max bucket occupancy). The split of
work follows the hardware:

- DEVICE (all wide, branch-free, Pallas-backed): gather points into
  [W*B, maxcnt] bucket slots, tree-reduce the occupancy axis to bucket sums,
  then reduce the 2^c-1 buckets of every window to c binary-weighted partial
  sums (masked tree over the bucket axis). Only ~log(maxcnt)+c add-levels,
  every one of them a wide batched complete add.
- HOST (tiny, latency-bound): the final combine — per window a c-step Horner
  over the bit sums, then the (255-ish)-double window ladder — a few hundred
  native C++ point ops (~1 ms).

Total device work ~ (255/c) * slack * N complete adds (slack ~1.1-1.3 from
occupancy padding) — ~8x less than the bit-decomposition kernel in ops/msm.py.
Equivalent of arkworks `VariableBaseMSM` (SURVEY.md §2b); the kernel behind
the 2^10..2^20 sweep (BASELINE.json config 3).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..constants import R
from ..host.g1 import G1
from .g1_ops import (
    PointsXYZ, g1_add, g1_infinity, points_from_device, points_to_device,
)

__all__ = ["build_plan", "msm_pippenger", "pick_window"]

NBITS = 255
# Bound on gathered points resident per device step (memory control).
_MAX_CHUNK_ELEMS = 2 * 1024 * 1024


def pick_window(n: int) -> int:
    """Window size heuristic: buckets ~ n/16 so occupancy slack stays small."""
    c = max(4, n.bit_length() - 5)
    return min(c, 12)


def build_plan(scalars: list[int], n_points: int, c: int) -> np.ndarray:
    """Host-side digit plan: int32 [W, 2^c - 1, maxcnt] of point indices
    (n_points = infinity sentinel)."""
    n = len(scalars)
    windows = (NBITS + c - 1) // c
    sbytes = np.frombuffer(
        b"".join(s.to_bytes(32, "little") for s in scalars),
        dtype=np.uint8).reshape(n, 32)
    bits = np.unpackbits(sbytes, axis=1, bitorder="little")
    need = windows * c
    if need > bits.shape[1]:
        bits = np.pad(bits, ((0, 0), (0, need - bits.shape[1])))
    bits = bits[:, :need]
    digits = bits.reshape(n, windows, c)
    weights = (1 << np.arange(c)).astype(np.int64)
    digits = (digits * weights).sum(axis=2).T.astype(np.int64)  # [W, n]

    n_buckets = (1 << c) - 1
    maxcnt = 1
    per_window = []
    for w in range(windows):
        d = digits[w]
        nz = np.nonzero(d)[0]
        order = np.argsort(d[nz], kind="stable")
        sorted_idx = nz[order]
        sorted_dig = d[nz][order]
        counts = np.bincount(sorted_dig, minlength=n_buckets + 1)[1:]
        maxcnt = max(maxcnt, int(counts.max(initial=1)))
        per_window.append((sorted_idx, counts))

    plan = np.full((windows, n_buckets, maxcnt), n_points, dtype=np.int32)
    for w, (sorted_idx, counts) in enumerate(per_window):
        offsets = np.concatenate([[0], np.cumsum(counts)])
        for b in np.nonzero(counts)[0]:
            cnt = int(counts[b])
            plan[w, b, :cnt] = sorted_idx[offsets[b] : offsets[b] + cnt]
    return plan


def _gather(points: PointsXYZ, idx) -> PointsXYZ:
    return PointsXYZ(jnp.take(points.x, idx, axis=1),
                     jnp.take(points.y, idx, axis=1),
                     jnp.take(points.z, idx, axis=1))


def _tree_reduce_last(p: PointsXYZ) -> PointsXYZ:
    """Reduce the trailing axis by pairwise complete adds (any length)."""
    m = p.x.shape[-1]
    while m > 1:
        half = m // 2
        lo = PointsXYZ(p.x[..., :half], p.y[..., :half], p.z[..., :half])
        hi = PointsXYZ(p.x[..., half : 2 * half], p.y[..., half : 2 * half],
                       p.z[..., half : 2 * half])
        s = g1_add(lo, hi)
        if m % 2:
            s = PointsXYZ(
                jnp.concatenate([s.x, p.x[..., -1:]], axis=-1),
                jnp.concatenate([s.y, p.y[..., -1:]], axis=-1),
                jnp.concatenate([s.z, p.z[..., -1:]], axis=-1))
            m = half + 1
        else:
            m = half
        p = s
    return PointsXYZ(p.x[..., 0], p.y[..., 0], p.z[..., 0])


@functools.partial(jax.jit, static_argnames=("c", "n_chunks"))
def _bucket_bit_sums_kernel(points_ext: PointsXYZ, plan: jnp.ndarray,
                            c: int, n_chunks: int) -> PointsXYZ:
    """plan: [W, B, maxcnt] -> per-window binary-weighted sums [24, W, c].

    All wide device work; the tiny per-window combine is left to the host.
    """
    windows, n_buckets, _ = plan.shape
    plan_flat = plan.reshape(n_chunks, -1, plan.shape[2])

    b_idx = np.arange(1, n_buckets + 1, dtype=np.uint32)
    masks = np.stack([(b_idx >> j) & 1 for j in range(c)]).astype(bool)

    def chunk_body(_, idx):
        gathered = _gather(points_ext, idx)       # [24, wB, maxcnt]
        buckets = _tree_reduce_last(gathered)     # [24, wB]
        return None, buckets

    _, bucket_sums = lax.scan(chunk_body, None, plan_flat)
    # pytree of [n_chunks, 24, wB] -> [24, W, B]
    buckets = PointsXYZ(*(
        jnp.moveaxis(b, 0, 1).reshape(24, windows, n_buckets)
        for b in bucket_sums))

    masks_j = jnp.asarray(masks)[None, None]      # [1, 1, c, B]
    inf = g1_infinity(())
    sel = PointsXYZ(
        jnp.where(masks_j, buckets.x[:, :, None, :], inf.x[:, None, None, None]),
        jnp.where(masks_j, buckets.y[:, :, None, :], inf.y[:, None, None, None]),
        jnp.where(masks_j, buckets.z[:, :, None, :], inf.z[:, None, None, None]),
    )
    return _tree_reduce_last(sel)                 # [24, W, c]


def msm_pippenger(points: list[G1], scalars: list[int],
                  c: int | None = None) -> G1:
    """Host-facing Pippenger MSM: device bucket phase + host final ladder."""
    n = len(points)
    if n == 0:
        return G1.infinity()
    if c is None:
        c = pick_window(n)
    plan = build_plan([s % R for s in scalars], n, c)
    windows, n_buckets, maxcnt = plan.shape

    # chunk windows so the gathered working set stays bounded
    per_window_elems = n_buckets * maxcnt
    wpc = max(1, _MAX_CHUNK_ELEMS // max(per_window_elems, 1))
    n_chunks = max(1, -(-windows // wpc))
    while windows % n_chunks:
        n_chunks += 1

    pts = points_to_device(list(points) + [G1.infinity()])
    sums = _bucket_bit_sums_kernel(pts, jnp.asarray(plan), c, n_chunks)

    # download [24, W, c] -> W*c host points; combine with native host ops
    flat = PointsXYZ(sums.x.reshape(24, -1), sums.y.reshape(24, -1),
                     sums.z.reshape(24, -1))
    host_pts = points_from_device(flat)  # row-major: [w, j]

    acc = G1.infinity()
    for w in range(windows - 1, -1, -1):
        for _ in range(c):
            acc = acc.double()
        # Horner over the c bit sums of window w, MSB first
        s_w = G1.infinity()
        for j in range(c - 1, -1, -1):
            s_w = s_w.double()
            s_w = s_w.add(host_pts[w * c + j])
        acc = acc.add(s_w)
    return acc
