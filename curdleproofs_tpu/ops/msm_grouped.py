"""Grouped device MSM: MANY small MSMs in ONE pipeline dispatch.

The batched prover's folding rounds need B proofs x 4-6 MSMs of ~n/2 terms
each, every round (reference round structure:
/root/reference/src/inner_product_argument.rs:150-186 and
same_multiscalar_argument.rs:99-136).  One `msm_device` call per MSM would
pay the ~40 ms dispatch+sync floor thousands of times; this module runs the
WHOLE round — thousands of relations — as one jitted program and downloads
only the finished points.

Differences from the single-MSM pipeline (ops/msm_device.py):

- Output axis: each relation (output point) owns its own window rows and
  bucket space; window sums reduce to final points ON DEVICE with a shared
  Horner ladder (64 x [4 doublings + add] over all relations at once), so
  the download is [3, 24, n_rel] canonical points, not window sums.
- c = 4 windows (W = 64, 8 buckets).  Small relations (~128-256 live
  columns) make the bucket-reduction term 2*W*2^(c-1) dominate at c = 8
  (256 reduction adds per 129-entry window); c = 4 costs 16 reduction adds
  per window and its 8-bucket space is dense enough that slot padding stays
  ~1.5x.  64*4 = 256 > 255 bits, so the top window is always 0..7 and
  absorbs the signed-recode carry.
- No sort: with 8 buckets, per-entry in-bucket ranks come from a one-hot
  cumulative sum over the 8 bucket lanes — pure streaming vector work,
  where the big pipeline's lax.sort is its scheduling bottleneck.
- Indirect columns: relations address bases through a col_pts map, so a
  composite-scalar prover can hit arbitrary strided subsets of a resident
  base set (the folded-base expansion) without materialising folded points.

Bases are a `DeviceBases` ([P | -P | inf] extended residency, shared with
the single-MSM path).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..constants import Q
from ..host.g1 import G1
from .field import FQ
from .g1_ops import PointsXYZ, g1_infinity, use_pallas
from .limbs import int_to_limbs
from .msm_device import (
    DeviceBases, _dev_add, _scalars_to_limbs, _take1, use_madd,
)

__all__ = ["GroupedParams", "grouped_msm", "grouped_core", "horner_device",
           "decode_points", "pick_grouped_params", "signed_digits_c4"]

_C = 4                      # window bits (see module docstring)
_W = 64                     # 64 windows x 4 bits = 256 bits >= 255
_B_CNT = 1 << (_C - 1)      # 8 buckets per window
_T = 8                      # slot depth = the fold kernel's row block


@dataclass(frozen=True)
class GroupedParams:
    """Static shape family of one grouped dispatch."""
    n_rel: int    # relations (output points), multiple of 8
    width: int    # columns per relation (padded)
    s_pad: int    # slot bound, multiple of 512
    n_ext: int    # resident base count N (ext arrays are [*, 2N+1])

    @property
    def rows(self) -> int:
        return self.n_rel * _W


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def pick_grouped_params(n_rel: int, width: int, n_ext: int) -> GroupedParams:
    n_rel = _round_up(max(n_rel, 8), 8)
    rows = n_rel * _W
    # per row: <= 8 occupied buckets + ceil-overflow slots bounded by
    # (width - occupied)/T; static worst case per row
    per_row = _B_CNT + _round_up(max(0, width - _B_CNT), _T) // _T
    s_pad = _round_up(rows * per_row, 512)
    return GroupedParams(n_rel, width, s_pad, n_ext)


def signed_digits_c4(limbs, m: int):
    """[16, m] uint16/uint32 scalar limbs -> signed base-16 digits [64, m]
    int32 in [-8, 8].  Scalars < r < 2^255, so the top window (bits 252..255,
    raw digit <= 7) absorbs the final carry (7 + 1 = 8 = half, not > half)."""
    limbs = limbs.astype(jnp.uint32)  # uint16 over the link, uint32 lanes
    nib = jnp.stack([(limbs >> (4 * j)).astype(jnp.int32) & 0xF
                     for j in range(4)], axis=1).reshape(_W, m)

    def recode(carry, raw):
        v = raw + carry
        neg = v > _B_CNT
        return neg.astype(jnp.int32), jnp.where(neg, v - 16, v)

    _, digits = lax.scan(recode, nib[0] * 0, nib)
    return digits


def grouped_core(ext_px, ext_py, ext_zb, digits, col_pts, *,
                 params: GroupedParams, pallas: bool, madd: bool = True):
    """Window sums for n_rel relations: digits [n_rel, W, width] int32 in
    [-8, 8], col_pts [n_rel, width] int32 base indices in [0, n_ext)
    (dead columns: any valid index with digit 0).  Returns Montgomery
    window sums as a PointsXYZ of [24, n_rel, W] arrays."""
    n_rel, width, s_pad = params.n_rel, params.width, params.s_pad
    rows = params.rows
    n_ext = params.n_ext

    # -- bucket key + extended index per cell ------------------------------
    live = digits != 0
    key = jnp.where(live, jnp.abs(digits) - 1, _B_CNT)       # [n_rel, W, wd]
    eidx = jnp.where(digits < 0, col_pts[:, None, :] + n_ext,
                     col_pts[:, None, :]) + jnp.zeros_like(key)

    # -- ranks: rank of each live cell within its (row, bucket) ------------
    # 8 masked cumsums (one per bucket) replace the big pipeline's lax.sort:
    # pure streaming vector work, no sorting network
    rank = jnp.zeros_like(key)
    cnts = []
    for b in range(_B_CNT):
        m = key == b
        cs = jnp.cumsum(m.astype(jnp.int32), axis=-1)
        rank = jnp.where(m, cs - 1, rank)
        cnts.append(cs[..., -1])
    cnt = jnp.stack(cnts, axis=-1)                           # [n_rel, W, 8]

    # -- slot layout: bucket (row, b) owns ceil(cnt/T) slots ---------------
    slots_per_bucket = -(-cnt // _T)                         # [n_rel, W, 8]
    b_off = jnp.cumsum(slots_per_bucket, axis=-1) - slots_per_bucket
    row_slots = jnp.sum(slots_per_bucket, axis=-1).reshape(-1)   # [rows]
    row_off = (jnp.cumsum(row_slots) - row_slots).reshape(n_rel, _W)

    # global slot of a cell: row base + bucket base + rank // T
    cell_boff = jnp.take_along_axis(
        b_off, jnp.minimum(key, _B_CNT - 1), axis=-1)        # [n_rel, W, wd]
    gslot = row_off[..., None] + cell_boff + rank // _T      # [n_rel, W, wd]

    # -- scatter-built fold plan + slot key table --------------------------
    dest = jnp.where(live, (rank % _T) * s_pad + gslot, _T * s_pad)
    plan = jnp.full((_T * s_pad,), 2 * n_ext, jnp.int32).at[
        dest.reshape(-1)].set(eidx.reshape(-1), mode="drop") \
        .reshape(_T, s_pad)
    # slot -> (row, bucket) key for merge + dense gather
    rowid = lax.broadcasted_iota(jnp.int32, (n_rel, _W, width), 0) * _W \
        + lax.broadcasted_iota(jnp.int32, (n_rel, _W, width), 1)
    gkey = jnp.where(live, rowid * _B_CNT + key, rows * _B_CNT + 9)
    sdest = jnp.where(live, gslot, s_pad)
    slot_gkey = jnp.full((s_pad,), rows * _B_CNT + 9, jnp.int32).at[
        sdest.reshape(-1)].set(gkey.reshape(-1), mode="drop")
    # first slot per (row, bucket): bucket totals end up there after merge
    first_slot = row_off[..., None] + b_off                  # [n_rel, W, 8]
    occupied = cnt > 0

    # -- bucket fold (the hot kernel; shared with the single-MSM path) -----
    if pallas:
        from .pallas_kernels import (
            g1_fold_rows_madd_pallas, g1_fold_rows_packed_pallas,
        )

        gx = _take1(ext_px, plan)
        gy = _take1(ext_py, plan)
        gzb = jnp.take(ext_zb, plan.reshape(-1)).reshape(_T, s_pad)
        fold = g1_fold_rows_madd_pallas if madd else g1_fold_rows_packed_pallas
        acc = PointsXYZ(*fold(gx, gy, gzb))
    else:
        from .msm_device import _unpack_rows

        one_col = FQ.const(1, (1,))

        def fold_step(a, row):
            qx = _unpack_rows(jnp.take(ext_px, row, axis=1))
            qy = _unpack_rows(jnp.take(ext_py, row, axis=1))
            zb = jnp.take(ext_zb, row)
            qz = jnp.where(zb[None] != 0, one_col, jnp.uint32(0))
            from .g1_ops import _g1_add_jnp

            return _g1_add_jnp(a, PointsXYZ(qx, qy, qz)), None

        acc, _ = lax.scan(fold_step, _vinf(ext_px, (s_pad,)), plan)

    # -- merge slots of equal (row, bucket) (masked suffix doubling scan) --
    kmax = jnp.max(slots_per_bucket)
    sidx = jnp.arange(s_pad, dtype=jnp.int32)

    def mbody(st):
        stride, ax, ay, az = st
        partner = jnp.minimum(sidx + stride, s_pad - 1)
        same = (jnp.take(slot_gkey, partner) == slot_gkey) \
            & (sidx + stride < s_pad)
        cur = PointsXYZ(ax, ay, az)
        q = PointsXYZ(jnp.take(ax, partner, axis=1),
                      jnp.take(ay, partner, axis=1),
                      jnp.take(az, partner, axis=1))
        s = _dev_add(cur, q, pallas)
        return (stride * 2,
                jnp.where(same[None], s.x, ax),
                jnp.where(same[None], s.y, ay),
                jnp.where(same[None], s.z, az))

    _, mx, my, mz = lax.while_loop(
        lambda st: st[0] < kmax, mbody, (jnp.int32(1), *acc))

    # -- dense buckets [24, 8, rows] + weighted suffix reduction -----------
    sel = jnp.where(occupied, first_slot, 0)
    occ = occupied.reshape(1, n_rel, _W, _B_CNT) \
        .transpose(0, 3, 1, 2).reshape(1, _B_CNT, rows)
    sel_t = sel.transpose(2, 0, 1).reshape(_B_CNT, rows)     # [8, rows]
    one_m = FQ.const(1, (1, 1))
    dense = PointsXYZ(
        jnp.where(occ, _take1(mx, sel_t), 0),
        jnp.where(occ, _take1(my, sel_t), one_m),
        jnp.where(occ, _take1(mz, sel_t), 0))

    if pallas and rows % 512 == 0:
        from .pallas_kernels import g1_suffix_weighted_pallas

        _, lw = g1_suffix_weighted_pallas(*dense)
        wsum = PointsXYZ(*lw)
    else:
        def p3_step(i, st):
            suf, wacc = st
            j = _B_CNT - 1 - i
            q = PointsXYZ(
                lax.dynamic_index_in_dim(dense.x, j, 1, keepdims=False),
                lax.dynamic_index_in_dim(dense.y, j, 1, keepdims=False),
                lax.dynamic_index_in_dim(dense.z, j, 1, keepdims=False))
            from .g1_ops import _g1_add_jnp

            suf = _g1_add_jnp(suf, q)
            return suf, _g1_add_jnp(wacc, suf)

        _, wsum = lax.fori_loop(
            0, _B_CNT, p3_step,
            (_vinf(ext_px, (rows,)), _vinf(ext_px, (rows,))))

    return PointsXYZ(wsum.x.reshape(24, n_rel, _W),
                     wsum.y.reshape(24, n_rel, _W),
                     wsum.z.reshape(24, n_rel, _W))


def _vinf(anchor, shape):
    """Infinity point derived from an input (mesh-varying under shard_map)."""
    vzero = anchor.reshape(-1)[0] * 0
    i = g1_infinity(shape)
    return PointsXYZ(i.x + vzero, i.y + vzero, i.z + vzero)


def horner_device(wsums: PointsXYZ, pallas: bool) -> jnp.ndarray:
    """[24, n_rel, W] Montgomery window sums -> [3, 24, n_rel] CANONICAL
    projective points: acc = ((ws[W-1] * 16 + ws[W-2]) * 16 + ...) on
    device — 64 iterations of 4 doublings + 1 add over all relations at
    once, replacing the host-side Horner the single-MSM path uses."""
    n_rel = wsums.x.shape[1]

    def step(w, acc):
        for _ in range(_C):
            acc = _dev_add(acc, acc, pallas)
        q = PointsXYZ(
            lax.dynamic_index_in_dim(wsums.x, _W - 1 - w, 2, keepdims=False),
            lax.dynamic_index_in_dim(wsums.y, _W - 1 - w, 2, keepdims=False),
            lax.dynamic_index_in_dim(wsums.z, _W - 1 - w, 2, keepdims=False))
        return _dev_add(acc, q, pallas)

    acc = lax.fori_loop(0, _W, step, _vinf(wsums.x, (n_rel,)))
    one_plain = jnp.asarray(int_to_limbs(1, FQ.L)).reshape(FQ.L, 1)
    return jnp.stack([FQ.mul(acc.x, one_plain), FQ.mul(acc.y, one_plain),
                      FQ.mul(acc.z, one_plain)])


@functools.partial(
    jax.jit,
    static_argnames=("n_rel", "width", "s_pad", "n_ext", "pallas", "madd"))
def _grouped_msm_jit(ext_px, ext_py, ext_zb, limbs, col_pts, *,
                     n_rel, width, s_pad, n_ext, pallas, madd):
    """limbs: [16, n_rel, width] canonical scalar limbs."""
    params = GroupedParams(n_rel, width, s_pad, n_ext)
    digits = signed_digits_c4(
        limbs.reshape(16, n_rel * width), n_rel * width) \
        .reshape(_W, n_rel, width).transpose(1, 0, 2)
    ws = grouped_core(ext_px, ext_py, ext_zb, digits, col_pts,
                      params=params, pallas=pallas, madd=madd)
    return horner_device(ws, pallas)


def decode_points(out: np.ndarray) -> list[G1]:
    """[3, 24, n_rel] canonical projective -> host G1 list."""
    from .msm_device import _decode_canonical
    from ..host.field import batch_inversion

    xs = _decode_canonical(out[0])
    ys = _decode_canonical(out[1])
    zs = _decode_canonical(out[2])
    zinvs = batch_inversion(zs, Q)
    pts = []
    for x, y, z, zi in zip(xs, ys, zs, zinvs):
        if z == 0:
            pts.append(G1.infinity())
        else:
            pts.append(G1.from_affine(x * zi % Q, y * zi % Q))
    return pts


# --------------------------------------------------------------------------
# TABLE MODE: dense relations over precomputed small multiples
# --------------------------------------------------------------------------
# The slot/merge machinery above handles arbitrary sparse relations, but the
# batched prover's rounds are DENSE (every row has `width` live cells) over
# bases that are resident and known in advance.  Profiling the slot design at
# the prover's round family (bench_grouped_phases.json: 2.74 s/dispatch =
# 0.46 s fold + ~1.2 s keyed slot-merge + 0.44 s gathers + 0.33 s plan
# scatters/cumsums) showed 83% of the wall is bucket bookkeeping.  Table mode
# removes ALL of it: the device precomputes d*P for d in 1..8 for every
# resident base once per residency (~0.5 s, amortized over every dispatch),
# and each window sum becomes a PURE STREAMING FOLD of `width` table entries
# — no buckets, no slots, no merge, no bucket reduction.  A memory-for-
# bookkeeping trade only an accelerator with GBs of HBM can make; the
# reference's rayon Pippenger has no analogue (/root/reference/src/util.rs:19).

class DeviceBasesTable:
    """Extended residency [d*P | -d*P | inf] for d = 1..8 (c = 4 digits).

    Layout: column m*N + i holds (m+1) * P_i for m in 0..7; columns
    8N..16N-1 the negations (y flipped); column 16N the infinity sentinel.
    Multiples are computed ON DEVICE (7 complete adds over the base vector
    + one batched z-normalization whose single field inversion hops to the
    host — 96 B down, 32 B up), so the table costs no host<->device
    bandwidth beyond the original base upload."""

    def __init__(self, bases: DeviceBases):
        self.n = bases.n
        self.n_real = bases.n_real
        total_dev, mx, my, mz = _table_stage1(
            bases.ext_px, bases.ext_py, bases.ext_zb)
        total = _decode_canonical_col(np.asarray(total_dev))
        # the ONE inversion of the whole batch, on host; re-uploaded in
        # MONTGOMERY form so the device chain stays in-domain
        inv_mont = pow(total, Q - 2, Q) * pow(2, 384, Q) % Q
        self.ext_px, self.ext_py, self.ext_zb = _table_stage2(
            bases.ext_px, bases.ext_py, bases.ext_zb, mx, my, mz,
            jnp.asarray(np.asarray(
                int_to_limbs(inv_mont, FQ.L), dtype=np.uint32)))


def _decode_canonical_col(arr) -> int:
    """[L] canonical 16-bit limb column (uint32 lanes) -> python int."""
    return sum(int(v) << (16 * i) for i, v in enumerate(np.asarray(arr)))


@jax.jit
def _table_stage1(ext_px, ext_py, ext_zb):
    """Base residency -> projective multiples 2P..8P + the z-product.

    Returns (total_z_canonical [L], mxs, mys, mzs each [24, 7N] Montgomery
    projective).  The caller inverts total_z on host (one 381-bit inversion)
    and feeds it to _table_stage2."""
    from .msm_device import _unpack_rows

    n = ext_zb.shape[0] // 2  # ext arrays are [*, 2N+1]
    x1 = _unpack_rows(ext_px[:, :n])
    y1 = _unpack_rows(ext_py[:, :n])
    zb = ext_zb[:n]
    one = FQ.const(1, (n,))
    z1 = jnp.where(zb[None] != 0, one, jnp.uint32(0))
    p1 = PointsXYZ(x1, y1, z1)

    # 2P..8P via a 7-step scan (ONE traced add body: the unrolled inline
    # chain produced an HLO big enough to OOM the remote compile helper)
    def step(acc, _):
        nxt = _g1_add_jnp_local(acc, p1)
        return nxt, (nxt.x, nxt.y, nxt.z)

    _, (sx, sy, sz) = lax.scan(step, p1, None, length=7)
    # [7, 24, N] -> [24, 7N] in multiple-major blocks (m*N + i)
    mx = sx.transpose(1, 0, 2).reshape(24, -1)
    my = sy.transpose(1, 0, 2).reshape(24, -1)
    mz = sz.transpose(1, 0, 2).reshape(24, -1)

    # product of all z's (zeros masked to 1) for Montgomery batch inversion
    zmask = jnp.where(jnp.any(mz != 0, axis=0)[None], mz,
                      FQ.const(1, mz.shape[1:]))
    prod = lax.associative_scan(FQ.mul, zmask, axis=1)[:, -1]
    one_plain = jnp.asarray(int_to_limbs(1, FQ.L)).reshape(FQ.L, 1)
    total = FQ.mul(prod[:, None], one_plain)[:, 0]  # canonical for the host
    return total, mx, my, mz


@jax.jit
def _table_stage2(ext_px, ext_py, ext_zb, mx, my, mz, inv_total_limbs):
    """Normalize the projective multiples with one shared inversion and
    assemble the [d*P | -d*P | inf] table residency (packed limb pairs)."""
    from .msm_device import _pack_rows

    m = mz.shape[1]
    one = FQ.const(1, (m,))
    live = jnp.any(mz != 0, axis=0)
    zmask = jnp.where(live[None], mz, one)
    # inv(z_i) = excl_prefix_i * excl_suffix_i * inv(total)
    pp = lax.associative_scan(FQ.mul, zmask, axis=1)
    sp = jnp.flip(lax.associative_scan(
        FQ.mul, jnp.flip(zmask, axis=1), axis=1), axis=1)
    excl_pp = jnp.concatenate([one[:, :1], pp[:, :-1]], axis=1)
    excl_sp = jnp.concatenate([sp[:, 1:], one[:, :1]], axis=1)
    inv_total = jnp.broadcast_to(inv_total_limbs[:, None], excl_pp.shape)
    inv_z = FQ.mul(FQ.mul(excl_pp, excl_sp), inv_total)
    ax = jnp.where(live[None], FQ.mul(mx, inv_z), 0)
    ay = jnp.where(live[None], FQ.mul(my, inv_z), one)
    azb = live.astype(jnp.uint32)

    # assemble: [P (from the base residency) | 2P..8P | negatives | inf]
    base_px = ext_px[:, : azb.shape[0] // 7]
    base_py = ext_py[:, : azb.shape[0] // 7]
    base_zb = ext_zb[: azb.shape[0] // 7]
    inf_px = ext_px[:, -1:]
    inf_py = ext_py[:, -1:]
    px_all = jnp.concatenate([base_px, _pack_rows(ax)], axis=1)
    py_all = jnp.concatenate([base_py, _pack_rows(ay)], axis=1)
    ny_all = jnp.concatenate(
        [_pack_rows(FQ.neg(_unpack_rows_local(base_py))),
         _pack_rows(FQ.neg(ay))], axis=1)
    zb_all = jnp.concatenate([base_zb, azb])
    tpx = jnp.concatenate([px_all, px_all, inf_px], axis=1)
    tpy = jnp.concatenate([py_all, ny_all, inf_py], axis=1)
    tzb = jnp.concatenate([zb_all, zb_all, jnp.zeros((1,), jnp.uint32)])
    return tpx, tpy, tzb


def _unpack_rows_local(a):
    from .msm_device import _unpack_rows

    return _unpack_rows(a)


def _g1_add_jnp_local(p, q):
    from .g1_ops import _g1_add_jnp

    return _g1_add_jnp(p, q)


@functools.partial(
    jax.jit, static_argnames=("n_rel", "width", "n_base", "pallas", "madd"))
def _grouped_table_jit(tpx, tpy, tzb, limbs, col_pts, *, n_rel, width,
                       n_base, pallas, madd):
    """Dense grouped MSM over the multiples table: limbs [16, n_rel, width]
    canonical scalar limbs, col_pts [n_rel, width] base indices ->
    [3, 24, n_rel] canonical projective results.

    Every (relation, window, position) cell maps to ONE table entry
    ((|d|-1)*N + col, negatives at +8N, dead cells at 16N), and window sums
    are a single streaming fold over the position axis — the fold kernel's
    minimum possible add count (width adds per window sum)."""
    rows = n_rel * _W
    wpad = -(-width // _T) * _T
    digits = signed_digits_c4(
        limbs.reshape(16, n_rel * width), n_rel * width) \
        .reshape(_W, n_rel, width).transpose(1, 0, 2)    # [n_rel, W, width]

    live = digits != 0
    idx = (jnp.abs(digits) - 1) * n_base + col_pts[:, None, :] \
        + jnp.where(digits < 0, 8 * n_base, 0)
    idx = jnp.where(live, idx, 16 * n_base)              # [n_rel, W, width]
    plan = jnp.full((n_rel, _W, wpad), 16 * n_base, jnp.int32) \
        .at[:, :, :width].set(idx) \
        .transpose(2, 0, 1).reshape(wpad, rows)          # [wpad, rows]

    if pallas:
        from .pallas_kernels import (
            g1_fold_rows_madd_pallas, g1_fold_rows_packed_pallas,
        )

        gx = _take1(tpx, plan)
        gy = _take1(tpy, plan)
        gzb = jnp.take(tzb, plan.reshape(-1)).reshape(wpad, rows)
        fold = g1_fold_rows_madd_pallas if madd else g1_fold_rows_packed_pallas
        acc = PointsXYZ(*fold(gx, gy, gzb))
    else:
        from .g1_ops import _g1_add_jnp
        from .msm_device import _unpack_rows

        one_col = FQ.const(1, (1,))

        def fold_step(a, row):
            qx = _unpack_rows(jnp.take(tpx, row, axis=1))
            qy = _unpack_rows(jnp.take(tpy, row, axis=1))
            zb = jnp.take(tzb, row)
            qz = jnp.where(zb[None] != 0, one_col, jnp.uint32(0))
            return _g1_add_jnp(a, PointsXYZ(qx, qy, qz)), None

        i0 = g1_infinity((rows,))
        vzero = tpx.reshape(-1)[0] * 0
        acc, _ = lax.scan(fold_step, PointsXYZ(
            i0.x + vzero, i0.y + vzero, i0.z + vzero), plan)

    ws = PointsXYZ(acc.x.reshape(24, n_rel, _W),
                   acc.y.reshape(24, n_rel, _W),
                   acc.z.reshape(24, n_rel, _W))
    return horner_device(ws, pallas)


def grouped_msm_table(table: DeviceBasesTable,
                      relations: "list[tuple[list[int], list[int]]]",
                      ) -> list[G1]:
    """`grouped_msm` twin over a DeviceBasesTable (dense fold path)."""
    if not relations:
        return []
    width = max(len(c) for c, _ in relations)
    n_rel = _round_up(max(len(relations), 8), 8)
    cols = np.zeros((n_rel, width), dtype=np.int32)
    flat: list[int] = []
    for c, s in relations:
        assert len(c) == len(s)
        flat.extend(s)
        flat.extend([0] * (width - len(s)))
    flat.extend([0] * ((n_rel - len(relations)) * width))
    for i, (c, _) in enumerate(relations):
        cols[i, : len(c)] = c
    limbs = _scalars_to_limbs(flat, n_rel * width).reshape(16, n_rel, width)

    out = _grouped_table_jit(
        table.ext_px, table.ext_py, table.ext_zb,
        jnp.asarray(limbs), jnp.asarray(cols),
        n_rel=n_rel, width=width, n_base=table.n,
        pallas=use_pallas(), madd=use_madd())
    return decode_points(np.asarray(out))[: len(relations)]


def grouped_msm(bases: DeviceBases,
                relations: "list[tuple[list[int], list[int]]]") -> list[G1]:
    """Host-facing grouped MSM: each relation is (cols, scalars) over the
    resident `bases` (cols index the ORIGINAL point list).  All relations
    run in one device dispatch; returns one G1 per relation.

    This is the generic entry (scalars as host ints).  The batched prover
    drives `grouped_core` directly inside its fused round program instead.
    """
    if not relations:
        return []
    n_ext = bases.n
    width = max(len(c) for c, _ in relations)
    params = pick_grouped_params(len(relations), width, n_ext)
    n_rel = params.n_rel

    cols = np.zeros((n_rel, width), dtype=np.int32)
    flat: list[int] = []
    for c, s in relations:
        assert len(c) == len(s)
        flat.extend(s)
        flat.extend([0] * (width - len(s)))
    flat.extend([0] * ((n_rel - len(relations)) * width))
    for i, (c, _) in enumerate(relations):
        cols[i, : len(c)] = c
    limbs = _scalars_to_limbs(flat, n_rel * width).reshape(16, n_rel, width)

    out = _grouped_msm_jit(
        bases.ext_px, bases.ext_py, bases.ext_zb,
        jnp.asarray(limbs), jnp.asarray(cols),
        n_rel=n_rel, width=width, s_pad=params.s_pad, n_ext=n_ext,
        pallas=use_pallas(), madd=use_madd())
    return decode_points(np.asarray(out))[: len(relations)]
