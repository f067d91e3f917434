"""Pallas TPU kernels for the hot field/curve inner loops.

Layout: limb-major [24, N] uint32 tiles — limbs on sublanes, batch on lanes
(full 128-lane utilisation; a batch-major [N, 24] layout wastes 5.3x on lane
padding). Inside a kernel the whole CIOS multiply is unrolled straight-line
vector code over [N]-wide rows held in vregs/VMEM — no XLA loop overhead and
no dynamic-slice buffer copies (the jnp fallback path in ops/field.py pays
~1.2 GB of buffer traffic per 64k-batch multiply; here traffic is just
inputs + outputs).

Kernels:
- fq_mul: batched Montgomery product
- g1_add: batched complete addition (RCB16 alg 7, a=0) = 12 fused muls
- g1_dbl_add: one double-and-add ladder step, the scalar-mul inner loop
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import CURVE_B, Q
from .field import FQ
from .limbs import FQ_LIMBS as L, LIMB_BITS, LIMB_MASK, int_to_limbs

_MASK = LIMB_MASK  # python int: jnp scalars would be captured consts in pallas
_N0 = None  # initialised below
_P_ROWS = None
_B3M_ROWS = None
_ONE_ROWS = None


def _rows(x_int: int) -> list[int]:
    return [int(v) for v in int_to_limbs(x_int, L)]


_P = _rows(Q)
_B3_MONT = _rows(FQ.to_mont(3 * CURVE_B))
_ONE_MONT = _rows(FQ.one_mont)
_N0INV = FQ.n0_inv


# --- in-kernel field arithmetic on lists of [N]-wide uint32 rows ---------------
# The row math itself lives in ops/field.py (`mul_rows` & friends) and is
# shared verbatim with the non-Pallas jnp path — one implementation, one
# bit-exactness surface.

from .field import carry_rows as _k_carry  # noqa: E402
from .field import cond_sub_rows, mul_rows  # noqa: E402


def _k_cond_sub_p(rows):
    return cond_sub_rows(rows, _P)


def _k_mul(a, b):
    return mul_rows(a, b, _P, _N0INV)


def _k_add(a, b):
    s = [x + y for x, y in zip(a, b)]
    s, _ = _k_carry(s)
    return _k_cond_sub_p(s)


def _k_sub(a, b):
    borrow = jnp.zeros_like(a[0], dtype=jnp.int32)
    out = []
    for i in range(L):
        t = (a[i].astype(jnp.int32) + _P[i]
             - b[i].astype(jnp.int32) + borrow)
        out.append((t & LIMB_MASK).astype(jnp.uint32))
        borrow = t >> LIMB_BITS
    return _k_cond_sub_p(out)


def _k_mul_b3(a):
    """a * 3b = a * 12 mod p via 4 modular adds (8a + 4a) — ~17x cheaper than
    the full 24x24 Montgomery product a previous revision used here."""
    a2 = _k_add(a, a)
    a4 = _k_add(a2, a2)
    a8 = _k_add(a4, a4)
    return _k_add(a8, a4)


def _k_g1_add(p, q):
    """Complete addition on row-list points (X, Y, Z each a list of L rows)."""
    X1, Y1, Z1 = p
    X2, Y2, Z2 = q
    t0 = _k_mul(X1, X2)
    t1 = _k_mul(Y1, Y2)
    t2 = _k_mul(Z1, Z2)
    t3 = _k_mul(_k_add(X1, Y1), _k_add(X2, Y2))
    t3 = _k_sub(t3, _k_add(t0, t1))
    t4 = _k_mul(_k_add(Y1, Z1), _k_add(Y2, Z2))
    t4 = _k_sub(t4, _k_add(t1, t2))
    X3 = _k_mul(_k_add(X1, Z1), _k_add(X2, Z2))
    Y3 = _k_sub(X3, _k_add(t0, t2))
    X3 = _k_add(t0, t0)
    t0 = _k_add(X3, t0)
    t2 = _k_mul_b3(t2)
    Z3 = _k_add(t1, t2)
    t1 = _k_sub(t1, t2)
    Y3 = _k_mul_b3(Y3)
    X3 = _k_sub(_k_mul(t3, t1), _k_mul(t4, Y3))
    Y3n = _k_add(_k_mul(Y3, t0), _k_mul(t1, Z3))
    Z3n = _k_add(_k_mul(Z3, t4), _k_mul(t0, t3))
    return X3, Y3n, Z3n


def _k_g1_madd(p, q):
    """Complete MIXED addition P + Q with Q affine (Z2 = 1 implicit):
    Renes–Costello–Batina 2016 algorithm 8 specialised to a = 0 — 11 field
    muls vs 12 for the full `_k_g1_add`, plus ~6 fewer modular adds.
    Complete in P (covers P = infinity, P = ±Q); Q must be an actual curve
    point — callers handle dead/infinity Q lanes by selecting the
    accumulator unchanged on a z liveness bit (see the madd fold kernel)."""
    X1, Y1, Z1 = p
    X2, Y2 = q
    t0 = _k_mul(X1, X2)
    t1 = _k_mul(Y1, Y2)
    t3 = _k_mul(_k_add(X2, Y2), _k_add(X1, Y1))
    t3 = _k_sub(t3, _k_add(t0, t1))           # X1·Y2 + X2·Y1
    t4 = _k_add(_k_mul(Y2, Z1), Y1)           # Y2·Z1 + Y1
    Y3 = _k_add(_k_mul(X2, Z1), X1)           # X2·Z1 + X1
    X3 = _k_add(t0, t0)
    t0 = _k_add(X3, t0)                       # 3·X1·X2
    t2 = _k_mul_b3(Z1)                        # 3b·Z1
    Z3 = _k_add(t1, t2)
    t1 = _k_sub(t1, t2)
    Y3 = _k_mul_b3(Y3)
    X3 = _k_sub(_k_mul(t3, t1), _k_mul(t4, Y3))
    Y3n = _k_add(_k_mul(Y3, t0), _k_mul(t1, Z3))
    Z3n = _k_add(_k_mul(Z3, t4), _k_mul(t0, t3))
    return X3, Y3n, Z3n


# --- modular square root (q = 3 mod 4): y = u^((q+1)/4) ----------------------

_B_MONT = _rows(FQ.to_mont(CURVE_B))
_SQRT_E = (Q + 1) // 4  # Tonelli exponent (q = 3 mod 4, so this sqrt is exact)


def _sqrt_digits() -> list[int]:
    """(q+1)/4 as MSB-first 2-bit digits for the windowed powering chain."""
    nb = _SQRT_E.bit_length()
    nb += nb & 1
    return [(_SQRT_E >> (nb - 2 * (j + 1))) & 3 for j in range(nb // 2)]


SQRT_DIGITS = _sqrt_digits()


def _k_sqrt_candidate(x, read_digit):
    """Row-list y-candidate for y^2 = x^3 + b: (x^3 + b)^((q+1)/4).

    `read_digit(j)` returns the j-th 2-bit exponent digit as an int32 scalar
    (SMEM ref read in the pallas kernel, constant-array index on the jnp
    path).  Loop body is 2 squares + 1 table multiply; digit 0 multiplies by
    Montgomery one (a wasted mul keeps the chain branch-free).  Works on any
    row width; Montgomery domain in and out (mont ops are a ring
    isomorphism, so the chain needs no domain conversions)."""
    u = _k_mul(_k_mul(x, x), x)
    b = [jnp.full_like(x[0], _B_MONT[i]) for i in range(L)]
    u = _k_add(u, b)
    u2 = _k_mul(u, u)
    u3 = _k_mul(u2, u)
    one = [jnp.full_like(x[0], _ONE_MONT[i]) for i in range(L)]

    def body(j, acc):
        acc = _k_mul(acc, acc)
        acc = _k_mul(acc, acc)
        d = read_digit(j)
        m = [jnp.where(d == 1, u[i],
                       jnp.where(d == 2, u2[i],
                                 jnp.where(d == 3, u3[i], one[i])))
             for i in range(L)]
        return _k_mul(acc, m)

    return jax.lax.fori_loop(0, len(SQRT_DIGITS), body, list(one))


def _g1_sqrt_kernel(px_ref, d_ref, oy):
    """px_ref: [12, S] packed Montgomery x limb pairs; d_ref: SMEM exponent
    digits; oy: [24, S] y-candidate rows (sign/liveness fixed by the XLA
    caller, which knows the parity bits)."""
    rows = []
    for k in range(L // 2):
        v = px_ref[k, :]
        rows.append(v & 0xFFFF)
        rows.append(v >> 16)
    y = _k_sqrt_candidate(rows, lambda j: d_ref[j])
    for i in range(L):
        oy[i, :] = y[i]


@jax.jit
def g1_sqrt_pallas(pxp, digits):
    """pxp: [12, n] packed Montgomery x limb pairs -> [24, n] y-candidate
    rows with y = (x^3 + b)^((q+1)/4); digits: int32 [len(SQRT_DIGITS)].
    n is padded to the lane-block size internally (callers mask dead lanes
    by their liveness bits anyway)."""
    n = pxp.shape[1]
    pad = (-n) % _BLOCK
    if pad:
        pxp = jnp.pad(pxp, ((0, 0), (0, pad)))
    out = _g1_sqrt_call(pxp, digits)
    return out[:, :n] if pad else out


def _g1_sqrt_call(pxp, digits):
    n = pxp.shape[1]
    return pl.pallas_call(
        _g1_sqrt_kernel,
        out_shape=jax.ShapeDtypeStruct((L, n), jnp.uint32),
        grid=(n // _BLOCK,),
        in_specs=[
            pl.BlockSpec((L // 2, _BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((L, _BLOCK), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
    )(pxp, digits)


def _load_point(refs):
    x_ref, y_ref, z_ref = refs
    return ([x_ref[i, :] for i in range(L)],
            [y_ref[i, :] for i in range(L)],
            [z_ref[i, :] for i in range(L)])


def _store_point(refs, pt):
    for ref, rows in zip(refs, pt):
        for i in range(L):
            ref[i, :] = rows[i]


# --- kernels -------------------------------------------------------------------

def _fq_mul_kernel(a_ref, b_ref, o_ref):
    a = [a_ref[i, :] for i in range(L)]
    b = [b_ref[i, :] for i in range(L)]
    out = _k_mul(a, b)
    for i in range(L):
        o_ref[i, :] = out[i]


def _g1_add_kernel(x1, y1, z1, x2, y2, z2, ox, oy, oz):
    p = _load_point((x1, y1, z1))
    q = _load_point((x2, y2, z2))
    r = _k_g1_add(p, q)
    _store_point((ox, oy, oz), r)


_BLOCK = 512  # lanes per grid step


def _spec():
    return pl.BlockSpec((L, _BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fq_mul_pallas(a, b, interpret: bool = False):
    """Batched Montgomery mul; a, b: [L, N] uint32, N multiple of 512."""
    n = a.shape[1]
    return pl.pallas_call(
        _fq_mul_kernel,
        out_shape=jax.ShapeDtypeStruct((L, n), jnp.uint32),
        grid=(n // _BLOCK,),
        in_specs=[_spec(), _spec()],
        out_specs=_spec(),
        interpret=interpret,
    )(a, b)


def g1_add_pallas_flat(p, q, batch_shape):
    """Complete add on PointsXYZ with any batch shape via the flat kernel.

    Broadcasts, flattens batch dims to one lane axis, pads to the block size
    (zero padding is safe: (0,0,0) rows stay bounded through the formulas).
    """
    from .g1_ops import PointsXYZ  # local import: avoid cycle at module load

    def prep(c):
        c = jnp.broadcast_to(c, (L, *batch_shape))
        flat = c.reshape(L, -1)
        w = flat.shape[1]
        pad = (-w) % _BLOCK
        if pad:
            flat = jnp.pad(flat, ((0, 0), (0, pad)))
        return flat

    flats = [prep(c) for c in (*p, *q)]
    ox, oy, oz = _g1_add_pallas_padded(*flats)
    w = 1
    for d in batch_shape:
        w *= d

    def unprep(c):
        return c[:, :w].reshape(L, *batch_shape)

    return PointsXYZ(unprep(ox), unprep(oy), unprep(oz))


@jax.jit
def _g1_add_pallas_padded(x1, y1, z1, x2, y2, z2):
    n = x1.shape[1]
    out_shape = tuple(jax.ShapeDtypeStruct((L, n), jnp.uint32) for _ in range(3))
    return pl.pallas_call(
        _g1_add_kernel,
        out_shape=out_shape,
        grid=(n // _BLOCK,),
        in_specs=[_spec()] * 6,
        out_specs=(_spec(), _spec(), _spec()),
    )(x1, y1, z1, x2, y2, z2)


_T_BLK = 8  # rows per grid step: 3 coords x 8 x 24 x 512 x 4 B ~ 4.5 MB VMEM


def _g1_fold_rows_kernel(x_ref, y_ref, z_ref, ox, oy, oz):
    """Accumulate _T_BLK pre-gathered point rows into the output accumulator.

    Grid is (S blocks, T blocks) with T minor: the output block stays VMEM-
    resident across the T revisits, so the whole bucket phase of an MSM is
    ONE pallas call (per-call dispatch overhead on the target platform is
    ~0.5 ms, which would otherwise dominate). On the first T step the
    accumulator initialises to the infinity point (0, 1_mont, 0).
    """
    j = pl.program_id(1)
    first = j == 0
    width = x_ref.shape[2]
    acc_x = [jnp.where(first, jnp.zeros((width,), jnp.uint32), ox[i, :])
             for i in range(L)]
    acc_y = [jnp.where(first, jnp.full((width,), _ONE_MONT[i], jnp.uint32),
                       oy[i, :]) for i in range(L)]
    acc_z = [jnp.where(first, jnp.zeros((width,), jnp.uint32), oz[i, :])
             for i in range(L)]
    acc = (acc_x, acc_y, acc_z)

    def body(t, acc):
        q = ([x_ref[i, t, :] for i in range(L)],
             [y_ref[i, t, :] for i in range(L)],
             [z_ref[i, t, :] for i in range(L)])
        return _k_g1_add(acc, q)

    acc = jax.lax.fori_loop(0, _T_BLK, body, acc)
    _store_point((ox, oy, oz), acc)


def _unpack_pair_row(ref, t):
    """One [L//2, T, S] limb-pair ref at row t -> list of L [S]-wide rows."""
    rows = []
    for k in range(L // 2):
        v = ref[k, t, :]
        rows.append(v & 0xFFFF)
        rows.append(v >> 16)
    return rows


def _fold_acc_init(refs, j, width):
    """Fold accumulator for grid step j: infinity on the first T step, else
    the VMEM-resident output block."""
    ox, oy, oz = refs
    first = j == 0
    acc_x = [jnp.where(first, jnp.zeros((width,), jnp.uint32), ox[i, :])
             for i in range(L)]
    acc_y = [jnp.where(first, jnp.full((width,), _ONE_MONT[i], jnp.uint32),
                       oy[i, :]) for i in range(L)]
    acc_z = [jnp.where(first, jnp.zeros((width,), jnp.uint32), oz[i, :])
             for i in range(L)]
    return acc_x, acc_y, acc_z


def _g1_fold_rows_packed_kernel(px_ref, py_ref, zb_ref, ox, oy, oz):
    """Packed twin of _g1_fold_rows_kernel: x/y arrive as 12 uint32 rows of
    16-bit limb PAIRS (halving the gather traffic that feeds the fold) and z
    as a per-entry liveness bit (z of every extended point is 1 or 0)."""
    acc = _fold_acc_init((ox, oy, oz), pl.program_id(1), px_ref.shape[2])

    def body(t, acc):
        zb = zb_ref[t, :] != 0
        qz = [jnp.where(zb, jnp.uint32(_ONE_MONT[i]), jnp.uint32(0))
              for i in range(L)]
        q = (_unpack_pair_row(px_ref, t), _unpack_pair_row(py_ref, t), qz)
        return _k_g1_add(acc, q)

    acc = jax.lax.fori_loop(0, _T_BLK, body, acc)
    _store_point((ox, oy, oz), acc)


def _g1_fold_rows_madd_kernel(px_ref, py_ref, zb_ref, ox, oy, oz):
    """Mixed-add twin of _g1_fold_rows_packed_kernel.  The gathered bases are
    affine (their z is exactly 0 or 1), so each accumulate runs the 11-mul
    complete mixed add `_k_g1_madd` instead of the 12-mul full add; dead
    lanes (zb = 0: input infinities and the plan's dead-slot sentinel) keep
    the accumulator through a per-row select — 3·24 one-op selects against a
    ~2300-lane-op saved multiply."""
    acc = _fold_acc_init((ox, oy, oz), pl.program_id(1), px_ref.shape[2])

    def body(t, acc):
        zb = zb_ref[t, :] != 0
        q = (_unpack_pair_row(px_ref, t), _unpack_pair_row(py_ref, t))
        rx, ry, rz = _k_g1_madd(acc, q)
        ax, ay, az = acc
        return ([jnp.where(zb, r, a) for r, a in zip(rx, ax)],
                [jnp.where(zb, r, a) for r, a in zip(ry, ay)],
                [jnp.where(zb, r, a) for r, a in zip(rz, az)])

    acc = jax.lax.fori_loop(0, _T_BLK, body, acc)
    _store_point((ox, oy, oz), acc)


def _fold_packed_call(kernel, px, py, zb):
    _, t_rows, n = px.shape
    spec_in = pl.BlockSpec((L // 2, _T_BLK, _BLOCK), lambda i, j: (0, j, i),
                           memory_space=pltpu.VMEM)
    spec_zb = pl.BlockSpec((_T_BLK, _BLOCK), lambda i, j: (j, i),
                           memory_space=pltpu.VMEM)
    spec_out = pl.BlockSpec((L, _BLOCK), lambda i, j: (0, i),
                            memory_space=pltpu.VMEM)
    out_shape = tuple(jax.ShapeDtypeStruct((L, n), jnp.uint32)
                      for _ in range(3))
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=(n // _BLOCK, t_rows // _T_BLK),
        in_specs=[spec_in, spec_in, spec_zb],
        out_specs=(spec_out, spec_out, spec_out),
    )(px, py, zb)


@jax.jit
def g1_fold_rows_packed_pallas(px, py, zb):
    """px, py: [12, T, S] uint32 limb-pairs; zb: [T, S] uint32 liveness ->
    folded [L, S] x3 (Montgomery)."""
    return _fold_packed_call(_g1_fold_rows_packed_kernel, px, py, zb)


@jax.jit
def g1_fold_rows_madd_pallas(px, py, zb):
    """Mixed-add fold: same interface as g1_fold_rows_packed_pallas but each
    accumulate is the 11-mul complete mixed add (bases affine, Z2 = 1)."""
    return _fold_packed_call(_g1_fold_rows_madd_kernel, px, py, zb)


@jax.jit
def g1_fold_rows_pallas(x, y, z):
    """x, y, z: [L, T, S] (S mult of 512, T mult of 8) -> folded [L, S].

    The [L, T, S] layout is exactly what jnp.take(ext, plan, axis=1)
    produces, so no physical transpose sits between the gather and the fold.
    """
    _, t_rows, n = x.shape
    spec_in = pl.BlockSpec((L, _T_BLK, _BLOCK), lambda i, j: (0, j, i),
                           memory_space=pltpu.VMEM)
    spec_out = pl.BlockSpec((L, _BLOCK), lambda i, j: (0, i),
                            memory_space=pltpu.VMEM)
    out_shape = tuple(jax.ShapeDtypeStruct((L, n), jnp.uint32)
                      for _ in range(3))
    return pl.pallas_call(
        _g1_fold_rows_kernel,
        out_shape=out_shape,
        grid=(n // _BLOCK, t_rows // _T_BLK),
        in_specs=[spec_in] * 3,
        out_specs=(spec_out, spec_out, spec_out),
    )(x, y, z)


def _g1_suffix_weighted_kernel(cb, x_ref, y_ref, z_ref,
                               otx, oty, otz, owx, owy, owz):
    """Per lane: suffix-accumulate cb bucket points (high bucket first) and
    the running sum of suffixes.  For bucket chunk P_0..P_{cb-1} this yields
      total    = sum_j P_j
      weighted = sum_j (j+1) * P_j
    which is the Pippenger bucket-reduction inner step (one chunk of a
    window's buckets), all in ONE pallas call per MSM."""
    width = x_ref.shape[2]
    inf_x = [jnp.zeros((width,), jnp.uint32) for _ in range(L)]
    inf_y = [jnp.full((width,), _ONE_MONT[i], jnp.uint32) for i in range(L)]
    inf_z = [jnp.zeros((width,), jnp.uint32) for _ in range(L)]

    def body(i, st):
        sufx, sufy, sufz, wx, wy, wz = st
        j = cb - 1 - i
        q = ([x_ref[l, j, :] for l in range(L)],
             [y_ref[l, j, :] for l in range(L)],
             [z_ref[l, j, :] for l in range(L)])
        suf = _k_g1_add((sufx, sufy, sufz), q)
        w = _k_g1_add((wx, wy, wz), suf)
        return (*suf, *w)

    st = jax.lax.fori_loop(0, cb, body,
                           (inf_x, inf_y, inf_z, inf_x, inf_y, inf_z))
    _store_point((otx, oty, otz), st[:3])
    _store_point((owx, owy, owz), st[3:])


@functools.partial(jax.jit, static_argnames=())
def g1_suffix_weighted_pallas(x, y, z):
    """x, y, z: [L, Cb, WG] (WG mult of 512) -> (total, weighted) each a
    3-tuple of [L, WG] arrays (Montgomery form)."""
    _, cb, wg = x.shape
    spec_in = pl.BlockSpec((L, cb, _BLOCK), lambda i: (0, 0, i),
                           memory_space=pltpu.VMEM)
    spec_out = pl.BlockSpec((L, _BLOCK), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    out_shape = tuple(jax.ShapeDtypeStruct((L, wg), jnp.uint32)
                      for _ in range(6))
    outs = pl.pallas_call(
        functools.partial(_g1_suffix_weighted_kernel, cb),
        out_shape=out_shape,
        grid=(wg // _BLOCK,),
        in_specs=[spec_in] * 3,
        out_specs=(spec_out,) * 6,
    )(x, y, z)
    return outs[:3], outs[3:]


@functools.partial(jax.jit, static_argnames=("interpret",))
def g1_add_pallas(p, q, interpret: bool = False):
    """Batched complete add on limb-major points; each field [L, N]."""
    n = p[0].shape[1]
    out_shape = tuple(jax.ShapeDtypeStruct((L, n), jnp.uint32) for _ in range(3))
    ox, oy, oz = pl.pallas_call(
        _g1_add_kernel,
        out_shape=out_shape,
        grid=(n // _BLOCK,),
        in_specs=[_spec()] * 6,
        out_specs=(_spec(), _spec(), _spec()),
        interpret=interpret,
    )(*p, *q)
    return (ox, oy, oz)
