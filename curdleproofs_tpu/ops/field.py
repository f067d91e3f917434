"""Batched modular arithmetic over 16-bit limb arrays (JAX, TPU-native).

LAYOUT: limb-major — field elements are [L, *batch] uint32 arrays (limb 0 =
least significant, on axis 0). Limbs ride the sublane dimension and the batch
rides the 128-wide lane dimension, so elementwise limb ops waste nothing
(batch-major [*, L] padding costs 5.3x on lanes).

Montgomery-form CIOS multiplication with uint32 lanes only: every limb product
fits uint32 exactly and column sums stay < 2^24 — no 64-bit emulation (TPU has
no native int64 multiply). The multiply is a fully-unrolled straight-line
graph over per-limb rows (`mul_rows`); the Pallas kernels run the SAME row
functions inside Mosaic.  (Loop-based formulations with dynamic slices were
dropped: their jaxpr->MLIR lowering was ~150 s per shape on the target
platform; see FieldSpec.mul.)

Replaces arkworks `ark-ff` (x86 asm Montgomery limbs,
`/root/reference/Cargo.toml:24,35`); bit-exact vs the host Python-int field.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from ..constants import Q
from .limbs import FQ_LIMBS, LIMB_BITS, LIMB_MASK, int_to_limbs

__all__ = ["FieldSpec", "FQ", "carry_rows", "cond_sub_rows", "mul_rows"]

# plain int, NOT jnp.uint32: creating a jax array at import time would
# initialize the PJRT backend, which blocks for minutes when a remote-TPU
# tunnel is attached but degraded; py-int & uint32 keeps uint32 dtype.
_MASK = LIMB_MASK


# --- row-list kernels: straight-line limb math shared with Pallas ----------
# Operands are python lists of [*batch]-shaped uint32 rows (limb-major with
# the limb axis unrolled into the graph).  Constants are python ints so the
# same code traces inside Pallas kernels (jnp scalars would be captured
# consts there).

def carry_rows(cols):
    """Full carry propagation over K rows; returns K rows + final carry."""
    out = []
    c = jnp.zeros_like(cols[0])
    for col in cols:
        t = col + c
        out.append(t & LIMB_MASK)
        c = t >> LIMB_BITS
    return out, c


def cond_sub_rows(rows, p_rows):
    """rows (< 2p) -> canonical < p."""
    n = len(rows)
    borrow = jnp.zeros_like(rows[0], dtype=jnp.int32)
    sub = []
    for i in range(n):
        t = rows[i].astype(jnp.int32) - p_rows[i] + borrow
        sub.append((t & LIMB_MASK).astype(jnp.uint32))
        borrow = t >> LIMB_BITS
    geq = borrow == 0
    return [jnp.where(geq, s, r) for s, r in zip(sub, rows)]


def mul_rows(a, b, p_rows, n0_inv):
    """Montgomery product of two L-row lists -> L rows (canonical < p)."""
    L = len(a)
    cols = [None] * (2 * L)
    for i in range(L):
        for j in range(L):
            prod = a[i] * b[j]
            lo = prod & LIMB_MASK
            hi = prod >> LIMB_BITS
            k = i + j
            cols[k] = lo if cols[k] is None else cols[k] + lo
            cols[k + 1] = hi if cols[k + 1] is None else cols[k + 1] + hi
    # CIOS reduction
    carry = jnp.zeros_like(a[0])
    for i in range(L):
        t = cols[i] + carry
        m = (t * n0_inv) & LIMB_MASK
        mp0 = m * p_rows[0]
        carry = (t >> LIMB_BITS) \
            + (((t & LIMB_MASK) + (mp0 & LIMB_MASK)) >> LIMB_BITS) \
            + (mp0 >> LIMB_BITS)
        for j in range(1, L):
            prod = m * p_rows[j]
            cols[i + j] = cols[i + j] + (prod & LIMB_MASK)
            cols[i + j + 1] = cols[i + j + 1] + (prod >> LIMB_BITS)
    out = cols[L: 2 * L]
    out[0] = out[0] + carry
    out, _ = carry_rows(out)
    return cond_sub_rows(out, p_rows)


def _bshape(a):
    return a.shape[1:]


def _carry_u(cols):
    """Carry-propagate [K, *b] uint32 columns (< 2^31); drops final carry."""

    def step(c, col):
        t = col + c
        return t >> LIMB_BITS, t & _MASK

    _, out = lax.scan(step, jnp.zeros_like(cols[0]), cols)
    return out


def _carry_s(cols):
    """Borrow-propagate [K, *b] int32 columns; returns (limbs u32, final borrow)."""

    def step(c, col):
        t = col + c
        return t >> LIMB_BITS, (t & jnp.int32(LIMB_MASK)).astype(jnp.uint32)

    c, out = lax.scan(step, jnp.zeros_like(cols[0]), cols)
    return out, c


class FieldSpec:
    """Precomputed constants + jnp ops for one prime field at a limb count."""

    def __init__(self, modulus: int, n_limbs: int):
        self.modulus = modulus
        self.L = n_limbs
        self.mont_R = (1 << (LIMB_BITS * n_limbs)) % modulus
        self.mont_R2 = self.mont_R * self.mont_R % modulus
        self.mont_R_inv = pow(self.mont_R, -1, modulus)
        self.n0_inv = (-pow(modulus, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)
        # numpy, not jnp: FieldSpec is built at import (FQ below) and must
        # not initialize the device backend; jnp ops lift it when traced
        import numpy as _np

        self.p_limbs = _np.asarray(int_to_limbs(modulus, n_limbs),
                                   dtype=_np.uint32)
        self.p_rows = [int(v) for v in int_to_limbs(modulus, n_limbs)]
        self.one_mont = self.mont_R % modulus

    # --- host-side form conversion -----------------------------------------
    def to_mont(self, x: int) -> int:
        return x * self.mont_R % self.modulus

    def from_mont(self, x: int) -> int:
        return x * self.mont_R_inv % self.modulus

    def _p_col(self, a, dtype=jnp.int32):
        """p limbs broadcast against a's batch dims: [L, 1, 1, ...]."""
        shape = (self.L,) + (1,) * (a.ndim - 1)
        return self.p_limbs.astype(dtype).reshape(shape)

    # --- device ops (shapes [L, *batch] uint32; Montgomery residues < p) -----
    def add(self, a, b):
        return self._cond_sub_p(_carry_u(a + b))

    def sub(self, a, b):
        d = a.astype(jnp.int32) + self._p_col(a) - b.astype(jnp.int32)
        limbs, _ = _carry_s(d)
        return self._cond_sub_p(limbs)

    def neg(self, a):
        is_zero = jnp.all(a == 0, axis=0, keepdims=True)
        d = self._p_col(a) - a.astype(jnp.int32)
        limbs, _ = _carry_s(d)
        return jnp.where(is_zero, a, limbs)

    def _cond_sub_p(self, a):
        """a - p if a >= p else a (canonicalise a < 2p)."""
        d = a.astype(jnp.int32) - self._p_col(a)
        sub, borrow = _carry_s(d)
        return jnp.where((borrow == 0)[None], sub, a)

    def mul(self, a, b):
        """Montgomery product a * b * R^{-1} mod p.

        Two trace-time-selected formulations of the same CIOS math:
        - TPU: fully-unrolled straight-line graph over per-limb rows (the
          same `mul_rows` the Pallas kernels run).  The loop formulation's
          jaxpr->MLIR lowering is pathological on TPU (~150 s per process
          per shape); the ~2000-op static graph lowers+compiles in seconds.
        - CPU: lax.fori_loop CIOS with dynamic slices.  XLA:CPU takes ~7 min
          to compile ONE unrolled multiply, but lowers/compiles the loop in
          seconds (this is the CI/test path; bit-exactness of the two forms
          is pinned by the known-answer tests both paths share).
        """
        L = self.L
        batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])

        def bcast(v):
            # right-align the batch dims after the leading limb axis
            lead = len(batch) - (v.ndim - 1)
            v = v.reshape(L, *([1] * lead), *v.shape[1:])
            return jnp.broadcast_to(v, (L, *batch))

        a = bcast(a)
        b = bcast(b)
        if jax.default_backend() in ("tpu", "axon"):
            rows = mul_rows([a[i] for i in range(L)], [b[i] for i in range(L)],
                            self.p_rows, self.n0_inv)
            return jnp.stack(rows)
        return self._mul_loop(a, b, batch)

    def _mul_loop(self, a, b, batch):
        L = self.L
        # derive the accumulator from BOTH operands so its mesh-varying type
        # matches the loop body under shard_map (plain zeros() is
        # 'replicated', and either operand alone may be too)
        zero_b = a[0] * 0 + b[0] * 0
        cols = jnp.zeros((2 * L + 1, *batch), dtype=jnp.uint32) + zero_b
        pad_lo = [(0, 1)] + [(0, 0)] * len(batch)
        pad_hi = [(1, 0)] + [(0, 0)] * len(batch)

        def conv_body(i, cols):
            ai = lax.dynamic_index_in_dim(a, i, 0, keepdims=True)
            prod = ai * b
            lo = prod & _MASK
            hi = prod >> LIMB_BITS
            w = lax.dynamic_slice_in_dim(cols, i, L + 1, axis=0)
            w = w + jnp.pad(lo, pad_lo) + jnp.pad(hi, pad_hi)
            return lax.dynamic_update_slice_in_dim(cols, w, i, axis=0)

        cols = lax.fori_loop(0, L, conv_body, cols)

        n0 = jnp.uint32(self.n0_inv)
        p = self.p_limbs.reshape((L,) + (1,) * len(batch))
        pad_rlo = [(1, 1)] + [(0, 0)] * len(batch)
        pad_rhi = [(2, 0)] + [(0, 0)] * len(batch)

        def red_body(i, state):
            cols, carry = state
            w = lax.dynamic_slice_in_dim(cols, i, L + 1, axis=0)
            t = w[0] + carry
            m = (t * n0) & _MASK
            mp = m[None] * p
            lo = mp & _MASK
            hi = mp >> LIMB_BITS
            new_carry = ((t >> LIMB_BITS)
                         + (((t & _MASK) + lo[0]) >> LIMB_BITS)
                         + hi[0])
            w = w + jnp.pad(lo[1:], pad_rlo) + jnp.pad(hi[1:], pad_rhi)
            w = w.at[0].set(0)
            cols = lax.dynamic_update_slice_in_dim(cols, w, i, axis=0)
            return cols, new_carry

        cols, carry = lax.fori_loop(0, L, red_body, (cols, zero_b))

        out = cols[L: 2 * L + 1]
        out = out.at[0].add(carry)
        out = _carry_u(out)
        # (ab + mP)/2^(16L) < 2p < 2^(16L) for a,b < p, so limb L is 0 here.
        return self._cond_sub_p(out[:L])

    def mul_const(self, a, c: int):
        """Multiply by a host constant (canonical int), e.g. 3b = 12."""
        return self.mul(a, self.const(c, ()))

    # --- misc ------------------------------------------------------------
    def select(self, cond, a, b):
        """cond broadcastable against batch dims (no limb axis)."""
        return jnp.where(cond[None], a, b)

    def is_zero(self, a):
        return jnp.all(a == 0, axis=0)

    def eq(self, a, b):
        return jnp.all(a == b, axis=0)

    def zeros(self, batch_shape=()):
        return jnp.zeros((self.L, *batch_shape), dtype=jnp.uint32)

    def const(self, x: int, batch_shape=()):
        """Host int (canonical) -> broadcast Montgomery limb array."""
        limbs = jnp.asarray(int_to_limbs(self.to_mont(x), self.L))
        return jnp.broadcast_to(limbs.reshape((self.L,) + (1,) * len(batch_shape)),
                                (self.L, *batch_shape))


@functools.cache
def _fq() -> FieldSpec:
    return FieldSpec(Q, FQ_LIMBS)


FQ = _fq()
