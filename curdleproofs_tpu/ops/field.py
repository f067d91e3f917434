"""Batched modular arithmetic over 16-bit limb arrays (JAX, TPU-native).

LAYOUT: limb-major — field elements are [L, *batch] uint32 arrays (limb 0 =
least significant, on axis 0). Limbs ride the sublane dimension and the batch
rides the 128-wide lane dimension, so elementwise limb ops waste nothing
(batch-major [*, L] padding costs 5.3x on lanes).

Montgomery-form CIOS multiplication with uint32 lanes only: every limb product
fits uint32 exactly and column sums stay < 2^24 — no 64-bit emulation (TPU has
no native int64 multiply). Limb recurrences are lax.scan/fori_loop bodies: the
unrolled graph takes XLA minutes to compile; the unrolled form lives in the
Pallas kernels (ops/pallas_kernels.py) where Mosaic compiles it in seconds.

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

__all__ = ["FieldSpec", "FQ"]

_MASK = jnp.uint32(LIMB_MASK)


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
        self.p_limbs = jnp.asarray(int_to_limbs(modulus, n_limbs))
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
        """Montgomery product a * b * R^{-1} mod p, CIOS over fori_loop."""
        L = self.L
        batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])

        def bcast(v):
            # right-align the batch dims after the leading limb axis
            lead = len(batch) - (v.ndim - 1)
            v = v.reshape(L, *([1] * lead), *v.shape[1:])
            return jnp.broadcast_to(v, (L, *batch))

        a = bcast(a)
        b = bcast(b)
        # derive the accumulator from `a` so its mesh-varying type matches the
        # loop body under shard_map (a plain zeros() is 'replicated')
        zero_b = a[0] * 0
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

        cols = lax.fori_loop(0, L, conv_body, cols, unroll=4)

        n0 = jnp.uint32(self.n0_inv)
        p = self.p_limbs.reshape((L,) + (1,) * len(batch))
        pad_rlo = [(1, 1)] + [(0, 0)] * len(batch)
        pad_rhi = [(2, 0)] + [(0, 0)] * len(batch)
        carry0 = zero_b

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

        cols, carry = lax.fori_loop(0, L, red_body, (cols, carry0), unroll=4)

        out = cols[L : 2 * L + 1]
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
