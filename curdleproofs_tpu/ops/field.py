"""Batched modular arithmetic over 16-bit limb arrays (JAX, TPU-native).

Montgomery-form CIOS multiplication with uint32 lanes only: every limb product
fits uint32 exactly ((2^16-1)^2 < 2^32) and column sums stay < 2^24, so no
64-bit emulation is needed on TPU.

All limb recurrences (convolution, CIOS steps, carry/borrow chains) are
expressed as `lax.scan`/`lax.fori_loop` bodies rather than unrolled graphs:
an unrolled 24-limb multiply is ~1.7k HLO ops and takes XLA minutes to
compile; the loop form compiles in seconds and is what the Pallas kernels
replace on the hot path.

This layer replaces arkworks `ark-ff` (x86 asm Montgomery limbs,
`/root/reference/Cargo.toml:24,35`); bit-exactness is tested against the host
Python-int field in tests/test_ops_field.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..constants import Q
from .limbs import FQ_LIMBS, LIMB_BITS, LIMB_MASK, int_to_limbs

__all__ = ["FieldSpec", "FQ"]

_MASK = jnp.uint32(LIMB_MASK)


def _carry_u(cols):
    """Carry-propagate [..., K] uint32 columns (< 2^31); drops final carry."""
    moved = jnp.moveaxis(cols, -1, 0)

    def step(c, col):
        t = col + c
        return t >> LIMB_BITS, t & _MASK

    _, out = lax.scan(step, jnp.zeros_like(moved[0]), moved)
    return jnp.moveaxis(out, 0, -1)


def _carry_s(cols):
    """Borrow-propagate [..., K] int32 columns; returns (limbs u32, final borrow)."""
    moved = jnp.moveaxis(cols, -1, 0)

    def step(c, col):
        t = col + c
        return t >> LIMB_BITS, (t & jnp.int32(LIMB_MASK)).astype(jnp.uint32)

    c, out = lax.scan(step, jnp.zeros_like(moved[0]), moved)
    return jnp.moveaxis(out, 0, -1), c


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

    # --- device ops (shapes [..., L] uint32; Montgomery residues < p) -------
    def add(self, a, b):
        return self._cond_sub_p(_carry_u(a + b))

    def sub(self, a, b):
        d = a.astype(jnp.int32) + self.p_limbs.astype(jnp.int32) - b.astype(jnp.int32)
        limbs, _ = _carry_s(d)
        return self._cond_sub_p(limbs)

    def neg(self, a):
        is_zero = jnp.all(a == 0, axis=-1, keepdims=True)
        d = self.p_limbs.astype(jnp.int32) - a.astype(jnp.int32)
        limbs, _ = _carry_s(d)
        return jnp.where(is_zero, a, limbs)

    def _cond_sub_p(self, a):
        """a - p if a >= p else a (canonicalise a < 2p)."""
        d = a.astype(jnp.int32) - self.p_limbs.astype(jnp.int32)
        sub, borrow = _carry_s(d)
        return jnp.where((borrow == 0)[..., None], sub, a)

    def mul(self, a, b):
        """Montgomery product a * b * R^{-1} mod p, CIOS over fori_loop."""
        L = self.L
        batch = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
        a = jnp.broadcast_to(a, (*batch, L))
        b = jnp.broadcast_to(b, (*batch, L))
        cols = jnp.zeros((*batch, 2 * L + 1), dtype=jnp.uint32)

        def conv_body(i, cols):
            ai = lax.dynamic_slice_in_dim(a, i, 1, axis=-1)  # [..., 1]
            prod = ai * b
            lo = prod & _MASK
            hi = prod >> LIMB_BITS
            w = lax.dynamic_slice_in_dim(cols, i, L + 1, axis=-1)
            pad = [(0, 0)] * (w.ndim - 1)
            w = w + jnp.pad(lo, pad + [(0, 1)]) + jnp.pad(hi, pad + [(1, 0)])
            return lax.dynamic_update_slice_in_dim(cols, w, i, axis=-1)

        cols = lax.fori_loop(0, L, conv_body, cols, unroll=4)

        n0 = jnp.uint32(self.n0_inv)
        p = self.p_limbs
        carry0 = jnp.zeros(batch, dtype=jnp.uint32)

        def red_body(i, state):
            cols, carry = state
            w = lax.dynamic_slice_in_dim(cols, i, L + 1, axis=-1)
            t = w[..., 0] + carry  # < 2^24 + 2^18
            m = (t * n0) & _MASK
            mp = m[..., None] * p  # [..., L] exact in uint32
            lo = mp & _MASK
            hi = mp >> LIMB_BITS
            new_carry = ((t >> LIMB_BITS)
                         + (((t & _MASK) + lo[..., 0]) >> LIMB_BITS)
                         + hi[..., 0])
            pad = [(0, 0)] * (w.ndim - 1)
            lo_shift = jnp.pad(lo[..., 1:], pad + [(1, 1)])
            hi_shift = jnp.pad(hi[..., 1:], pad + [(2, 0)])
            w = w + lo_shift + hi_shift
            w = w.at[..., 0].set(0)
            cols = lax.dynamic_update_slice_in_dim(cols, w, i, axis=-1)
            return cols, new_carry

        cols, carry = lax.fori_loop(0, L, red_body, (cols, carry0), unroll=4)

        out = cols[..., L : 2 * L + 1]
        out = out.at[..., 0].add(carry)
        out = _carry_u(out)
        # (ab + mP)/2^(16L) < 2p < 2^(16L) for a,b < p, so limb L is 0 here.
        return self._cond_sub_p(out[..., :L])

    def mul_const(self, a, c: int):
        """Multiply by a host constant (canonical int), e.g. 3b = 12."""
        return self.mul(a, self.const(c, ()))

    # --- misc ------------------------------------------------------------
    def select(self, cond, a, b):
        return jnp.where(cond, a, b)

    def is_zero(self, a):
        return jnp.all(a == 0, axis=-1)

    def eq(self, a, b):
        return jnp.all(a == b, axis=-1)

    def zeros(self, batch_shape=()):
        return jnp.zeros((*batch_shape, self.L), dtype=jnp.uint32)

    def const(self, x: int, batch_shape=()):
        """Host int (canonical) -> broadcast Montgomery limb array."""
        limbs = jnp.asarray(int_to_limbs(self.to_mont(x), self.L))
        return jnp.broadcast_to(limbs, (*batch_shape, self.L))


@functools.cache
def _fq() -> FieldSpec:
    return FieldSpec(Q, FQ_LIMBS)


FQ = _fq()
