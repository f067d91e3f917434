"""Limb-array representation for TPU field arithmetic.

Field elements are arrays of 16-bit limbs held in uint32 lanes (limb 0 = least
significant), batched over leading axes. 16-bit limbs are chosen so that a
product of two limbs fits a native uint32 lane exactly and column sums of a
24x24 schoolbook convolution stay far below 2^32 after a hi/lo split — no
64-bit emulation anywhere on device (TPU has no native int64 multiply).

Device values are kept in Montgomery form (R = 2^(16*L)); host<->device
conversion does the form change with cheap Python bigint ops.
"""

from __future__ import annotations

import numpy as np


LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1

FQ_LIMBS = 24  # 384 bits
FR_LIMBS = 16  # 256 bits


def int_to_limbs(x: int, n_limbs: int) -> np.ndarray:
    """Single int -> [n_limbs] uint32 array of 16-bit limbs (LE)."""
    out = np.empty(n_limbs, dtype=np.uint32)
    for i in range(n_limbs):
        out[i] = x & LIMB_MASK
        x >>= LIMB_BITS
    assert x == 0, "value does not fit in the limb array"
    return out


def ints_to_limbs(xs: list[int], n_limbs: int) -> np.ndarray:
    """List of ints -> [len(xs), n_limbs] uint32 (vectorised via LE bytes)."""
    nbytes = n_limbs * (LIMB_BITS // 8)
    buf = b"".join(x.to_bytes(nbytes, "little") for x in xs)
    le16 = np.frombuffer(buf, dtype="<u2").reshape(len(xs), n_limbs)
    return le16.astype(np.uint32)


def limbs_to_int(a) -> int:
    """[n_limbs] array -> int."""
    a = np.asarray(a, dtype=np.uint16)
    return int.from_bytes(a.astype("<u2").tobytes(), "little")


def limbs_to_ints(a) -> list[int]:
    """[batch, n_limbs] array -> list of ints (vectorised via LE bytes)."""
    a = np.ascontiguousarray(np.asarray(a).astype("<u2"))
    n, L = a.shape
    nbytes = L * 2
    raw = a.tobytes()
    return [int.from_bytes(raw[j * nbytes : (j + 1) * nbytes], "little")
            for j in range(n)]


def int_to_bits(x: int, n_bits: int) -> np.ndarray:
    """Scalar -> [n_bits] uint32 bit array (LSB first)."""
    return ints_to_bits([x], n_bits)[0]


def ints_to_bits(xs: list[int], n_bits: int) -> np.ndarray:
    """[len(xs)] scalars -> [len(xs), n_bits] uint32 bits (LSB first)."""
    nbytes = (n_bits + 7) // 8
    buf = b"".join(x.to_bytes(nbytes, "little") for x in xs)
    by = np.frombuffer(buf, dtype=np.uint8).reshape(len(xs), nbytes)
    bits = np.unpackbits(by, axis=1, bitorder="little")[:, :n_bits]
    return bits.astype(np.uint32)
