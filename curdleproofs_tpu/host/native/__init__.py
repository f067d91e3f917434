"""ctypes bindings for the native host runtime (C++ 64-bit-limb BLS12-381).

Falls back gracefully: `lib()` returns None when g++ or the build is
unavailable and callers keep using the pure-Python path.
"""

from __future__ import annotations

import ctypes
import functools

from ...constants import Q, R
from ..g1 import G1

_POINT = 144  # jacobian canonical LE: x, y, z @ 48 bytes
_SCALAR = 32


@functools.cache
def lib() -> ctypes.CDLL | None:
    from .build import build

    path = build()
    if path is None:
        return None
    cdll = ctypes.CDLL(str(path))
    for name, argtypes in {
        "cp_msm": [ctypes.c_char_p, ctypes.c_char_p, ctypes.c_uint64,
                   ctypes.c_char_p],
        "cp_add": [ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p],
        "cp_mul": [ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p],
        "cp_batch_mul": [ctypes.c_char_p, ctypes.c_uint64, ctypes.c_char_p,
                         ctypes.c_char_p],
        "cp_batch_mul_each": [ctypes.c_char_p, ctypes.c_char_p,
                              ctypes.c_uint64, ctypes.c_char_p],
        "cp_fold": [ctypes.c_char_p, ctypes.c_char_p, ctypes.c_uint64,
                    ctypes.c_char_p, ctypes.c_char_p],
        "cp_keccak_f1600": [ctypes.c_char_p],
        "cp_mul_raw": [ctypes.c_char_p, ctypes.c_char_p, ctypes.c_uint64,
                       ctypes.c_char_p],
    }.items():
        fn = getattr(cdll, name)
        fn.argtypes = argtypes
        fn.restype = None
    return cdll


def available() -> bool:
    return lib() is not None


# --- codecs -----------------------------------------------------------------

def _pt_to_bytes(p: G1) -> bytes:
    return (p.x % Q).to_bytes(48, "little") + (p.y % Q).to_bytes(48, "little") \
        + (p.z % Q).to_bytes(48, "little")


def pts_to_bytes(pts: list[G1]) -> bytes:
    return b"".join(_pt_to_bytes(p) for p in pts)


def scalars_to_bytes(ss: list[int]) -> bytes:
    return b"".join((s % R).to_bytes(32, "little") for s in ss)


def pts_from_bytes(buf: bytes, n: int) -> list[G1]:
    out = []
    for i in range(n):
        o = i * _POINT
        x = int.from_bytes(buf[o : o + 48], "little")
        y = int.from_bytes(buf[o + 48 : o + 96], "little")
        z = int.from_bytes(buf[o + 96 : o + 144], "little")
        out.append(G1.infinity() if z == 0 else G1(x, y, z))
    return out


# --- high-level wrappers -------------------------------------------------------

def msm(points: list[G1], scalars: list[int]) -> G1:
    l = lib()
    out = ctypes.create_string_buffer(_POINT)
    l.cp_msm(pts_to_bytes(points), scalars_to_bytes(scalars),
             len(points), out)
    return pts_from_bytes(out.raw, 1)[0]


def mul(p: G1, scalar: int) -> G1:
    l = lib()
    out = ctypes.create_string_buffer(_POINT)
    l.cp_mul(_pt_to_bytes(p), (scalar % R).to_bytes(32, "little"), out)
    return pts_from_bytes(out.raw, 1)[0]


def add(p: G1, q: G1) -> G1:
    l = lib()
    out = ctypes.create_string_buffer(_POINT)
    l.cp_add(_pt_to_bytes(p), _pt_to_bytes(q), out)
    return pts_from_bytes(out.raw, 1)[0]


def batch_mul(points: list[G1], scalar: int) -> list[G1]:
    l = lib()
    n = len(points)
    out = ctypes.create_string_buffer(_POINT * n)
    l.cp_batch_mul(pts_to_bytes(points), n,
                   (scalar % R).to_bytes(32, "little"), out)
    return pts_from_bytes(out.raw, n)


def batch_mul_each(points: list[G1], scalars: list[int]) -> list[G1]:
    l = lib()
    n = len(points)
    out = ctypes.create_string_buffer(_POINT * n)
    l.cp_batch_mul_each(pts_to_bytes(points), scalars_to_bytes(scalars), n, out)
    return pts_from_bytes(out.raw, n)


def keccak_f1600(state: bytearray) -> None:
    """In-place Keccak-f[1600] on a 200-byte state."""
    buf = ctypes.create_string_buffer(bytes(state), 200)
    lib().cp_keccak_f1600(buf)
    state[:] = buf.raw[:200]


def mul_raw(p: G1, scalar: int) -> G1:
    """Unreduced scalar mul (cofactor clearing, subgroup checks)."""
    nbytes = max(1, (scalar.bit_length() + 7) // 8)
    out = ctypes.create_string_buffer(_POINT)
    l = lib()
    l.cp_mul_raw(_pt_to_bytes(p), scalar.to_bytes(nbytes, "little"), nbytes, out)
    return pts_from_bytes(out.raw, 1)[0]


def fold(left: list[G1], right: list[G1], gamma: int) -> list[G1]:
    l = lib()
    n = len(left)
    out = ctypes.create_string_buffer(_POINT * n)
    l.cp_fold(pts_to_bytes(left), pts_to_bytes(right), n,
              (gamma % R).to_bytes(32, "little"), out)
    return pts_from_bytes(out.raw, n)
