"""GLV endomorphism scalar decomposition for BLS12-381 G1.

First-party replacement for the scalar-mul substrate inside arkworks `ark-ec`
(the reference's every scalar mul, e.g. curdleproofs.rs:112-116, funnels
there); the reference has no first-party GLV.

G1 has the cube-root endomorphism phi(x, y) = (beta*x, y) with phi(P) =
lambda*P for a primitive cube root of unity beta in Fq (lambda in Fr). Any
scalar k splits as k = k1 + k2*lambda (mod r) with |k1|, |k2| ~ sqrt(r) ~
2^128, halving the doubling chains in scalar multiplication.

All constants are derived numerically here (roots of x^2 + x + 1; lattice
basis via extended Euclid) and the (beta, lambda) pairing is validated against
the group law at import — no copied magic numbers.
"""

from __future__ import annotations

from ..constants import Q, R
from .g1 import GENERATOR, G1

__all__ = ["BETA", "LAMBDA", "decompose", "endo"]


def _cube_roots_of_unity(modulus: int) -> tuple[int, int]:
    """The two primitive cube roots of unity mod `modulus` (p = 1 mod 3)."""
    # roots of x^2 + x + 1: (-1 ± sqrt(-3)) / 2
    s = pow(modulus - 3, (modulus + 1) // 4, modulus) if modulus % 4 == 3 else None
    if s is None or s * s % modulus != modulus - 3:
        # generic: find via exponentiation of a non-cube
        g = 2
        while True:
            c = pow(g, (modulus - 1) // 3, modulus)
            if c != 1:
                return c, c * c % modulus
            g += 1
    inv2 = pow(2, -1, modulus)
    r1 = (modulus - 1 + s) * inv2 % modulus
    return r1, (modulus - 1 - s) * inv2 % modulus


def _find_pair() -> tuple[int, int]:
    """Return (beta, lambda) with (beta*x, y) == lambda * (x, y) on G1."""
    fb1, fb2 = _cube_roots_of_unity(Q)
    fl1 = pow(7, (R - 1) // 3, R)  # 7 is a generator-ish try; validate below
    candidates_l = []
    for g in (7, 5, 3, 2, 10, 11):
        c = pow(g, (R - 1) // 3, R)
        if c != 1 and pow(c, 3, R) == 1:
            candidates_l = [c, c * c % R]
            break
    P = GENERATOR
    for beta in (fb1, fb2):
        endo_p = G1.from_affine(beta * P.x % Q, P.y)
        for lam in candidates_l:
            # mul_bigint: does not route through the GLV fast path (which
            # imports this module — avoid the cycle during initialisation)
            if P.mul_bigint(lam) == endo_p:
                return beta, lam
    raise AssertionError("no (beta, lambda) pairing found")


BETA, LAMBDA = _find_pair()


def _lattice_basis() -> tuple[tuple[int, int], tuple[int, int]]:
    """Short basis of {(x, y): x + y*lambda == 0 mod r} via extended Euclid."""
    # run the EEA on (r, lambda); rows (s_i, t_i, r_i) satisfy s*r + t*lam = rem
    # so (rem, -t) is in the lattice. Stop around sqrt(r).
    import math

    sqrt_r = math.isqrt(R)
    r0, r1 = R, LAMBDA
    t0, t1 = 0, 1
    prev = None
    while r1 != 0:
        if r1 < sqrt_r:
            # v1 = (r1, -t1); v2 = best of (r0, -t0) and next row
            q = r0 // r1
            r2 = r0 - q * r1
            t2 = t0 - q * t1
            v1 = (r1, -t1)
            v2 = (r0, -t0) if max(abs(r0), abs(t0)) <= max(abs(r2), abs(t2)) \
                else (r2, -t2)
            return v1, v2
        q = r0 // r1
        r0, r1 = r1, r0 - q * r1
        t0, t1 = t1, t0 - q * t1
    raise AssertionError("EEA failed")


_V1, _V2 = _lattice_basis()
# sanity: both basis vectors are in the lattice
assert (_V1[0] + _V1[1] * LAMBDA) % R == 0
assert (_V2[0] + _V2[1] * LAMBDA) % R == 0


def decompose(k: int) -> tuple[int, int]:
    """Return (k1, k2), possibly negative, with k1 + k2*lambda == k (mod r)
    and |k1|, |k2| < 2^129."""
    a1, b1 = _V1
    a2, b2 = _V2
    det = a1 * b2 - a2 * b1
    # Babai rounding: (c1, c2) = round( k * (b2, -b1) / det )
    c1 = (b2 * k * 2 + det) // (2 * det)
    c2 = (-b1 * k * 2 + det) // (2 * det)
    k1 = k - c1 * a1 - c2 * a2
    k2 = -(c1 * b1 + c2 * b2)
    assert (k1 + k2 * LAMBDA - k) % R == 0
    return k1, k2


_NATIVE_GLV = False  # False = unprobed, None = unavailable


def _native_glv():
    """ctypes handle to cp_glv_decompose after one-time cp_glv_init."""
    global _NATIVE_GLV
    if _NATIVE_GLV is False:
        try:
            import ctypes

            from . import native

            lib = native.lib()
            if lib is None or not hasattr(lib, "cp_glv_init"):
                _NATIVE_GLV = None
                return None
            (a1, b1), (a2, b2) = _V1, _V2
            mu = (1 << 640) // (2 * R)
            lib.cp_glv_init(
                abs(a1).to_bytes(16, "little"), ctypes.c_int32(-1 if a1 < 0 else 1),
                abs(b1).to_bytes(16, "little"), ctypes.c_int32(-1 if b1 < 0 else 1),
                abs(a2).to_bytes(16, "little"), ctypes.c_int32(-1 if a2 < 0 else 1),
                abs(b2).to_bytes(16, "little"), ctypes.c_int32(-1 if b2 < 0 else 1),
                R.to_bytes(32, "little"), mu.to_bytes(56, "little"),
                (2 * R).to_bytes(40, "little"))
            lib.cp_glv_decompose.restype = ctypes.c_int32
            _NATIVE_GLV = lib.cp_glv_decompose
        except Exception:
            _NATIVE_GLV = None
    return _NATIVE_GLV


def decompose_batch(scalars: list[int]):
    """Batch GLV split via the native library: returns
    (k1s bytes [16B each], negs1 bytes, k2s bytes, negs2 bytes) or None if the
    native path is unavailable / a half overflows (caller falls back)."""
    if _native_glv() is None:
        return None
    ks = b"".join((s % R).to_bytes(32, "little") for s in scalars)
    return decompose_batch_raw(ks, len(scalars))


def decompose_batch_raw(ks: bytes, n: int):
    """`decompose_batch` over pre-serialised canonical 32 B-LE scalars (the
    verifier's fused-dedup output) — no python int round trip."""
    fn = _native_glv()
    if fn is None:
        return None
    import ctypes

    k1s = ctypes.create_string_buffer(16 * n)
    k2s = ctypes.create_string_buffer(16 * n)
    n1 = ctypes.create_string_buffer(n)
    n2 = ctypes.create_string_buffer(n)
    if fn(ks, ctypes.c_uint64(n), k1s, n1, k2s, n2) != 0:
        return None
    return k1s.raw, n1.raw, k2s.raw, n2.raw


def endo(p: G1) -> G1:
    """phi(P) = (beta * x, y) on an affine-normalised point."""
    aff = p.to_affine()
    if aff is None:
        return G1.infinity()
    return G1.from_affine(BETA * aff[0] % Q, aff[1])
