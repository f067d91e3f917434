"""The Curdleproofs CRS (parity: `/root/reference/src/crs.rs`).

Includes `from_points`, the seeded dev CRS (`StdRng::seed_from_u64(0)`), the
hex-JSON serde twin of `CurdleproofsCrsHex`, and the deterministic
SHA-256 try-and-increment hash-to-curve ceremony path from
`/root/reference/tests/crs.rs:13-52`.
"""

from __future__ import annotations

import hashlib
import json
import math

from .constants import CRS_EXTRA_POINTS, N_BLINDERS
from .host.g1 import G1, get_point_from_x
from .host.rng import StdRng
from .host.serde import g1_from_bytes, g1_to_bytes
from .util import sum_affine_points

__all__ = ["CurdleproofsCrs", "generate_random_points"]


class CurdleproofsCrs:
    __slots__ = ("vec_G", "vec_H", "H", "G_t", "G_u", "G_sum", "H_sum")

    def __init__(self, vec_G, vec_H, H, G_t, G_u, G_sum, H_sum):
        self.vec_G = vec_G
        self.vec_H = vec_H
        self.H = H
        self.G_t = G_t
        self.G_u = G_u
        self.G_sum = G_sum
        self.H_sum = H_sum

    @staticmethod
    def from_points(ell: int, points: list[G1]) -> "CurdleproofsCrs":
        n = ell + N_BLINDERS
        num_points = n + CRS_EXTRA_POINTS
        if len(points) < num_points:
            raise ValueError("not enough points")
        vec_G = points[:ell]
        vec_H = points[ell:n]
        return CurdleproofsCrs(
            vec_G=vec_G,
            vec_H=vec_H,
            H=points[n],
            G_t=points[n + 1],
            G_u=points[n + 2],
            G_sum=sum_affine_points(vec_G),
            H_sum=sum_affine_points(vec_H),
        )

    @staticmethod
    def generate_crs(ell: int) -> "CurdleproofsCrs":
        """Unsafe dev CRS from StdRng(0) — bit-exact with crs.rs:61-69."""
        num_points = ell + N_BLINDERS + CRS_EXTRA_POINTS
        rng = StdRng.seed_from_u64(0)
        points = [rng.rand_g1() for _ in range(num_points)]
        return CurdleproofsCrs.from_points(ell, points)

    def log2_n(self) -> int:
        n = len(self.vec_H) + len(self.vec_G)
        return math.ceil(math.log2(n))

    # --- hex JSON serde (crs.rs:77-142) ------------------------------------
    def to_json(self) -> str:
        def hx(p: G1) -> str:
            return "0x" + g1_to_bytes(p).hex()

        return json.dumps({
            "vec_G": [hx(p) for p in self.vec_G],
            "vec_H": [hx(p) for p in self.vec_H],
            "H": hx(self.H),
            "G_t": hx(self.G_t),
            "G_u": hx(self.G_u),
            "G_sum": hx(self.G_sum),
            "H_sum": hx(self.H_sum),
        })

    @staticmethod
    def from_json(s: str) -> "CurdleproofsCrs":
        def unhx(h: str) -> G1:
            assert h.startswith("0x")
            return g1_from_bytes(bytes.fromhex(h[2:]))

        d = json.loads(s)
        return CurdleproofsCrs(
            vec_G=[unhx(h) for h in d["vec_G"]],
            vec_H=[unhx(h) for h in d["vec_H"]],
            H=unhx(d["H"]),
            G_t=unhx(d["G_t"]),
            G_u=unhx(d["G_u"]),
            G_sum=unhx(d["G_sum"]),
            H_sum=unhx(d["H_sum"]),
        )


def generate_random_points(num_points: int, seed: str) -> tuple[list[G1], int]:
    """Deterministic ceremony CRS: SHA-256 try-and-increment hash-to-curve.

    Parity with `/root/reference/tests/crs.rs:13-52`: hash = SHA256(seed ||
    counter_be); the 32-byte digest fills the LOW four 64-bit limbs as
    big-endian words; take the smaller root; clear cofactor; subgroup-check.
    """
    points: list[G1] = []
    increment = 0
    while len(points) != num_points:
        h = hashlib.sha256(seed.encode() + increment.to_bytes(8, "big")).digest()
        x = 0
        for i in range(4):
            x |= int.from_bytes(h[8 * i: 8 * i + 8], "big") << (64 * i)
        p = get_point_from_x(x, greatest=False)
        if p is not None:
            z = p.mul_by_cofactor()
            if z.is_in_correct_subgroup():
                points.append(z)
        increment += 1
    return points, increment
