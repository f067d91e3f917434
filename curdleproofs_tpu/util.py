"""Utility functions used around Curdleproofs.

Parity: `/root/reference/src/util.rs` (msm wrappers, blinders, verification-scalar
bitstrings, inner products, permutation apply, shuffle helper).
"""

from __future__ import annotations

from .backend import get_backend
from .constants import N_BLINDERS, R
from .host.g1 import G1
from .host.rng import StdRng

__all__ = [
    "msm", "inner_product", "get_permutation", "generate_blinders",
    "get_verification_scalars_bitstring", "verification_scalar_products",
    "scaled_verification_products", "fr_power_vector",
    "shuffle_permute_and_commit_input", "sum_affine_points",
]


def _native():
    from .host import native

    return native if native.available() else None


def msm(points: list[G1], scalars: list[int]) -> G1:
    """Multi-scalar multiplication through the active backend (util.rs:19-22)."""
    assert len(points) == len(scalars), "number of points != number of scalars"
    return get_backend().msm(points, scalars)


def inner_product(a: list[int], b: list[int]) -> int:
    """Scalar inner product over Fr (util.rs:67-74)."""
    assert len(a) == len(b)
    return sum(x * y for x, y in zip(a, b)) % R


def get_permutation(vec_a: list, permutation: list[int]) -> list:
    """Return `vec_a` permuted: out[j] = vec_a[permutation[j]] (util.rs:77-79)."""
    return [vec_a[i] for i in permutation]


def generate_blinders(rng: StdRng, n: int) -> list[int]:
    """n random Fr elements (util.rs:32-34)."""
    return [rng.rand_fr() for _ in range(n)]


def get_verification_scalars_bitstring(n: int, logn: int) -> list[list[int]]:
    """Binary-decomposition bitstring for O(n) IPA verification (util.rs:40-64).

    bitstring[i] lists the challenge-round indices j whose challenge divides
    into s_i, i.e. rounds where bit (logn-1-j) of i is set.
    """
    bitstring: list[list[int]] = [[] for _ in range(n)]
    for j in range(logn):
        for i in range(n):
            if (i >> (logn - 1 - j)) & 1:
                bitstring[i].append(j)
    return bitstring


def verification_scalar_products(challenges: list[int], n: int) -> list[int]:
    """s_i = prod_{j in bitstring[i]} challenges[j], ONE mul per entry.

    Same output as the bitstring product loop over
    `get_verification_scalars_bitstring` (util.rs:40-64 semantics): round j
    enters s_i iff bit (logn-1-j) of i is set, so with b = lowest set bit of
    i, s_i = s_{i & (i-1)} * challenges[logn-1-b].  Cuts the verifier's
    per-proof scalar work from O(n log n) muls to O(n) — this loop runs once
    per proof in every batch-verification replay.
    """
    logn = len(challenges)
    assert n == 1 << logn
    s = [1] * n
    for i in range(1, n):
        b = (i & -i).bit_length() - 1
        s[i] = s[i & (i - 1)] * challenges[logn - 1 - b] % R
    return s


def scaled_verification_products(challenges: list[int], n: int,
                                 cmul: int | None = None,
                                 mulvec: list[int] | None = None,
                                 neg: bool = False) -> list[int]:
    """`verification_scalar_products` with the scaling its callers apply
    fused in: out_i = [-] cmul * s_i [* mulvec_i].

    The IPA/SameMsm verifier replays compute `c_final * s_i` (negated, as the
    accumulator's rhs) and `d_final * inv_s_i * u_i`; running the whole chain
    in the native Fr Montgomery engine (host/native `cp_fr_vsp`) turns ~3n
    python bigint mulmods per call into one ctypes round trip."""
    nat = _native()
    if nat is not None:
        return nat.fr_vsp(challenges, n, cmul=cmul, mulvec=mulvec, neg=neg)
    s = verification_scalar_products(challenges, n)
    if cmul is not None:
        s = [cmul * v % R for v in s]
    if mulvec is not None:
        s = [a * b % R for a, b in zip(s, mulvec)]
    if neg:
        s = [-v % R for v in s]
    return s


def fr_power_vector(base: int, n: int) -> list[int]:
    """[base^1, ..., base^n] (native chain when available)."""
    nat = _native()
    if nat is not None:
        return nat.fr_powers(base, n)
    out = []
    acc = 1
    for _ in range(n):
        acc = acc * base % R
        out.append(acc)
    return out


def shuffle_permute_and_commit_input(
    crs, vec_R: list[G1], vec_S: list[G1], permutation: list[int], k: int, rng: StdRng,
):
    """Prepare shuffle-proof inputs (util.rs:83-106).

    Returns (vec_T, vec_U, M, vec_m_blinders):
    T = sigma(k*R), U = sigma(k*S), M = Pedersen commitment to sigma.
    """
    ell = len(crs.vec_G)
    backend = get_backend()
    vec_T = get_permutation(backend.batch_mul(vec_R, k), permutation)
    vec_U = get_permutation(backend.batch_mul(vec_S, k), permutation)

    sigma_ell = get_permutation(list(range(ell)), permutation)
    vec_m_blinders = generate_blinders(rng, N_BLINDERS)
    M = msm(crs.vec_G, sigma_ell).add(msm(crs.vec_H, vec_m_blinders))
    return vec_T, vec_U, M, vec_m_blinders


def sum_affine_points(points: list[G1]) -> G1:
    acc = G1.infinity()
    for p in points:
        acc = acc.add(p)
    return acc
