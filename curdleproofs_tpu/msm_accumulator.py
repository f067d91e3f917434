"""Deferred-MSM verifier accumulator (parity: `/root/reference/src/msm_accumulator.rs`).

Collapses every check `C == <x, V>` into one random linear combination, dedup'ing
repeated bases, then verifies them all with ONE giant MSM — the verifier's single
hot kernel, and exactly the MSM the TPU path shards across chips.
"""

from __future__ import annotations

from .constants import R
from .errors import VerificationError
from .host.g1 import G1
from .host.rng import StdRng
from .util import msm

__all__ = ["MsmAccumulator"]


class MsmAccumulator:
    def __init__(self):
        # dedup on affine coordinates (arkworks dedups on G1Affine hash)
        self._base_scalar: dict[tuple[int, int] | None, int] = {}
        self._base_point: dict[tuple[int, int] | None, G1] = {}

    def accumulate_zero(self, vec_x: list[int], vec_V: list[G1],
                        rng: StdRng) -> None:
        """Accumulate the relation `<vec_x, vec_V> == 0` under a fresh random
        factor. No eager group math happens here — every term joins the
        deduped base set, and the whole batch of relations is verified by the
        single MSM `sum_i rf_i * <x_i, V_i> == 0`."""
        random_factor = rng.rand_fr()
        keys = G1.batch_to_affine(vec_V)
        for key, base, scalar in zip(keys, vec_V, vec_x):
            cur = self._base_scalar.get(key)
            if cur is None:
                self._base_scalar[key] = random_factor * scalar % R
                self._base_point[key] = base
            else:
                self._base_scalar[key] = (cur + random_factor * scalar) % R

    def accumulate_check(self, C: G1, vec_x: list[int], vec_V: list[G1],
                         rng: StdRng) -> None:
        """Accumulate the check `C == <vec_x, vec_V>` (zero-relation form:
        C enters the base set with weight -1)."""
        self.accumulate_zero(vec_x + [-1 % R], vec_V + [C], rng)

    def verify(self) -> None:
        """Run the single deduped MSM; raise VerificationError on mismatch."""
        bases = list(self._base_point.values())
        scalars = [self._base_scalar[k] for k in self._base_point]
        if not msm(bases, scalars).is_infinity():
            raise VerificationError("accumulated MSM check failed")
