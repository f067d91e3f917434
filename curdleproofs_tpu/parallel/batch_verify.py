"""Batched shuffle-proof verification (new capability; the reference verifies
one proof per call — SURVEY.md §2c "batch-verification data parallelism").

All proofs in a batch share ONE MSM accumulator: each proof's deferred checks
enter the random linear combination, and the CRS bases (identical across
proofs) dedup, so B proofs cost B x (transcript replay + small muls) on the
host plus a SINGLE giant MSM — which is exactly the kernel `sharded_msm`
spreads across a TPU mesh.

Semantics: all-or-nothing (a single invalid proof fails the batch);
`identify=True` bisects to per-proof verdicts on failure.
"""

from __future__ import annotations

from jax.sharding import Mesh

from ..crs import CurdleproofsCrs
from ..curdleproofs import CurdleproofsProof
from ..errors import VerificationError
from ..host.rng import StdRng
from ..msm_accumulator import MsmAccumulator
from .sharded_msm import sharded_msm

__all__ = ["batch_verify", "ShuffleInstance"]


class ShuffleInstance:
    """One shuffle statement: (R, S) -> (T, U) with permutation commitment M."""

    __slots__ = ("vec_R", "vec_S", "vec_T", "vec_U", "M")

    def __init__(self, vec_R, vec_S, vec_T, vec_U, M):
        self.vec_R = vec_R
        self.vec_S = vec_S
        self.vec_T = vec_T
        self.vec_U = vec_U
        self.M = M


def _final_check(acc: MsmAccumulator, mesh: Mesh | None) -> bool:
    if mesh is None:
        try:
            acc.verify()
            return True
        except VerificationError:
            return False
    bases, scalars = acc._dedup()
    return sharded_msm(bases, scalars, mesh).is_infinity()


def batch_verify(
    crs: CurdleproofsCrs,
    instances: list[ShuffleInstance],
    proofs: list[CurdleproofsProof],
    rng: StdRng,
    mesh: Mesh | None = None,
    identify: bool = False,
) -> bool | list[bool]:
    """Verify many proofs with one deduped (optionally mesh-sharded) MSM.

    Returns a bool, or per-proof verdicts when `identify=True` and the batch
    fails (log-depth bisection; valid batches still cost one MSM).
    """
    assert len(instances) == len(proofs)

    def run(idx: list[int]) -> bool:
        acc = MsmAccumulator()
        try:
            for i in idx:
                inst = instances[i]
                proofs[i].verify_with_accumulator(
                    crs, inst.vec_R, inst.vec_S, inst.vec_T, inst.vec_U,
                    inst.M, acc, rng)
        except VerificationError:
            # an eagerly-checked sub-argument (same-scalar) already failed;
            # for batch semantics that fails the whole subset
            return False
        return _final_check(acc, mesh)

    all_idx = list(range(len(proofs)))
    ok = run(all_idx)
    if ok or not identify:
        return ok

    # bisect to find the offenders
    verdicts = [True] * len(proofs)

    def bisect(idx: list[int]) -> None:
        if len(idx) == 1:
            verdicts[idx[0]] = run(idx)
            return
        mid = len(idx) // 2
        for part in (idx[:mid], idx[mid:]):
            if not run(part):
                bisect(part)

    bisect(all_idx)
    return verdicts
