"""Chain-sync batch verification demo (new capability; no reference
analogue — whisk.rs verifies one shuffle per call).

A syncing node validates a segment of Whisk shuffle blocks at once:
every proof's deferred checks share ONE accumulated MSM, consecutive
blocks' tracker lists overlap (block k's post == block k+1's pre) so the
validated-decompress cache collapses their sqrt + subgroup ladders, and a
block's worth of tracker opening proofs verifies as a single ~(5B+1)-base
MSM.

Run: python examples/chain_sync_demo.py [n_blocks] [ell]
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parents[1]))

from curdleproofs_tpu.curdleproofs import generate_crs
from curdleproofs_tpu.host import serde
from curdleproofs_tpu.host.g1 import GENERATOR
from curdleproofs_tpu.host.rng import StdRng
from curdleproofs_tpu.host.serde import g1_to_bytes
from curdleproofs_tpu.whisk import (
    WhiskTracker,
    generate_whisk_shuffle_proof,
    generate_whisk_tracker_proof,
    is_valid_whisk_shuffle_proof,
    is_valid_whisk_shuffle_proofs,
    is_valid_whisk_tracker_proof,
    is_valid_whisk_tracker_proofs,
)


def main() -> None:
    n_blocks = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    ell = int(sys.argv[2]) if len(sys.argv) > 2 else 124
    rng = StdRng.seed_from_u64(7)
    crs = generate_crs(ell)

    print(f"building a {n_blocks}-block segment at ell={ell} ...")
    secrets, trackers, commitments = [], [], []
    for _ in range(ell):
        k, r = rng.rand_fr(), rng.rand_fr()
        r_G = GENERATOR.mul(r)
        trackers.append(WhiskTracker(g1_to_bytes(r_G),
                                     g1_to_bytes(r_G.mul(k))))
        commitments.append(g1_to_bytes(GENERATOR.mul(k)))
        secrets.append(k)
    shuffles = []
    for _ in range(n_blocks):
        post, proof = generate_whisk_shuffle_proof(rng, crs, trackers)
        shuffles.append((trackers, post, proof))
        trackers = post
    openings = [generate_whisk_tracker_proof(rng, t, k)
                for t, k in zip(shuffles[0][0], secrets)]

    # --- shuffle proofs: serial vs one-MSM batch
    serde._CACHE.clear()
    t0 = time.perf_counter()
    for pre, post, proof in shuffles:
        assert is_valid_whisk_shuffle_proof(rng, crs, pre, post, proof)
    t_serial = time.perf_counter() - t0
    serde._CACHE.clear()
    t0 = time.perf_counter()
    assert is_valid_whisk_shuffle_proofs(rng, crs, shuffles)
    t_batch = time.perf_counter() - t0
    print(f"shuffle proofs : serial {1e3 * t_serial:.0f} ms "
          f"({1e3 * t_serial / n_blocks:.1f}/blk) -> "
          f"batch {1e3 * t_batch:.0f} ms "
          f"({1e3 * t_batch / n_blocks:.1f}/blk), "
          f"{t_serial / t_batch:.2f}x")

    # --- tracker openings: serial vs one-MSM batch
    pre0 = shuffles[0][0]
    t0 = time.perf_counter()
    for t, c, p in zip(pre0, commitments, openings):
        assert is_valid_whisk_tracker_proof(t, c, p)
    t_serial = time.perf_counter() - t0
    t0 = time.perf_counter()
    assert is_valid_whisk_tracker_proofs(pre0, commitments, openings, rng)
    t_batch = time.perf_counter() - t0
    print(f"tracker proofs : serial {1e3 * t_serial:.0f} ms -> "
          f"batch {1e3 * t_batch:.0f} ms "
          f"({1e3 * t_batch / ell:.2f} ms/proof), "
          f"{t_serial / t_batch:.1f}x")
    print("segment valid — demo complete")


if __name__ == "__main__":
    main()
