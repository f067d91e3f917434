"""Golden bit-exactness gates vs the Rust reference's hardcoded test vectors.

Tracker proof hex: `/root/reference/src/whisk.rs:401`.
Shuffle proof hex (4496 bytes): `/root/reference/src/whisk.rs:455`.
These exercise the full stack: ChaCha12 StdRng, Merlin transcript, field/curve
math and serialization — any 1-bit divergence anywhere fails them.
"""

import pytest

from curdleproofs_tpu.constants import WHISK_ELL
from curdleproofs_tpu.crs import CurdleproofsCrs
from curdleproofs_tpu.host.g1 import GENERATOR
from curdleproofs_tpu.host.rng import StdRng
from curdleproofs_tpu.host.serde import g1_to_bytes
from curdleproofs_tpu.whisk import (
    WhiskTracker, generate_whisk_shuffle_proof, generate_whisk_tracker_proof,
    is_valid_whisk_shuffle_proof, is_valid_whisk_tracker_proof,
)

TRACKER_PROOF_GOLDEN_HEX = (
    "a994a4f67adaaa5f595809c1eb09e329d9217030e204203009acb39768f29d8ee7ea9cac57"
    "7426e60a4b6092b06434ed953d27f60af561dce34f18f0111a41ea4188c9aac0249d29a68c"
    "e6168a3b31cf830b30f3abf2f7b2e11886c1f5e653a50a91ba585ffeff9902ebba92da6dfe"
    "41df7c453b6b71a8557d2da93645996a1e"
)


def _get_k_commitment(k: int) -> bytes:
    return g1_to_bytes(GENERATOR.mul(k))


def test_whisk_tracker_proof_golden():
    rng = StdRng.seed_from_u64(0)

    k = rng.rand_fr()
    tracker = WhiskTracker.from_k(rng, k)
    k_commitment = _get_k_commitment(k)

    tracker_proof = generate_whisk_tracker_proof(rng, tracker, k)
    assert is_valid_whisk_tracker_proof(tracker, k_commitment, tracker_proof)
    assert tracker_proof.hex() == TRACKER_PROOF_GOLDEN_HEX


@pytest.mark.slow
def test_whisk_shuffle_proof_golden():
    rng = StdRng.seed_from_u64(0)
    crs = CurdleproofsCrs.generate_crs(WHISK_ELL)

    shuffled_trackers = [WhiskTracker.from_rand(rng) for _ in range(WHISK_ELL)]

    post_trackers, proof_bytes = generate_whisk_shuffle_proof(
        rng, crs, shuffled_trackers)

    golden = (__import__("pathlib").Path(__file__).parent
              / "golden" / "whisk_shuffle_proof_128.hex").read_text().strip()
    assert proof_bytes.hex() == golden

    # fixture YAML generation, gated like the reference (whisk.rs:444-453)
    import os

    if os.environ.get("GENERATE_VECTORS"):
        import pathlib

        import yaml

        spec = {
            "pre_trackers": [{"r_G": t.r_G.hex(), "k_r_G": t.k_r_G.hex()}
                             for t in shuffled_trackers],
            "post_trackers": [{"r_G": t.r_G.hex(), "k_r_G": t.k_r_G.hex()}
                              for t in post_trackers],
            "proof": proof_bytes.hex(),
        }
        fixtures = pathlib.Path(__file__).parent / "fixtures"
        fixtures.mkdir(exist_ok=True)
        with open(fixtures / "shuffle_proof_128_valid.yml", "w") as f:
            yaml.safe_dump(spec, f)

    assert is_valid_whisk_shuffle_proof(rng, crs, shuffled_trackers,
                                        post_trackers, proof_bytes)
