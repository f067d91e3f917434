"""Ethereum ceremony CRS tests (parity: `/root/reference/tests/crs.rs`)."""

import pytest

from curdleproofs_tpu.constants import CRS_EXTRA_POINTS, N_BLINDERS
from curdleproofs_tpu.crs import CurdleproofsCrs, generate_random_points
from curdleproofs_tpu.host.rng import StdRng
from curdleproofs_tpu.whisk import (
    WhiskTracker, generate_whisk_shuffle_proof, is_valid_whisk_shuffle_proof,
)

SEED = "nankokita_no_kakurenbo"


def test_ethereum_crs_8_seed():
    n = 8
    points, increment = generate_random_points(n + CRS_EXTRA_POINTS, SEED)
    crs = CurdleproofsCrs.from_points(n - N_BLINDERS, points)
    assert increment >= n + CRS_EXTRA_POINTS
    assert crs.log2_n() == 3
    for p in points:
        assert p.is_on_curve() and p.is_in_correct_subgroup()
    # deterministic: same seed gives same CRS
    points2, increment2 = generate_random_points(n + CRS_EXTRA_POINTS, SEED)
    assert increment2 == increment
    assert all(a == b for a, b in zip(points, points2))
    # hex JSON round-trip
    crs2 = CurdleproofsCrs.from_json(crs.to_json())
    assert crs2.G_sum == crs.G_sum and crs2.H_sum == crs.H_sum


@pytest.mark.slow
def test_ethereum_crs_shuffle_roundtrip():
    n = 16
    points, _ = generate_random_points(n + CRS_EXTRA_POINTS, SEED)
    crs = CurdleproofsCrs.from_points(n - N_BLINDERS, points)

    rng = StdRng.seed_from_u64(0)
    trackers = [WhiskTracker.from_rand(rng) for _ in range(n - N_BLINDERS)]
    post, proof = generate_whisk_shuffle_proof(rng, crs, trackers)
    assert is_valid_whisk_shuffle_proof(rng, crs, trackers, post, proof)


def test_ethereum_crs_128_seed():
    """The REAL Ethereum CRS: n=128 from the ceremony seed, full whisk
    round-trip on it (tests/crs.rs:55-114 `ethereum_crs_128_seed`)."""
    n = 128
    points, increment = generate_random_points(n + CRS_EXTRA_POINTS, SEED)
    crs = CurdleproofsCrs.from_points(n - N_BLINDERS, points)
    assert crs.log2_n() == 7
    assert increment >= n + CRS_EXTRA_POINTS
    for p in points:
        assert p.is_on_curve() and p.is_in_correct_subgroup()
    crs2 = CurdleproofsCrs.from_json(crs.to_json())
    assert crs2.G_sum == crs.G_sum and crs2.H_sum == crs.H_sum

    rng = StdRng.seed_from_u64(0)
    trackers = [WhiskTracker.from_rand(rng) for _ in range(n - N_BLINDERS)]
    post, proof = generate_whisk_shuffle_proof(rng, crs, trackers)
    assert len(proof) == 4496
    assert is_valid_whisk_shuffle_proof(rng, crs, trackers, post, proof)


def test_readme_example():
    """The README quick-start runs as written (reference doctests its README)."""
    import pathlib
    import re

    readme = (pathlib.Path(__file__).parents[1] / "README.md").read_text()
    code = re.search(r"```python\n(.*?)```", readme, re.S).group(1)
    namespace: dict = {}
    exec(compile(code, "README.md", "exec"), namespace)  # noqa: S102
    assert "proof2" in namespace
