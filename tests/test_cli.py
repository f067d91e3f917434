"""`python -m curdleproofs_tpu` CLI round trip (crs -> prove -> verify ->
tamper-reject) driven in-process via main(argv)."""

import json

import pytest

from curdleproofs_tpu.__main__ import main
from curdleproofs_tpu.host.g1 import GENERATOR
from curdleproofs_tpu.host.rng import StdRng
from curdleproofs_tpu.host.serde import g1_to_bytes

ELL = 28


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    """All shared artifacts (CRS, trackers, round-1 proof) are built HERE so
    each test runs standalone, in any order."""
    d = tmp_path_factory.mktemp("cli")
    assert main(["crs", "--ell", str(ELL), "-o", str(d / "crs.json")]) == 0

    rng = StdRng.seed_from_u64(5)
    trk, ks = [], []
    for _ in range(ELL):
        k, r = rng.rand_fr(), rng.rand_fr()
        rG = GENERATOR.mul(r)
        trk.append({"r_G": "0x" + g1_to_bytes(rG).hex(),
                    "k_r_G": "0x" + g1_to_bytes(rG.mul(k)).hex()})
        ks.append(k)
    (d / "pre.json").write_text(json.dumps(trk))
    assert main(["shuffle-prove", "--crs", str(d / "crs.json"),
                 "--pre", str(d / "pre.json"), "--post", str(d / "post.json"),
                 "--proof", str(d / "p.bin"), "--seed", "7"]) == 0
    return d, trk, ks


def test_cli_shuffle_roundtrip(workdir):
    d, _, _ = workdir
    assert main(["shuffle-verify", "--crs", str(d / "crs.json"),
                 "--pre", str(d / "pre.json"), "--post", str(d / "post.json"),
                 "--proof", str(d / "p.bin")]) == 0
    # tamper -> exit 1 (not an exception), whether the flip corrupts a point
    # encoding (SerializationError) or the proof math
    bad = bytearray((d / "p.bin").read_bytes())
    bad[100] ^= 1
    (d / "pbad.bin").write_bytes(bytes(bad))
    assert main(["shuffle-verify", "--crs", str(d / "crs.json"),
                 "--pre", str(d / "pre.json"), "--post", str(d / "post.json"),
                 "--proof", str(d / "pbad.bin")]) == 1


def test_cli_shuffle_verify_batch(workdir):
    d, _, _ = workdir
    # chain two shuffles: round 2's pre = round 1's post
    assert main(["shuffle-prove", "--crs", str(d / "crs.json"),
                 "--pre", str(d / "post.json"), "--post", str(d / "post2.json"),
                 "--proof", str(d / "p2.bin"), "--seed", "8"]) == 0
    manifest = [{"pre": "pre.json", "post": "post.json", "proof": "p.bin"},
                {"pre": "post.json", "post": "post2.json", "proof": "p2.bin"}]
    (d / "chain.json").write_text(json.dumps(manifest))
    assert main(["shuffle-verify-batch", "--crs", str(d / "crs.json"),
                 "--manifest", str(d / "chain.json")]) == 0
    # corrupt block 1 -> exit 1
    manifest[1]["proof"] = "pbad2.bin"
    bad = bytearray((d / "p2.bin").read_bytes())
    bad[-1] ^= 1
    (d / "pbad2.bin").write_bytes(bytes(bad))
    (d / "chain.json").write_text(json.dumps(manifest))
    assert main(["shuffle-verify-batch", "--crs", str(d / "crs.json"),
                 "--manifest", str(d / "chain.json")]) == 1


def test_cli_tracker_roundtrip(workdir):
    d, trk, ks = workdir
    kG = "0x" + g1_to_bytes(GENERATOR.mul(ks[0])).hex()
    assert main(["tracker-prove", "--r-g", trk[0]["r_G"],
                 "--k-r-g", trk[0]["k_r_G"], "--k", hex(ks[0]),
                 "--proof", str(d / "t.bin"), "--seed", "9"]) == 0
    assert main(["tracker-verify", "--r-g", trk[0]["r_G"],
                 "--k-r-g", trk[0]["k_r_G"], "--k-commitment", kG,
                 "--proof", str(d / "t.bin")]) == 0
    # wrong k-commitment rejects
    wrong = "0x" + g1_to_bytes(GENERATOR.mul(ks[1])).hex()
    assert main(["tracker-verify", "--r-g", trk[0]["r_G"],
                 "--k-r-g", trk[0]["k_r_G"], "--k-commitment", wrong,
                 "--proof", str(d / "t.bin")]) == 1


def test_cli_info(capsys):
    assert main(["info"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert "backend" in out and "native_runtime" in out
