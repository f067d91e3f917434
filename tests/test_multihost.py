"""World>1 process-group execution (SURVEY.md §2c row 5).

Drives scripts/multihost_verify.py: two real processes join a JAX
coordination service on localhost, each verifies its `process_slice` of a
shared batch, and the verdict AND-reduces over `all_hosts_agree` — the one
cross-host collective the batch-verification placement needs.
"""

import json
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]


def test_two_process_distributed_batch_verify():
    out = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "multihost_verify.py")],
        capture_output=True, text=True, timeout=600, cwd=str(REPO))
    assert out.returncode == 0, out.stdout + out.stderr
    artifact = json.loads(out.stdout.splitlines()[-1])
    assert artifact["ok"] is True
    ranks = {w["rank"]: w for w in artifact["workers"]}
    assert all(w["process_count"] == 2 for w in ranks.values())
    # the AND-reduction saw True/True -> True and True/False -> False
    assert ranks[0]["valid_pass"] and ranks[1]["valid_pass"]
    assert ranks[0]["local_ok_corrupt"] and not ranks[1]["local_ok_corrupt"]
    assert not ranks[0]["corrupt_pass"] and not ranks[1]["corrupt_pass"]
