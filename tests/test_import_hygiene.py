"""Importing the host-only surface must NOT initialize a jax device backend.

Backend init is an import side effect to avoid at all costs here: with a
remote-TPU tunnel attached but degraded, PJRT client creation blocks for
minutes, so a consensus client that only wants the host path (whisk codecs,
batch verification) would hang on `import`.  This pins the fix for the
module-level jax-array constants that once lived in ops/field.py.
"""

import pathlib
import subprocess
import sys

_REPO = str(pathlib.Path(__file__).resolve().parents[1])

_PROBE = """
import curdleproofs_tpu
import curdleproofs_tpu.whisk
import curdleproofs_tpu.curdleproofs
import curdleproofs_tpu.msm_accumulator
import curdleproofs_tpu.parallel.batch_verify
import curdleproofs_tpu.ops.field          # the former offender
from curdleproofs_tpu.backend import get_backend
get_backend()                              # auto-resolution must stay host
from jax._src import xla_bridge
assert not xla_bridge._backends, f"backend initialized: {list(xla_bridge._backends)}"
print("clean")
"""


def test_host_imports_do_not_init_device_backend():
    r = subprocess.run([sys.executable, "-c", _PROBE],
                       capture_output=True, timeout=180, cwd=_REPO)
    assert r.returncode == 0, r.stderr.decode()[-2000:]
    assert b"clean" in r.stdout
