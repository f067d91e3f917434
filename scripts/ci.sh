#!/bin/bash
# CI gate — mirrors the reference's pipeline (fmt+clippy / test / docs,
# /root/reference/.github/workflows/ci.yml:36-92) with TPU-build equivalents:
#
#   1. lint      scripts/lint.py (first-party AST linter, warnings are errors)
#   2. syntax    python -m compileall over every first-party source
#   3. native    the C++ host runtime builds and self-tests
#   4. tests     the fast host test subset on a virtual 8-device CPU mesh,
#                including the golden bit-exactness gates (whisk proof bytes
#                vs /root/reference/src/whisk.rs:401,455)
#   5. docs      every doc page parses and internal file references resolve
#
# Run:  bash scripts/ci.sh          (fast subset, ~2-4 min warm)
#       CI_FULL=1 bash scripts/ci.sh   (entire test suite)
set -euo pipefail
cd "$(dirname "$0")/.."

fail=0
step() { echo; echo "=== $1 ==="; }

step "lint"
python scripts/lint.py

step "syntax (compileall)"
python -m compileall -q curdleproofs_tpu tests scripts examples bench.py

step "native runtime"
python -c "
from curdleproofs_tpu.host import native
ok = native.available()
print('native C++ runtime:', 'loaded' if ok else 'MISSING (pure-python fallback)')
assert ok, 'C++ runtime must build in CI'
"

step "tests"
if [ "${CI_FULL:-0}" = "1" ]; then
  python -m pytest tests/ -q
else
  # the fast gate: golden bit-exactness + serde + every protocol argument +
  # host substrate + accumulator/batch logic (pure-host, no kernel compiles)
  python -m pytest -q \
    tests/test_whisk_golden.py tests/test_serde_negative.py \
    tests/test_subarguments.py tests/test_shuffle_argument.py \
    tests/test_host_substrate.py tests/test_util.py \
    tests/test_batch_verify.py tests/test_crs_ceremony.py \
    tests/test_whisk_batch.py tests/test_tracker_batch.py \
    tests/test_import_hygiene.py tests/test_backend_env.py
fi

step "docs"
python - <<'EOF'
import pathlib, re
root = pathlib.Path(".")
bad = []
for md in sorted(root.glob("docs/*.md")) + [root / "README.md"]:
    text = md.read_text()
    # every referenced first-party path must exist (docs drift gate)
    for m in re.finditer(r"`(curdleproofs_tpu/[\w/]+\.py|scripts/[\w/]+\.(?:py|sh)|tests/[\w/]+\.py|bench\.py)`", text):
        if not (root / m.group(1)).exists():
            bad.append(f"{md}: dangling reference {m.group(1)}")
print(f"docs: {len(bad)} dangling references")
for b in bad:
    print(" ", b)
raise SystemExit(1 if bad else 0)
EOF

echo
echo "CI PASSED"
