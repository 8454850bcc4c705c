#!/usr/bin/env bash
# Run the slow test tier (golden/parity/sharding suites) one process per test
# file.  A single long pytest process intermittently SIGSEGVs inside
# XLA:CPU's backend_compile_and_load after ~20 heavy compiles (jaxlib-level,
# in-process-history dependent: every file passes reliably in a fresh
# interpreter).  The fast tier (`pytest -q`) is unaffected.
set -u
cd "$(dirname "$0")/.."
fail=0
for f in $(grep -l "pytest.mark.slow" tests/test_*.py); do
    echo "=== $f ==="
    python -m pytest "$f" -q -m slow || fail=1
done
exit $fail
