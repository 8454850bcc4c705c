#!/usr/bin/env bash
# Back-compat wrapper: per-file crash isolation now lives in a pytest hook
# (tests/conftest.py pytest_runtestloop), so the one command below is the
# whole slow tier — `pytest -q -m slow` forks one process per test file
# automatically.
set -u
cd "$(dirname "$0")/.."
exec python -m pytest tests/ -q -m slow
