"""Overflow auto-retry contract of the batched front-end.

Split out of test_host_batch.py so the slow tier's per-file process
isolation (tests/conftest.py) also bounds per-file wall-clock: each of these
compiles several full-pipeline programs, and together with the rest of the
batched-front-end suite they exceeded a 10-minute budget on a 1-core host.
"""

import os

import numpy as np
import pytest

from bpm_analysis_tpu import host_batch
from bpm_analysis_tpu.config import AnalyzerConfig, RuntimeConfig

from test_host_batch import CFG, make_wav, _normalized, _assert_log_equal, ARTIFACTS

pytestmark = pytest.mark.slow

def test_batched_overflow_retry(tmp_path):
    """An input whose event population exceeds the configured capacities
    must still come back EXACT via the auto-retry (capacities double, the
    chunk re-runs on the already-staged device inputs) — and must surface
    the serial path's capacity-overflow error when retries are disabled."""
    src = tmp_path / "src"
    src.mkdir()
    files = []
    for i in range(2):
        p = str(src / f"rec{i}.wav")
        make_wav(p, 25.0, seed=40 + i, bpm=100.0 + 9 * i)
        files.append(p)

    # Capacities far below the ~90 raw peaks / ~130+ noise-floor troughs
    # these recordings carry; three doublings reach 256/256/512 (measured
    # clean), a superset of the adequately-sized comparison run below.
    tiny = AnalyzerConfig(runtime=RuntimeConfig(
        max_raw_peaks=32, max_troughs=32, max_candidates=64,
        dtype="float32", noise_quantile_stride=8, quantile_backend="xla"))

    # Retries disabled: the serial-mode contract (error on the roster).
    out0 = str(tmp_path / "noretry")
    results0, errors0 = host_batch.analyze_files_batched(
        files, tiny, out0, max_batch=4, min_bucket=1 << 13,
        overflow_retries=0)
    assert len(errors0) == len(files)
    assert all("capacity overflow" in msg for _, msg in errors0)

    # Retries on: exact artifacts, identical to an adequately-sized run
    # (capacities never change results, only whether events fit).
    out1 = str(tmp_path / "retry")
    results1, errors1 = host_batch.analyze_files_batched(
        files, tiny, out1, max_batch=4, min_bucket=1 << 13,
        overflow_retries=3)
    assert errors1 == []
    big_dir = str(tmp_path / "big")
    host_batch.analyze_files_batched(files, CFG, big_dir, max_batch=4,
                                     min_bucket=1 << 13)
    for i in range(len(files)):
        for suffix in ("_bpm_plot.csv", "_Analysis_Summary.md"):
            a = os.path.join(big_dir, f"rec{i}{suffix}")
            b = os.path.join(out1, f"rec{i}{suffix}")
            assert _normalized(a) == _normalized(b), f"rec{i}{suffix}"
