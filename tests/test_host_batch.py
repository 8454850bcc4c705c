"""Batched front-end contract: ``host_batch.analyze_files_batched`` over
mixed-length recordings produces byte-identical artifacts to the serial
per-file path (``host.analyze_wav_file``) — the parallelization of the
reference's serial worker loop (gui.py:202) must be invisible in the output.
"""

import os
import re

import numpy as np
import pytest

from bpm_analysis_tpu import host, host_batch
from bpm_analysis_tpu.config import AnalyzerConfig, RuntimeConfig
from bpm_analysis_tpu.io import wav

pytestmark = pytest.mark.slow

SR = 302

CFG = AnalyzerConfig(runtime=RuntimeConfig(
    max_raw_peaks=512, max_troughs=512, max_candidates=256,
    dtype="float32", noise_quantile_stride=8, quantile_backend="xla"))


def make_wav(path, seconds, seed, bpm=105.0):
    n = int(seconds * SR)
    rng = np.random.RandomState(seed)
    t = np.arange(n) / SR
    beats = np.diff(np.floor(t * bpm / 60.0), prepend=0.0) > 0
    sig = np.zeros(n)
    sig[beats] = 1000.0
    s2 = np.nonzero(beats)[0] + int(0.33 * 60 / bpm * SR)
    sig[s2[s2 < n]] = 450.0
    kernel = np.exp(-np.arange(30) / 6.0) * np.cos(np.arange(30) * 0.9)
    sig = np.convolve(sig, kernel, mode="same") + rng.randn(n) * 6.0
    peak = np.abs(sig).max() or 1.0
    wav.write(path, SR, np.int16(sig / peak * 32767))


ARTIFACTS = ("_bpm_plot.csv", "_Analysis_Summary.md", "_Debug_Log.md",
             "_Analysis_Settings.json")


def _normalized(path):
    """File content with generation-timestamp lines stripped (the only
    legitimate difference between serial and batched artifacts)."""
    out = []
    with open(path, "rb") as f:
        for line in f.read().split(b"\n"):
            if line.startswith(b"*Generated on:") or \
                    line.startswith(b"Analysis performed on:"):
                continue
            out.append(line)
    return b"\n".join(out)


_AMP_LINE = re.compile(rb"^(- \*\*(?:Raw Amp|Noise Floor)\*\*: `)(-?[\d.]+)(`)$")


def _assert_log_equal(path_a, path_b, label):
    """Debug logs must match line-for-line; amplitude DISPLAY lines may
    differ by one 0.1 formatting quantum.  XLA:CPU's GEMM kernels block (and
    so associate f32 sums) differently for different batch shapes, so a raw
    envelope value can land a half-ULP across a rounding boundary between
    the serial and batched compilations; every decision, position, count and
    derived number is still required to be byte-identical."""
    la = _normalized(path_a).split(b"\n")
    lb = _normalized(path_b).split(b"\n")
    assert len(la) == len(lb), f"{label}: line count {len(la)} != {len(lb)}"
    for i, (a, b) in enumerate(zip(la, lb)):
        if a == b:
            continue
        ma, mb = _AMP_LINE.match(a), _AMP_LINE.match(b)
        assert ma and mb and ma.group(1) == mb.group(1), \
            f"{label} line {i + 1}: {a!r} != {b!r}"
        va, vb = float(ma.group(2)), float(mb.group(2))
        assert abs(va - vb) <= 0.1001, \
            f"{label} line {i + 1}: amplitude {va} vs {vb}"


def test_batched_artifacts_match_serial(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    seconds = [21.0, 34.5, 47.2, 22.8, 61.0]
    files = []
    for i, sec in enumerate(seconds):
        p = str(src / f"rec{i}.wav")
        make_wav(p, sec, seed=10 + i, bpm=95.0 + 7 * i)
        files.append(p)

    serial_dir = str(tmp_path / "serial")
    for f in files:
        host.analyze_any_file(f, CFG, None, serial_dir)

    batch_dir = str(tmp_path / "batched")
    results, errors = host_batch.analyze_files_batched(
        files, CFG, batch_dir, max_batch=4, min_bucket=1 << 13)
    assert errors == []
    assert set(results) == set(files)
    for r in results.values():
        assert r is not None

    for i in range(len(files)):
        for suffix in ARTIFACTS:
            a = os.path.join(serial_dir, f"rec{i}{suffix}")
            b = os.path.join(batch_dir, f"rec{i}{suffix}")
            assert os.path.exists(a), a
            assert os.path.exists(b), b
            if suffix == "_Debug_Log.md":
                _assert_log_equal(a, b, f"rec{i}{suffix}")
            else:
                assert _normalized(a) == _normalized(b), \
                    f"artifact mismatch: rec{i}{suffix}"


def test_batched_error_roster(tmp_path):
    good = str(tmp_path / "good.wav")
    make_wav(good, 20.0, seed=1)
    bad = str(tmp_path / "bad.wav")
    with open(bad, "wb") as f:
        f.write(b"not a wav at all")

    out = str(tmp_path / "out")
    results, errors = host_batch.analyze_files_batched(
        [good, bad], CFG, out, max_batch=4, min_bucket=1 << 13)
    assert good in results and results[good] is not None
    assert len(errors) == 1 and errors[0][0] == bad


def test_length_buckets():
    assert host_batch.length_bucket(100, 1 << 13) == 1 << 13
    # Half-octave grid: 1.5 * 2^k sizes cap padding waste at ~33%.
    assert host_batch.length_bucket((1 << 15) + 1, 1 << 13) == 3 << 14
    assert host_batch.length_bucket((3 << 14) + 1, 1 << 13) == 1 << 16
    assert host_batch.length_bucket(181233, 1 << 15) == 196608  # 10-min @302
    assert host_batch.length_bucket(196608, 1 << 15) == 196608
    assert host_batch.batch_bucket(1, 32) == 1
    assert host_batch.batch_bucket(5, 32) == 8
    assert host_batch.batch_bucket(33, 32) == 32
