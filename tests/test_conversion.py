"""Multi-format ingest path (L0): ``host.convert_to_wav`` and the per-file
conversion isolation rosters, executed end-to-end against a fake ``ffmpeg``
on PATH.

The reference decodes non-WAV formats by shelling to FFmpeg via pydub
(bpm_analysis.py:989-1005, extension list gui.py:88,115); our
``convert_to_wav`` invokes the ffmpeg CLI directly.  ffmpeg itself is not
installed in CI, so these tests install a stub executable that honors the
exact CLI contract ``ffmpeg -y -i INPUT -ac 1 TARGET`` — inputs are mono
WAVs renamed to ``.mp3``, for which a real ``ffmpeg -ac 1`` conversion is a
PCM copy, so the stub copies bytes (and fails, exit 1, for inputs whose name
contains ``bad``).  This executes every line of the conversion path except
ffmpeg's own codec work: argument order, return-code handling, stderr
capture, per-file isolation, and the converted-file analysis flow.
"""
import dataclasses
import os
import stat
import sys

import numpy as np
import pytest

from bpm_analysis_tpu import host, host_batch
from bpm_analysis_tpu.config import DEFAULT_CONFIG
from bpm_analysis_tpu.io import wav

SR = 302

SMALL_CFG = dataclasses.replace(
    DEFAULT_CONFIG,
    runtime=dataclasses.replace(DEFAULT_CONFIG.runtime, max_raw_peaks=512,
                                max_troughs=512, max_candidates=256),
)

_STUB = f"""#!{sys.executable}
import shutil, sys
# fake ffmpeg honoring: ffmpeg -y -i INPUT -ac 1 TARGET
args = sys.argv[1:]
assert args[0] == "-y" and args[1] == "-i" and args[3:5] == ["-ac", "1"], args
inp, target = args[2], args[5]
if "bad" in inp:
    sys.stderr.write("fake ffmpeg: Invalid data found when processing input\\n")
    sys.exit(1)
shutil.copyfile(inp, target)
"""


@pytest.fixture
def fake_ffmpeg(tmp_path, monkeypatch):
    """Install the stub ffmpeg at the front of PATH; return its bin dir."""
    bindir = tmp_path / "bin"
    bindir.mkdir()
    exe = bindir / "ffmpeg"
    exe.write_text(_STUB)
    exe.chmod(exe.stat().st_mode | stat.S_IXUSR | stat.S_IXGRP | stat.S_IXOTH)
    monkeypatch.setenv("PATH", f"{bindir}{os.pathsep}{os.environ['PATH']}")
    return str(bindir)


def _synthetic_mp3(path, seconds=40, bpm=100.0):
    """A mono WAV byte stream saved under an .mp3 name (see module doc)."""
    n = SR * seconds
    sig = np.zeros(n, np.float32)
    period = 60.0 / bpm * SR
    beats = (np.arange(1, int(n / period)) * period).astype(int)
    sig[beats] = 1000.0
    s2 = beats + int(0.3 * period)
    sig[s2[s2 < n]] = 500.0
    sig = np.convolve(sig, np.exp(-np.arange(30) / 6.0).astype(np.float32),
                      mode="same")
    sig += np.abs(np.random.RandomState(0).randn(n)).astype(np.float32) * 3
    wav.write(str(path), SR, np.int16(sig / sig.max() * 30000))


def test_convert_to_wav_success(fake_ffmpeg, tmp_path):
    src = tmp_path / "song.mp3"
    _synthetic_mp3(src)
    target = tmp_path / "song.wav"
    assert host.convert_to_wav(str(src), str(target)) is True
    sr, data = wav.read(str(target))
    assert sr == SR and len(data) == SR * 40


def test_convert_to_wav_failure_returns_false(fake_ffmpeg, tmp_path):
    src = tmp_path / "bad_take.mp3"
    src.write_bytes(b"not audio")
    assert host.convert_to_wav(str(src), str(tmp_path / "bad_take.wav")) is False


def test_convert_to_wav_without_ffmpeg_raises(tmp_path, monkeypatch):
    empty = tmp_path / "emptybin"
    empty.mkdir()
    monkeypatch.setenv("PATH", str(empty))
    with pytest.raises(RuntimeError, match="ffmpeg is required"):
        host.convert_to_wav(str(tmp_path / "x.mp3"), str(tmp_path / "x.wav"))


@pytest.mark.slow
def test_analyze_any_file_converts_then_analyzes(fake_ffmpeg, tmp_path):
    """SLOW TIER: compiles the serial SMALL_CFG pipeline program — the fast
    tier's single heaviest XLA:CPU compile (~40 s); the conversion logic
    itself stays fast-covered by the prepare_wavs/convert_to_wav tests.
    The GUI/webapp/CLI per-file flow on a non-WAV input (gui.py:234-243):
    convert into the output dir, analyze the converted WAV, artifacts named
    after the ORIGINAL file."""
    src = tmp_path / "rec.mp3"
    _synthetic_mp3(src)
    outdir = tmp_path / "processed"
    result = host.analyze_any_file(str(src), SMALL_CFG,
                                   output_directory=str(outdir))
    assert result is not None and bool(result.ok)
    assert (outdir / "rec.wav").exists()  # the converted intermediate
    for suffix in ("_bpm_plot.csv", "_Analysis_Summary.md",
                   "_Analysis_Settings.json"):
        assert (outdir / f"rec{suffix}").exists(), suffix
    assert 90 < float(result.metrics.avg_bpm) < 110


def test_analyze_any_file_conversion_failure_raises(fake_ffmpeg, tmp_path):
    src = tmp_path / "bad.mp3"
    src.write_bytes(b"junk")
    with pytest.raises(RuntimeError, match="conversion failed"):
        host.analyze_any_file(str(src), SMALL_CFG,
                              output_directory=str(tmp_path / "out"))


def test_prepare_wavs_isolates_conversion_failures(fake_ffmpeg, tmp_path):
    """Batched front-end conversion roster (host_batch.prepare_wavs): one
    failing file doesn't sink the batch; its slot carries wav_path=None and
    one roster entry, and order is preserved."""
    good1 = tmp_path / "a.mp3"
    bad = tmp_path / "bad.mp3"
    good2 = tmp_path / "b.wav"
    _synthetic_mp3(good1)
    bad.write_bytes(b"junk")
    _synthetic_mp3(good2)
    outdir = tmp_path / "out"
    errors = []
    pairs = host_batch.prepare_wavs([str(good1), str(bad), str(good2)],
                                    str(outdir), errors)
    assert [orig for _, orig in pairs] == [str(good1), str(bad), str(good2)]
    assert pairs[0][0] == str(outdir / "a.wav")
    assert pairs[1][0] is None
    assert pairs[2][0] == str(outdir / "b.wav")
    assert len(errors) == 1 and errors[0][0] == str(bad)


@pytest.mark.slow
def test_batched_fleet_with_conversion_failure(fake_ffmpeg, tmp_path):
    """End-to-end batched run over a mixed fleet with one unconvertible
    file: the good files produce results, the bad one lands on the error
    roster only.  Slow tier: this is the only test that would compile the
    batched program in the fast tier (the roster logic itself is covered
    fast by test_prepare_wavs_isolates_conversion_failures)."""
    good = tmp_path / "g.mp3"
    bad = tmp_path / "bad.mp3"
    _synthetic_mp3(good)
    bad.write_bytes(b"junk")
    outdir = tmp_path / "out"
    results, errors = host_batch.analyze_files_batched(
        [str(good), str(bad)], SMALL_CFG, str(outdir), render=False)
    assert str(good) in results and results[str(good)] is not None
    assert str(bad) not in results
    assert len(errors) == 1 and errors[0][0] == str(bad)


@pytest.mark.slow
def test_cli_converts_non_wav(fake_ffmpeg, tmp_path, monkeypatch, capsys):
    """SLOW TIER: shares the serial SMALL_CFG pipeline compile with
    test_analyze_any_file_converts_then_analyzes (whichever runs first pays
    ~40 s of XLA:CPU).
    CLI front-end conversion flow (apps/cli.py -> analyze_any_file); the
    webapp's process_audio_batch shares the same analyze_any_file body."""
    from bpm_analysis_tpu.apps import cli

    # Small capacities so the compiled program is the one the other
    # conversion/host tests already built (DEFAULT_CONFIG's full-size caps
    # would add the fast tier's single heaviest XLA:CPU compile for no
    # extra coverage — the CLI flow under test is identical).
    monkeypatch.setattr(cli, "DEFAULT_CONFIG", SMALL_CFG)

    src = tmp_path / "take.mp3"
    _synthetic_mp3(src)
    outdir = tmp_path / "processed"
    rc = cli.main([str(src), "--output-dir", str(outdir)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "beats" in out
    assert (outdir / "take_Analysis_Summary.md").exists()
