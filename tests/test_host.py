"""Host orchestration end-to-end: file in → artifact set out."""
import dataclasses
import os

import numpy as np
import jax.numpy as jnp
import pytest

from bpm_analysis_tpu.config import DEFAULT_CONFIG, AnalyzerConfig, CompatConfig, RuntimeConfig
from bpm_analysis_tpu import host
from bpm_analysis_tpu.io import wav
from bpm_analysis_tpu.models import envelope as envm

SR = 302

# Small capacities for the end-to-end artifact test: a 60 s / 100 bpm
# synthetic recording has ~200 raw peaks, so capacity 512 is generous while
# shrinking the one-shot pipeline compile ~4x (the full-capacity graphs are
# exercised by the slow-tier vulpine goldens).
SMALL_CFG = dataclasses.replace(
    DEFAULT_CONFIG,
    runtime=dataclasses.replace(DEFAULT_CONFIG.runtime, max_raw_peaks=512,
                                max_troughs=512, max_candidates=256),
)


def _synthetic_wav(path, seconds=40, bpm=100.0):
    n = SR * seconds
    sig = np.zeros(n, np.float32)
    period = 60.0 / bpm * SR
    beats = (np.arange(1, int(n / period)) * period).astype(int)
    sig[beats] = 1000.0
    s2 = beats + int(0.3 * period)
    sig[s2[s2 < n]] = 500.0
    kernel = np.exp(-np.arange(30) / 6.0).astype(np.float32)
    sig = np.convolve(sig, kernel, mode="same")
    sig += np.abs(np.random.RandomState(0).randn(n)).astype(np.float32) * 3
    wav.write(path, SR, np.int16(sig / sig.max() * 30000))


def test_analyze_wav_file_produces_artifact_set(tmp_path):
    src = str(tmp_path / "rec.wav")
    _synthetic_wav(src)
    result = host.analyze_wav_file(src, SMALL_CFG, None, output_directory=str(tmp_path))
    assert result is not None and bool(result.ok)
    for suffix in ("_bpm_plot.csv", "_bpm_plot.html", "_Analysis_Summary.md",
                   "_Debug_Log.md", "_Analysis_Settings.json", "_filtered_debug.wav"):
        assert (tmp_path / f"rec{suffix}").exists(), suffix
    summary = (tmp_path / "rec_Analysis_Summary.md").read_text()
    assert "Average BPM" in summary
    avg = float(result.metrics.avg_bpm)
    assert 90 < avg < 110


def test_analyze_too_short_returns_none(tmp_path):
    src = str(tmp_path / "tiny.wav")
    wav.write(src, SR, np.zeros(SR, np.int16))
    result = host.analyze_wav_file(src, SMALL_CFG, None, output_directory=str(tmp_path))
    assert result is None
    # Settings are still persisted (reference saves them regardless).
    assert (tmp_path / "tiny_Analysis_Settings.json").exists()


def test_antialias_preprocess_path():
    """North-star preprocessing (compat.antialias_decimation=True): filter at
    the native rate, then decimate."""
    cfg = DEFAULT_CONFIG.replace(compat=CompatConfig(antialias_decimation=True))
    rng = np.random.RandomState(0)
    sr = 44100
    n = sr * 4
    sig = jnp.asarray(rng.randn(n).astype(np.float32) * 1000)
    env, filtered, new_rate = envm.preprocess(sig, sr, cfg)
    factor = envm.safe_downsample_factor(sr, cfg)
    assert new_rate == sr // factor
    assert env.shape[0] == filtered.shape[0] == -(-n // factor)
    assert bool(jnp.all(jnp.isfinite(env)))


def test_compat_preprocess_path():
    cfg = DEFAULT_CONFIG
    rng = np.random.RandomState(0)
    sr = 44100
    n = sr * 4
    sig = jnp.asarray(rng.randn(n).astype(np.float32) * 1000)
    env, filtered, new_rate = envm.preprocess(sig, sr, cfg)
    factor = envm.safe_downsample_factor(sr, cfg)
    assert factor == 146  # int(44100/300 - 1) = 146 -> clamped from 300
    assert new_rate == sr // factor
    assert bool(jnp.all(jnp.isfinite(env)))
