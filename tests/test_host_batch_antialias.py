"""Antialias host-FIR path of the batched front-end (split out of
test_host_batch.py to bound per-file wall-clock under the slow tier's
process isolation)."""

import numpy as np
import pytest

from bpm_analysis_tpu import host, host_batch
from bpm_analysis_tpu.io import wav

from test_host_batch import CFG, SR

pytestmark = pytest.mark.slow


def make_wav_native(path, seconds, seed, sr_native=4832, bpm=105.0):
    """Native-rate variant of make_wav: same pulse family at a rate the
    decimation clamp maps to factor 15 (post rate 322; its own clamp is 1,
    so no double decimation)."""
    n = int(seconds * sr_native)
    rng = np.random.RandomState(seed)
    t = np.arange(n) / sr_native
    beats = np.diff(np.floor(t * bpm / 60.0), prepend=0.0) > 0
    sig = np.zeros(n)
    sig[beats] = 1000.0
    s2 = np.nonzero(beats)[0] + int(0.33 * 60 / bpm * sr_native)
    sig[s2[s2 < n]] = 450.0
    taps = int(30 / SR * sr_native)
    kt = np.arange(taps) / sr_native
    kernel = np.exp(-kt * SR / 6.0) * np.cos(2 * np.pi * (0.9 * SR / (2 * np.pi)) * kt)
    sig = np.convolve(sig, kernel, mode="same") + rng.randn(n) * 6.0
    peak = np.abs(sig).max() or 1.0
    wav.write(path, sr_native, np.int16(sig / peak * 32767))


def test_batched_antialias_host_fir(tmp_path):
    """The antialias path's host-side FIR decode (native decode_batch_fir /
    its numpy fallback) matches the serial path's on-device FIR
    (ops/filter.fir_decimate): identical decimated grid and taps, float32
    rounding the only difference — final beat sets must agree.  This is the
    path that makes the robust antialias mode batch-viable (ANTIALIAS_r04
    measured 5 vs 156 audio-min/s shipping full native-rate PCM)."""
    import dataclasses

    cfg = dataclasses.replace(CFG, compat=dataclasses.replace(
        CFG.compat, antialias_decimation=True))
    paths = []
    for seed in (0, 1):
        p = str(tmp_path / f"native_{seed}.wav")
        make_wav_native(p, 50 + 10 * seed, seed)
        paths.append(p)

    serial_beats = {}
    for p in paths:
        res = host.analyze_wav_file(p, cfg, output_directory=str(tmp_path / "ser"))
        serial_beats[p] = np.asarray(res.final_positions)[: int(res.final_count)]

    results, errors = host_batch.analyze_files_batched(
        paths, cfg, str(tmp_path / "bat"), render=False, max_batch=2)
    assert not errors, errors
    for p in paths:
        res = results[p]
        got = np.asarray(res.final_positions)[: int(res.final_count)]
        exp = serial_beats[p]
        assert len(got) == len(exp), (len(got), len(exp))
        # float32 FIR rounding may move a peak by at most one sample.
        assert np.max(np.abs(got - exp)) <= 1, np.max(np.abs(got - exp))
