"""Mixed-length batching contract: a zero-padded recording analyzed with a
traced ``n_valid`` must reproduce the unpadded serial run exactly — the
property that lets the batched front-end (host_batch) pad mixed-length files
into shared bucket shapes without changing any artifact.

Covers the full masked chain: preprocess (FIR/stride decimation + dynamic-
boundary filtfilt + truncated rolling mean), noise floor (NaN-masked rolling
quantiles, tail-span pinning, masked fallbacks), raw peaks (tail-filled
local maxima / prominences / masked prominence quantile), classifier,
corrections, metrics.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from bpm_analysis_tpu.config import AnalyzerConfig, CompatConfig, RuntimeConfig
from bpm_analysis_tpu.models import envelope as envm
from bpm_analysis_tpu.models import pipeline

pytestmark = pytest.mark.slow

SR = 302


def synth(n, seed=0, bpm=110.0):
    rng = np.random.RandomState(seed)
    t = np.arange(n) / SR
    beats = (np.diff(np.floor(t * bpm / 60.0), prepend=0.0) > 0)
    sig = np.zeros(n)
    sig[beats] = 1000.0
    s2 = np.nonzero(beats)[0] + int(0.33 * 60 / bpm * SR)
    s2 = s2[s2 < n]
    sig[s2] = 450.0
    kernel = np.exp(-np.arange(30) / 6.0) * np.cos(np.arange(30) * 0.9)
    sig = np.convolve(sig, kernel, mode="same")
    sig += rng.randn(n) * 6.0
    return sig.astype(np.float64)


def run_pair(cfg, nv, n_pad, seed=1):
    """Returns (serial result, masked-padded result, serial env, padded env)."""
    x = synth(nv, seed=seed)
    xp = np.concatenate([x, np.zeros(n_pad - nv)])

    out_s = envm.preprocess(jnp.asarray(x), SR, cfg)
    env_s, rate = out_s[0], out_s[2]
    res_s = pipeline.analyze_envelope(env_s, rate, cfg)

    env_p, _, rate_p, nv_dec = envm.preprocess(jnp.asarray(xp), SR, cfg,
                                               n_valid=nv)
    assert rate_p == rate
    res_p = pipeline.analyze_envelope(env_p, rate_p, cfg, n_valid=nv_dec)
    return res_s, res_p, np.asarray(env_s), np.asarray(env_p), int(nv_dec)


def assert_results_equal(res_s, res_p):
    ns = int(res_s.final_count)
    np_ = int(res_p.final_count)
    assert ns == np_
    np.testing.assert_array_equal(np.asarray(res_s.final_positions)[:ns],
                                  np.asarray(res_p.final_positions)[:ns])
    rs = int(res_s.raw_peak_count)
    assert rs == int(res_p.raw_peak_count)
    np.testing.assert_array_equal(np.asarray(res_s.raw_peak_positions)[:rs],
                                  np.asarray(res_p.raw_peak_positions)[:rs])
    np.testing.assert_array_equal(np.asarray(res_s.classes)[:rs],
                                  np.asarray(res_p.classes)[:rs])
    ts = int(res_s.trough_count)
    assert ts == int(res_p.trough_count)
    np.testing.assert_array_equal(np.asarray(res_s.trough_positions)[:ts],
                                  np.asarray(res_p.trough_positions)[:ts])
    for name in ("avg_bpm", "min_bpm", "max_bpm"):
        a = float(getattr(res_s.metrics, name))
        b = float(getattr(res_p.metrics, name))
        np.testing.assert_allclose(a, b, rtol=1e-9)


@pytest.mark.parametrize("stride", [1, 8])
def test_masked_equals_serial_compat_path(stride):
    cfg = AnalyzerConfig(runtime=RuntimeConfig(
        max_raw_peaks=512, max_troughs=512, max_candidates=256,
        dtype="float64", noise_quantile_stride=stride, quantile_backend="xla"))
    nv, n_pad = 18120, 24064  # 60 s padded to ~80 s
    res_s, res_p, env_s, env_p, nv_dec = run_pair(cfg, nv, n_pad)
    np.testing.assert_allclose(env_p[:nv_dec], env_s, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(res_p.floor)[:nv_dec], np.asarray(res_s.floor),
        rtol=1e-9, atol=1e-12)
    assert_results_equal(res_s, res_p)


def test_masked_equals_serial_antialias_path():
    cfg = AnalyzerConfig(
        compat=CompatConfig(antialias_decimation=True),
        runtime=RuntimeConfig(
            max_raw_peaks=512, max_troughs=512, max_candidates=256,
            dtype="float64", noise_quantile_stride=8, quantile_backend="xla"))
    nv, n_pad = 18120, 20480
    res_s, res_p, env_s, env_p, nv_dec = run_pair(cfg, nv, n_pad, seed=3)
    np.testing.assert_allclose(env_p[:nv_dec], env_s, rtol=1e-12, atol=1e-12)
    assert_results_equal(res_s, res_p)


def test_masked_filtfilt_matches_truncated():
    from scipy.signal import butter as sbutter, filtfilt as sfiltfilt

    from bpm_analysis_tpu.ops import filter as flt

    rng = np.random.RandomState(7)
    x = rng.randn(5000)
    nv = 3777
    b, a = sbutter(2, [20, 150], btype="band", fs=SR)
    want = sfiltfilt(b, a, x[:nv])
    got = np.asarray(flt.filtfilt_masked(b, a, jnp.asarray(x), nv))[:nv]
    np.testing.assert_allclose(got, want, rtol=1e-7, atol=1e-9)
