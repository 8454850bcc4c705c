import numpy as np
import jax.numpy as jnp

from bpm_analysis_tpu.config import DEFAULT_CONFIG
from bpm_analysis_tpu.models import analytics


_METRICS_CACHE = {}


def _metrics(oracle, cfg=DEFAULT_CONFIG):
    # compute_metrics is pure and cfg is frozen/hashable: memoize so the six
    # oracle-parity tests share one execution instead of re-running it.
    if cfg not in _METRICS_CACHE:
        _METRICS_CACHE[cfg] = _metrics_uncached(oracle, cfg)
    return _METRICS_CACHE[cfg]


def _metrics_uncached(oracle, cfg):
    final = oracle["final_peaks"]
    sr = int(oracle["sample_rate"])
    cap = cfg.runtime.max_candidates
    pos = np.full(cap, 10**9, dtype=np.int32)
    pos[: len(final)] = final
    return analytics.compute_metrics(
        jnp.asarray(pos), jnp.asarray(len(final)), sr, cfg, jnp.float64
    )


def test_bpm_series_matches_oracle(oracle):
    m = _metrics(oracle)
    count = int(m.bpm.count)
    assert count == len(oracle["bpm_times"])
    np.testing.assert_allclose(np.asarray(m.bpm.times)[:count], oracle["bpm_times"], rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(m.bpm.smoothed)[:count], oracle["smoothed_bpm"], rtol=1e-9
    )


def test_summary_stats_match_oracle(oracle):
    m = _metrics(oracle)
    np.testing.assert_allclose(float(m.avg_bpm), oracle["avg_bpm"], rtol=1e-9)
    np.testing.assert_allclose(float(m.min_bpm), oracle["min_bpm"], rtol=1e-9)
    np.testing.assert_allclose(float(m.max_bpm), oracle["max_bpm"], rtol=1e-9)
    np.testing.assert_allclose(float(m.avg_rmssdc), oracle["avg_rmssdc"], rtol=1e-9)
    np.testing.assert_allclose(float(m.avg_sdnn), oracle["avg_sdnn"], rtol=1e-9)


def test_hrv_matches_oracle(oracle):
    m = _metrics(oracle)
    count = int(m.hrv.count)
    assert count == len(oracle["hrv_time"])
    np.testing.assert_allclose(np.asarray(m.hrv.time)[:count], oracle["hrv_time"], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(m.hrv.rmssdc)[:count], oracle["hrv_rmssdc"], rtol=1e-9)
    np.testing.assert_allclose(np.asarray(m.hrv.sdnn)[:count], oracle["hrv_sdnn"], rtol=1e-9)
    np.testing.assert_allclose(np.asarray(m.hrv.bpm)[:count], oracle["hrv_bpm"], rtol=1e-9)


def test_slopes_match_oracle(oracle):
    # Oracle times pass through datetime.timedelta (microsecond resolution,
    # bpm_analysis.py:1473), so they carry ~1e-6 s truncation; our
    # float-second math is exact.  Tolerances account for that.
    m = _metrics(oracle)
    assert bool(m.peak_exertion.found)
    np.testing.assert_allclose(
        float(m.peak_exertion.slope), oracle["peak_exertion_slope"], rtol=1e-6
    )
    np.testing.assert_allclose(
        float(m.peak_exertion.start_time), oracle["peak_exertion_start"], atol=1e-5
    )
    assert bool(m.peak_recovery.found)
    np.testing.assert_allclose(
        float(m.peak_recovery.slope), oracle["peak_recovery_slope"], rtol=1e-6
    )
    np.testing.assert_allclose(
        float(m.peak_recovery.end_time), oracle["peak_recovery_end"], atol=1e-5
    )


def test_hrr_compat_truncated_interp(oracle):
    """Default compat mode reproduces the reference's int-truncated
    epoch-second np.interp (bpm_analysis.py:1606): x-coordinates floored to
    whole seconds.  On the golden curve this is the shipped 58.9 value."""
    m = _metrics(oracle)
    t = oracle["bpm_times"]
    b = oracle["smoothed_bpm"]
    imax = np.argmax(b)
    expected = b[imax] - np.interp(t[imax] + 60.0, np.floor(t), b)
    assert bool(m.hrr.found)
    np.testing.assert_allclose(float(m.hrr.hrr), expected, rtol=1e-9)
    assert abs(float(m.hrr.hrr) - 58.9) < 0.05  # golden summary value


def test_hrr_clean_semantics(oracle):
    """With the compat flag off, clean float-second interpolation."""
    import dataclasses

    cfg = DEFAULT_CONFIG.replace(
        compat=dataclasses.replace(DEFAULT_CONFIG.compat, hrr_truncated_interp=False))
    m = _metrics(oracle, cfg)
    t = oracle["bpm_times"]
    b = oracle["smoothed_bpm"]
    imax = np.argmax(b)
    expected = b[imax] - np.interp(t[imax] + 60.0, t, b)
    assert bool(m.hrr.found)
    np.testing.assert_allclose(float(m.hrr.hrr), expected, rtol=1e-9)


def test_empty_input():
    cfg = DEFAULT_CONFIG
    cap = cfg.runtime.max_candidates
    pos = np.full(cap, 10**9, dtype=np.int32)
    m = analytics.compute_metrics(jnp.asarray(pos), jnp.asarray(0), 302, cfg, jnp.float64)
    assert int(m.bpm.count) == 0
    assert not bool(m.hrr.found)
    assert not bool(m.peak_exertion.found)
    assert int(m.hrv.count) == 0
