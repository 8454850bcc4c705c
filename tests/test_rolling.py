import numpy as np
import pandas as pd
import jax.numpy as jnp
import pytest

from bpm_analysis_tpu.ops import rolling


@pytest.mark.parametrize("window", [3, 4, 5, 30, 31, 100])
def test_rolling_mean_centered_matches_pandas(window):
    rng = np.random.RandomState(0)
    x = rng.rand(500)
    expected = pd.Series(x).rolling(window=window, min_periods=1, center=True).mean().values
    got = np.asarray(rolling.rolling_mean_centered(jnp.asarray(x), window))
    np.testing.assert_allclose(got, expected, rtol=1e-12)


def test_rolling_mean_masked_matches_pandas():
    rng = np.random.RandomState(1)
    x = rng.rand(300)
    x[rng.rand(300) < 0.2] = np.nan
    expected = pd.Series(x).rolling(window=7, min_periods=1, center=True).mean().values
    got = np.asarray(
        rolling.rolling_mean_centered_masked(jnp.asarray(x), jnp.asarray(~np.isnan(x)), 7)
    )
    np.testing.assert_allclose(got, expected, rtol=1e-12, equal_nan=True)


@pytest.mark.parametrize("window", [5, 8, 73])
def test_rolling_mean_dynamic_window(window):
    rng = np.random.RandomState(2)
    n, cap = 211, 256
    x = rng.rand(n)
    expected = pd.Series(x).rolling(window=window, min_periods=1, center=True).mean().values
    xp = np.zeros(cap)
    xp[:n] = x
    valid = np.arange(cap) < n
    got = np.asarray(
        rolling.rolling_mean_dynamic_window(jnp.asarray(xp), jnp.asarray(valid), window)
    )
    np.testing.assert_allclose(got[:n], expected, rtol=1e-12)
    assert np.all(np.isnan(got[n:]))


def test_rolling_mean_time_window_matches_pandas():
    rng = np.random.RandomState(3)
    n, cap = 180, 256
    times = np.sort(rng.rand(n) * 300.0)
    values = rng.rand(n) * 100
    import datetime

    idx = [datetime.datetime.fromtimestamp(0) + datetime.timedelta(seconds=s) for s in times]
    expected = (
        pd.Series(values, index=idx).rolling(window="5s", min_periods=1, center=True).mean().values
    )
    tp = np.zeros(cap)
    tp[:n] = times
    vp = np.zeros(cap)
    vp[:n] = values
    valid = np.arange(cap) < n
    got = np.asarray(
        rolling.rolling_mean_time_window(jnp.asarray(tp), jnp.asarray(vp), jnp.asarray(valid), 5.0)
    )
    np.testing.assert_allclose(got[:n], expected, rtol=1e-12)


def test_envelope_window_on_vulpine(oracle):
    """The envelope formula: abs -> centered rolling mean of sr//10 samples
    (reference bpm_analysis.py:1052-1054)."""
    raw = oracle["raw_signal"].astype(np.float64)
    sr = int(oracle["sample_rate"])
    got = np.asarray(rolling.rolling_mean_centered(jnp.abs(jnp.asarray(raw)), sr // 10))
    np.testing.assert_allclose(got, oracle["envelope"], rtol=1e-12)


def test_rolling_mean_time_window_bounded_path_bit_identical():
    """The shift-count path (static bound on slots per half-window) must be
    bit-identical to the searchsorted path: identical hi/lo indices feed the
    identical prefix-sum arithmetic."""
    rng = np.random.RandomState(7)
    n, cap = 300, 512
    # spacing >= 0.05 s (the beat-time invariant that justifies the bound)
    times = np.cumsum(0.05 + rng.rand(n) * 0.5)
    values = rng.rand(n) * 120
    tp = np.zeros(cap); tp[:n] = times
    vp = np.zeros(cap); vp[:n] = values
    valid = np.arange(cap) < n
    base = np.asarray(rolling.rolling_mean_time_window(
        jnp.asarray(tp), jnp.asarray(vp), jnp.asarray(valid), 5.0))
    m_bound = int(np.ceil(2.5 / 0.05)) + 1
    fast = np.asarray(rolling.rolling_mean_time_window(
        jnp.asarray(tp), jnp.asarray(vp), jnp.asarray(valid), 5.0,
        max_slots_in_half_window=m_bound))
    np.testing.assert_array_equal(
        fast.view(np.uint8), base.view(np.uint8))
