import numpy as np
import pandas as pd
import jax.numpy as jnp
import pytest

from bpm_analysis_tpu.ops import quantile


@pytest.mark.parametrize("impl", [quantile.rolling_quantile_centered,
                                  quantile.rolling_quantile_centered_sort])
@pytest.mark.parametrize("window,minp,q", [(5, 3, 0.2), (8, 3, 0.2), (51, 3, 0.5), (30, 1, 0.9)])
def test_rolling_quantile_matches_pandas(impl, window, minp, q):
    rng = np.random.RandomState(0)
    x = rng.rand(400)
    x[rng.rand(400) < 0.3] = np.nan
    expected = pd.Series(x).rolling(window=window, min_periods=minp, center=True).quantile(q).values
    got = np.asarray(impl(jnp.asarray(x), window, q, minp, chunk=64))
    np.testing.assert_allclose(got, expected, rtol=1e-12, equal_nan=True)


def test_wavelet_vs_sort_cross_check():
    rng = np.random.RandomState(7)
    x = rng.randn(1000) * 100
    x[rng.rand(1000) < 0.15] = np.nan
    a = np.asarray(quantile.rolling_quantile_centered(jnp.asarray(x), 73, 0.37, 4))
    b = np.asarray(quantile.rolling_quantile_centered_sort(jnp.asarray(x), 73, 0.37, 4, chunk=128))
    np.testing.assert_allclose(a, b, rtol=1e-12, equal_nan=True)


def test_bfill_ffill():
    x = np.array([np.nan, np.nan, 3.0, np.nan, 5.0, np.nan, np.nan])
    expected = pd.Series(x).bfill().ffill().values
    got = np.asarray(quantile.bfill_ffill(jnp.asarray(x)))
    np.testing.assert_allclose(got, expected)


def test_edge_fill_matches_bfill_ffill_on_edge_runs():
    """edge_fill == bfill_ffill for every prefix/suffix NaN structure (the
    only structure the noise-floor path produces), incl. all-NaN/no-NaN."""
    rng = np.random.RandomState(3)
    for lead in (0, 1, 7):
        for trail in (0, 2, 5):
            x = rng.randn(40)
            if lead:
                x[:lead] = np.nan
            if trail:
                x[-trail:] = np.nan
            a = np.asarray(quantile.bfill_ffill(jnp.asarray(x)))
            b = np.asarray(quantile.edge_fill(jnp.asarray(x)))
            np.testing.assert_allclose(a, b, equal_nan=True)
    allnan = np.full(16, np.nan)
    np.testing.assert_array_equal(
        np.asarray(quantile.edge_fill(jnp.asarray(allnan))), allnan)


def test_draft_noise_floor_on_vulpine(oracle):
    """Draft floor = rolling quantile of the dense interpolated trough series
    (reference bpm_analysis.py:1081-1086)."""
    dense = oracle["dense_troughs"]
    sr = int(oracle["sample_rate"])
    win = int(10 * sr)
    got = np.asarray(
        quantile.rolling_quantile_centered(jnp.asarray(dense), win, 0.20, 3, chunk=2048)
    )
    np.testing.assert_allclose(got, oracle["draft_noise_floor"], rtol=1e-9, equal_nan=True)
    filled = np.asarray(quantile.bfill_ffill(jnp.asarray(got)))
    np.testing.assert_allclose(filled, oracle["draft_noise_floor_filled"], rtol=1e-9)
