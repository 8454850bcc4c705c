import numpy as np
import jax.numpy as jnp
import pytest
from scipy.signal import butter as scipy_butter, filtfilt as scipy_filtfilt
from scipy.signal import lfilter as scipy_lfilter, lfilter_zi as scipy_lfilter_zi

from bpm_analysis_tpu.ops import filter as flt


@pytest.mark.parametrize("order,low,high,fs", [(2, 20, 150, 302), (2, 20, 150, 44100),
                                               (3, 5, 40, 500)])
def test_butter_design_matches_scipy(order, low, high, fs):
    b, a = flt.butter_bandpass(order, low, high, fs)
    nyq = fs / 2
    be, ae = scipy_butter(order, [low / nyq, high / nyq], btype="band")
    np.testing.assert_allclose(b, be, rtol=1e-9, atol=1e-14)
    np.testing.assert_allclose(a, ae, rtol=1e-9)


def test_lfilter_zi_matches_scipy():
    b, a = flt.butter_bandpass(2, 20, 150, 302)
    np.testing.assert_allclose(flt.lfilter_zi(b, a), scipy_lfilter_zi(b, a), rtol=1e-9)


def test_lfilter_matches_scipy():
    rng = np.random.RandomState(0)
    x = rng.randn(3000)
    b, a = flt.butter_bandpass(2, 20, 150, 302)
    zi = flt.lfilter_zi(b, a) * x[0]
    expected, _ = scipy_lfilter(b, a, x, zi=zi)
    got = np.asarray(flt.lfilter(b, a, jnp.asarray(x), jnp.asarray(zi)))
    np.testing.assert_allclose(got, expected, rtol=1e-7, atol=1e-9)


def test_filtfilt_matches_scipy():
    rng = np.random.RandomState(1)
    x = rng.randn(5000)
    b, a = flt.butter_bandpass(2, 20, 150, 302)
    expected = scipy_filtfilt(b, a, x)
    got = np.asarray(flt.filtfilt(b, a, jnp.asarray(x)))
    np.testing.assert_allclose(got, expected, rtol=1e-6, atol=1e-8)


def test_filtfilt_on_vulpine_like_signal(oracle):
    """Re-filtering the bundled filtered signal reproduces scipy end to end
    (the compat preprocess path at the decimated rate)."""
    raw = oracle["raw_signal"].astype(np.float64)
    sr = int(oracle["sample_rate"])
    b, a = flt.butter_bandpass(2, 20, 150, sr)
    expected = scipy_filtfilt(b, a, raw)
    got = np.asarray(flt.filtfilt(b, a, jnp.asarray(raw)))
    # IIR forward+backward over 114k samples: tolerances loosened for the
    # associative-scan evaluation order.
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-4 * np.abs(expected).max())
