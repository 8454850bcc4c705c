import numpy as np
import jax.numpy as jnp
import pytest
from scipy.signal import find_peaks as scipy_find_peaks, peak_prominences as scipy_proms

from bpm_analysis_tpu.ops import find_peaks as fp


def _positions(res):
    count = int(res.count)
    return np.asarray(res.positions)[:count]


def test_local_maxima_with_plateaus():
    x = np.array([0, 1, 0, 2, 2, 2, 0, 3, 3, 0, 1, 1], dtype=float)
    expected, _ = scipy_find_peaks(x)
    mask = np.asarray(fp.local_maxima_mask(jnp.asarray(x)))
    np.testing.assert_array_equal(np.nonzero(mask)[0], expected)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_signals_all_filters(seed):
    rng = np.random.RandomState(seed)
    x = np.cumsum(rng.randn(2000))
    x += 0.3 * rng.randn(2000)
    height = np.full_like(x, np.quantile(x, 0.3))
    prom = 0.5
    dist = 7
    expected, _ = scipy_find_peaks(x, height=height, prominence=prom, distance=dist)
    got = _positions(fp.find_peaks(jnp.asarray(x), 1024, height=jnp.asarray(height),
                                   prominence=prom, distance=dist))
    np.testing.assert_array_equal(got, expected)


def test_prominences_match_scipy():
    rng = np.random.RandomState(3)
    x = np.cumsum(rng.randn(1000))
    peaks, _ = scipy_find_peaks(x)
    expected = scipy_proms(x, peaks)[0]
    cap = 512
    pos = np.full(cap, len(x) - 1)
    pos[: len(peaks)] = peaks
    valid = np.arange(cap) < len(peaks)
    got = np.asarray(fp.peak_prominences(jnp.asarray(x), jnp.asarray(pos), jnp.asarray(valid)))
    np.testing.assert_allclose(got[: len(peaks)], expected, rtol=1e-12)


def test_distance_tie_breaking():
    # Equal heights within distance: scipy keeps the *later* one.
    x = np.array([0, 5, 0, 5, 0], dtype=float)
    expected, _ = scipy_find_peaks(x, distance=3)
    got = _positions(fp.find_peaks(jnp.asarray(x), 8, distance=3))
    np.testing.assert_array_equal(got, expected)


@pytest.mark.slow
def test_raw_peaks_on_vulpine(oracle):
    """Raw peak finding: height = dynamic noise floor, prominence = envelope
    quantile, distance = 0.05 s (reference bpm_analysis.py:223-229)."""
    env = oracle["envelope"]
    sr = int(oracle["sample_rate"])
    floor = oracle["noise_floor"]
    prom = np.quantile(env, 0.1)
    dist = int(0.05 * sr)
    got = _positions(
        fp.find_peaks(jnp.asarray(env), 4096, height=jnp.asarray(floor),
                      prominence=prom, distance=dist)
    )
    np.testing.assert_array_equal(got, oracle["all_raw_peaks"])


def test_troughs_on_vulpine(oracle):
    """Trough finding on the negated envelope (bpm_analysis.py:1070)."""
    env = oracle["envelope"]
    sr = int(oracle["sample_rate"])
    prom = np.quantile(env, 0.1)
    dist = int(0.05 * sr)
    got = _positions(fp.find_peaks(jnp.asarray(-env), 4096, prominence=prom, distance=dist))
    np.testing.assert_array_equal(got, oracle["all_troughs"])
