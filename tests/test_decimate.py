import numpy as np
import jax.numpy as jnp

from bpm_analysis_tpu.ops import filter as flt


def test_fir_decimate_passband_and_alias_rejection():
    sr, factor = 44100, 146
    new_sr = sr / factor  # ~302 Hz, Nyquist ~151 Hz
    n = sr * 2
    t = np.arange(n) / sr
    in_band = np.sin(2 * np.pi * 60.0 * t)            # survives
    alias = np.sin(2 * np.pi * 1000.0 * t)            # must be rejected
    out_in = np.asarray(flt.fir_decimate(jnp.asarray(in_band), factor))
    out_alias = np.asarray(flt.fir_decimate(jnp.asarray(alias), factor))
    mid = slice(len(out_in) // 4, -len(out_in) // 4)
    assert np.std(out_in[mid]) > 0.6   # ~0.707 for a unit sine
    assert np.std(out_alias[mid]) < 0.02

    # Bare stride slicing (the reference's decimation) folds the alias in.
    bare = alias[::factor]
    assert np.std(bare[len(bare) // 4: -len(bare) // 4]) > 0.5


def test_fir_decimate_matches_direct_convolution():
    """Polyphase-matmul formulation == the direct strided windowed-sinc
    convolution it replaces (float64 numpy oracle, built from the same tap
    recipe), for several (n, factor) shapes incl. n not a multiple of factor.
    """
    rng = np.random.RandomState(7)
    for n, factor, tpp in [(1000, 7, 8), (4096, 16, 8), (5001, 44, 8),
                           (300, 146, 4)]:
        x = rng.randn(n)
        half = tpp * factor // 2
        n_taps = 2 * half + 1
        t = np.arange(n_taps) - half
        cutoff = 0.9 / factor
        h = np.sinc(cutoff * t) * cutoff
        h *= np.hanning(n_taps)
        h /= h.sum()
        out_len = -(-n // factor)
        xp = np.pad(x, (half, half + factor * out_len - n + half))
        oracle = np.asarray(
            [np.dot(h, xp[m * factor: m * factor + n_taps])
             for m in range(out_len)])
        got = np.asarray(flt.fir_decimate(jnp.asarray(x), factor,
                                          taps_per_phase=tpp))
        assert got.shape == oracle.shape
        np.testing.assert_allclose(got, oracle, rtol=0, atol=1e-5)


def test_fir_decimate_identity_factor_1():
    x = jnp.asarray(np.random.RandomState(0).randn(100))
    np.testing.assert_array_equal(np.asarray(flt.fir_decimate(x, 1)), np.asarray(x))
