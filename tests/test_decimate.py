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


def test_fir_decimate_identity_factor_1():
    x = jnp.asarray(np.random.RandomState(0).randn(100))
    np.testing.assert_array_equal(np.asarray(flt.fir_decimate(x, 1)), np.asarray(x))
