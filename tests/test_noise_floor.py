import numpy as np
import jax.numpy as jnp

from bpm_analysis_tpu.config import DEFAULT_CONFIG
from bpm_analysis_tpu.models import noise_floor


def test_noise_floor_on_vulpine(oracle):
    env = jnp.asarray(oracle["envelope"])
    sr = int(oracle["sample_rate"])
    res = noise_floor.dynamic_noise_floor(env, sr, DEFAULT_CONFIG)

    count = int(res.trough_count)
    assert count == len(oracle["sanitized_troughs"])
    np.testing.assert_array_equal(
        np.asarray(res.trough_positions)[:count], oracle["sanitized_troughs"]
    )
    np.testing.assert_allclose(np.asarray(res.floor), oracle["noise_floor"], rtol=1e-9)


def test_noise_floor_few_troughs_fallback():
    # Flat-ish tiny signal: no troughs -> static floor at the 0.2 quantile.
    rng = np.random.RandomState(0)
    env = jnp.asarray(np.abs(rng.randn(2000)) + 10.0)
    cfg = DEFAULT_CONFIG
    # Constant signal has no prominence-passing troughs.
    flat = jnp.ones(2000) * 5.0
    res = noise_floor.dynamic_noise_floor(flat, 302, cfg)
    assert int(res.trough_count) == 0
    np.testing.assert_allclose(np.asarray(res.floor), np.full(2000, 5.0), rtol=1e-12)
