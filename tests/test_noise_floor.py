import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from bpm_analysis_tpu.config import DEFAULT_CONFIG
from bpm_analysis_tpu.models import noise_floor

# Small capacities shrink the compiled find_peaks/quantile graphs so the
# fast-tier fallback test stays cheap; semantics are capacity-independent
# below the caps.
SMALL_CFG = dataclasses.replace(
    DEFAULT_CONFIG,
    runtime=dataclasses.replace(DEFAULT_CONFIG.runtime, max_raw_peaks=128,
                                max_troughs=128, max_candidates=64),
)


@pytest.mark.slow
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
    # Constant signal has no prominence-passing troughs -> static floor at
    # the envelope quantile (reference bpm_analysis.py:1073-1077).
    flat = jnp.ones(512) * 5.0
    res = noise_floor.dynamic_noise_floor(flat, 302, SMALL_CFG)
    assert int(res.trough_count) == 0
    np.testing.assert_allclose(np.asarray(res.floor), np.full(512, 5.0), rtol=1e-12)
