"""Pallas strided-quantile kernel vs the XLA reference implementation
(interpret mode on CPU; the real-TPU path is exercised by bench.py)."""
import numpy as np
import jax.numpy as jnp
import pytest

from bpm_analysis_tpu.ops import quantile
from bpm_analysis_tpu.ops.pallas import quantile_kernel as qk


@pytest.mark.parametrize("window,stride", [
    (603, 8),
    pytest.param(301, 4, marks=pytest.mark.slow),  # twin per tier
])
def test_pallas_matches_xla_strided(window, stride):
    rng = np.random.RandomState(0)
    x = np.abs(rng.randn(2, 3000).astype(np.float32)) * 100
    x[0, :40] = np.nan
    got = np.asarray(qk.rolling_quantile_strided_pallas(
        jnp.asarray(x), window, 0.2, 3, stride=stride, interpret=True))
    exp = np.stack([
        np.asarray(quantile.rolling_quantile_centered_strided(
            jnp.asarray(x[i]), window, 0.2, 3, stride=stride))
        for i in range(2)
    ])
    np.testing.assert_allclose(got, exp, rtol=1e-6, equal_nan=True)


def test_pallas_single_recording_shape():
    rng = np.random.RandomState(1)
    x = np.abs(rng.randn(2500).astype(np.float32))
    got = qk.rolling_quantile_strided_pallas(jnp.asarray(x), 301, 0.5, 1,
                                             stride=8, interpret=True)
    assert got.shape == (2500,)
