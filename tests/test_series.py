import numpy as np
import pandas as pd
import pytest
import jax.numpy as jnp

from bpm_analysis_tpu.ops import series


def test_interpolate_dense_matches_pandas():
    n, cap = 100, 32
    pos = np.array([5, 10, 11, 40, 77])
    val = np.array([1.0, 3.0, -2.0, 8.0, 0.5])
    expected = pd.Series(val, index=pos).reindex(np.arange(n)).interpolate().values
    kp = np.full(cap, 0)
    kv = np.zeros(cap)
    kp[: len(pos)] = pos
    kv[: len(val)] = val
    got = np.asarray(
        series.interpolate_dense(jnp.asarray(kp), jnp.asarray(kv), len(pos), n, dtype=jnp.float64)
    )
    np.testing.assert_allclose(got, expected, rtol=1e-12, equal_nan=True)


def test_interpolate_dense_on_vulpine(oracle):
    troughs = oracle["all_troughs"]
    env = oracle["envelope"]
    n = len(env)
    cap = 4096
    kp = np.full(cap, 0)
    kp[: len(troughs)] = troughs
    kv = np.zeros(cap)
    kv[: len(troughs)] = env[troughs]
    got = np.asarray(
        series.interpolate_dense(jnp.asarray(kp), jnp.asarray(kv), len(troughs), n,
                                 dtype=jnp.float64)
    )
    np.testing.assert_allclose(got, oracle["dense_troughs"], rtol=1e-12, equal_nan=True)


@pytest.mark.parametrize(
    "n,spacing,seed",
    [
        # Two fast cases cover both spacing regimes (each is a distinct
        # compile, ~5 s apiece on CPU): below the 128-sample block size with
        # a ragged tail, and above it.
        (4999, 84, 1),
        (1000, 150, 2),
        pytest.param(5000, 37, 0, marks=pytest.mark.slow),
        pytest.param(301, 20, 3, marks=pytest.mark.slow),
    ],
)
def test_interpolate_dense_spacing_kernel(n, spacing, seed):
    """The spacing-aware block kernel must match pandas exactly whenever its
    spacing precondition holds (adjacent knots >= min_spacing apart) — across
    spacings above/below the 128-sample block size and ragged tails."""
    rng = np.random.RandomState(seed)
    gaps = rng.randint(spacing, spacing + 120, size=200)
    pos = np.cumsum(gaps) + rng.randint(0, spacing)
    pos = pos[pos < n]
    val = rng.randn(len(pos))
    expected = pd.Series(val, index=pos).reindex(np.arange(n)).interpolate().values
    cap = 256
    kp = np.full(cap, 0)
    kv = np.zeros(cap)
    kp[: len(pos)] = pos
    kv[: len(val)] = val
    got = np.asarray(series.interpolate_dense(
        jnp.asarray(kp), jnp.asarray(kv), len(pos), n, dtype=jnp.float64,
        min_spacing=spacing))
    np.testing.assert_allclose(got, expected, rtol=1e-12, equal_nan=True)


def test_interpolate_dense_no_knots():
    # Degenerate: no knots -> all NaN.
    got = np.asarray(series.interpolate_dense(
        jnp.zeros(16, jnp.int32), jnp.zeros(16), 0, 200, dtype=jnp.float64,
        min_spacing=10))
    assert np.all(np.isnan(got))


def test_asof():
    idx = np.array([1.0, 2.0, 3.0])
    val = np.array([10.0, 20.0, 30.0])
    cap = 8
    ip = np.zeros(cap)
    vp = np.zeros(cap)
    ip[:3] = idx
    vp[:3] = val
    q = np.array([0.5, 1.0, 2.5, 9.0])
    got = np.asarray(series.asof(jnp.asarray(ip), jnp.asarray(vp), 3, jnp.asarray(q)))
    np.testing.assert_allclose(got, [np.nan, 10.0, 20.0, 30.0], equal_nan=True)


def test_masked_quantile_and_median():
    rng = np.random.RandomState(0)
    x = rng.rand(50)
    cap = 64
    xp = np.zeros(cap)
    xp[:50] = x
    valid = np.arange(cap) < 50
    for q in (0.2, 0.25, 0.5, 0.75):
        got = float(series.masked_quantile(jnp.asarray(xp), jnp.asarray(valid), q))
        np.testing.assert_allclose(got, np.quantile(x, q), rtol=1e-12)
    got = float(series.masked_median(jnp.asarray(xp), jnp.asarray(valid)))
    np.testing.assert_allclose(got, np.median(x), rtol=1e-12)
