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


def _synthetic_env(n=40_000, seed=0):
    rng = np.random.RandomState(seed)
    t = np.arange(n) / 302.0
    env = (80 + 60 * np.sin(2 * np.pi * t / 7.0)
           + np.abs(rng.randn(n)) * 25).astype(np.float32)
    return jnp.asarray(env)


@pytest.mark.slow
@pytest.mark.parametrize("stride,knots_backend", [
    (32, "knots"), (64, "knots"), (64, "knots_pallas")])
def test_knots_backend_matches_strided_xla(stride, knots_backend):
    """The knot-domain quantile computes the same strided noise floor as the
    dense XLA path — closed-form segment counting vs materialized window
    rank-selection — to float32 rounding, with the identical sanitized
    trough set.  Covers both lowerings: ops/knot_quantile.py (XLA) and the
    fused VMEM-resident Pallas kernel (ops/pallas/knot_kernel.py, interpret
    mode on CPU)."""
    env = _synthetic_env()

    def run(backend):
        cfg = dataclasses.replace(
            DEFAULT_CONFIG,
            runtime=dataclasses.replace(
                DEFAULT_CONFIG.runtime, noise_quantile_stride=stride,
                quantile_backend=backend, dtype="float32"))
        return noise_floor.dynamic_noise_floor(env, 302, cfg)

    a, b = run("xla"), run(knots_backend)
    assert int(a.trough_count) == int(b.trough_count)
    np.testing.assert_array_equal(np.asarray(a.trough_positions),
                                  np.asarray(b.trough_positions))
    fa, fb = np.asarray(a.floor), np.asarray(b.floor)
    np.testing.assert_allclose(fb, fa, rtol=3e-5, atol=1e-3)


@pytest.mark.slow
def test_knots_backend_masked_prefix():
    """Padded run with traced n_valid == unpadded run on the valid prefix
    (the host_batch masking contract, knots backend)."""
    env = _synthetic_env(30_000, seed=3)
    cfg = dataclasses.replace(
        DEFAULT_CONFIG,
        runtime=dataclasses.replace(
            DEFAULT_CONFIG.runtime, noise_quantile_stride=64,
            quantile_backend="knots", dtype="float32"))
    ref = noise_floor.dynamic_noise_floor(env, 302, cfg)
    padded = jnp.concatenate([env, jnp.zeros(4096, env.dtype)])
    got = noise_floor.dynamic_noise_floor(padded, 302, cfg,
                                          n_valid=jnp.asarray(env.shape[0]))
    count = int(ref.trough_count)
    assert int(got.trough_count) == count
    np.testing.assert_array_equal(np.asarray(got.trough_positions)[:count],
                                  np.asarray(ref.trough_positions)[:count])
    n = env.shape[0]
    np.testing.assert_allclose(np.asarray(got.floor)[:n],
                               np.asarray(ref.floor), rtol=3e-5, atol=1e-3)


def test_knots_backend_few_troughs_fallback():
    flat = jnp.ones(512) * 5.0
    cfg = dataclasses.replace(
        SMALL_CFG,
        runtime=dataclasses.replace(SMALL_CFG.runtime,
                                    noise_quantile_stride=64,
                                    quantile_backend="knots"))
    res = noise_floor.dynamic_noise_floor(flat, 302, cfg)
    assert int(res.trough_count) == 0
    np.testing.assert_allclose(np.asarray(res.floor), np.full(512, 5.0), rtol=1e-6)
