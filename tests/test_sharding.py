"""Multi-chip sharding tests on the virtual 8-device CPU mesh
(conftest sets --xla_force_host_platform_device_count=8)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bpm_analysis_tpu.config import DEFAULT_CONFIG, AnalyzerConfig, RuntimeConfig
from bpm_analysis_tpu.models import envelope as envm, pipeline
from bpm_analysis_tpu.ops import rolling
from bpm_analysis_tpu.parallel import mesh as mesh_mod, seqshard

pytestmark = pytest.mark.slow

TINY = AnalyzerConfig(runtime=RuntimeConfig(max_raw_peaks=512, max_troughs=512,
                                            max_candidates=256, dtype="float64"))


@pytest.fixture(scope="module")
def devices():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return devs


def _synthetic_batch(B, n, sr, seed=0):
    rng = np.random.RandomState(seed)
    t = np.arange(n) / sr
    out = []
    for b in range(B):
        bpm = 90 + 10 * b / B
        phase = np.cumsum(np.full(n, bpm / 60 / sr))
        sig = np.zeros(n)
        beats = np.nonzero(np.diff(np.floor(phase)) > 0)[0]
        sig[beats] = 1000.0
        s2 = beats + int(0.3 * 60 / bpm * sr)
        sig[s2[s2 < n]] = 500.0
        sig = np.convolve(sig, np.exp(-np.arange(30) / 6.0), mode="same")
        sig += rng.randn(n) * 5
        out.append(sig)
    return np.stack(out)


def test_dp_sharded_batch_matches_unsharded(devices):
    m = mesh_mod.make_mesh(devices)
    sr = 302
    B, n = 8, 302 * 30
    sig = _synthetic_batch(B, n, sr)
    envs = jax.vmap(lambda x: envm.envelope_from_filtered(x, sr))(jnp.asarray(sig))

    res_sharded = mesh_mod.analyze_batch_sharded(m, envs, sr, TINY)
    res_local = pipeline.analyze_batch(envs, sr, TINY)
    np.testing.assert_array_equal(np.asarray(res_sharded.final_count),
                                  np.asarray(res_local.final_count))
    np.testing.assert_allclose(np.asarray(res_sharded.metrics.avg_bpm),
                               np.asarray(res_local.metrics.avg_bpm), rtol=1e-12)

    stats = mesh_mod.fleet_summary(m, res_sharded)
    assert int(stats["recordings_ok"]) == B
    assert 80 < float(stats["mean_avg_bpm"]) < 110


def test_seqshard_envelope_matches_local(devices):
    m = mesh_mod.make_mesh(devices, sp=8)
    sr = 302
    n = 302 * 40  # divisible by 8
    n = (n // 8) * 8
    rng = np.random.RandomState(1)
    sig = jnp.asarray(rng.randn(n) * 100)
    window = sr // 10
    got = seqshard.sequence_sharded_envelope(m, sig, window)
    expected = rolling.rolling_mean_centered(jnp.abs(sig), window)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=1e-12)


def test_seqshard_batched(devices):
    m = mesh_mod.make_mesh(devices, sp=4)
    sr = 302
    n = (302 * 20 // 4) * 4
    rng = np.random.RandomState(2)
    sig = jnp.asarray(rng.randn(3, n) * 100)
    window = sr // 10
    got = seqshard.sequence_sharded_envelope(m, sig, window, batched=True)
    expected = jax.vmap(lambda x: rolling.rolling_mean_centered(jnp.abs(x), window))(sig)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=1e-12)


def test_seqshard_bandpass_filtfilt_matches_local(devices):
    from bpm_analysis_tpu.ops import filter as filt

    m = mesh_mod.make_mesh(devices, sp=8)
    sr = 302
    n = (302 * 40 // 8) * 8
    rng = np.random.RandomState(5)
    sig = jnp.asarray(rng.randn(n) * 100)
    got = seqshard.sequence_sharded_bandpass_filtfilt(m, sig, sr, 20.0, 150.0)
    expected = filt.bandpass_filtfilt(sig, sr, 20.0, 150.0)
    # The state relay is exact affine-carry arithmetic, but block boundaries
    # differ from the serial blocking, so float rounding differs at ~1e-12.
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=1e-9, atol=1e-9 * float(np.abs(expected).max()))


def test_seqshard_bandpass_filtfilt_batched(devices):
    from bpm_analysis_tpu.ops import filter as filt

    m = mesh_mod.make_mesh(devices, sp=4)
    sr = 302
    n = (302 * 20 // 4) * 4
    rng = np.random.RandomState(6)
    sig = jnp.asarray(rng.randn(3, n) * 100)
    got = seqshard.sequence_sharded_bandpass_filtfilt(m, sig, sr, 20.0, 150.0,
                                                      batched=True)
    expected = jax.vmap(lambda v: filt.bandpass_filtfilt(v, sr, 20.0, 150.0))(sig)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=1e-9, atol=1e-9 * float(np.abs(expected).max()))


def test_seqshard_noise_quantile_matches_local(devices):
    from bpm_analysis_tpu.ops import quantile as q

    m = mesh_mod.make_mesh(devices, sp=8)
    sr = 302
    stride = 8
    n = ((302 * 160) // (8 * stride)) * (8 * stride)
    rng = np.random.RandomState(3)
    x = rng.rand(n) * 10
    x[rng.rand(n) < 0.05] = np.nan  # missing entries, as in the trough series
    window = int(10.0 * sr)  # the reference's noise_window_sec * sr
    sig = jnp.asarray(x)

    got = seqshard.sequence_sharded_rolling_quantile(
        m, sig, window, 0.3, min_periods=3, stride=stride)
    expected = q.rolling_quantile_centered_strided(
        sig, window, 0.3, min_periods=3, stride=stride)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=1e-12, equal_nan=True)


def test_seqshard_noise_quantile_batched(devices):
    from bpm_analysis_tpu.ops import quantile as q

    m = mesh_mod.make_mesh(devices, sp=4)
    sr = 302
    stride = 8
    n = ((302 * 80) // (4 * stride)) * (4 * stride)
    rng = np.random.RandomState(4)
    x = rng.rand(2, n) * 10
    x[rng.rand(2, n) < 0.05] = np.nan
    window = int(10.0 * sr)
    sig = jnp.asarray(x)

    got = seqshard.sequence_sharded_rolling_quantile(
        m, sig, window, 0.3, min_periods=3, stride=stride, batched=True)
    expected = jax.vmap(lambda v: q.rolling_quantile_centered_strided(
        v, window, 0.3, min_periods=3, stride=stride))(sig)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=1e-12, equal_nan=True)
