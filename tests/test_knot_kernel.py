"""Pallas knot-domain quantile kernel vs the XLA knot-quantile reference
(interpret mode on CPU; the real-TPU path is exercised by bench.py).

The kernel fuses dense interpolation + strided rolling quantile into one
VMEM-resident bit-prefix descent (ops/pallas/knot_kernel.py); the oracle is
``ops/knot_quantile.rolling_quantile_knots``, itself equality-tested against
the dense pandas-exact path in tests/test_noise_floor.py.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from bpm_analysis_tpu.ops import knot_quantile as kq
from bpm_analysis_tpu.ops.pallas import knot_kernel as kk


def _random_knots(rng, n, cap, min_spacing, count):
    """Sorted positions >= min_spacing apart, padded with n past count."""
    gaps = rng.randint(min_spacing, 3 * min_spacing, size=count)
    pos = np.minimum(np.cumsum(gaps) - gaps[0], n - 1)
    pos = np.unique(pos)[:count]
    count = len(pos)
    full = np.full(cap, n, np.int32)
    full[:count] = pos
    val = np.zeros(cap, np.float32)
    val[:count] = np.abs(rng.randn(count)).astype(np.float32) * 120
    return full, val, count


@pytest.mark.parametrize("window,stride,min_spacing", [
    (603, 8, 30),
    pytest.param(301, 4, 45, marks=pytest.mark.slow),
])
def test_knot_kernel_matches_xla_knots(window, stride, min_spacing):
    rng = np.random.RandomState(0)
    n, cap, B = 6000, 128, 3
    pos_b, val_b, cnt_b = [], [], []
    for b, count in enumerate([90, 40, 7]):
        p, v, c = _random_knots(rng, n, cap, min_spacing, count)
        pos_b.append(p)
        val_b.append(v)
        cnt_b.append(c)
    pos = jnp.asarray(np.stack(pos_b))
    val = jnp.asarray(np.stack(val_b))
    cnt = jnp.asarray(np.array(cnt_b, np.int32))

    got = np.asarray(kk.knot_quantile_anchors_pallas(
        pos, val, cnt, n, window, 0.2, min_periods=3, stride=stride,
        min_spacing=min_spacing, interpret=True))
    exp = np.stack([
        np.asarray(kq.rolling_quantile_knots(
            pos[i], val[i], cnt[i], n, window, 0.2, min_periods=3,
            stride=stride, min_spacing=min_spacing))
        for i in range(B)
    ])
    assert got.shape == exp.shape
    np.testing.assert_allclose(got, exp, rtol=3e-6, atol=1e-3, equal_nan=True)


def test_knot_kernel_masked_prefix():
    """Traced n_valid: dense positions past the horizon are missing, matching
    the host_batch padded-batch contract (same as the XLA knots path)."""
    rng = np.random.RandomState(3)
    n, cap = 5000, 64
    n_valid = 3500
    p, v, c = _random_knots(rng, n_valid - 10, cap, 40, 55)
    pos = jnp.asarray(p[None])
    val = jnp.asarray(v[None])
    cnt = jnp.asarray(np.array([c], np.int32))
    nv = jnp.asarray(np.array([n_valid], np.int32))

    got = np.asarray(kk.knot_quantile_anchors_pallas(
        pos, val, cnt, n, 603, 0.2, min_periods=3, stride=8,
        min_spacing=40, n_valid=nv, interpret=True))[0]
    exp = np.asarray(kq.rolling_quantile_knots(
        pos[0], val[0], cnt[0], n, 603, 0.2, min_periods=3, stride=8,
        min_spacing=40, n_valid=nv[0]))
    np.testing.assert_allclose(got, exp, rtol=3e-6, atol=1e-3, equal_nan=True)


def test_knot_kernel_no_knots():
    pos = jnp.full((1, 32), 4000, jnp.int32)
    val = jnp.zeros((1, 32), jnp.float32)
    got = np.asarray(kk.knot_quantile_anchors_pallas(
        pos, val, jnp.zeros((1,), jnp.int32), 4000, 301, 0.2,
        min_periods=3, stride=8, min_spacing=30, interpret=True))
    assert np.isnan(got).all()


def test_knot_kernel_first_knot_past_zero():
    """Anchors whose windows sit entirely/partially BEFORE the first knot
    (base clamps to 0 in the kernel, index -1 masks in the XLA path): the
    first knot starts well past 0 so the pre-first-knot NaN region and the
    first interpolating segment are both exercised against the oracle."""
    rng = np.random.RandomState(7)
    n, cap, window, stride, min_spacing = 6000, 64, 603, 8, 30
    count = 40
    gaps = rng.randint(min_spacing, 3 * min_spacing, size=count)
    pos_np = np.minimum(2 * window + np.cumsum(gaps), n - 1)  # first ~2*window
    pos_np = np.unique(pos_np)[:count]
    count = len(pos_np)
    full = np.full(cap, n, np.int32)
    full[:count] = pos_np
    val = np.zeros(cap, np.float32)
    val[:count] = np.abs(rng.randn(count)).astype(np.float32) * 120

    pos = jnp.asarray(full[None])
    vals = jnp.asarray(val[None])
    cnt = jnp.asarray(np.array([count], np.int32))
    got = np.asarray(kk.knot_quantile_anchors_pallas(
        pos, vals, cnt, n, window, 0.2, min_periods=3, stride=stride,
        min_spacing=min_spacing, interpret=True))[0]
    exp = np.asarray(kq.rolling_quantile_knots(
        pos[0], vals[0], cnt[0], n, window, 0.2, min_periods=3,
        stride=stride, min_spacing=min_spacing))
    # The pre-first-knot region must include NaN anchors on both paths.
    assert np.isnan(exp[: window // (2 * stride)]).any()
    np.testing.assert_allclose(got, exp, rtol=3e-6, atol=1e-3, equal_nan=True)
