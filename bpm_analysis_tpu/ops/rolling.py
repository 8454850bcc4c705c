"""Rolling-window kernels with exact pandas semantics, XLA-native.

The reference leans on ``pandas.Series.rolling`` for its envelope
(bpm_analysis.py:1054), deviation smoothing (:100), and BPM-curve smoothing
(:1479).  Pandas' centered integer window of size ``w`` covers
``[i - w//2, i + (w-1)//2]`` truncated at the edges (verified empirically —
see tests/test_rolling.py), and its time-based centered window ``'Xs'`` is
the half-open interval ``(t - X/2, t + X/2]`` (closed on the right).

TPU-first design: windowed sums use ``lax.reduce_window`` (the pooling
primitive — each output touches only its own window, so float32 stays exact
to ~1e-7 relative instead of suffering prefix-sum cancellation), and the
variable-window variants use prefix sums over short arrays where that is
numerically safe.  Everything is shape-static and vmappable.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def centered_bounds(window: int) -> tuple[int, int]:
    """Pandas center=True window extents: (left, right) s.t. the window at
    position i is [i-left, i+right]."""
    return window // 2, (window - 1) // 2


# Above this window size the shifted-adds formulation is emitted as a
# reduce_window instead: the unroll produces ``window`` HLO adds, which for a
# native-rate envelope window (e.g. 44.1 kHz -> 4410 adds) is a program-size /
# compile-time blow-up.  The bit-identical-across-padded-shapes contract the
# unroll exists for only matters at the decimated rate (~30-sample windows on
# the batched path), far below the cap.
_UNROLL_CAP = 256


def _windowed_sum_fixed_order(x: jnp.ndarray, window: int, left: int,
                              right: int) -> jnp.ndarray:
    """Windowed sum as ``window`` shifted elementwise adds in ascending
    sample order.  Unlike ``lax.reduce_window`` — whose in-window reduction
    tree the compiler may reassociate differently for different array
    lengths — elementwise dataflow has no reassociation freedom, so the sums
    are bit-identical across padded shapes.  That is the property the
    mixed-length batching contract rests on (tests/test_host_batch.py:
    serial vs bucket-padded artifacts byte-equal)."""
    if window > _UNROLL_CAP:
        return lax.reduce_window(
            x, jnp.zeros((), x.dtype), lax.add,
            window_dimensions=(window,), window_strides=(1,),
            padding=((left, right),))
    n = x.shape[0]
    xp = jnp.concatenate([jnp.zeros((left,), x.dtype), x,
                          jnp.zeros((right,), x.dtype)])
    acc = xp[0:n]
    for k in range(1, window):
        acc = acc + xp[k:k + n]
    return acc


def rolling_mean_centered(x: jnp.ndarray, window: int) -> jnp.ndarray:
    """pandas ``rolling(window, min_periods=1, center=True).mean()`` on a
    1-D array with no NaNs.  Edge windows are truncated (count shrinks)."""
    left, right = centered_bounds(window)
    n = x.shape[0]
    sums = _windowed_sum_fixed_order(x, window, left, right)
    idx = jnp.arange(n)
    counts = (jnp.minimum(idx + right, n - 1) - jnp.maximum(idx - left, 0) + 1).astype(x.dtype)
    return sums / counts


def rolling_mean_centered_masked(x: jnp.ndarray, valid: jnp.ndarray, window: int) -> jnp.ndarray:
    """Same as :func:`rolling_mean_centered` but NaN/invalid entries are
    excluded from both sum and count (pandas skips NaNs).  Output is NaN
    where a window holds no valid values (min_periods=1)."""
    left, right = centered_bounds(window)
    xz = jnp.where(valid, x, jnp.zeros((), x.dtype))
    sums = _windowed_sum_fixed_order(xz, window, left, right)
    counts = _windowed_sum_fixed_order(valid.astype(x.dtype), window, left, right)
    return jnp.where(counts > 0, sums / jnp.maximum(counts, 1), jnp.nan)


def rolling_mean_dynamic_window(x: jnp.ndarray, valid: jnp.ndarray, window) -> jnp.ndarray:
    """Centered rolling mean where ``window`` is a *traced* scalar.

    Needed for the deviation-series smoothing whose window is
    ``max(5, int(n_deviations * factor))`` (bpm_analysis.py:99) — data
    dependent under batching.  Uses masked prefix sums; intended for short
    arrays (thousands of elements) where float32 prefix sums are exact
    enough.  ``valid`` masks padded tail slots.
    """
    n = x.shape[0]
    window = jnp.asarray(window, jnp.int32)
    left = window // 2
    right = (window - 1) // 2
    xz = jnp.where(valid, x, 0).astype(x.dtype)
    csum = jnp.concatenate([jnp.zeros((1,), x.dtype), jnp.cumsum(xz)])
    ccnt = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(valid.astype(jnp.int32))]
    )
    idx = jnp.arange(n)
    # Truncate to the valid prefix: padded tail slots are invalid, and pandas
    # windows also truncate at the logical end of the series.
    nvalid = jnp.sum(valid.astype(jnp.int32))
    lo = jnp.clip(idx - left, 0, nvalid)
    hi = jnp.clip(idx + right + 1, 0, nvalid)
    sums = csum[hi] - csum[lo]
    counts = ccnt[hi] - ccnt[lo]
    out = jnp.where(counts > 0, sums / jnp.maximum(counts, 1).astype(x.dtype), jnp.nan)
    return jnp.where(valid, out, jnp.nan)


def rolling_mean_time_window(
    times: jnp.ndarray, values: jnp.ndarray, valid: jnp.ndarray,
    window_sec: float, max_slots_in_half_window: int | None = None,
) -> jnp.ndarray:
    """pandas time-based ``rolling('Xs', min_periods=1, center=True).mean()``
    over an irregularly-sampled series: window = (t - X/2, t + X/2], closed
    right (bpm_analysis.py:1479).

    ``times`` must be sorted ascending over its valid prefix; padded slots
    (``valid`` False) are excluded.  Short-array path (BPM curves, ~1e3
    points) using prefix sums.

    ``max_slots_in_half_window`` (static): when the caller can bound the
    inter-sample spacing from below (beat times are >= the peak-finder's
    NMS distance apart), the window membership spans at most that many
    slots per side, and the two searchsorteds (the op's dominant cost — ~11
    ns per scattered query-level gather on TPU) become dense shifted
    compares.  The hi/lo indices and the prefix-sum arithmetic are
    identical either way, so results are bit-identical.
    """
    half = window_sec / 2.0
    n = times.shape[0]
    nvalid = jnp.sum(valid.astype(jnp.int32))
    big = jnp.finfo(times.dtype).max
    t = jnp.where(valid, times, big)
    vz = jnp.where(valid, values, 0).astype(values.dtype)
    csum = jnp.concatenate([jnp.zeros((1,), values.dtype), jnp.cumsum(vz)])
    # (t - half, t + half]: left bound exclusive -> side='right' at t-half;
    # right bound inclusive -> side='right' at t+half.
    M = max_slots_in_half_window
    if M is not None and M < n:
        idx = jnp.arange(n, dtype=jnp.int32)
        cnt_next = jnp.zeros((n,), jnp.int32)
        cnt_prev = jnp.zeros((n,), jnp.int32)
        pos_inf = jnp.array(jnp.inf, t.dtype)
        neg_inf = jnp.array(-jnp.inf, t.dtype)
        for m in range(1, M + 1):
            nxt = jnp.concatenate([t[m:], jnp.full((m,), pos_inf, t.dtype)])
            cnt_next += (nxt <= t + half).astype(jnp.int32)
            prv = jnp.concatenate([jnp.full((m,), neg_inf, t.dtype), t[:-m]])
            cnt_prev += (prv > t - half).astype(jnp.int32)
        hi = idx + 1 + cnt_next
        lo = idx - cnt_prev
    else:
        lo = jnp.searchsorted(t, t - half, side="right")
        hi = jnp.searchsorted(t, t + half, side="right")
    hi = jnp.clip(hi, 0, nvalid)
    lo = jnp.clip(lo, 0, nvalid)
    sums = csum[hi] - csum[lo]
    counts = (hi - lo).astype(values.dtype)
    out = jnp.where(counts > 0, sums / jnp.maximum(counts, 1), jnp.nan)
    return jnp.where(valid, out, jnp.nan)
