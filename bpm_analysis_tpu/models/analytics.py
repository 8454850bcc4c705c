"""On-device analytics: BPM curve, HRV, HRR, exertion/recovery slopes.

Reference: bpm_analysis.py:1414-1620 (``calculate_windowed_hrv``,
``calculate_bpm_series``, ``find_major_hr_inclines/declines``,
``find_peak_recovery_rate``, ``find_peak_exertion_rate``, ``calculate_hrr``,
``find_recovery_phase``) and the aggregator ``_calculate_final_metrics``
(:1701-1722).

All functions are shape-static over fixed-capacity arrays + counts and
vmappable.  The reference's O(n²) "steepest fixed-window slope" searches
(:1552-1595) become vectorized ``searchsorted`` sweeps (identical results:
the window end is the first sample ≥ 20 s ahead, the extremum is the first
strict max/min, matching the Python loop's strict comparisons).

Reference quirk reproduced behind ``compat.hrr_truncated_interp`` (default
True): ``calculate_hrr`` feeds integer-truncated epoch seconds with
duplicate x-values into ``np.interp`` (:1606) — equivalent to flooring the
beat times to whole seconds (whole-second timezone offsets cancel).  The
shipped vulpine summary value 58.9 requires the floor; a clean float-second
interpolation of the same golden curve gives 61.2 (flag False; see
tests/test_analytics.py).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..config import AnalyzerConfig
from ..ops import rolling
from ..ops import find_peaks as fp
from ..ops import series


class BpmSeries(NamedTuple):
    times: jnp.ndarray     # (cap,) seconds of beats 1..count
    smoothed: jnp.ndarray  # (cap,) time-smoothed BPM
    instant: jnp.ndarray   # (cap,) raw instantaneous BPM
    count: jnp.ndarray


class SlopeStats(NamedTuple):
    found: jnp.ndarray
    start_time: jnp.ndarray
    end_time: jnp.ndarray
    start_bpm: jnp.ndarray
    end_bpm: jnp.ndarray
    slope: jnp.ndarray
    duration: jnp.ndarray


class SlopeList(NamedTuple):
    start_time: jnp.ndarray  # (cap,) sorted by |slope| descending
    end_time: jnp.ndarray
    start_bpm: jnp.ndarray
    end_bpm: jnp.ndarray
    duration: jnp.ndarray
    bpm_change: jnp.ndarray
    slope: jnp.ndarray
    count: jnp.ndarray


class HrvResult(NamedTuple):
    time: jnp.ndarray     # (cap,) window midpoint seconds
    rmssdc: jnp.ndarray
    sdnn: jnp.ndarray
    bpm: jnp.ndarray
    count: jnp.ndarray


class HrrStats(NamedTuple):
    found: jnp.ndarray
    peak_bpm: jnp.ndarray
    peak_time: jnp.ndarray
    recovery_bpm: jnp.ndarray
    hrr: jnp.ndarray


class Metrics(NamedTuple):
    bpm: BpmSeries
    hrv: HrvResult
    hrr: HrrStats
    peak_exertion: SlopeStats
    peak_recovery: SlopeStats
    inclines: SlopeList
    declines: SlopeList
    avg_bpm: jnp.ndarray
    min_bpm: jnp.ndarray
    max_bpm: jnp.ndarray
    avg_rmssdc: jnp.ndarray
    avg_sdnn: jnp.ndarray


def bpm_series(positions: jnp.ndarray, count, sample_rate: int,
               cfg: AnalyzerConfig, dtype) -> BpmSeries:
    """``calculate_bpm_series`` (bpm_analysis.py:1463-1484): instantaneous
    BPM at each beat after the first, smoothed by a centered 5 s time window
    (closed right).  Diffs ≤ 1e-6 s are dropped."""
    cap = positions.shape[0]
    n_big = jnp.iinfo(jnp.int32).max
    slot = jnp.arange(cap)
    pos = jnp.where(slot < count, positions, n_big)
    t = pos.astype(dtype) / sample_rate
    diffs = t[1:] - t[:-1]
    dvalid = (slot[:-1] < count - 1) & (diffs > 1e-6)
    inst = 60.0 / jnp.where(dvalid, diffs, 1.0)
    times = t[1:]
    # compact valid diffs to the front, keeping time order — rank-scatter
    # (cumsum + one scatter per array) instead of a device argsort
    rank = jnp.cumsum(dvalid.astype(jnp.int32)) - 1
    write = jnp.where(dvalid, rank, cap)          # cap = out of bounds, dropped
    vcount = jnp.sum(dvalid.astype(jnp.int32))
    ctimes = jnp.full((cap,), jnp.nan, dtype).at[write].set(times, mode="drop")
    cinst = jnp.full((cap,), jnp.nan, dtype).at[write].set(inst, mode="drop")
    valid = slot < vcount

    # Reference guard: smoothing only if median BPM > 0 — always true when
    # any valid diff exists.
    # Beat times are >= the peak-finder NMS distance apart, which bounds the
    # smoothing window's slot span and unlocks the gather-free path.
    import math

    dt_min = max(int(cfg.features.min_peak_distance_sec * sample_rate), 1) / sample_rate
    m_bound = int(math.ceil(cfg.output.output_smoothing_window_sec / 2 / dt_min)) + 1
    smoothed = rolling.rolling_mean_time_window(
        ctimes, cinst, valid, cfg.output.output_smoothing_window_sec,
        max_slots_in_half_window=m_bound if m_bound <= 128 else None,
    )
    return BpmSeries(times=ctimes, smoothed=smoothed, instant=cinst, count=vcount)


def _first_at_or_after(times, valid_count, targets):
    """First index i with times[i] >= target (times sorted, padded +inf)."""
    t = jnp.where(jnp.arange(times.shape[0]) < valid_count, times, jnp.inf)
    return jnp.searchsorted(t, targets, side="left")


def steepest_slope(bpm: BpmSeries, window_sec: float, direction: int,
                   start_slot=0) -> SlopeStats:
    """``find_peak_exertion_rate`` (direction=+1, whole series) /
    ``find_peak_recovery_rate`` (direction=-1, from the global max onward)
    — steepest slope over the first window ≥ ``window_sec`` ahead
    (bpm_analysis.py:1552-1595)."""
    cap = bpm.times.shape[0]
    slot = jnp.arange(cap)
    valid = slot < bpm.count
    t = jnp.where(valid, bpm.times, jnp.inf)
    v = bpm.smoothed

    start_slot = jnp.asarray(start_slot, jnp.int32)
    in_range = valid & (slot >= start_slot)
    # Reference rebases times to the segment start and requires the segment
    # to span >= window_sec (:1558-1559).
    t0 = t[jnp.minimum(start_slot, cap - 1)]
    last_t = t[jnp.maximum(bpm.count - 1, 0)]
    long_enough = (bpm.count - start_slot >= 2) & (last_t - t0 >= window_sec)

    end_idx = _first_at_or_after(t, bpm.count, t + window_sec)
    has_end = end_idx < bpm.count
    end_c = jnp.clip(end_idx, 0, cap - 1)
    duration = t[end_c] - t
    ok = in_range & has_end & (duration > 0) & (slot < bpm.count - 1)
    slope = (v[end_c] - v) / jnp.where(ok, duration, 1.0)
    eff = jnp.where(ok, slope * direction, -jnp.inf)
    best = jnp.argmax(eff)
    found = long_enough & (eff[best] > 0)  # strict: loop starts at 0
    return SlopeStats(
        found=found,
        start_time=t[best],
        end_time=t[end_c[best]],
        start_bpm=v[best],
        end_bpm=v[end_c[best]],
        slope=slope[best],
        duration=duration[best],
    )


def peak_recovery(bpm: BpmSeries, cfg: AnalyzerConfig) -> SlopeStats:
    idxmax = jnp.argmax(jnp.where(jnp.arange(bpm.times.shape[0]) < bpm.count,
                                  bpm.smoothed, -jnp.inf))
    return steepest_slope(bpm, cfg.output.slope_window_sec, -1, start_slot=idxmax)


def peak_exertion(bpm: BpmSeries, cfg: AnalyzerConfig) -> SlopeStats:
    return steepest_slope(bpm, cfg.output.slope_window_sec, +1)


def slope_extrema(bpm: BpmSeries, cfg: AnalyzerConfig, capacity: int = 64):
    """Peak/trough sets of the smoothed BPM curve for the major-slope scans
    (bpm_analysis.py:1496-1497,1529-1530) — shared between the incline and
    decline passes, which the reference computes twice on the same curve."""
    o = cfg.output
    cap = bpm.times.shape[0]
    slot = jnp.arange(cap)
    valid = slot < bpm.count
    t = jnp.where(valid, bpm.times, jnp.inf)
    v = jnp.where(valid, bpm.smoothed, jnp.nan)

    dt = t[1:] - t[:-1]
    dt_valid = slot[:-1] < bpm.count - 1
    mean_dt = jnp.nanmean(jnp.where(dt_valid, dt, jnp.nan))
    dist = jnp.where(
        jnp.isnan(mean_dt) | (mean_dt == 0), 5,
        (o.incline_min_duration_sec / 2 / jnp.where(mean_dt == 0, 1.0, mean_dt)).astype(jnp.int32),
    )
    vv = jnp.where(valid, bpm.smoothed, v[jnp.maximum(bpm.count - 1, 0)])
    pk = fp.find_peaks(vv, capacity, prominence=o.slope_peak_prominence, distance=dist)
    tr = fp.find_peaks(-vv, capacity, prominence=o.slope_peak_prominence, distance=dist)
    return pk, tr


def major_slopes(bpm: BpmSeries, cfg: AnalyzerConfig, declines: bool,
                 capacity: int = 64, extrema=None) -> SlopeList:
    """``find_major_hr_inclines/declines`` (bpm_analysis.py:1486-1550):
    trough→next-peak (incline) or peak→next-trough (decline) segments with
    duration ≥ 10 s and |ΔBPM| ≥ 15, sorted by slope steepness."""
    o = cfg.output
    cap = bpm.times.shape[0]
    slot = jnp.arange(cap)
    valid = slot < bpm.count
    t = jnp.where(valid, bpm.times, jnp.inf)
    v = jnp.where(valid, bpm.smoothed, jnp.nan)

    pk, tr = extrema if extrema is not None else slope_extrema(bpm, cfg, capacity)

    starts, ends = (pk, tr) if declines else (tr, pk)
    s_slot = jnp.arange(capacity)
    s_valid = s_slot < starts.count
    s_pos = jnp.where(s_valid, starts.positions, cap)
    e_padded = jnp.where(jnp.arange(capacity) < ends.count, ends.positions, cap)
    nxt = jnp.searchsorted(e_padded, s_pos, side="right")
    has_next = nxt < ends.count
    e_pos = e_padded[jnp.clip(nxt, 0, capacity - 1)]

    s_c = jnp.clip(s_pos, 0, cap - 1)
    e_c = jnp.clip(e_pos, 0, cap - 1)
    duration = t[e_c] - t[s_c]
    change = v[e_c] - v[s_c]
    magnitude = jnp.where(declines, -change, change)
    ok = (s_valid & has_next & (ends.count > 0) & (starts.count > 0)
          & (duration >= o.incline_min_duration_sec)
          & (magnitude >= o.incline_min_bpm_change) & (bpm.count >= 2))
    slope = change / jnp.where(duration > 0, duration, 1.0)

    sort_key = jnp.where(ok, jnp.where(declines, slope, -slope), jnp.inf)
    order = jnp.argsort(sort_key, stable=True)
    cnt = jnp.sum(ok.astype(jnp.int32))

    def take(x):
        return jnp.where(jnp.arange(capacity) < cnt, x[order], jnp.nan)

    return SlopeList(
        start_time=take(t[s_c]), end_time=take(t[e_c]),
        start_bpm=take(v[s_c]), end_bpm=take(v[e_c]),
        duration=take(duration), bpm_change=take(change), slope=take(slope),
        count=cnt,
    )


def hrr(bpm: BpmSeries, cfg: AnalyzerConfig) -> HrrStats:
    """1-minute heart-rate recovery (bpm_analysis.py:1597-1610).

    With ``compat.hrr_truncated_interp`` (default) the interpolation
    x-coordinates are the beat times floored to whole seconds, reproducing
    the reference's integer-truncated epoch-second ``np.interp`` call
    (:1606) and the golden vulpine value of 58.9; otherwise clean
    float-second interpolation (see module docstring)."""
    cap = bpm.times.shape[0]
    valid = jnp.arange(cap) < bpm.count
    v = jnp.where(valid, bpm.smoothed, -jnp.inf)
    t = jnp.where(valid, bpm.times, jnp.inf)
    imax = jnp.argmax(v)
    peak_bpm = v[imax]
    peak_time = t[imax]
    check_time = peak_time + cfg.output.hrr_interval_sec
    last_t = t[jnp.maximum(bpm.count - 1, 0)]
    found = (bpm.count >= 2) & (check_time <= last_t)
    tq = jnp.where(valid, bpm.times, last_t)
    if cfg.compat.hrr_truncated_interp:
        tq = jnp.floor(tq)
    vq = jnp.where(valid, bpm.smoothed, v[jnp.maximum(bpm.count - 1, 0)])
    recovery_bpm = jnp.interp(check_time, tq, vq)
    return HrrStats(found=found, peak_bpm=peak_bpm, peak_time=peak_time,
                    recovery_bpm=recovery_bpm, hrr=peak_bpm - recovery_bpm)


def windowed_hrv(positions: jnp.ndarray, count, sample_rate: int,
                 cfg: AnalyzerConfig, dtype, capacity: int = 512) -> HrvResult:
    """``calculate_windowed_hrv`` (bpm_analysis.py:1414-1461): sliding
    window of ``hrv_window_size_beats`` RR intervals, step
    ``hrv_step_size_beats``; SDNN (population std, ms), RMSSD, RMSSDc
    (= RMSSD_ms / mean_RR_sec — the reference's unit mix, reproduced
    as-is), window BPM; emitted at the window midpoint time."""
    w = cfg.output.hrv_window_size_beats
    step = cfg.output.hrv_step_size_beats
    cap = positions.shape[0]
    slot = jnp.arange(cap)
    t = jnp.where(slot < count, positions, 0).astype(dtype) / sample_rate
    rr_ms = (t[1:] - t[:-1]) * 1000.0

    n_rr = jnp.maximum(count - 1, 0)
    starts = jnp.arange(capacity) * step
    wvalid = (starts + w <= n_rr) & (count >= w)
    idx = jnp.clip(starts[:, None] + jnp.arange(w)[None, :], 0, cap - 2)
    win = rr_ms[idx]                                   # (capacity, w)
    mean_rr = jnp.mean(win, axis=1)
    sdnn = jnp.std(win, axis=1)
    sd = win[:, 1:] - win[:, :-1]
    rmssd = jnp.sqrt(jnp.mean(sd ** 2, axis=1))
    mean_rr_sec = mean_rr / 1000.0
    rmssdc = jnp.where(mean_rr_sec > 0, rmssd / mean_rr_sec, 0.0)
    wbpm = jnp.where(mean_rr_sec > 0, 60.0 / mean_rr_sec, 0.0)
    mid = (t[jnp.clip(starts, 0, cap - 1)] + t[jnp.clip(starts + w, 0, cap - 1)]) / 2.0

    nwin = jnp.sum(wvalid.astype(jnp.int32))

    def mask(x):
        return jnp.where(wvalid, x, jnp.nan)

    return HrvResult(time=mask(mid), rmssdc=mask(rmssdc), sdnn=mask(sdnn),
                     bpm=mask(wbpm), count=nwin)


def compute_metrics(positions: jnp.ndarray, count, sample_rate: int,
                    cfg: AnalyzerConfig, dtype) -> Metrics:
    """``_calculate_final_metrics`` (bpm_analysis.py:1701-1722)."""
    bpm = bpm_series(positions, count, sample_rate, cfg, dtype)
    hrv = windowed_hrv(positions, count, sample_rate, cfg, dtype)
    cap = bpm.times.shape[0]
    valid = jnp.arange(cap) < bpm.count
    sm = jnp.where(valid, bpm.smoothed, jnp.nan)
    nonempty = bpm.count > 0
    avg = jnp.where(nonempty, jnp.nanmean(sm), jnp.nan)
    mn = jnp.where(nonempty, jnp.nanmin(sm), jnp.nan)
    mx = jnp.where(nonempty, jnp.nanmax(sm), jnp.nan)
    hrv_nonempty = hrv.count > 0
    avg_rmssdc = jnp.where(hrv_nonempty, jnp.nanmean(hrv.rmssdc), jnp.nan)
    avg_sdnn = jnp.where(hrv_nonempty, jnp.nanmean(hrv.sdnn), jnp.nan)
    slope_ext = slope_extrema(bpm, cfg)
    return Metrics(
        bpm=bpm,
        hrv=hrv,
        hrr=hrr(bpm, cfg),
        peak_exertion=peak_exertion(bpm, cfg),
        peak_recovery=peak_recovery(bpm, cfg),
        inclines=major_slopes(bpm, cfg, declines=False, extrema=slope_ext),
        declines=major_slopes(bpm, cfg, declines=True, extrema=slope_ext),
        avg_bpm=avg, min_bpm=mn, max_bpm=mx,
        avg_rmssdc=avg_rmssdc, avg_sdnn=avg_sdnn,
    )


def recovery_phase(bpm: BpmSeries, cfg: AnalyzerConfig):
    """``find_recovery_phase`` (bpm_analysis.py:1612-1620): peak-BPM time of
    the preliminary smoothed series, recovery window end = +120 s.  Returns
    (peak_time, end_time, valid)."""
    cap = bpm.times.shape[0]
    valid = jnp.arange(cap) < bpm.count
    v = jnp.where(valid, bpm.smoothed, -jnp.inf)
    imax = jnp.argmax(v)
    peak_time = bpm.times[imax]
    ok = bpm.count >= 2
    return peak_time, peak_time + cfg.pairing.recovery_phase_duration_sec, ok
