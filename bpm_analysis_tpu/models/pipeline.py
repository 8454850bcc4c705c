"""Single-recording analysis pipeline — the device-side orchestrator.

Mirrors ``analyze_wav_file`` (bpm_analysis.py:1725-1768):

  STAGE 1   envelope + dynamic noise floor
  STAGE 2   preliminary high-confidence pass → start BPM + recovery window
  STAGE 3   main classification scan
  STAGE 4+5 rhythmic + iterative gap/conflict corrections
  STAGE 6   metrics (BPM curve, HRV, HRR, slopes)

Everything below PCM ingest is one traced JAX program (jit/vmap/pjit-able);
file I/O, FFmpeg and report rendering stay on host (north-star split,
BASELINE.json).

The ``start_bpm_hint`` is a traced scalar: NaN means "no hint", reproducing
the reference's ``hint or estimate or 80.0`` falsiness chain (a 0.0 hint also
falls through, bpm_analysis.py:1647).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import AnalyzerConfig
from ..ops import find_peaks as fp
from ..ops import quantile as quantile_ops
from ..ops import series
from .. import types
from . import analytics, classifier, corrections, noise_floor
from . import envelope as envm


class PipelineResult(NamedTuple):
    floor: jnp.ndarray
    trough_positions: jnp.ndarray
    trough_count: jnp.ndarray
    raw_peak_positions: jnp.ndarray
    raw_peak_count: jnp.ndarray
    start_bpm: jnp.ndarray
    peak_bpm_time: jnp.ndarray      # NaN when no recovery phase found
    recovery_end_time: jnp.ndarray
    trace: classifier.ClassifierTrace
    smoothed_deviation: jnp.ndarray
    classes: jnp.ndarray            # final (post-correction) class per raw peak
    precorrection_classes: jnp.ndarray
    s1_positions: jnp.ndarray       # post-classification, pre-correction
    s1_count: jnp.ndarray
    final_positions: jnp.ndarray    # post-correction S1 peaks
    final_count: jnp.ndarray
    metrics: analytics.Metrics
    ok: jnp.ndarray                 # >= 2 final peaks (reference returns None otherwise)
    overflowed: jnp.ndarray         # () bool: some fixed capacity truncated data
                                    # (max_raw_peaks/max_troughs/max_candidates)
                                    # — output may silently omit events; the
                                    # host surface raises (host.py)


def raw_peaks(envelope: jnp.ndarray, floor: jnp.ndarray, sample_rate: int,
              cfg: AnalyzerConfig, n_valid=None, env_tables=None,
              extrema=None) -> fp.Peaks:
    """``PeakClassifier._find_raw_peaks`` (bpm_analysis.py:223-229).

    ``env_tables``: optional shared ``(max_table, min_table)`` of the
    edge-held envelope; ``extrema``: optional shared extrema decomposition
    (the faster prominence path — see ``analyze_envelope``)."""
    valid, env_m = envm.edge_held(envelope, n_valid)
    prom = quantile_ops.quantile_exact(envelope, cfg.features.peak_prominence_quantile,
                                       valid=valid)
    dist = int(cfg.features.min_peak_distance_sec * sample_rate)
    cap = min(cfg.runtime.max_raw_peaks,
              fp.distance_capacity_bound(envelope.shape[0], dist))
    tables = {}
    height = floor
    if extrema is not None:
        # The height filter applies on the shared candidate maxima (same
        # values: mh[k] == env_m[max_positions[k]]), then the survivors are
        # slot-compacted — no dense mask or dense-axis scatter in this call.
        n = envelope.shape[0]
        mh_real = extrema.max_heights[1:-1]
        floor_at = floor[jnp.clip(extrema.max_positions, 0, n - 1)]
        in_count = jnp.arange(mh_real.shape[0]) < extrema.max_count
        keep = in_count & (mh_real >= floor_at)
        # Candidate axis: the noise floor rejects the bulk of the
        # micro-maxima, so the NMS (whose shifted-compare rounds scale
        # linearly with this axis) runs over a right-sized compaction
        # instead of the full extrema width; overflow propagates into
        # Peaks.overflowed (host raises) like every other capacity.
        ccap = min(cfg.runtime.raw_candidate_capacity or mh_real.shape[0],
                   mh_real.shape[0])
        (cpos, chts), ccount, cover = fp.compact_slots(
            keep, ccap,
            [(extrema.max_positions, n),
             (mh_real, jnp.array(-jnp.inf, mh_real.dtype))])
        tables = dict(
            extrema=extrema, extrema_negated=False,
            candidates=fp.Peaks(cpos, ccount, cover | extrema.overflowed),
            priorities=chts,
            prominence_sweep_window=cfg.runtime.prominence_sweep_window,
            prominence_residual_capacity=cfg.runtime.prominence_residual_capacity)
        height = None
    elif env_tables is not None:
        tables = dict(max_table=env_tables[0], min_table=env_tables[1])
    return fp.find_peaks(
        env_m, cap, height=height, prominence=prom,
        distance=dist,
        work_capacity=cfg.runtime.find_peaks_work_factor * cfg.runtime.max_raw_peaks,
        prominence_capacity=int(cfg.runtime.prominence_work_factor * cap),
        **tables,
    )


def preliminary_pass(envelope, floor, peaks: fp.Peaks, sample_rate: int,
                     start_bpm_hint, cfg: AnalyzerConfig):
    """``_run_preliminary_pass`` (bpm_analysis.py:1623-1652)."""
    dtype = envelope.dtype
    hint_valid = ~jnp.isnan(start_bpm_hint) & (start_bpm_hint != 0)
    hint_or_default = jnp.where(hint_valid, start_bpm_hint,
                                cfg.rhythm.default_start_bpm)

    cfg_hc = cfg.with_pairing_threshold(cfg.pairing.preliminary_confidence_threshold)
    # want_trace=False: the preliminary pass only consumes the anchor
    # positions; dropping the 26-field trace ys lets XLA dead-code eliminate
    # the trace-only math inside the latency-bound scan body.
    res = classifier.classify(
        envelope, floor, peaks.positions, peaks.count, sample_rate,
        hint_or_default, cfg_hc, want_trace=False,
    )
    anchors, a_count = res.s1_positions, res.s1_count

    cap = anchors.shape[0]
    slot = jnp.arange(cap)
    rr = (anchors[1:] - anchors[:-1]).astype(dtype) / sample_rate
    rr_valid = slot[:-1] < a_count - 1
    median_rr = series.masked_median(rr, rr_valid)
    est_valid = (a_count >= 10) & (median_rr > 0)
    estimate = 60.0 / jnp.where(median_rr > 0, median_rr, 1.0)

    start_bpm = jnp.where(hint_valid, start_bpm_hint,
                          jnp.where(est_valid, estimate, cfg.rhythm.default_start_bpm))

    prelim_bpm = analytics.bpm_series(anchors, a_count, sample_rate, cfg, dtype)
    peak_time, recovery_end, rec_ok = analytics.recovery_phase(prelim_bpm, cfg)
    peak_time = jnp.where(rec_ok, peak_time, jnp.nan)
    recovery_end = jnp.where(rec_ok, recovery_end, jnp.nan)
    return start_bpm, peak_time, recovery_end


def analyze_envelope(envelope: jnp.ndarray, sample_rate: int,
                     cfg: AnalyzerConfig, start_bpm_hint=jnp.nan,
                     n_valid=None) -> PipelineResult:
    """Full pipeline from a precomputed envelope (stages 1b-6).

    ``n_valid`` (traced) marks the valid prefix of a zero-padded envelope:
    every result equals the serial run on ``envelope[:n_valid]`` (the
    mixed-length batching contract — see ``host_batch``)."""
    dtype = envelope.dtype
    n = envelope.shape[0]
    start_bpm_hint = jnp.asarray(start_bpm_hint, dtype)

    # Shared peak-finder auxiliaries of the edge-held envelope, built once
    # for the trough finder (on -env: roles swap and comparisons negate) and
    # the raw-peak finder.  The extrema decomposition (default) feeds the
    # extrema-domain prominence path; the dense sparse-table pair remains as
    # the "dense" backend (each build ~75 ms per 128x181k batch on chip).
    _, env_m = envm.edge_held(envelope, n_valid)
    if cfg.runtime.prominence_backend == "dense":
        env_tables = (fp._sparse_table(env_m, jnp.maximum),
                      fp._sparse_table(env_m, jnp.minimum))
        extrema = None
    else:
        env_tables = None
        extrema = fp.build_extrema(
            env_m, cfg.runtime.extrema_capacity
            or cfg.runtime.find_peaks_work_factor * cfg.runtime.max_raw_peaks)

    nf = noise_floor.dynamic_noise_floor(envelope, sample_rate, cfg,
                                         n_valid=n_valid, env_tables=env_tables,
                                         extrema=extrema)
    peaks = raw_peaks(envelope, nf.floor, sample_rate, cfg, n_valid=n_valid,
                      env_tables=env_tables, extrema=extrema)

    start_bpm, peak_time, recovery_end = preliminary_pass(
        envelope, nf.floor, peaks, sample_rate, start_bpm_hint, cfg
    )

    res = classifier.classify(
        envelope, nf.floor, peaks.positions, peaks.count, sample_rate,
        start_bpm, cfg, peak_bpm_time_sec=peak_time,
        recovery_end_time_sec=recovery_end,
    )

    # Reference short-circuit: < 2 raw peaks → every raw peak is a "beat"
    # with no debug info (bpm_analysis.py:115-116).
    few = peaks.count < 2
    ccap = cfg.runtime.max_candidates
    rp = peaks.positions
    if rp.shape[0] < ccap:
        rp = jnp.concatenate([rp, jnp.full((ccap - rp.shape[0],), n, rp.dtype)])
    s1_pos = jnp.where(few, jnp.where(jnp.arange(ccap) < peaks.count,
                                      rp[:ccap], n),
                       res.s1_positions)
    s1_count = jnp.where(few, jnp.minimum(peaks.count, ccap), res.s1_count)

    corr = corrections.refine_and_correct(
        s1_pos, s1_count, peaks.positions, peaks.count, res.trace.peak_class,
        envelope, nf.floor, sample_rate, cfg,
    )

    metrics = analytics.compute_metrics(
        corr.positions, corr.count, sample_rate, cfg, dtype
    )

    return PipelineResult(
        floor=nf.floor,
        trough_positions=nf.trough_positions,
        trough_count=nf.trough_count,
        raw_peak_positions=peaks.positions,
        raw_peak_count=peaks.count,
        start_bpm=start_bpm,
        peak_bpm_time=peak_time,
        recovery_end_time=recovery_end,
        trace=res.trace,
        smoothed_deviation=res.smoothed_deviation,
        classes=corr.classes,
        precorrection_classes=corr.precorrection_classes,
        s1_positions=s1_pos,
        s1_count=s1_count,
        final_positions=corr.positions,
        final_count=corr.count,
        metrics=metrics,
        ok=corr.count >= 2,
        overflowed=(peaks.overflowed | nf.overflowed | res.s1_overflowed
                    | corr.overflowed),
    )


@functools.partial(jax.jit, static_argnames=("sample_rate", "cfg"))
def analyze_envelope_jit(envelope, sample_rate: int, cfg: AnalyzerConfig,
                         start_bpm_hint=jnp.nan) -> PipelineResult:
    return analyze_envelope(envelope, sample_rate, cfg, start_bpm_hint)


def analyze_batch(envelopes: jnp.ndarray, sample_rate: int, cfg: AnalyzerConfig,
                  start_bpm_hints: Optional[jnp.ndarray] = None,
                  n_valid: Optional[jnp.ndarray] = None) -> PipelineResult:
    """vmapped pipeline over a batch of equal-length envelopes.

    This is the unit the runtime shards across chips: the classifier scans
    run in lockstep over the batch, amortizing the sequential steps.
    ``n_valid`` (per-recording valid lengths) enables mixed-length batches
    padded to a shared bucket length.
    """
    if start_bpm_hints is None:
        start_bpm_hints = jnp.full((envelopes.shape[0],), jnp.nan, envelopes.dtype)
    if n_valid is None:
        fn = jax.vmap(lambda e, h: analyze_envelope(e, sample_rate, cfg, h))
        return fn(envelopes, start_bpm_hints)
    fn = jax.vmap(lambda e, h, nv: analyze_envelope(e, sample_rate, cfg, h,
                                                    n_valid=nv))
    return fn(envelopes, start_bpm_hints, n_valid)
