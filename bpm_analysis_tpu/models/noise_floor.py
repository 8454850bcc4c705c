"""Dynamic noise-floor estimation (reference bpm_analysis.py:1064-1117).

Pipeline (all on device, shape-static):

1. trough detection on the negated envelope (distance + prominence, where
   the prominence threshold is a quantile of the *envelope*, :1067),
2. draft floor: dense linear interpolation of trough amplitudes → centered
   rolling quantile (window ``noise_window_sec * sr``, ``min_periods=3``,
   q = ``noise_floor_quantile``) → bfill/ffill,
3. trough sanitization: keep troughs with amplitude ≤ ``multiplier`` × the
   draft floor at the trough (:1090-1097),
4. final floor: same rolling quantile over the sanitized troughs only.

Fallback ladder (reproduced via masked selects so the whole thing stays one
traced program under vmap):

* fewer than 5 raw troughs → static floor at the envelope's
  ``noise_floor_quantile`` (:1073-1077), and the *raw* troughs are returned,
* ≤ 2 sanitized troughs → fall back to the (filled) draft floor (:1107-1110),
* final floor all-NaN → static floor at quantile 0.1 (:1112-1115).

Note the reference's fallback return values: the <5-trough branch returns
the raw trough list, while the normal path returns the *sanitized* troughs
(:1077,1117) — the classifier's trough markers and debug log reflect that.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..config import AnalyzerConfig
from ..ops import find_peaks as fp
from ..ops import quantile as q
from ..ops import series
from . import envelope as envm


class NoiseFloorResult(NamedTuple):
    floor: jnp.ndarray            # (n,) dense noise floor
    trough_positions: jnp.ndarray  # (max_troughs,) int32, padded with n
    trough_count: jnp.ndarray      # () int32
    raw_trough_positions: jnp.ndarray
    raw_trough_count: jnp.ndarray
    overflowed: jnp.ndarray        # () bool: max_troughs truncated the set


def dynamic_noise_floor(
    envelope: jnp.ndarray, sample_rate: int, cfg: AnalyzerConfig, n_valid=None,
    env_tables=None, extrema=None,
) -> NoiseFloorResult:
    """``n_valid`` (traced) marks the valid prefix of a zero-padded envelope;
    results at positions < n_valid match the unpadded serial run exactly.
    The padded tail is hidden by (a) filling it with ``envelope[n_valid-1]``
    so local-maxima/prominence/edge semantics see the same "signal edge" the
    serial run sees, (b) NaN-masking it out of every rolling quantile (NaN ==
    missing == pandas' window truncation at the series end), and (c) masking
    the global quantiles.

    ``env_tables``: optional precomputed ``(max_table, min_table)`` sparse
    tables of the edge-held envelope (built once by the orchestrator and
    shared with the raw-peak finder); troughs search ``-env``, whose tables
    are the negated swap of the pair."""
    n = envelope.shape[0]
    ncfg = cfg.noise
    min_dist_cap = int(cfg.features.min_peak_distance_sec * sample_rate)
    cap = min(cfg.runtime.max_troughs,
              fp.distance_capacity_bound(n, max(min_dist_cap, 1)))

    idx = jnp.arange(n)
    valid, env_m = envm.edge_held(envelope, n_valid)

    min_dist = min_dist_cap
    trough_prom = q.quantile_exact(envelope, cfg.features.trough_prominence_quantile,
                                   valid=valid)
    neg_tables = {}
    if extrema is not None:
        # Extrema were built on env == -(-env_m): roles swap in place, and
        # the envelope's minima ARE the trough candidates (no height filter
        # here) — no dense mask or dense-axis scatter in this call.  The NMS
        # priority on -env is the negated minima heights (fill +inf -> -inf,
        # exactly the invalid-slot priority the NMS expects).
        neg_tables = dict(
            extrema=extrema, extrema_negated=True,
            candidates=fp.Peaks(extrema.min_positions, extrema.min_count,
                                extrema.overflowed),
            priorities=-extrema.min_heights[1:-1],
            prominence_sweep_window=cfg.runtime.prominence_sweep_window,
            prominence_residual_capacity=cfg.runtime.prominence_residual_capacity)
    elif env_tables is not None:
        # Tables are of env == -(-env_m): descents flip in place, no copies.
        neg_tables = dict(max_table=env_tables[0], min_table=env_tables[1],
                          tables_negated=True)
    troughs = fp.find_peaks(
        -env_m, cap, prominence=trough_prom, distance=min_dist,
        work_capacity=cfg.runtime.find_peaks_work_factor * cfg.runtime.max_troughs,
        prominence_capacity=int(cfg.runtime.prominence_work_factor * cap),
        **neg_tables,
    )
    slot = jnp.arange(cap)
    t_valid = slot < troughs.count
    t_pos = jnp.where(t_valid, troughs.positions, 0)
    t_amp = env_m[t_pos]

    window = int(ncfg.noise_window_sec * sample_rate)
    chunk = cfg.runtime.quantile_chunk
    stride = cfg.runtime.noise_quantile_stride
    backend = cfg.runtime.quantile_backend
    if backend == "auto":
        import jax

        # knots_pallas (ops/pallas/knot_kernel.py) fuses interpolation +
        # rolling quantile in the knot domain with the whole bisection
        # VMEM-resident AND builds the per-anchor segment tables in-kernel
        # (the v2 XLA-side gather cost ~500 ms/batch and kept the backend
        # opt-in through round 4).  Measured at the bench config
        # (B=128, n=181200, stride 64): fused kernel 30.9 ms/call vs the
        # dense interpolate+rolling path's 112.6 ms; full noise floor
        # 452.5 -> 252.7 ms (tools/profile_noise_floor.py, round 5).
        backend = ("knots_pallas" if jax.default_backend() == "tpu"
                   else "xla")
    if stride > 1 and backend in ("knots", "knots_pallas"):
        return _dynamic_noise_floor_knots(
            envelope, env_m, valid, n_valid, cfg, troughs, t_pos, t_amp,
            t_valid, cap, min_dist, window, stride,
            pallas=backend == "knots_pallas")
    if stride > 1 and backend == "pallas" and 128 % stride == 0:
        from ..ops.pallas.quantile_kernel import make_vmappable_rolling_quantile

        rolling_q = make_vmappable_rolling_quantile(
            window, ncfg.noise_floor_quantile, 3, stride)
    elif stride > 1:
        def rolling_q(d):
            return q.rolling_quantile_centered_strided(
                d, window, ncfg.noise_floor_quantile, min_periods=3,
                stride=stride, chunk=chunk)
    else:
        def rolling_q(d):
            return q.rolling_quantile_centered(
                d, window, ncfg.noise_floor_quantile, min_periods=3, chunk=chunk)

    if valid is None:
        def mask_tail(d):
            return d

        def fix_tail_span(d):
            return d
    else:
        # Hide the padded tail from the rolling quantile: NaN == missing ==
        # pandas truncating the window at the series end.
        def mask_tail(d):
            return jnp.where(valid, d, jnp.nan)

        # Strided quantiles interpolate between anchors; the serial run's
        # final partial span holds its LAST anchor constant (interp_anchors
        # with nxt == self), while the padded run would interpolate toward a
        # tail anchor.  Pin the span [last_anchor*stride, n_valid) to the
        # last-anchor value (exact for stride == 1 too: the span is then a
        # single sample equal to itself).
        last_anchor_pos = ((jnp.asarray(n_valid, jnp.int32) - 1) // stride) * stride

        def fix_tail_span(d):
            return jnp.where(idx >= last_anchor_pos, d[last_anchor_pos], d)

    # --- draft floor from ALL troughs --------------------------------------
    # Troughs come out of the distance NMS, so adjacent knots are >= min_dist
    # apart — unlocks the spacing-aware block interpolation kernel.
    dense_draft = series.interpolate_dense(t_pos, t_amp, troughs.count, n,
                                           dtype=envelope.dtype,
                                           min_spacing=max(min_dist, 1))
    draft = fix_tail_span(rolling_q(mask_tail(dense_draft)))
    # NaNs here are structurally prefix/suffix runs (min_periods edges and
    # the masked tail), so the cheap edge fill is exactly bfill().ffill().
    draft_filled = q.edge_fill(mask_tail(draft))

    # --- sanitize troughs ---------------------------------------------------
    floor_at_trough = draft_filled[t_pos]
    keep = t_valid & ~jnp.isnan(floor_at_trough) & (
        t_amp <= ncfg.trough_rejection_multiplier * floor_at_trough
    )
    sane_pos, sane_count = series.compact_valid(t_pos, keep, fill=n)
    sane_amp = env_m[jnp.where(jnp.arange(cap) < sane_count, sane_pos, 0)]

    # --- final floor from sanitized troughs --------------------------------
    dense_final = series.interpolate_dense(sane_pos, sane_amp, sane_count, n,
                                           dtype=envelope.dtype,
                                           min_spacing=max(min_dist, 1))
    final = fix_tail_span(rolling_q(mask_tail(dense_final)))
    final = q.edge_fill(mask_tail(final))

    # --- fallback ladder ----------------------------------------------------
    floor = jnp.where(sane_count > 2, final, draft_filled)
    static_all_nan = q.quantile_exact(envelope, ncfg.all_nan_fallback_quantile,
                                      valid=valid)
    floor = jnp.where(jnp.all(jnp.isnan(floor)), static_all_nan, floor)
    static_few = q.quantile_exact(envelope, ncfg.noise_floor_quantile,
                                  valid=valid)
    few_troughs = troughs.count < 5
    floor = jnp.where(few_troughs, static_few, floor)

    # Returned trough set: raw when <5 troughs, sanitized otherwise.
    out_pos = jnp.where(few_troughs, troughs.positions, sane_pos)
    out_count = jnp.where(few_troughs, troughs.count, sane_count)

    return NoiseFloorResult(
        floor=floor,
        trough_positions=out_pos.astype(jnp.int32),
        trough_count=out_count,
        raw_trough_positions=troughs.positions,
        raw_trough_count=troughs.count,
        overflowed=troughs.overflowed,
    )


def _dynamic_noise_floor_knots(
    envelope, env_m, valid, n_valid, cfg, troughs, t_pos, t_amp, t_valid,
    cap, min_dist, window, stride, pallas: bool = False,
) -> NoiseFloorResult:
    """Strided noise floor computed entirely in the knot domain
    (ops/knot_quantile.py): the rolling quantile of the trough interpolation
    never materializes the dense series — per-anchor closed-form counting
    over the <= window/min_spacing knot segments replaces per-anchor window
    gathers and rank selection, and the draft floor is evaluated *sparsely*
    at the trough positions for sanitization.  NaN anchors (min_periods)
    are bfilled on the anchor axis rather than the dense axis; this deviates
    from the dense path only across a NaN anchor's stride span (recording
    edges), where the fill lands one anchor earlier — the strided path is
    already an interpolating approximation there.  Dense expansion happens
    once per floor via ``interp_anchors``."""
    from ..ops import knot_quantile as kq

    n = envelope.shape[0]
    ncfg = cfg.noise
    idx = jnp.arange(n)
    min_spacing = max(min_dist, 1)

    if pallas:
        import jax

        from ..ops.pallas.knot_kernel import make_vmappable_knot_quantile

        # f32-only contract: the Mosaic kernel computes in float32 regardless
        # of cfg dtype (amplitudes are cast going in, anchors cast back going
        # out) — a float64 run silently loses precision on this backend,
        # unlike the XLA knots path which honors the envelope dtype.  float64
        # parity drives must use backend="knots"/"xla" (they already must:
        # X64 doesn't lower on the TPU path at all).
        if envelope.dtype == jnp.float64:
            import warnings

            warnings.warn(
                "quantile_backend='knots_pallas' computes in float32; "
                "float64 envelope precision is reduced. Use 'knots' for "
                "float64-exact noise floors.", stacklevel=3)
        # Off-TPU the Mosaic kernel runs in interpret mode — slow but
        # semantically identical, which keeps the backend testable on the
        # virtual-CPU suite.
        _pallas_q = make_vmappable_knot_quantile(
            n, window, ncfg.noise_floor_quantile, 3, stride, min_spacing,
            interpret=jax.default_backend() != "tpu")
        _nv = jnp.asarray(n if n_valid is None else n_valid, jnp.int32)

        def rolling_q_knots(pos, amp, count):
            return _pallas_q(pos, amp.astype(jnp.float32),
                             jnp.asarray(count, jnp.int32),
                             _nv).astype(envelope.dtype)
    else:
        def rolling_q_knots(pos, amp, count):
            return kq.rolling_quantile_knots(
                pos, amp, count, n, window, ncfg.noise_floor_quantile,
                min_periods=3, stride=stride, min_spacing=min_spacing,
                n_valid=n_valid, chunk=cfg.runtime.quantile_chunk,
                dtype=envelope.dtype)

    if n_valid is None:
        def fix_tail_span(d):
            return d
    else:
        last_anchor_pos = ((jnp.asarray(n_valid, jnp.int32) - 1) // stride) * stride

        def fix_tail_span(d):
            return jnp.where(idx >= last_anchor_pos, d[last_anchor_pos], d)

    # --- draft floor from ALL troughs (anchors only) -----------------------
    draft_anchors = rolling_q_knots(troughs.positions, t_amp, troughs.count)
    draft_anchors_filled = q.bfill_ffill(draft_anchors)

    # --- sanitize troughs (sparse draft evaluation — no dense gather) ------
    floor_at_trough = kq.anchors_at(draft_anchors_filled, t_pos, n, stride,
                                    n_valid=n_valid)
    keep = t_valid & ~jnp.isnan(floor_at_trough) & (
        t_amp <= ncfg.trough_rejection_multiplier * floor_at_trough
    )
    sane_pos, sane_count = series.compact_valid(t_pos, keep, fill=n)
    sane_amp = env_m[jnp.where(jnp.arange(cap) < sane_count, sane_pos, 0)]

    # --- final floor from sanitized troughs --------------------------------
    final_anchors = rolling_q_knots(sane_pos, sane_amp, sane_count)

    # --- fallback ladder (identical to the dense path) ---------------------
    # The draft/final select happens on the ANCHOR axis: both floors share
    # the same anchor grid and ``interp_anchors`` is linear in the anchor
    # values, so selecting anchors then expanding once equals expanding both
    # and selecting densely (the dense path's formulation) — and saves a
    # full dense interpolation + dense select per call.  The all-NaN check
    # is anchor-equivalent too: bfill_ffill output is all-NaN iff its input
    # was, and interpolation of any non-NaN anchor pair is non-NaN.
    floor_anchors = jnp.where(sane_count > 2, q.bfill_ffill(final_anchors),
                              draft_anchors_filled)
    floor = fix_tail_span(
        q.interp_anchors(floor_anchors, n, stride, envelope.dtype))
    static_all_nan = q.quantile_exact(envelope, ncfg.all_nan_fallback_quantile,
                                      valid=valid)
    floor = jnp.where(jnp.all(jnp.isnan(floor_anchors)), static_all_nan, floor)
    static_few = q.quantile_exact(envelope, ncfg.noise_floor_quantile,
                                  valid=valid)
    few_troughs = troughs.count < 5
    floor = jnp.where(few_troughs, static_few, floor)

    out_pos = jnp.where(few_troughs, troughs.positions, sane_pos)
    out_count = jnp.where(few_troughs, troughs.count, sane_count)

    return NoiseFloorResult(
        floor=floor,
        trough_positions=out_pos.astype(jnp.int32),
        trough_count=out_count,
        raw_trough_positions=troughs.positions,
        raw_trough_count=troughs.count,
        overflowed=troughs.overflowed,
    )
