"""The stateful beat classifier as a single branchless ``lax.scan``.

Reference: ``PeakClassifier`` (bpm_analysis.py:64-330) plus its free helper
functions ``calculate_blended_confidence`` (:1120),
``_adjust_confidence_with_stability_and_ratio`` (:1146),
``calculate_lone_s1_confidence`` (:1201), ``update_long_term_bpm`` (:1239).

The reference walks raw peaks with a Python while-loop that advances by 1
(lone/noise) or 2 (S1-S2 pair) carrying mutable state: the long-term BPM
belief, the candidate-beat list, a pairing-success history *parsed out of its
own debug strings*, and a consecutive-rhythm-rejection counter.  Here the
same transition function is one scan step over raw-peak slots:

* the variable advance becomes a ``pending_s2`` carry flag — when a pair is
  accepted at slot t, slot t+1 is consumed as the S2 on the next step (and,
  matching the reference's per-*iteration* belief update, no belief update
  happens on consumed slots);
* the debug-string greps become a 20-slot ring buffer of "was this candidate
  an S1 (Paired)" flags (reference counts ``PeakType.S1_PAIRED.value in
  debug_info[idx]`` over the last ``stability_history_window`` candidates,
  :180-186);
* every per-peak decision emits a structured numeric trace (confidences,
  ratios, penalties) from which reports/trace.py reconstructs the
  reference's reason strings byte-for-byte.

Faithfully reproduced quirks (golden-embedded; see SURVEY.md §2):

* the belief EMA runs once per loop iteration even when the step classified
  noise — re-applying the same RR interval (reference calls
  ``_update_long_term_bpm`` unconditionally at :128);
* a NaN confidence (first pair attempt: ``Series.asof`` before the first
  deviation midpoint) clamps to **1.0** via Python's
  ``max(0.0, min(1.0, nan))`` ordering (:1197) — visible in the golden log
  as "Base Conf: nan … Final Score: 1.00";
* the kick-start check writes an override key that is never read (:168) —
  a no-op here unless ``compat.kickstart_effective`` (see config.py);
* fewer than 2 raw peaks short-circuits: every raw peak is returned as a
  "beat" with no debug info (:115-116) — handled by the caller (pipeline).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..config import AnalyzerConfig
from ..ops import rolling
from .. import types


class ClassifierTrace(NamedTuple):
    """Per-raw-peak-slot structured decision trace (fixed capacity)."""

    peak_class: jnp.ndarray        # int32 class code (types.*)
    # pair-attempt fields (valid on S1/lone/noise slots; S2 slots mirror the
    # previous slot when rendering)
    deviation: jnp.ndarray
    blend_ratio: jnp.ndarray
    base_conf: jnp.ndarray         # blended-model confidence before adjustments
    pairing_ratio: jnp.ndarray
    stability_factor: jnp.ndarray  # NaN when beat_count < 5
    s2_s1_ratio: jnp.ndarray
    max_expected_ratio: jnp.ndarray
    penalty_amount: jnp.ndarray    # NaN when no penalty
    boost_amount: jnp.ndarray      # NaN when no boost
    s1_s2_ratio: jnp.ndarray       # actual S1/S2 strength ratio (boost reason)
    interval_sec: jnp.ndarray
    max_interval_sec: jnp.ndarray
    interval_penalty: jnp.ndarray  # NaN when no interval penalty
    final_conf: jnp.ndarray
    paired: jnp.ndarray            # bool
    # lone-S1 fields
    lone_reason: jnp.ndarray       # int32 types.LONE_*
    lone_conf: jnp.ndarray
    rhythm_score: jnp.ndarray
    actual_rr_sec: jnp.ndarray
    expected_rr_sec: jnp.ndarray
    amp_score: jnp.ndarray
    amp_ratio: jnp.ndarray
    implied_bpm: jnp.ndarray       # forward-check implied BPM
    # belief tracking
    belief: jnp.ndarray            # long-term BPM after this step
    belief_time_sec: jnp.ndarray   # last-candidate time (NaN when no candidates)


class ClassifierResult(NamedTuple):
    s1_positions: jnp.ndarray      # (max_candidates,) int32, padded with n
    s1_count: jnp.ndarray          # () int32
    trace: Optional[ClassifierTrace]  # None under classify(want_trace=False)
    smoothed_deviation: jnp.ndarray  # (capacity-1 slots worth, padded)
    s1_overflowed: jnp.ndarray     # () bool: max_candidates truncated the beats


def _interp(x, xp, fp_, dtype):
    return jnp.interp(x, jnp.asarray(xp, dtype), jnp.asarray(fp_, dtype))


def deviation_series(
    envelope: jnp.ndarray,
    floor: jnp.ndarray,
    positions: jnp.ndarray,
    count: jnp.ndarray,
    cfg: AnalyzerConfig,
):
    """Smoothed peak-strength deviation series (bpm_analysis.py:93-100).

    dev[k] = |strength[k+1]-strength[k]| / (max(strengths)+1e-9) at the
    midpoint time of peaks k,k+1; smoothed by a centered rolling mean of
    width max(5, int(n_dev * deviation_smoothing_factor)) — dynamic, so the
    dynamic-window rolling kernel is used.
    """
    dtype = envelope.dtype
    cap = positions.shape[0]
    pos = jnp.clip(positions, 0, envelope.shape[0] - 1)
    strengths = jnp.maximum(envelope[pos] - floor[pos], 0)
    d = jnp.abs(strengths[1:] - strengths[:-1]) / (
        jnp.maximum(strengths[:-1], strengths[1:]) + 1e-9
    )
    n_dev = jnp.maximum(count - 1, 0)
    valid = jnp.arange(cap - 1) < n_dev
    window = jnp.maximum(
        5, (n_dev.astype(dtype) * cfg.pairing.deviation_smoothing_factor).astype(jnp.int32)
    )
    smoothed = rolling.rolling_mean_dynamic_window(d.astype(dtype), valid, window)
    return smoothed, strengths


def classify(
    envelope: jnp.ndarray,
    floor: jnp.ndarray,
    positions: jnp.ndarray,
    count: jnp.ndarray,
    sample_rate: int,
    start_bpm,
    cfg: AnalyzerConfig,
    peak_bpm_time_sec=None,
    recovery_end_time_sec=None,
    want_trace: bool = True,
) -> ClassifierResult:
    """Run the full classification scan over raw-peak slots.

    ``want_trace=False`` emits only ``peak_class`` from the scan instead of
    the full 26-field ``ClassifierTrace`` (``ClassifierResult.trace`` is then
    ``None``).  The preliminary pass (pipeline.py) only consumes the anchor
    positions, and dropping the per-step trace writes lets XLA dead-code
    eliminate every trace-only computation inside the latency-bound scan
    body — the scan's wall time is sequential step latency, so a thinner
    step is directly faster."""
    p = cfg.pairing
    r = cfg.rhythm
    dtype = envelope.dtype
    n = envelope.shape[0]
    cap = positions.shape[0]
    sr = jnp.asarray(sample_rate, dtype)
    nan = jnp.asarray(jnp.nan, dtype)

    smoothed_dev, strengths = deviation_series(envelope, floor, positions, count, cfg)
    # deviation value seen by slot t's pair attempt: asof(t_peak) resolves to
    # the (t-1, t) midpoint — i.e. smoothed_dev[t-1]; NaN for t = 0
    # (bpm_analysis.py:234; see SURVEY.md §3.3).
    dev_at_slot = jnp.concatenate([jnp.full((1,), jnp.nan, dtype), smoothed_dev])

    pos_c = jnp.clip(positions, 0, n - 1)
    env_at = envelope[pos_c]
    times = positions.astype(dtype) / sr

    hist = p.stability_history_window
    has_recovery = peak_bpm_time_sec is not None and recovery_end_time_sec is not None
    if has_recovery:
        rec_lo = jnp.asarray(peak_bpm_time_sec, dtype)
        rec_hi = jnp.asarray(recovery_end_time_sec, dtype)
        rec_valid = ~(jnp.isnan(rec_lo) | jnp.isnan(rec_hi))
    else:
        rec_lo = jnp.asarray(0.0, dtype)
        rec_hi = jnp.asarray(0.0, dtype)
        rec_valid = jnp.asarray(False)

    kickstart = cfg.compat.kickstart_effective

    class Carry(NamedTuple):
        pending_s2: jnp.ndarray
        belief: jnp.ndarray
        last_pos: jnp.ndarray      # int32, -1 when none
        prev_pos: jnp.ndarray
        last_strength: jnp.ndarray
        cand_count: jnp.ndarray
        ring: jnp.ndarray          # (hist,) bool — paired flags, newest last
        rejections: jnp.ndarray    # consecutive rhythm rejections
        # kick-start bookkeeping (compat.kickstart_effective only; the
        # reference's mechanism writes an override that is never read,
        # bpm_analysis.py:132-168 — these model the *documented* behavior):
        # last-4 candidates: was it a lone S1, and was the raw peak right
        # after it classified noise?
        ks_lone: jnp.ndarray       # (4,) bool
        ks_next_noise: jnp.ndarray  # (4,) bool
        ks_prev_was_lone: jnp.ndarray

    def step(carry: Carry, xs):
        (slot, pos, pos_next, envv, env_next, strength, strength_next, dev, t_sec) = xs
        active = slot < count
        is_last = slot == count - 1
        pending = carry.pending_s2

        # ---- pairing ratio (bpm_analysis.py:179-186) ----------------------
        ring_mean = jnp.mean(carry.ring.astype(dtype))
        pairing_ratio = jnp.where(carry.cand_count < hist, jnp.asarray(0.5, dtype), ring_mean)
        if kickstart:
            # Documented kick-start (README.md:9, _kickstart_check
            # bpm_analysis.py:132-168): when the pairing ratio has collapsed
            # and >= 3 of the last 4 candidates are lone S1s each followed by
            # a Noise peak, pair with the override ratio instead.
            matches = jnp.sum((carry.ks_lone & carry.ks_next_noise).astype(jnp.int32))
            lones = jnp.sum(carry.ks_lone.astype(jnp.int32))
            fire = ((pairing_ratio < p.kickstart_check_threshold)
                    & (carry.cand_count >= 4) & (lones >= 3) & (matches >= 3))
            pairing_ratio = jnp.where(
                fire, jnp.asarray(p.kickstart_override_ratio, dtype), pairing_ratio)

        # ---- pair attempt (bpm_analysis.py:231-272) -----------------------
        interval_sec = (pos_next - pos).astype(dtype) / sr
        blend = jnp.clip(
            (carry.belief - p.contractility_bpm_low)
            / (p.contractility_bpm_high - p.contractility_bpm_low),
            0, 1,
        )
        curve = (jnp.asarray(p.curve_low, dtype)
                 + (jnp.asarray(p.curve_high, dtype) - jnp.asarray(p.curve_low, dtype)) * blend)
        base_conf = jnp.interp(dev, jnp.asarray(p.deviation_points, dtype), curve)

        conf = base_conf
        # 1. stability pre-adjustment (>= 5 beats)
        sf = _interp(pairing_ratio, [0.0, 1.0],
                     [p.stability_confidence_floor, p.stability_confidence_ceiling], dtype)
        use_sf = carry.cand_count >= 5
        conf = jnp.where(use_sf, conf * sf, conf)
        sf_out = jnp.where(use_sf, sf, nan)

        # 2. strength ratio vs expectation
        s2s1 = strength_next / (strength + 1e-9)
        in_recovery = rec_valid & (rec_lo < t_sec) & (t_sec < rec_hi)
        eff_bpm = jnp.where(in_recovery,
                            jnp.maximum(carry.belief, p.contractility_bpm_low), carry.belief)
        max_expected = _interp(eff_bpm, [p.contractility_bpm_low, p.contractility_bpm_high],
                               [p.s2_s1_ratio_low_bpm, p.s2_s1_ratio_high_bpm], dtype)
        # 3. penalty / boost
        do_penalty = s2s1 > max_expected
        severity = jnp.clip((s2s1 / max_expected - 1.0) / 2.0, 0, 1)
        penalty = p.penalty_amount_min + severity * (p.penalty_amount_max - p.penalty_amount_min)
        s1s2 = strength / (strength_next + 1e-9)
        do_boost = ~do_penalty & (strength > strength_next * p.s1_s2_boost_ratio)
        exceed = jnp.clip((s1s2 - p.s1_s2_boost_ratio)
                          / (p.boost_saturation_ratio - p.s1_s2_boost_ratio), 0, 1)
        boost = p.boost_amount_min + exceed * (p.boost_amount_max - p.boost_amount_min)
        conf = jnp.where(do_penalty, conf - penalty, jnp.where(do_boost, conf + boost, conf))
        # Python max(0.0, min(1.0, nan)) == 1.0 (bpm_analysis.py:1197).
        conf = jnp.where(jnp.isnan(conf), jnp.asarray(1.0, dtype), jnp.clip(conf, 0, 1))

        # 4. interval penalty
        max_interval = jnp.minimum(
            jnp.asarray(p.s1_s2_interval_cap_sec, dtype),
            (60.0 / carry.belief) * p.s1_s2_interval_rr_fraction,
        )
        pzs = max_interval * p.interval_penalty_start_factor
        pze = max_interval * p.interval_penalty_full_factor
        exceed_i = jnp.clip((interval_sec - pzs) / (pze - pzs + 1e-9), 0, 1)
        ipen = exceed_i * p.interval_max_penalty
        do_ipen = (p.enable_interval_penalty
                   & (interval_sec > max_interval) & (interval_sec > pzs))
        conf = jnp.where(do_ipen, jnp.maximum(conf - ipen, 0), conf)
        ipen_out = jnp.where(do_ipen, ipen, nan)

        paired = conf >= p.pairing_confidence_threshold

        # ---- lone-S1 validation (bpm_analysis.py:274-329, 1201-1237) ------
        first_beat = carry.cand_count == 0
        expected_rr = 60.0 / carry.belief
        actual_rr = (pos - carry.last_pos).astype(dtype) / sr
        rhythm_dev = jnp.abs(actual_rr - expected_rr) / expected_rr
        rhythm_score = _interp(rhythm_dev, r.rhythm_dev_points, r.rhythm_conf_curve, dtype)
        amp_ratio = strength / (carry.last_strength + 1e-9)
        amp_score = _interp(amp_ratio, r.amp_ratio_points, r.amp_conf_curve, dtype)
        lone_conf = (rhythm_score * r.lone_s1_rhythm_weight
                     + amp_score * r.lone_s1_amplitude_weight)
        conf_ok = lone_conf >= r.lone_s1_confidence_threshold
        # forward check (slot+1 always exists here: last slot handled apart)
        fwd_interval = (pos_next - pos).astype(dtype) / sr
        min_fwd = expected_rr * r.lone_s1_forward_check_pct
        fwd_waived = envv > env_next * r.forward_check_amp_waiver
        fwd_fail = (fwd_interval < min_fwd) & ~fwd_waived
        implied_bpm = jnp.where(fwd_interval > 0, 60.0 / fwd_interval,
                                jnp.asarray(jnp.inf, dtype))

        lone_valid = first_beat | (conf_ok & ~fwd_fail)
        lone_reason = jnp.where(
            first_beat, types.LONE_FIRST_BEAT,
            jnp.where(~conf_ok, types.LONE_REJ_CONFIDENCE,
                      jnp.where(fwd_fail, types.LONE_REJ_FORWARD, types.LONE_OK)),
        ).astype(jnp.int32)

        # cascade reset (bpm_analysis.py:286-302)
        is_rhythm_rej = ~lone_valid & (lone_reason == types.LONE_REJ_CONFIDENCE)
        rej_after = jnp.where(is_rhythm_rej, carry.rejections + 1, 0)
        cascade = ~lone_valid & (rej_after >= r.cascade_reset_trigger_count)

        # ---- outcome selection -------------------------------------------
        # Precedence: consumed-S2 slot > last peak > pair > lone/cascade/noise.
        lone_class = jnp.where(
            lone_valid, types.LONE_S1_VALIDATED,
            jnp.where(cascade, types.LONE_S1_CASCADE, types.NOISE),
        )
        peak_class = jnp.where(
            pending, types.S2_PAIRED,
            jnp.where(is_last, types.LONE_S1_LAST,
                      jnp.where(paired, types.S1_PAIRED, lone_class)),
        )
        peak_class = jnp.where(active, peak_class, types.UNCLASSIFIED).astype(jnp.int32)

        processed = active & ~pending
        appended = processed & (is_last | paired | (~paired & (lone_valid | cascade)))
        appended_paired_flag = processed & ~is_last & paired

        new_last = jnp.where(appended, pos, carry.last_pos)
        new_prev = jnp.where(appended, carry.last_pos, carry.prev_pos)
        new_last_strength = jnp.where(appended, strength, carry.last_strength)
        new_count = carry.cand_count + appended.astype(jnp.int32)
        shifted_ring = jnp.concatenate([carry.ring[1:], appended_paired_flag[None]])
        new_ring = jnp.where(appended, shifted_ring, carry.ring)
        # rejection counter: pair success or lone accept resets; noise path
        # already computed in rej_after; cascade resets to 0.
        new_rej = jnp.where(
            processed & ~is_last,
            jnp.where(paired | lone_valid, 0, jnp.where(cascade, 0, rej_after)),
            carry.rejections,
        )

        # ---- belief update (once per loop iteration; bpm_analysis.py:203-212)
        do_belief = processed
        rr_new = (new_last - new_prev).astype(dtype) / sr
        can_update = do_belief & (new_count > 1) & (new_prev >= 0) & (rr_new > 0)
        instant = 60.0 / rr_new
        target = (1 - r.belief_learning_rate) * carry.belief + r.belief_learning_rate * instant
        max_change = r.belief_max_change_per_beat * rr_new
        change = jnp.clip(target - carry.belief, -max_change, max_change)
        updated = jnp.clip(carry.belief + change, r.min_bpm, r.max_bpm)
        new_belief = jnp.where(can_update, updated, carry.belief)

        belief_time = jnp.where(
            do_belief & (new_count > 0), new_last.astype(dtype) / sr, nan
        )

        trace = peak_class if not want_trace else ClassifierTrace(
            peak_class=peak_class,
            deviation=dev,
            blend_ratio=blend,
            base_conf=base_conf,
            pairing_ratio=pairing_ratio,
            stability_factor=sf_out,
            s2_s1_ratio=s2s1,
            max_expected_ratio=max_expected,
            penalty_amount=jnp.where(do_penalty, penalty, nan),
            boost_amount=jnp.where(do_boost, boost, nan),
            s1_s2_ratio=s1s2,
            interval_sec=interval_sec,
            max_interval_sec=max_interval,
            interval_penalty=ipen_out,
            final_conf=conf,
            paired=paired,
            lone_reason=lone_reason,
            lone_conf=lone_conf,
            rhythm_score=rhythm_score,
            actual_rr_sec=actual_rr,
            expected_rr_sec=expected_rr,
            amp_score=amp_score,
            amp_ratio=amp_ratio,
            implied_bpm=implied_bpm,
            belief=new_belief,
            belief_time_sec=belief_time,
        )

        next_pending = processed & ~is_last & paired
        if kickstart:
            appended_lone = appended & ~appended_paired_flag
            is_noise_step = processed & ~is_last & ~paired & ~lone_valid & ~cascade
            # A noise peak immediately following a lone-S1 candidate marks
            # that candidate's ring entry.
            marked = jnp.where(
                is_noise_step & carry.ks_prev_was_lone,
                carry.ks_next_noise.at[-1].set(True), carry.ks_next_noise)
            ks_lone = jnp.where(
                appended, jnp.concatenate([carry.ks_lone[1:], appended_lone[None]]),
                carry.ks_lone)
            ks_next_noise = jnp.where(
                appended, jnp.concatenate([marked[1:], jnp.array([False])]), marked)
            ks_prev_was_lone = jnp.where(processed, appended_lone,
                                         carry.ks_prev_was_lone)
        else:
            ks_lone = carry.ks_lone
            ks_next_noise = carry.ks_next_noise
            ks_prev_was_lone = carry.ks_prev_was_lone
        new_carry = Carry(
            pending_s2=next_pending,
            belief=new_belief,
            last_pos=new_last,
            prev_pos=new_prev,
            last_strength=new_last_strength,
            cand_count=new_count,
            ring=new_ring,
            rejections=new_rej,
            ks_lone=ks_lone,
            ks_next_noise=ks_next_noise,
            ks_prev_was_lone=ks_prev_was_lone,
        )
        return new_carry, trace

    # Scan-step economy: the transition is pure register math, so wall time
    # is sequential-step latency; processing UNROLL slots per scan step cuts
    # the step count at the cost of a larger (still tiny) step body.
    UNROLL = cfg.runtime.classifier_unroll
    slots = jnp.arange(cap)
    pos_next = jnp.concatenate([positions[1:], jnp.full((1,), n, positions.dtype)])
    env_next = jnp.concatenate([env_at[1:], env_at[-1:]])
    strength_next = jnp.concatenate([strengths[1:], strengths[-1:]])

    init = Carry(
        pending_s2=jnp.asarray(False),
        belief=jnp.asarray(start_bpm, dtype),
        last_pos=jnp.asarray(-1, jnp.int32),
        prev_pos=jnp.asarray(-1, jnp.int32),
        last_strength=jnp.asarray(0.0, dtype),
        cand_count=jnp.asarray(0, jnp.int32),
        ring=jnp.zeros((hist,), jnp.bool_),
        rejections=jnp.asarray(0, jnp.int32),
        ks_lone=jnp.zeros((4,), jnp.bool_),
        ks_next_noise=jnp.zeros((4,), jnp.bool_),
        ks_prev_was_lone=jnp.asarray(False),
    )
    xs = (slots, positions.astype(jnp.int32), pos_next.astype(jnp.int32),
          env_at, env_next, strengths, strength_next, dev_at_slot, times)
    pad = (-cap) % UNROLL
    if pad:
        # Padding slots get indices >= cap >= count, so they are inactive
        # no-ops; the other leaves just repeat their last entry.
        def _pad(a, fill_slots=False):
            tail = (jnp.arange(cap, cap + pad) if fill_slots
                    else jnp.repeat(a[-1:], pad, axis=0))
            return jnp.concatenate([a, tail])

        xs = (_pad(slots, True),) + tuple(_pad(a) for a in xs[1:])
    xsb = jax.tree_util.tree_map(
        lambda a: a.reshape((cap + pad) // UNROLL, UNROLL, *a.shape[1:]), xs)

    def blocked_step(carry, xs_u):
        ys = []
        for u in range(UNROLL):
            carry, y = step(carry, jax.tree_util.tree_map(lambda a: a[u], xs_u))
            ys.append(y)
        return carry, jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *ys)

    # NOTE: an early-exit variant (while_loop over occupied blocks writing
    # into a preallocated trace) measured 10x SLOWER on chip — carrying the
    # (n_blocks, UNROLL, 26-field) trace through a while_loop defeats scan's
    # optimized ys accumulation.  Keep the full-capacity scan.
    _, trace = lax.scan(blocked_step, init, xsb)
    trace = jax.tree_util.tree_map(
        lambda a: a.reshape(cap + pad, *a.shape[2:])[:cap], trace)

    peak_class = trace.peak_class if want_trace else trace
    is_beat = ((peak_class == types.S1_PAIRED)
               | (peak_class == types.LONE_S1_VALIDATED)
               | (peak_class == types.LONE_S1_CASCADE)
               | (peak_class == types.LONE_S1_LAST))
    ccap = cfg.runtime.max_candidates
    key = jnp.where(is_beat, positions, n)
    if ccap > cap:
        key = jnp.concatenate([key, jnp.full((ccap - cap,), n, key.dtype)])
    s1_positions = jnp.sort(key)[:ccap].astype(jnp.int32)
    n_beats = jnp.sum(is_beat.astype(jnp.int32))
    s1_count = jnp.minimum(n_beats, ccap)

    return ClassifierResult(
        s1_positions=s1_positions,
        s1_count=s1_count,
        trace=trace if want_trace else None,
        smoothed_deviation=smoothed_dev,
        s1_overflowed=n_beats > ccap,
    )
