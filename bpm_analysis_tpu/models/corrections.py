"""Post-classification correction passes (reference stages 4 & 5).

Stage 4 — ``correct_peaks_by_rhythm`` (bpm_analysis.py:1257-1306): greedy
left-to-right conflict resolution.  Intervals shorter than
``median_RR * rr_correction_threshold_pct`` drop/replace the lower-amplitude
peak.  Sequential by construction (each decision depends on the last
*accepted* peak) → a ``lax.scan`` over candidate slots carrying the output
write cursor.  Skipped for < 5 peaks.

Stage 5 — ``_fix_rhythmic_discontinuities`` (bpm_analysis.py:1309-1412),
iterated ≤ 5 times until no corrections (:1671-1695):

* pass 1 (gap promotion): for every adjacent S1 interval longer than
  ``median * rr_correction_long_interval_pct`` (median over IQR-filtered
  intervals), promote the first qualifying Noise-labeled raw-peak pair in
  the gap to ``S1/S2 (Paired - Corrected from Gap)``.  Gaps are disjoint, so
  this pass is fully parallel here: candidate qualification is vectorized
  over raw peaks and a segmented argmin picks the first per gap.
* pass 2 (short-interval removal): sequential adjacent-pair walk with
  already-removed skips → another short scan.

The reference identifies "Noise" candidates by substring-matching its debug
strings (:1351,1357); since corrected peaks keep their original reason via an
``ORIGINAL_REASON`` tag, a once-noise peak keeps matching in later
iterations.  We carry an explicit ``noise_flag`` per raw peak with exactly
that sticky semantics.

Both passes preserve margins of ``margin_beats`` at each end (:1318,1345,
1383) — note pass 1 scans ``i in [margin, len-1-margin)`` over the *input*
S1 list while pass 2 scans the list *with additions*.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import lax

from ..config import AnalyzerConfig
from ..ops import series
from .. import types


class CorrectionResult(NamedTuple):
    positions: jnp.ndarray       # (max_candidates,) int32 final S1 peaks
    count: jnp.ndarray
    classes: jnp.ndarray         # (max_raw_peaks,) int32 updated classes
    precorrection_classes: jnp.ndarray  # classes before any gap promotion
    overflowed: jnp.ndarray      # () bool: max_candidates truncated a merge


def rhythm_correction(
    positions: jnp.ndarray, count, envelope: jnp.ndarray, sample_rate: int,
    cfg: AnalyzerConfig,
):
    """Stage 4.  Returns (positions, count) with conflicts resolved."""
    cap = positions.shape[0]
    n = envelope.shape[0]
    dtype = envelope.dtype
    sr = jnp.asarray(sample_rate, dtype)
    slot = jnp.arange(cap)
    valid = slot < count
    pos = jnp.where(valid, positions, n)
    amp = envelope[jnp.clip(pos, 0, n - 1)]

    rr = (pos[1:] - pos[:-1]).astype(dtype) / sr
    rr_valid = slot[:-1] < count - 1
    median_rr = series.masked_median(rr, rr_valid)
    threshold = median_rr * cfg.correction.rr_correction_threshold_pct

    # Scalar-carry scan (last kept slot/pos/amp) emitting per-slot decisions;
    # the output list is reconstructed vectorized afterwards.  The previous
    # formulation carried the whole (cap,) output array with one scatter per
    # step — O(cap) work per step and most of the corrections stage's time.
    def step(carry, xs):
        last_slot, last_pos, last_amp = carry
        i, p, a, v = xs
        interval = (p - last_pos).astype(dtype) / sr
        act = v & (i > 0)
        conflict = act & (interval < threshold)
        replace = conflict & (a > last_amp)
        written = act & ~(conflict & ~replace)          # drop: skip
        victim = jnp.where(replace, last_slot, cap)     # slot unseated by p
        last_slot = jnp.where(written, i, last_slot)
        last_pos = jnp.where(written, p, last_pos)
        last_amp = jnp.where(written, a, last_amp)
        return (last_slot, last_pos, last_amp), (written, victim)

    init = (jnp.asarray(0, jnp.int32), pos[0], amp[0])
    # unroll: fewer sequential scan steps (the scan is step-latency-bound;
    # the unrolled body is the same math, so results are bit-identical).
    _, (written, victim) = lax.scan(
        step, init, (slot.astype(jnp.int32), pos.astype(jnp.int32), amp, valid),
        unroll=8)
    written = written.at[0].set(count > 0)
    unseated = jnp.zeros((cap + 1,), jnp.bool_).at[victim].set(
        True, mode="drop")[:cap]
    kept = written & ~unseated
    out_pos, out_len = series.compact_valid(pos.astype(jnp.int32), kept, fill=n)

    # Reference skips correction entirely for < 5 peaks (bpm_analysis.py:1263).
    skip = count < 5
    final_pos = jnp.where(skip, positions, out_pos)
    final_count = jnp.where(skip, count, out_len)
    return final_pos.astype(jnp.int32), final_count


def _static_candidates(raw_pos, raw_count, noise_flag, envelope, floor,
                       capacity: int, cfg: AnalyzerConfig):
    """Loop-invariant promotion-candidate features of the raw-peak list —
    hoisted out of the stage-5 iterations (the noise flag is sticky and the
    raw list never changes, so candidacy minus the gap predicates is fixed).
    Candidates compact to ``capacity`` slots so the per-iteration
    searchsorted/gather work scales with the realistic candidate population
    instead of the raw capacity.  Returns (cand_rslot, cand_pos, cand_next,
    count, overflowed)."""
    from ..ops.find_peaks import compact_slots

    c = cfg.correction
    rcap = raw_pos.shape[0]
    n = envelope.shape[0]
    rslot = jnp.arange(rcap)
    rvalid = rslot < raw_count
    rpos = jnp.where(rvalid, raw_pos, n)
    rpos_c = jnp.clip(rpos, 0, n - 1)
    next_rpos = jnp.concatenate([rpos[1:], jnp.full((1,), n, rpos.dtype)])
    has_next = rslot + 1 < raw_count
    next_noise = jnp.concatenate([noise_flag[1:], jnp.zeros((1,), jnp.bool_)])
    s1_strength = jnp.maximum(envelope[rpos_c] - floor[rpos_c], 0)
    strong = s1_strength > c.penalty_waiver_strength_ratio * floor[rpos_c]
    next_rpos_c = jnp.clip(next_rpos, 0, n - 1)
    ratio_ok = (envelope[next_rpos_c] / (envelope[rpos_c] + 1e-9)
                < c.penalty_waiver_max_s2_s1_ratio)
    cand = rvalid & noise_flag & has_next & next_noise & strong & ratio_ok
    (cand_rslot, cand_pos, cand_next), count, over = compact_slots(
        cand, capacity,
        [(rslot.astype(jnp.int32), jnp.int32(rcap)),
         (rpos.astype(jnp.int32), jnp.int32(n)),
         (next_rpos.astype(jnp.int32), jnp.int32(n))])
    return cand_rslot, cand_pos, cand_next, count, over


def _fix_iteration(
    s1_pos, s1_count, cand, rcap: int, classes,
    envelope, floor, sample_rate, cfg: AnalyzerConfig,
):
    """One iteration of stage 5.  ``cand`` is the loop-invariant compacted
    candidate tuple from ``_static_candidates``.  Returns updated (s1_pos,
    s1_count, classes, corrections_made, overflowed)."""
    c = cfg.correction
    cap = s1_pos.shape[0]
    n = envelope.shape[0]
    dtype = envelope.dtype
    sr = jnp.asarray(sample_rate, dtype)
    margin = c.margin_beats

    slot = jnp.arange(cap)
    valid = slot < s1_count
    pos = jnp.where(valid, s1_pos, n)

    enough = s1_count >= margin * 2

    rr = (pos[1:] - pos[:-1]).astype(dtype) / sr
    rr_valid = slot[:-1] < s1_count - 1

    # One sort serves q1, q3 AND the IQR-filtered median: the stable subset
    # (q1-1.5*IQR < rr < q3+1.5*IQR) is a contiguous run of the sorted valid
    # prefix, so its median is an interpolated lookup — bit-identical to
    # masked_quantile on the stable mask, 1 sort instead of 3 per iteration.
    big = jnp.finfo(dtype).max
    s = jnp.sort(jnp.where(rr_valid, rr, big))
    nvr = jnp.sum(rr_valid.astype(jnp.int32))

    def q_at(qv, m, offset):
        p = qv * jnp.maximum(m - 1, 0).astype(dtype)
        lo = jnp.clip(jnp.floor(p).astype(jnp.int32), 0, jnp.maximum(m - 1, 0))
        hi = jnp.clip(jnp.ceil(p).astype(jnp.int32), 0, jnp.maximum(m - 1, 0))
        frac = p - lo.astype(dtype)
        out = s[offset + lo] * (1 - frac) + s[offset + hi] * frac
        return jnp.where(m > 0, out, jnp.nan)

    q1 = q_at(0.25, nvr, 0)
    q3 = q_at(0.75, nvr, 0)
    iqr = q3 - q1
    lo_b, hi_b = q1 - 1.5 * iqr, q3 + 1.5 * iqr
    a = jnp.sum((rr_valid & (rr <= lo_b)).astype(jnp.int32))
    m = jnp.sum((rr_valid & (rr < hi_b)).astype(jnp.int32)) - a
    any_stable = m >= 1
    median_rr = q_at(0.5, m, a)
    short_thresh = median_rr * c.rr_correction_threshold_pct
    long_thresh = median_rr * c.rr_correction_long_interval_pct

    active = enough & any_stable

    # ---- pass 1: promote noise pairs inside long gaps ---------------------
    gap_slot = slot  # gap g spans (pos[g], pos[g+1])
    gap_in_margin = (gap_slot >= margin) & (gap_slot < s1_count - 1 - margin)
    gap_long = gap_in_margin & (rr_padded(rr, cap) > long_thresh)

    cand_rslot, cand_pos, cand_next, cand_count, _ = cand
    ccap = cand_pos.shape[0]
    cslot = jnp.arange(ccap, dtype=jnp.int32)
    cvalid = cslot < cand_count

    gap_of = jnp.searchsorted(pos, cand_pos, side="right") - 1
    gap_of_c = jnp.clip(gap_of, 0, cap - 1)
    next_s1 = pos[jnp.minimum(gap_of_c + 1, cap - 1)]
    in_gap = (gap_of >= 0) & (cand_pos > pos[gap_of_c]) & (cand_pos < next_s1)
    s2_in_gap = cand_next < next_s1

    cand_ok = (active & cvalid & in_gap & gap_long[gap_of_c] & s2_in_gap)

    # first qualifying candidate per gap (segmented min over candidate
    # slots; stable compaction keeps raw-slot order, so min candidate slot
    # == min raw slot == the reference's "first pair in the gap")
    first_per_gap = jnp.full((cap,), ccap, jnp.int32).at[gap_of_c].min(
        jnp.where(cand_ok, cslot, ccap)
    )
    promoted_gap0 = gap_long & (first_per_gap < ccap)
    promoted_cslot = jnp.where(promoted_gap0, first_per_gap, ccap)
    promoted_s1_rslot = jnp.where(
        promoted_gap0, cand_rslot[jnp.clip(promoted_cslot, 0, ccap - 1)], rcap)
    promote_mask_s1 = jnp.zeros((rcap + 1,), jnp.bool_).at[promoted_s1_rslot].set(
        True, mode="drop")[:rcap]
    promote_mask_s2 = jnp.concatenate([jnp.zeros((1,), jnp.bool_), promote_mask_s1[:-1]])

    n_promoted = jnp.sum(promoted_gap0.astype(jnp.int32))
    classes = jnp.where(promote_mask_s1, types.S1_CORRECTED_GAP, classes)
    classes = jnp.where(promote_mask_s2, types.S2_CORRECTED_GAP, classes)
    # noise_flag is sticky (ORIGINAL_REASON keeps the "Noise" substring).

    # Merge promoted S1 positions into the S1 list — closed form, no sort:
    # a promotion in gap g lands immediately after pos[g], so its merged
    # slot is g + (promotions in gaps <= g), and pos[i] shifts right by the
    # promotions in gaps < i.  One cumsum over gaps + two slot scatters.
    # INVARIANT PRODUCER SITE: ``prom_pos`` comes from ``cand_pos`` — raw
    # peak positions — so every merged position remains a member of the
    # NMS-spaced raw peak set (min spacing >= the peak-finder distance).
    # ``analytics._bpm_series``'s gather-free smoothing window RELIES on
    # this bound; never write an interpolated/synthesized position here
    # (tests/test_corrections.py::test_final_positions_subset_of_raw_peaks
    # enforces it).
    promoted_gap = promoted_gap0
    prom_csum = jnp.cumsum(promoted_gap.astype(jnp.int32))  # promotions <= g
    prom_before = jnp.concatenate([jnp.zeros((1,), jnp.int32), prom_csum[:-1]])
    merged_count = s1_count + n_promoted
    # Capacity overflow drops the tail — surfaced via the returned flag.
    overflowed = active & (merged_count > cap)
    merged_count = jnp.minimum(merged_count, cap)
    slot_a = jnp.where(valid, slot + prom_before, cap + 1)
    merged = jnp.full((cap + 1,), n, pos.dtype).at[slot_a].set(
        pos, mode="drop")
    prom_pos = cand_pos[jnp.clip(promoted_cslot, 0, ccap - 1)]
    slot_b = jnp.where(promoted_gap, slot + prom_csum, cap + 1)
    merged = merged.at[slot_b].set(prom_pos, mode="drop")[:cap]
    merged = jnp.where(jnp.arange(cap) < merged_count, merged, n)

    # ---- pass 2: remove the weaker of too-close adjacent beats ------------
    mslot = jnp.arange(cap)
    mvalid = mslot < merged_count
    mpos = jnp.where(mvalid, merged, n)
    mamp = envelope[jnp.clip(mpos, 0, n - 1)]

    # The reference's sequential adjacent-pair walk has a closed form.  Step
    # i removes the weaker of (i, i+1) when both alive and too close; the
    # only cross-step state is "was peak i removed by step i-1's rm_b" (step
    # j only ever writes slots j and j+1).  Let C_i = static conflict
    # predicate and E_i = "b is not stronger" (so a conflict at i removes
    # i+1).  Then rm_b_i = (C&E)_i & ~rm_b_{i-1}: within each maximal run of
    # (C&E) it alternates T,F,T,... from the run start — pure parity,
    # computed with one cummax.  No scan, no per-step scatters.
    mnext = jnp.minimum(mslot + 1, cap - 1)
    in_range = active & (mslot >= margin) & (mslot < merged_count - 1 - margin)
    interval = (mpos[mnext] - mpos[mslot]).astype(dtype) / sr
    C = in_range & (interval < short_thresh)
    E = ~(mamp[mnext] > mamp[mslot])
    ce = C & E
    last_non_ce = lax.cummax(jnp.where(~ce, mslot, -1))
    prev_non_ce = jnp.concatenate([jnp.full((1,), -1), last_non_ce[:-1]])
    rm_b = ce & (((mslot - prev_non_ce) & 1) == 1)
    rm_b_prev = jnp.concatenate([jnp.zeros((1,), jnp.bool_), rm_b[:-1]])
    conflicts = C & ~rm_b_prev                  # the walk's per-step conflict
    rm_a = conflicts & ~E
    removed = rm_a | rm_b_prev
    n_removed = jnp.sum(conflicts.astype(jnp.int32))

    keep = mvalid & ~removed
    out_pos, out_count = series.compact_valid(mpos, keep, fill=n)

    corrections = jnp.where(active, n_promoted + n_removed, 0).astype(jnp.int32)
    # When inactive, pass through unchanged.
    out_pos = jnp.where(active, out_pos, s1_pos)
    out_count = jnp.where(active, out_count, s1_count).astype(jnp.int32)
    return (out_pos.astype(jnp.int32), out_count,
            classes.astype(jnp.int32), corrections, overflowed)


def rr_padded(rr, cap):
    return jnp.concatenate([rr, jnp.full((1,), jnp.inf, rr.dtype)])[:cap]


def refine_and_correct(
    s1_pos, s1_count, raw_pos, raw_count, classes,
    envelope, floor, sample_rate, cfg: AnalyzerConfig,
) -> CorrectionResult:
    """Stages 4 + 5 (reference ``_refine_and_correct_peaks``,
    bpm_analysis.py:1655-1698).

    INVARIANT (relied on downstream): every position this returns is a
    member of ``raw_pos`` — corrections only drop peaks or promote existing
    raw peaks, never synthesize new positions.  Final beats therefore stay
    at least the peak-finder NMS distance apart, which is what lets
    ``analytics._bpm_series`` bound its smoothing window's slot span and use
    the gather-free rolling-mean path.  A correction stage that interpolated
    NEW beat positions would silently break that bound — route such
    positions through ``raw_pos`` or disable the bounded-window fast path.
    """
    s1_pos = jnp.asarray(s1_pos, jnp.int32)
    s1_count = jnp.asarray(s1_count, jnp.int32)
    raw_pos = jnp.asarray(raw_pos, jnp.int32)
    raw_count = jnp.asarray(raw_count, jnp.int32)
    classes = jnp.asarray(classes, jnp.int32)
    precorrection = classes
    if not cfg.correction.enable_correction_pass:
        return CorrectionResult(s1_pos, s1_count, classes, precorrection,
                                jnp.asarray(False))

    pos, count = rhythm_correction(s1_pos, s1_count, envelope, sample_rate, cfg)

    # "Noise" substring flag: NOISE class now; sticky through promotions.
    noise_flag = classes == types.NOISE
    rcap = raw_pos.shape[0]
    *cand_arrays, cand_count, cand_over = _static_candidates(
        raw_pos, raw_count, noise_flag, envelope, floor,
        s1_pos.shape[0], cfg)
    cand = (*cand_arrays, cand_count, cand_over)

    # The reference iterates until an iteration makes no corrections (<= 5);
    # a while_loop reproduces that early exit — on realistic recordings the
    # fixer converges after one working iteration, so this runs 2 of the 5
    # paid by a static fori_loop (~115 ms/iteration at B=128 on chip).
    # Under vmap the loop runs until every batch row converges.
    def w_cond(state):
        _, _, _, still_active, _, it = state
        return still_active & (it < cfg.correction.max_iterations)

    def w_body(state):
        pos, count, classes, still_active, ovf, it = state
        new_pos, new_count, new_classes, corrections, new_ovf = (
            _fix_iteration(
                pos, count, cand, rcap, classes,
                envelope, floor, sample_rate, cfg,
            ))
        take = still_active
        pos = jnp.where(take, new_pos, pos)
        count = jnp.where(take, new_count, count)
        classes = jnp.where(take, new_classes, classes)
        ovf = ovf | (take & new_ovf)
        still_active = still_active & (corrections > 0)
        return (pos, count, classes, still_active, ovf, it + 1)

    state = (pos, count, classes, jnp.asarray(True),
             jnp.asarray(False), jnp.asarray(0, jnp.int32))
    state = lax.while_loop(w_cond, w_body, state)
    pos, count, classes, _, overflowed, _ = state
    # Candidate-slot overflow only matters when promotions could have been
    # missed, i.e. the candidate population exceeded the S1 capacity too.
    overflowed = overflowed | cand_over
    return CorrectionResult(pos, count, classes, precorrection, overflowed)
