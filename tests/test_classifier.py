import pytest
import numpy as np
import jax.numpy as jnp

from bpm_analysis_tpu import types
from bpm_analysis_tpu.config import DEFAULT_CONFIG
from bpm_analysis_tpu.models import classifier


_MAIN_PASS_CACHE = {}


def _run_main_pass(oracle, cfg=DEFAULT_CONFIG):
    # Several tests assert different fields of the same (pure) classify run;
    # cfg is frozen/hashable, so memoize per config instead of re-executing
    # the ~12 s CPU scan four times.
    if cfg not in _MAIN_PASS_CACHE:
        _MAIN_PASS_CACHE[cfg] = _run_main_pass_uncached(oracle, cfg)
    return _MAIN_PASS_CACHE[cfg]


def _run_main_pass_uncached(oracle, cfg):
    env = jnp.asarray(oracle["envelope"])
    floor = jnp.asarray(oracle["noise_floor"])
    sr = int(oracle["sample_rate"])
    peaks = oracle["all_raw_peaks"]
    cap = cfg.runtime.max_raw_peaks
    pos = np.full(cap, len(env), dtype=np.int32)
    pos[: len(peaks)] = peaks
    return classifier.classify(
        env, floor, jnp.asarray(pos), jnp.asarray(len(peaks)), sr,
        float(oracle["start_bpm"]), cfg,
        peak_bpm_time_sec=float(oracle["peak_time"]),
        recovery_end_time_sec=float(oracle["recovery_time"]),
    )


def test_smoothed_deviation_matches_oracle(oracle):
    res = _run_main_pass(oracle)
    n_dev = len(oracle["all_raw_peaks"]) - 1
    got = np.asarray(res.smoothed_deviation)[:n_dev]
    np.testing.assert_allclose(got, oracle["smoothed_dev_values"], rtol=1e-9)


def test_classifications_match_oracle(oracle):
    res = _run_main_pass(oracle)
    peaks = oracle["all_raw_peaks"]
    got_codes = np.asarray(res.trace.peak_class)[: len(peaks)]
    exp_codes = types.labels_to_codes(oracle["labels"])
    mismatches = np.nonzero(got_codes != exp_codes)[0]
    assert mismatches.size == 0, (
        f"{mismatches.size} mismatches at slots {mismatches[:10]}: "
        f"got {got_codes[mismatches[:10]]} expected {exp_codes[mismatches[:10]]}"
    )


def test_s1_peaks_match_oracle(oracle):
    res = _run_main_pass(oracle)
    count = int(res.s1_count)
    got = np.asarray(res.s1_positions)[:count]
    np.testing.assert_array_equal(got, oracle["s1_peaks"])


def test_belief_trajectory_matches_oracle(oracle):
    res = _run_main_pass(oracle)
    times = np.asarray(res.trace.belief_time_sec)
    beliefs = np.asarray(res.trace.belief)
    mask = ~np.isnan(times)
    np.testing.assert_allclose(times[mask], oracle["lt_bpm_times"], rtol=1e-12)
    np.testing.assert_allclose(beliefs[mask], oracle["lt_bpm_values"], rtol=1e-9)


def test_anchor_pass_matches_oracle(oracle):
    cfg = DEFAULT_CONFIG.with_pairing_threshold(
        DEFAULT_CONFIG.pairing.preliminary_confidence_threshold
    )
    env = jnp.asarray(oracle["envelope"])
    floor = jnp.asarray(oracle["noise_floor"])
    sr = int(oracle["sample_rate"])
    peaks = oracle["all_raw_peaks"]
    cap = cfg.runtime.max_raw_peaks
    pos = np.full(cap, len(env), dtype=np.int32)
    pos[: len(peaks)] = peaks
    res = classifier.classify(
        env, floor, jnp.asarray(pos), jnp.asarray(len(peaks)), sr, None_to_default(), cfg
    )
    count = int(res.s1_count)
    np.testing.assert_array_equal(np.asarray(res.s1_positions)[:count], oracle["anchor_beats"])


def None_to_default():
    # Reference: start hint None -> 80.0 (bpm_analysis.py:103)
    return 80.0


def test_want_trace_false_identical_beats():
    """classify(want_trace=False) is a pure DCE knob: the anchor/beat set
    must be bit-identical to the traced run, with ``trace`` None (the
    preliminary pass runs this mode, pipeline.py)."""
    import dataclasses

    rng = np.random.RandomState(11)
    sr = 302
    n = sr * 30
    env = np.abs(rng.randn(n)).astype(np.float64) * 5
    period = int(60.0 / 110.0 * sr)
    beats = np.arange(2, n // period) * period
    env[beats] += 400.0
    s2 = beats + int(0.3 * period)
    env[s2[s2 < n]] += 150.0
    peaks = np.sort(np.concatenate([beats, s2[s2 < n]])).astype(np.int32)
    floor = np.full(n, 20.0)

    cfg = dataclasses.replace(
        DEFAULT_CONFIG,
        runtime=dataclasses.replace(DEFAULT_CONFIG.runtime,
                                    max_raw_peaks=256, max_troughs=128,
                                    max_candidates=128))
    cap = cfg.runtime.max_raw_peaks
    pos = np.full(cap, n, dtype=np.int32)
    pos[: len(peaks)] = peaks
    args = (jnp.asarray(env), jnp.asarray(floor), jnp.asarray(pos),
            jnp.asarray(len(peaks)), sr, 110.0, cfg)
    ref = classifier.classify(*args)
    lean = classifier.classify(*args, want_trace=False)
    assert lean.trace is None
    np.testing.assert_array_equal(np.asarray(lean.s1_positions),
                                  np.asarray(ref.s1_positions))
    assert int(lean.s1_count) == int(ref.s1_count)
    assert bool(lean.s1_overflowed) == bool(ref.s1_overflowed)


@pytest.mark.slow
def test_unroll_width_invariance():
    """classifier_unroll is a pure scheduling knob: any width must produce
    bit-identical classifications, S1 sets, and deviation series (the vulpine
    oracle was also verified identical at widths 4/8/16 offline)."""
    import dataclasses

    rng = np.random.RandomState(7)
    sr = 302
    n = sr * 30
    env = np.abs(rng.randn(n)).astype(np.float64) * 5
    period = int(60.0 / 95.0 * sr)
    beats = np.arange(2, n // period) * period
    env[beats] += 400.0
    s2 = beats + int(0.33 * period)
    env[s2[s2 < n]] += 150.0
    peaks = np.sort(np.concatenate([beats, s2[s2 < n]])).astype(np.int32)
    floor = np.full(n, 20.0)

    sigs = []
    for u in (1, 4, 8):
        cfg = dataclasses.replace(
            DEFAULT_CONFIG,
            runtime=dataclasses.replace(DEFAULT_CONFIG.runtime,
                                        max_raw_peaks=128, max_troughs=128,
                                        max_candidates=64,
                                        classifier_unroll=u))
        cap = cfg.runtime.max_raw_peaks
        pos = np.full(cap, n, dtype=np.int32)
        pos[: len(peaks)] = peaks
        res = classifier.classify(
            jnp.asarray(env), jnp.asarray(floor), jnp.asarray(pos),
            jnp.asarray(len(peaks)), sr, 95.0, cfg)
        sigs.append((
            np.asarray(res.trace.peak_class)[: len(peaks)],
            np.asarray(res.s1_positions)[: int(res.s1_count)],
            np.asarray(res.smoothed_deviation)[: len(peaks) - 1],
        ))
    for got in sigs[1:]:
        np.testing.assert_array_equal(got[0], sigs[0][0])
        np.testing.assert_array_equal(got[1], sigs[0][1])
        np.testing.assert_array_equal(got[2], sigs[0][2])
