import numpy as np
import jax.numpy as jnp

from bpm_analysis_tpu import types
from bpm_analysis_tpu.config import DEFAULT_CONFIG
from bpm_analysis_tpu.models import corrections


def test_corrections_on_vulpine(oracle):
    cfg = DEFAULT_CONFIG
    env = jnp.asarray(oracle["envelope"])
    floor = jnp.asarray(oracle["noise_floor"])
    sr = int(oracle["sample_rate"])
    n = len(env)

    raw = oracle["all_raw_peaks"]
    rcap = cfg.runtime.max_raw_peaks
    rpos = np.full(rcap, n, dtype=np.int32)
    rpos[: len(raw)] = raw

    s1 = oracle["s1_peaks"]
    ccap = cfg.runtime.max_candidates
    spos = np.full(ccap, n, dtype=np.int32)
    spos[: len(s1)] = s1

    classes = types.labels_to_codes(oracle["labels"])
    cpad = np.zeros(rcap, dtype=np.int32)
    cpad[: len(classes)] = classes

    res = corrections.refine_and_correct(
        jnp.asarray(spos), jnp.asarray(len(s1)), jnp.asarray(rpos),
        jnp.asarray(len(raw)), jnp.asarray(cpad), env, floor, sr, cfg,
    )
    count = int(res.count)
    np.testing.assert_array_equal(np.asarray(res.positions)[:count], oracle["final_peaks"])

    got_final_classes = np.asarray(res.classes)[: len(raw)]
    exp_final = types.labels_to_codes(oracle["final_labels"])
    mism = np.nonzero(got_final_classes != exp_final)[0]
    assert mism.size == 0, f"{mism.size} class mismatches at {mism[:10]}"


def test_rhythm_correction_conflict_resolution():
    # Synthetic: peaks at regular 100-sample RR with one 20-sample intruder.
    env = np.zeros(1000)
    pos = np.array([100, 200, 300, 320, 400, 500, 600])
    env[pos] = [10, 10, 10, 5, 10, 10, 10]  # intruder at 320 is weaker
    cap = 64
    p = np.full(cap, 1000, np.int32)
    p[: len(pos)] = pos
    got_pos, got_count = corrections.rhythm_correction(
        jnp.asarray(p), jnp.asarray(len(pos)), jnp.asarray(env), 302, DEFAULT_CONFIG
    )
    kept = np.asarray(got_pos)[: int(got_count)]
    np.testing.assert_array_equal(kept, [100, 200, 300, 400, 500, 600])


def test_rhythm_correction_replacement():
    # Intruder is *stronger* -> replaces the previous peak.
    env = np.zeros(1000)
    pos = np.array([100, 200, 300, 320, 400, 500, 600])
    env[pos] = [10, 10, 5, 10, 10, 10, 10]
    cap = 64
    p = np.full(cap, 1000, np.int32)
    p[: len(pos)] = pos
    got_pos, got_count = corrections.rhythm_correction(
        jnp.asarray(p), jnp.asarray(len(pos)), jnp.asarray(env), 302, DEFAULT_CONFIG
    )
    kept = np.asarray(got_pos)[: int(got_count)]
    np.testing.assert_array_equal(kept, [100, 200, 320, 400, 500, 600])


def test_final_positions_subset_of_raw_peaks(oracle):
    """THE smoothing-bound invariant (produced in corrections.py's gap-merge,
    consumed by analytics._bpm_series's gather-free window): every final beat
    position is a member of the NMS-spaced raw peak set, so adjacent final
    beats are >= the peak-finder distance apart."""
    cfg = DEFAULT_CONFIG
    env = jnp.asarray(oracle["envelope"])
    floor = jnp.asarray(oracle["noise_floor"])
    sr = int(oracle["sample_rate"])
    n = len(env)

    raw = np.asarray(oracle["all_raw_peaks"])
    rcap = cfg.runtime.max_raw_peaks
    rpos = np.full(rcap, n, dtype=np.int32)
    rpos[: len(raw)] = raw
    s1 = oracle["s1_peaks"]
    ccap = cfg.runtime.max_candidates
    spos = np.full(ccap, n, dtype=np.int32)
    spos[: len(s1)] = s1
    cpad = np.zeros(rcap, dtype=np.int32)
    cpad[: len(types.labels_to_codes(oracle["labels"]))] = types.labels_to_codes(
        oracle["labels"])

    res = corrections.refine_and_correct(
        jnp.asarray(spos), jnp.asarray(len(s1)), jnp.asarray(rpos),
        jnp.asarray(len(raw)), jnp.asarray(cpad), env, floor, sr, cfg,
    )
    final = np.asarray(res.positions)[: int(res.count)]
    assert np.isin(final, raw).all(), "corrections synthesized a position"
    min_dist = int(cfg.features.min_peak_distance_sec * sr)
    assert (np.diff(final) >= min_dist).all(), (
        "final beats closer than the NMS distance - the gather-free BPM "
        "smoothing bound in analytics._bpm_series no longer holds")
