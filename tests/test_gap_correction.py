"""Stage-5 gap promotion end-to-end: a Noise-labeled pair inside a long
beat gap gets promoted to S1/S2 (Corrected from Gap), with
ORIGINAL_REASON-wrapped debug strings (reference bpm_analysis.py:1344-1375)
— a path the vulpine golden never exercises (0 corrections there)."""
import os
import sys

import numpy as np
import jax.numpy as jnp
import pytest

from bpm_analysis_tpu import types
from bpm_analysis_tpu.config import DEFAULT_CONFIG
from bpm_analysis_tpu.models import envelope as envm, pipeline
from bpm_analysis_tpu.reports import trace

pytestmark = pytest.mark.slow

SR = 302


def _gap_signal():
    """100 BPM S1/S2 train with a 4-period hole containing one weak,
    rhythmically-offset pair: rejected by the classifier (interval penalty /
    S2-ratio penalty) but qualifying for stage-5 promotion."""
    n = SR * 90
    sig = np.zeros(n, np.float32)
    rng = np.random.RandomState(0)
    for k in range(2, 146):
        t0 = k * 0.6
        if 60 <= k <= 62:
            continue
        sig[int(t0 * SR)] = 1000.0
        sig[int((t0 + 0.2) * SR)] = 500.0
    gap_start = 59 * 0.6
    sig[int((gap_start + 0.93) * SR)] = 250.0
    sig[int((gap_start + 1.38) * SR)] = 230.0
    kernel = np.exp(-np.arange(20) / 5.0).astype(np.float32)
    sig = np.convolve(sig, kernel, mode="same")
    sig += np.abs(rng.randn(n)).astype(np.float32) * 2.0
    return sig


@pytest.fixture(scope="module")
def result():
    sig = _gap_signal()
    env = envm.envelope_from_filtered(jnp.asarray(sig), SR)
    return pipeline.analyze_envelope(env, SR, DEFAULT_CONFIG), env


def test_gap_promotion_fires(result):
    res, _ = result
    n = int(res.raw_peak_count)
    cls = np.asarray(res.classes)[:n]
    pre = np.asarray(res.precorrection_classes)[:n]
    s1_idx = np.nonzero(cls == types.S1_CORRECTED_GAP)[0]
    s2_idx = np.nonzero(cls == types.S2_CORRECTED_GAP)[0]
    assert len(s1_idx) == 1 and len(s2_idx) == 1
    assert s2_idx[0] == s1_idx[0] + 1  # the immediately following raw peak
    assert pre[s1_idx[0]] == types.NOISE and pre[s2_idx[0]] == types.NOISE
    # Promoted peaks enter the final beat list.
    pos = np.asarray(res.raw_peak_positions)[:n]
    finals = set(np.asarray(res.final_positions)[: int(res.final_count)].tolist())
    assert int(pos[s1_idx[0]]) in finals


def test_gap_promotion_debug_strings(result):
    res, _ = result
    d = trace.debug_strings(res, DEFAULT_CONFIG)
    corrected = [s for s in d.values() if "Corrected from Gap" in s]
    assert len(corrected) == 2
    for s in corrected:
        parts = s.split("§")
        assert parts[1] == "ORIGINAL_REASON"
        assert parts[2] == types.NOISE_LOG_NAME  # original class prefix
        assert "PAIRING_FAIL_REASON" in parts


@pytest.mark.skipif(not os.path.isdir("/root/reference"),
                    reason="reference not mounted")
def test_gap_promotion_matches_reference(result):
    """Live parity: the reference engine promotes the same pair on the same
    envelope."""
    sys.path.insert(0, os.path.dirname(__file__))
    from make_oracle import load_reference

    ref, ref_config = load_reference()
    res, env = result
    params = dict(ref_config.DEFAULT_PARAMS)
    env_np = np.asarray(env, dtype=np.float64)

    floor, troughs = ref._calculate_dynamic_noise_floor(env_np, SR, params)
    start_bpm, pk, rec = ref._run_preliminary_pass(env_np, SR, params, floor,
                                                   troughs, None)
    clf = ref.PeakClassifier(env_np, SR, params, start_bpm, floor, troughs, pk, rec)
    s1, raw, analysis = clf.classify_peaks()
    final, analysis = ref._refine_and_correct_peaks(s1, raw, analysis, env_np,
                                                    SR, params)
    ref_corr = {p for p, s in analysis["beat_debug_info"].items()
                if "Corrected from Gap" in s}

    n = int(res.raw_peak_count)
    cls = np.asarray(res.classes)[:n]
    pos = np.asarray(res.raw_peak_positions)[:n]
    ours_corr = {int(p) for p, c in zip(pos, cls)
                 if c in (types.S1_CORRECTED_GAP, types.S2_CORRECTED_GAP)}
    assert ours_corr == ref_corr
    np.testing.assert_array_equal(
        np.asarray(res.final_positions)[: int(res.final_count)], final)
