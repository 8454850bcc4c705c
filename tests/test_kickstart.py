"""Effective kick-start mechanism (compat.kickstart_effective).

The reference's v4.0 kick-start writes a pairing-ratio override that is never
read (bpm_analysis.py:168 — dead code; SURVEY.md §2).  Default compat mode
reproduces the no-op; the flag enables the *documented* behavior
(README.md:9): a collapsed pairing ratio with a persistent lone-S1→noise
pattern overrides the ratio so pairing can resume.
"""
import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from bpm_analysis_tpu.config import DEFAULT_CONFIG, CompatConfig
from bpm_analysis_tpu.models import envelope as envm, pipeline
from bpm_analysis_tpu import types

pytestmark = pytest.mark.slow

SR = 302


def _stuck_signal():
    """S1 every 0.5 s with a companion peak: far (interval-penalized) for the
    first stretch — collapsing the pairing ratio — then near enough that
    only a healthy stability factor lets pairs form."""
    n = SR * 170
    sig = np.zeros(n, np.float32)
    for k in range(2, 238):
        s1 = int(k * 0.7 * SR)
        comp = s1 + (int(0.50 * SR) if k < 80 else int(0.30 * SR))
        if s1 < n:
            sig[s1] = 1000.0
        if comp < n:
            sig[comp] = 420.0
    kernel = np.exp(-np.arange(20) / 5.0).astype(np.float32)
    sig = np.convolve(sig, kernel, mode="same")
    rng = np.random.RandomState(0)
    sig += np.abs(rng.randn(n)).astype(np.float32) * 3.0
    return sig


@pytest.fixture(scope="module")
def stuck_results():
    sig = _stuck_signal()
    env = envm.envelope_from_filtered(jnp.asarray(sig), SR)
    base = pipeline.analyze_envelope(env, SR, DEFAULT_CONFIG)
    ks_cfg = DEFAULT_CONFIG.replace(compat=CompatConfig(kickstart_effective=True))
    ks = pipeline.analyze_envelope(env, SR, ks_cfg)
    return base, ks


def test_kickstart_recovers_pairing(stuck_results):
    base, ks = stuck_results
    n = int(base.raw_peak_count)
    base_pairs = int(np.sum(np.asarray(base.classes)[:n] == types.S1_PAIRED))
    ks_pairs = int(np.sum(np.asarray(ks.classes)[:n] == types.S1_PAIRED))
    # Without the mechanism the late stretch stays lone/noise; with it,
    # pairing resumes.
    assert ks_pairs > base_pairs, (base_pairs, ks_pairs)


def test_kickstart_noop_on_vulpine(oracle):
    """The vulpine recording never collapses its pairing ratio, so enabling
    the mechanism must not change a single classification."""
    env = envm.envelope_from_filtered(
        jnp.asarray(oracle["raw_signal"].astype(np.float64)), int(oracle["sample_rate"])
    )
    ks_cfg = DEFAULT_CONFIG.replace(compat=CompatConfig(kickstart_effective=True))
    res = pipeline.analyze_envelope(env, int(oracle["sample_rate"]), ks_cfg)
    n = int(res.raw_peak_count)
    got = np.asarray(res.classes)[:n]
    exp = types.labels_to_codes(oracle["final_labels"])
    np.testing.assert_array_equal(got, exp)
