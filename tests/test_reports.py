"""Report-layer parity vs the reference's shipped vulpine artifacts.

The bundled sample WAV is the int16-*normalized* filtered signal
(bpm_analysis.py:1049 scales by 32767/max), so absolute amplitudes differ
from the original run by one constant factor; every ratio-based quantity
(classifications, confidences, BPM) is unaffected.  The debug-log test
therefore checks decision text exactly and amplitude lines up to that
constant scale.
"""
import os
import re

import numpy as np
import jax.numpy as jnp
import pytest

from bpm_analysis_tpu.config import DEFAULT_CONFIG
from bpm_analysis_tpu.models import envelope as envm, pipeline
from bpm_analysis_tpu.reports import debug_log, summary, trace

# Full float64 vulpine pipeline fixture -> slow tier (golden parity suite).
pytestmark = pytest.mark.slow

GOLDEN_DIR = "/root/reference/samples"


@pytest.fixture(scope="module")
def result(oracle):
    env = envm.envelope_from_filtered(
        jnp.asarray(oracle["raw_signal"].astype(np.float64)), int(oracle["sample_rate"])
    )
    return pipeline.analyze_envelope(env, int(oracle["sample_rate"]), DEFAULT_CONFIG), env


def test_debug_strings_match_oracle_strings(result):
    import json

    res, _ = result
    ours = trace.debug_strings(res, DEFAULT_CONFIG)
    with open("tests/golden/vulpine_debug_info.json") as f:
        golden = {int(k): v for k, v in json.load(f).items()}
    assert set(ours.keys()) == set(golden.keys())
    mismatches = [k for k in golden if ours[k] != golden[k]]
    assert not mismatches, (
        f"{len(mismatches)} differing debug strings; first at {mismatches[0]}:\n"
        f"OURS:   {ours[mismatches[0]]!r}\nGOLDEN: {golden[mismatches[0]]!r}"
    )


@pytest.mark.skipif(not os.path.exists(GOLDEN_DIR), reason="reference not mounted")
def test_debug_log_parity(result, tmp_path):
    res, env = result
    text = debug_log.render(res, DEFAULT_CONFIG, np.asarray(env),
                            302, "vulpine.wav")
    ours_lines = [l for l in text.splitlines() if not l.startswith("Analysis performed on")]
    with open(os.path.join(GOLDEN_DIR, "vulpine_Debug_Log.md")) as f:
        golden_lines = [l for l in f.read().splitlines()
                        if not l.startswith("Analysis performed on")]

    amp_re = re.compile(r"- \*\*(Raw Amp|Noise Floor)\*\*: `([\d\.]+)`")

    def split(lines):
        decisions, amps = [], []
        for l in lines:
            m = amp_re.match(l)
            if m:
                amps.append(float(m.group(2)))
                decisions.append(f"- **{m.group(1)}**: <amp>")
            else:
                decisions.append(l)
        return decisions, np.array(amps)

    ours_d, ours_a = split(ours_lines)
    gold_d, gold_a = split(golden_lines)
    # Decision text: identical line-by-line (amplitudes masked).  The
    # bundled WAV is int16-quantized, which shifts a handful of trough
    # timestamps by one sample vs the original float run — allow only that.
    assert len(ours_d) == len(gold_d), (len(ours_d), len(gold_d))
    time_re = re.compile(r"## Time: `([\d\.]+)s`")
    hard_diffs = []
    for i, (a, b) in enumerate(zip(ours_d, gold_d)):
        if a == b:
            continue
        ma, mb = time_re.match(a), time_re.match(b)
        if ma and mb and abs(float(ma.group(1)) - float(mb.group(1))) <= 0.05:
            continue
        hard_diffs.append(i)
    assert not hard_diffs, (
        f"{len(hard_diffs)} differing lines; first: "
        f"{ours_d[hard_diffs[0]]!r} vs {gold_d[hard_diffs[0]]!r}"
    )
    # Amplitudes: constant scale (int16 normalization of the bundled WAV).
    ratio = gold_a / np.maximum(ours_a, 1e-9)
    assert np.std(ratio) / np.mean(ratio) < 0.02, "amplitude ratio not constant"


@pytest.mark.skipif(not os.path.exists(GOLDEN_DIR), reason="reference not mounted")
def test_summary_parity(result):
    res, _ = result
    text = summary.render(res, "vulpine.wav")
    ours = [l for l in text.splitlines() if not l.startswith("*Generated on")]
    with open(os.path.join(GOLDEN_DIR, "vulpine_Analysis_Summary.md")) as f:
        golden = [l for l in f.read().splitlines() if not l.startswith("*Generated on")]
    assert ours == golden


def test_plot_feature_checklist(result, tmp_path):
    """The figure carries the reference's full feature set
    (bpm_analysis.py:672-780): slope segments, min/max annotations, the
    summary box, and the scaled amplitude axis — in whichever backend is
    active (plotly when installed, the SVG fallback otherwise)."""
    from bpm_analysis_tpu.reports import plot as plot_mod

    res, env = result
    fig, path = plot_mod.save(res, DEFAULT_CONFIG, np.asarray(env),
                              int(res.metrics.bpm.count * 0 + 302), "vulpine.wav",
                              str(tmp_path))
    html_text = open(path, encoding="utf-8").read()

    segs = plot_mod.slope_segments(res.metrics)
    kinds = {s["kind"] for s in segs}
    # The vulpine recording has exertion and recovery phases, so the steepest
    # slopes must exist; the figure must carry every produced segment kind.
    assert "Peak Exertion Slope" in kinds and "Peak Recovery Slope" in kinds
    for kind in kinds:
        assert kind in html_text, f"missing slope trace {kind!r}"
    assert "Max:" in html_text and "Min:" in html_text
    assert "Analysis Summary" in html_text
    assert "1-Min HRR" in html_text

    if fig is not None:  # plotly backend
        names = {t.name for t in fig.data}
        assert {"Audio Envelope", "Dynamic Noise Floor", "Average BPM"} <= names
        # amplitude axis uses the configured scale factor
        rng = fig.layout.yaxis.range
        robust = float(np.quantile(np.asarray(env), 0.95))
        assert abs(rng[1] - robust * DEFAULT_CONFIG.output.plot_amplitude_scale_factor) < 1e-6

    ext = plot_mod.bpm_extrema(res.metrics)
    assert ext is not None
    max_bpm, _, min_bpm, _ = ext
    assert f"Max: {max_bpm:.1f} BPM" in html_text
    assert f"Min: {min_bpm:.1f} BPM" in html_text


class _StubScatter:
    def __init__(self, **kw):
        self.kw = kw
        self.name = kw.get("name")


class _StubFigure:
    def __init__(self):
        self.data = []
        self.annotations = []
        self.layout_kw = {}
        self.yaxes = []

    def add_trace(self, tr, secondary_y=None):
        tr.kw["secondary_y"] = secondary_y
        self.data.append(tr)

    def add_annotation(self, **kw):
        self.annotations.append(kw)

    def update_layout(self, **kw):
        self.layout_kw.update(kw)

    def update_yaxes(self, **kw):
        self.yaxes.append(kw)

    def write_html(self, path, config=None):
        with open(path, "w", encoding="utf-8") as f:
            f.write("<html>plotly-stub</html>")


def test_plotly_backend_figure(result, tmp_path, monkeypatch):
    """Execute the real plotly figure construction (reference
    bpm_analysis.py:478-780) against recording stubs injected as
    ``plotly.graph_objects`` / ``plotly.subplots`` — plotly itself is not
    installed here, but the figure logic is what real users see."""
    import sys
    import types as pytypes

    from bpm_analysis_tpu.reports import plot as plot_mod

    plotly = pytypes.ModuleType("plotly")
    go = pytypes.ModuleType("plotly.graph_objects")
    subplots = pytypes.ModuleType("plotly.subplots")
    go.Scatter = _StubScatter
    subplots.make_subplots = lambda specs=None: _StubFigure()
    plotly.graph_objects = go
    plotly.subplots = subplots
    for name, mod in (("plotly", plotly), ("plotly.graph_objects", go),
                      ("plotly.subplots", subplots)):
        monkeypatch.setitem(sys.modules, name, mod)

    res, env = result
    fig, path = plot_mod.save(res, DEFAULT_CONFIG, np.asarray(env), 302,
                              "vulpine.wav", str(tmp_path))
    assert fig is not None and os.path.exists(path)

    names = {t.name for t in fig.data}
    assert {"Audio Envelope", "Dynamic Noise Floor", "Troughs", "S1 Beats",
            "S2 Beats", "Average BPM", "BPM Trend (Belief)", "RMSSDc",
            "SDNN"} <= names
    # Slope segments: every produced kind appears as a trace, steepest slopes
    # included (vulpine has both phases).
    kinds = {s["kind"] for s in plot_mod.slope_segments(res.metrics)}
    assert {"Peak Exertion Slope", "Peak Recovery Slope"} <= kinds
    assert kinds <= names

    # Peak traces carry the formatted per-peak decision tooltips.
    s1 = next(t for t in fig.data if t.name == "S1 Beats")
    assert s1.kw["hovertemplate"].startswith("%{customdata}")
    assert any("S1-S2 pairing decision" in c for c in s1.kw["customdata"])

    # Min/max annotations + summary box.
    texts = [a.get("text", "") for a in fig.annotations]
    assert any(t.startswith("Max:") for t in texts)
    assert any(t.startswith("Min:") for t in texts)
    assert any("Analysis Summary" in t for t in texts)
    assert any("1-Min HRR" in t for t in texts)

    # Amplitude axis scaled by plot_amplitude_scale_factor (bpm_analysis.py:503-506).
    amp_axis = next(y for y in fig.yaxes if y.get("secondary_y") is False)
    robust = float(np.quantile(np.asarray(env), 0.95))
    expected = robust * DEFAULT_CONFIG.output.plot_amplitude_scale_factor
    assert abs(amp_axis["range"][1] - expected) < 1e-6
    # Dark theme + unified hover layout, as the reference sets.
    assert fig.layout_kw.get("template") == "plotly_dark"
    assert fig.layout_kw.get("hovermode") == "x unified"
