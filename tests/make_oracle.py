"""Generate golden oracle artifacts from the reference implementation.

Runs the reference engine (mounted read-only at /root/reference) on the bundled
``vulpine_filtered_debug.wav`` sample and dumps every intermediate the TPU
rebuild needs to test against into ``tests/golden/*.npz``.

The sample WAV is the *post-filter* signal at 302 Hz (reference
``preprocess_audio``, bpm_analysis.py:1007-1062, decimates then band-passes the
original ~90.6 kHz recording).  The envelope is recomputed here exactly the way
the reference's labeler does from the same file (heartbeat_labeler.py:62-67):
``abs`` then a centered rolling mean of ``sr // 10`` samples.  Everything
downstream of the envelope (noise floor, classifier, corrections, analytics)
is the reference's own code, so the dumped artifacts are a bit-exact CPU
oracle for those stages.

Only meant to run inside the build environment (needs /root/reference).  The
generated .npz files are committed so the test-suite never imports the
reference at test time.
"""
import json
import os
import sys
import types

import numpy as np
import pandas as pd

REFERENCE = "/root/reference"
GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def _stub_missing_modules():
    """The reference imports plotly at module scope; stub it (not installed)."""
    if "plotly" not in sys.modules:
        plotly = types.ModuleType("plotly")
        go = types.ModuleType("plotly.graph_objects")
        subplots = types.ModuleType("plotly.subplots")
        go.Scatter = object
        subplots.make_subplots = lambda *a, **k: None
        plotly.graph_objects = go
        plotly.subplots = subplots
        sys.modules["plotly"] = plotly
        sys.modules["plotly.graph_objects"] = go
        sys.modules["plotly.subplots"] = subplots


def load_reference():
    _stub_missing_modules()
    sys.path.insert(0, REFERENCE)
    import bpm_analysis as ref  # noqa: E402
    import config as ref_config  # noqa: E402
    return ref, ref_config


def compute_envelope(wav_path):
    from scipy.io import wavfile

    sample_rate, data = wavfile.read(wav_path)
    data = data.astype(np.float64)
    window = sample_rate // 10
    envelope = (
        pd.Series(np.abs(data)).rolling(window=window, min_periods=1, center=True).mean().values
    )
    return envelope, sample_rate, data


def main():
    ref, ref_config = load_reference()
    params = dict(ref_config.DEFAULT_PARAMS)

    wav_path = os.path.join(REFERENCE, "samples", "vulpine_filtered_debug.wav")
    envelope, sr, raw = compute_envelope(wav_path)
    print(f"envelope: {len(envelope)} samples @ {sr} Hz")

    # --- Stage 1b: dynamic noise floor -------------------------------------
    noise_floor, troughs = ref._calculate_dynamic_noise_floor(envelope, sr, params)
    print(f"troughs: {len(troughs)}  noise floor nan count: {noise_floor.isna().sum()}")

    # Draft floor + raw troughs (pre-sanitization) for unit tests.
    from scipy.signal import find_peaks as scipy_find_peaks

    min_dist = int(params["min_peak_distance_sec"] * sr)
    trough_prom = np.quantile(envelope, params["trough_prominence_quantile"])
    all_troughs, _ = scipy_find_peaks(-envelope, distance=min_dist, prominence=trough_prom)
    trough_series = pd.Series(index=all_troughs, data=envelope[all_troughs])
    dense = trough_series.reindex(np.arange(len(envelope))).interpolate()
    win = int(params["noise_window_sec"] * sr)
    draft = dense.rolling(window=win, min_periods=3, center=True).quantile(
        params["noise_floor_quantile"]
    )
    draft_filled = draft.bfill().ffill()

    # --- Stage 2: preliminary pass -----------------------------------------
    start_bpm, peak_time, recovery_time = ref._run_preliminary_pass(
        envelope, sr, params, noise_floor, troughs, None
    )
    print(f"prelim: start_bpm={start_bpm:.3f} peak_time={peak_time} recovery={recovery_time}")

    # Also capture the anchor-beat pass output itself.
    params_hc = dict(params)
    params_hc["pairing_confidence_threshold"] = 0.75
    clf_hc = ref.PeakClassifier(envelope, sr, params_hc, None, noise_floor, troughs, None, None)
    anchor_beats, _, _ = clf_hc.classify_peaks()

    # --- Stage 3: main classifier ------------------------------------------
    clf = ref.PeakClassifier(
        envelope, sr, params, start_bpm, noise_floor, troughs, peak_time, recovery_time
    )
    s1_peaks, all_raw_peaks, analysis_data = clf.classify_peaks()
    debug_info = analysis_data["beat_debug_info"]
    print(f"raw peaks: {len(all_raw_peaks)}  s1: {len(s1_peaks)}")

    # Per-raw-peak classification labels (the scan-parity oracle).
    labels = [debug_info.get(int(p), "").split("§")[0].split("§")[0] for p in all_raw_peaks]

    # Long-term BPM belief trajectory.
    lt = analysis_data.get("long_term_bpm_series")
    lt_times = np.asarray(lt.index, dtype=np.float64) if lt is not None else np.array([])
    lt_vals = np.asarray(lt.values, dtype=np.float64) if lt is not None else np.array([])

    smoothed_dev = clf.state["smoothed_dev_series"]

    # --- Stages 4+5: corrections -------------------------------------------
    final_peaks, analysis_data = ref._refine_and_correct_peaks(
        s1_peaks, all_raw_peaks, analysis_data, envelope, sr, params
    )
    final_labels = [
        analysis_data["beat_debug_info"].get(int(p), "").split("§")[0] for p in all_raw_peaks
    ]
    print(f"final peaks: {len(final_peaks)}")

    # --- Stage 6: metrics ---------------------------------------------------
    metrics = ref._calculate_final_metrics(final_peaks, sr, params)
    smoothed_bpm = metrics["smoothed_bpm"]
    bpm_times = metrics["bpm_times"]
    hrv = metrics["windowed_hrv_df"]
    hs = metrics["hrv_summary"]
    hrr = metrics["hrr_stats"]
    pex = metrics["peak_exertion_stats"]
    prec = metrics["peak_recovery_stats"]
    print(
        f"avg/min/max bpm: {hs['avg_bpm']:.2f}/{hs['min_bpm']:.2f}/{hs['max_bpm']:.2f} "
        f"rmssdc {hs['avg_rmssdc']:.2f} sdnn {hs['avg_sdnn']:.2f} hrr {hrr['hrr_value_bpm']:.2f}"
    )

    epoch = pd.Timestamp(0)

    def _sec(ts):
        return (ts - epoch).total_seconds()

    os.makedirs(GOLDEN_DIR, exist_ok=True)
    np.savez_compressed(
        os.path.join(GOLDEN_DIR, "vulpine_oracle.npz"),
        sample_rate=sr,
        envelope=envelope,
        raw_signal=raw.astype(np.int16),
        all_troughs=all_troughs,
        draft_noise_floor=draft.values,
        draft_noise_floor_filled=draft_filled.values,
        dense_troughs=dense.values,
        sanitized_troughs=troughs,
        noise_floor=noise_floor.values,
        all_raw_peaks=all_raw_peaks,
        anchor_beats=anchor_beats,
        start_bpm=start_bpm,
        peak_time=np.float64(peak_time if peak_time is not None else np.nan),
        recovery_time=np.float64(recovery_time if recovery_time is not None else np.nan),
        s1_peaks=s1_peaks,
        labels=np.array(labels),
        final_labels=np.array(final_labels),
        final_peaks=final_peaks,
        lt_bpm_times=lt_times,
        lt_bpm_values=lt_vals,
        smoothed_dev_times=np.asarray(smoothed_dev.index, dtype=np.float64),
        smoothed_dev_values=np.asarray(smoothed_dev.values, dtype=np.float64),
        bpm_times=bpm_times,
        smoothed_bpm=np.asarray(smoothed_bpm.values, dtype=np.float64),
        hrv_time=hrv["time"].to_numpy(),
        hrv_rmssdc=hrv["rmssdc"].to_numpy(),
        hrv_sdnn=hrv["sdnn"].to_numpy(),
        hrv_bpm=hrv["bpm"].to_numpy(),
        avg_bpm=hs["avg_bpm"],
        min_bpm=hs["min_bpm"],
        max_bpm=hs["max_bpm"],
        avg_rmssdc=hs["avg_rmssdc"],
        avg_sdnn=hs["avg_sdnn"],
        hrr_value=hrr["hrr_value_bpm"],
        peak_exertion_slope=pex["slope_bpm_per_sec"] if pex else np.nan,
        peak_exertion_start=_sec(pex["start_time"]) if pex else np.nan,
        peak_exertion_end=_sec(pex["end_time"]) if pex else np.nan,
        peak_recovery_slope=prec["slope_bpm_per_sec"] if prec else np.nan,
        peak_recovery_start=_sec(prec["start_time"]) if prec else np.nan,
        peak_recovery_end=_sec(prec["end_time"]) if prec else np.nan,
    )

    # Full debug strings for trace-parity work (JSON, keyed by raw-peak index).
    with open(os.path.join(GOLDEN_DIR, "vulpine_debug_info.json"), "w") as f:
        json.dump({str(k): v for k, v in analysis_data["beat_debug_info"].items()}, f)

    # --- compare with the shipped golden CSV --------------------------------
    golden_csv = pd.read_csv(os.path.join(REFERENCE, "samples", "vulpine_bpm_plot.csv"))
    ours = pd.DataFrame({"t": bpm_times, "bpm": smoothed_bpm.values}).dropna()
    print(f"shipped golden rows: {len(golden_csv)}  oracle rows: {len(ours)}")
    n = min(len(golden_csv), len(ours))
    dt = np.abs(golden_csv["Time (s)"].values[:n] - ours["t"].values[:n])
    db = np.abs(golden_csv["Average BPM"].values[:n] - ours["bpm"].values[:n])
    print(f"time diff max: {dt.max():.4f}  bpm diff max: {db.max():.4f} mean: {db.mean():.4f}")
    print("oracle artifacts written to", GOLDEN_DIR)


if __name__ == "__main__":
    main()
