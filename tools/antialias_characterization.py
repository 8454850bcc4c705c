"""Characterize the north-star anti-aliased decimation path (VERDICT r3 #6).

The reference decimates native-rate audio by pure striding with NO
anti-alias filter (reference bpm_analysis.py:1031-1045, contradicting its
own README:6), folding everything above the post-decimation Nyquist into
the band the beat detector reads.  ``compat.antialias_decimation=True`` is
this repo's fix: band-pass at the native rate, FIR-decimate, then analyze.
SURVEY §7 step 2 proposed it as the eventual default; this tool produces the
evidence table that decision needs:

    for each path (compat strided / antialias):
        worst-case beat F1 + BPM MAE vs the GROUND TRUTH beat grid
        (the synthetic fleet's generator phase accumulator — the thing
        neither path has seen), plus the same vs the CPU reference,
        plus the end-to-end fleet rate (the antialias path ships the full
        44.1 kHz signal through the band-pass, so its rate bounds the
        H2D + native-rate-filter cost).

Run on the TPU bench host:  python tools/antialias_characterization.py
Writes ANTIALIAS_r04.json at the repo root and prints a markdown table.
"""
import dataclasses
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402  (bench.py at the repo root: fleet + oracles)


def ground_truth_beats(seed: int, sr: int = bench.NATIVE_SR) -> np.ndarray:
    """Beat times (s) straight out of the synthetic generator's phase
    accumulator — regenerated, not stored, so it can't drift from the WAVs
    (same RNG stream as bench.synth_recording_native)."""
    rng = np.random.RandomState(10_000 + seed)
    n = sr * 60 * bench.MINUTES
    t = np.arange(n) / sr
    dur = t[-1]
    walk = rng.standard_normal(n).cumsum() * (1e-4 / np.sqrt(sr / bench.SR))
    hr = np.interp(t, [0, dur * 0.3, dur * 0.5, dur * 0.8, dur],
                   [80, 170, 150, 95, 95]) + walk
    hr = np.clip(hr, 60, 200)
    phase = np.cumsum(hr / 60.0 / sr)
    beats = np.nonzero(np.diff(np.floor(phase), prepend=0.0) > 0)[0]
    return beats / sr, t, hr


def run_fleet(native_paths, antialias: bool, stride: int = 64,
              backend: str = "auto"):
    """(rate, curves) for the 64-file fleet under one decimation path."""
    from bpm_analysis_tpu import host_batch
    from bpm_analysis_tpu.models import envelope as envm

    bench._enable_cache()
    cfg = bench._bench_cfg(stride, backend, candidates=3072, work_factor=8,
                           prom_factor=2.0, extrema_capacity=32768)
    if antialias:
        cfg = dataclasses.replace(
            cfg, compat=dataclasses.replace(cfg.compat,
                                            antialias_decimation=True))
    outdir = os.path.dirname(native_paths[0])

    batchn = bench.NATIVE_BATCH
    host_batch.analyze_files_batched(native_paths[:batchn], cfg, outdir,
                                     max_batch=batchn, render=False)
    t0 = time.time()
    results, errors = host_batch.analyze_files_batched(
        native_paths, cfg, outdir, max_batch=batchn, render=False)
    elapsed = time.time() - t0
    if errors:
        raise RuntimeError(f"fleet errors ({'aa' if antialias else 'compat'}): "
                           f"{errors[:3]}")

    rate = bench.NATIVE_SR // envm.safe_downsample_factor(bench.NATIVE_SR, cfg)
    curves = {}
    for seed, p in enumerate(native_paths):
        res = results[p]
        beats = np.asarray(res.final_positions)[: int(res.final_count)] / rate
        k = int(res.metrics.bpm.count)
        curves[seed] = (beats, np.asarray(res.metrics.bpm.times)[:k],
                        np.asarray(res.metrics.bpm.smoothed)[:k])
    return len(native_paths) * bench.MINUTES / elapsed, curves


def score(curves, native_paths) -> dict:
    """Worst-case F1/MAE vs ground truth across the fleet.  MAE compares the
    smoothed BPM curve against the generator's instantaneous HR profile at
    the curve's own sample times (the smoother necessarily lags a moving
    target, so this is an upper bound on curve error, comparable BETWEEN the
    two paths rather than against the <0.5 reference-parity ceiling)."""
    f1s, maes = [], []
    for seed in range(len(native_paths)):
        gt_beats, t, hr = ground_truth_beats(seed)
        beats, times, values = curves[seed]
        f1s.append(bench.beat_f1(beats, gt_beats))
        if len(times):
            hr_at = np.interp(times, t, hr)
            maes.append(float(np.mean(np.abs(values - hr_at))))
    return {"worst_beat_f1_vs_truth": round(float(min(f1s)), 4),
            "mean_beat_f1_vs_truth": round(float(np.mean(f1s)), 4),
            "worst_bpm_mae_vs_truth": round(float(max(maes)), 3),
            "mean_bpm_mae_vs_truth": round(float(np.mean(maes)), 3)}


def main():
    n_files = int(os.environ.get("AA_FILES", bench.NATIVE_FILES))
    native_paths = bench.write_native_files(n_files)

    out = {}
    for name, aa in (("compat_strided", False), ("antialias", True)):
        rate, curves = run_fleet(native_paths, antialias=aa)
        row = score(curves, native_paths)
        row["e2e_audio_min_per_sec"] = round(rate, 2)
        out[name] = row
        print(f"[{name}] {row}", file=sys.stderr)

    # Reference parity for the compat path only (the antialias path differs
    # from the reference BY DESIGN — its yardstick is the ground truth).
    try:
        cpu = bench.measure_cpu_native(native_paths)
        rate, curves = run_fleet(native_paths, antialias=False)
        acc = bench._accuracy_rows(cpu["per_seed"], curves)
        out["compat_strided"]["beat_f1_vs_cpu_reference"] = \
            acc["beat_f1_vs_cpu_reference"]
        out["compat_strided"]["bpm_mae_vs_cpu_reference"] = \
            acc["bpm_mae_vs_cpu_reference"]
    except Exception as e:
        out["reference_parity_error"] = str(e)[:200]

    with open(os.path.join(REPO, "ANTIALIAS_r04.json"), "w") as f:
        json.dump(out, f, indent=1)

    c, a = out["compat_strided"], out["antialias"]
    print("| path | worst F1 vs truth | mean F1 | worst MAE vs truth | "
          "mean MAE | e2e audio-min/s |")
    print("|---|---|---|---|---|---|")
    for name, r in (("compat (stride decimation)", c), ("antialias FIR", a)):
        print(f"| {name} | {r['worst_beat_f1_vs_truth']} | "
              f"{r['mean_beat_f1_vs_truth']} | {r['worst_bpm_mae_vs_truth']} | "
              f"{r['mean_bpm_mae_vs_truth']} | {r['e2e_audio_min_per_sec']} |")


if __name__ == "__main__":
    main()
