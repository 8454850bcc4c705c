"""Characterize the north-star anti-aliased preprocessing path.

The reference decimates BEFORE filtering with no anti-alias filter
(bpm_analysis.py:1031-1045), folding everything above the post-decimation
Nyquist into the band the band-pass keeps.  ``compat.antialias_decimation``
(SURVEY §7 step 2) instead FIR-decimates at the native rate
(ops/filter.fir_decimate) and filters at the decimated rate.  This tool
answers the questions that decide which should be the default:

1. parity — beat F1 / BPM MAE vs the float64 CPU reference oracles on the
   clean native fleet (the compat path must match; the antialias path is
   EXPECTED to diverge — it computes a different, cleaner signal);
2. ground truth — the generator's true beat schedule is deterministic per
   seed, so both paths are scored against it directly: median detection
   offset and offset-corrected recall (the engine reports envelope-peak
   positions, which lag the physical onset by a constant the reference
   shares, so raw-F1-vs-truth is the wrong metric);
3. robustness — the same fleet with an out-of-band 1 kHz tone added
   (amplitude 300 vs beats 1000/S2 450).  Stride decimation at factor 146
   folds 1 kHz to |1000 - 3*302.05| = 93.8 Hz — inside the 20-150 Hz pass
   band — while the FIR rejects it by design (tests/test_decimate.py);
4. cost — end-to-end batched rate of each path.  Round 4 shipped the
   antialias path's full 44.1 kHz PCM through the tunneled H2D link
   (~5 audio-min/s vs 156 compat); round 5 runs the same windowed-sinc FIR
   inside the native decoder's streaming loop (wav_decoder.cpp:
   decode_one_fir), so both paths stage ~180k samples/file and the gap is
   just the in-decode convolution.

Usage: python tools/characterize_antialias.py [N_FILES]
Writes ANTIALIAS_r05.json at the repo root and prints one JSON line per
(fleet, path) row plus a comparison block.
"""
import dataclasses
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

from bench import (  # noqa: E402
    CPU_NATIVE_FILE, MINUTES, NATIVE_BATCH, NATIVE_SR, SR, _bench_cfg,
    beat_f1, bpm_mae, synth_recording_native, write_native_files)
from bpm_analysis_tpu.io import wav as wavio  # noqa: E402

N_FILES = int(sys.argv[1]) if len(sys.argv) > 1 else 8
OOB_TONE_HZ = 1000.0
OOB_TONE_AMP = 300.0


def true_beat_times(seed: int, sr: int = NATIVE_SR) -> np.ndarray:
    """The beat schedule bench.synth_recording_native embedded (its phase
    accumulator is deterministic per seed)."""
    rng = np.random.RandomState(10_000 + seed)
    n = sr * 60 * MINUTES
    t = np.arange(n) / sr
    dur = t[-1]
    walk = rng.standard_normal(n).cumsum() * (1e-4 / np.sqrt(sr / SR))
    hr = np.clip(np.interp(t, [0, dur * 0.3, dur * 0.5, dur * 0.8, dur],
                           [80, 170, 150, 95, 95]) + walk, 60, 200)
    phase = np.cumsum(hr / 60.0 / sr)
    return np.nonzero(np.diff(np.floor(phase), prepend=0.0) > 0)[0] / sr


def write_oob_files(n_files: int) -> list:
    """The native fleet + an out-of-band 1 kHz tone (robustness probe)."""
    outdir = os.path.join(tempfile.gettempdir(), "bpm_bench_native_oob_v1")
    os.makedirs(outdir, exist_ok=True)
    paths = []
    for seed in range(n_files):
        path = os.path.join(outdir, f"rec_oob_{seed:03d}.wav")
        paths.append(path)
        if os.path.exists(path):
            continue
        sig = synth_recording_native(seed)
        t = np.arange(len(sig)) / NATIVE_SR
        sig = sig + OOB_TONE_AMP * np.sin(2 * np.pi * OOB_TONE_HZ * t)
        peak = np.max(np.abs(sig)) or 1.0
        wavio.write(path, NATIVE_SR, np.int16(sig / peak * 32767))
    return paths


def truth_stats(beats: np.ndarray, truth: np.ndarray) -> dict:
    """Median detection offset + offset-corrected recall at 50/75 ms."""
    if len(beats) == 0:
        return {"median_offset_ms": None, "recall50": 0.0, "recall75": 0.0}
    j = np.clip(np.searchsorted(truth, beats), 1, len(truth) - 1)
    near = np.where(np.abs(truth[j] - beats) < np.abs(truth[j - 1] - beats),
                    truth[j], truth[j - 1])
    d = (beats - near) * 1000.0
    dm = d - np.median(d)
    hit50 = np.abs(dm) <= 50.0
    hit75 = np.abs(dm) <= 75.0
    return {"median_offset_ms": round(float(np.median(d)), 1),
            "recall50": round(float(np.sum(hit50) / len(truth)), 4),
            "recall75": round(float(np.sum(hit75) / len(truth)), 4)}


def run_fleet(paths, cfg, fleet, tag, truths, oracle=None,
              batch=NATIVE_BATCH):
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from bpm_analysis_tpu import host_batch
    from bpm_analysis_tpu.models import envelope as envm

    outdir = os.path.dirname(paths[0])
    # Warmup compile on one chunk, then pre-warm the page cache so every
    # path decodes from memory (bench.py writes the fleet right before
    # timing, so its decode lane is cache-warm too).
    host_batch.analyze_files_batched(paths[:batch], cfg, outdir,
                                     max_batch=batch, render=False)
    for p in paths:
        with open(p, "rb") as f:
            while f.read(1 << 24):
                pass
    lanes = {}
    t0 = time.time()
    results, errors = host_batch.analyze_files_batched(
        paths, cfg, outdir, max_batch=batch, render=False, lane_stats=lanes)
    elapsed = time.time() - t0

    rate = NATIVE_SR // envm.safe_downsample_factor(NATIVE_SR, cfg)
    f1s, maes, stats = [], [], []
    n_failed = 0
    for seed, path in enumerate(paths):
        res = results.get(path)
        if res is None:
            # Per-file failure (e.g. capacity overflow that survived the
            # auto-retry) — itself a data point for the hostile fleet.
            n_failed += 1
            stats.append({"median_offset_ms": None,
                          "recall50": 0.0, "recall75": 0.0})
            continue
        beats = np.asarray(res.final_positions)[: int(res.final_count)] / rate
        stats.append(truth_stats(beats, truths[seed]))
        if oracle is not None:
            k = int(res.metrics.bpm.count)
            o = oracle[str(seed)]
            f1s.append(beat_f1(beats, o["beat_times"]))
            maes.append(bpm_mae(o["bpm_times"], o["bpm_values"],
                                np.asarray(res.metrics.bpm.times)[:k],
                                np.asarray(res.metrics.bpm.smoothed)[:k]))
    offsets = [s["median_offset_ms"] for s in stats
               if s["median_offset_ms"] is not None]
    row = {
        "fleet": fleet,
        "path": tag,
        "audio_min_per_sec": round(len(paths) * MINUTES / elapsed, 2),
        "n_files": len(paths),
        "n_failed": n_failed,
        "errors": [str(e)[:120] for e in errors[:3]],
        "truth_median_offset_ms": (round(float(np.median(offsets)), 1)
                                   if offsets else None),
        "truth_worst_recall50": min(s["recall50"] for s in stats),
        "truth_mean_recall50": round(float(np.mean(
            [s["recall50"] for s in stats])), 4),
        "truth_mean_recall75": round(float(np.mean(
            [s["recall75"] for s in stats])), 4),
        "lanes": {k: round(v, 2) for k, v in sorted(lanes.items())},
    }
    if oracle is not None and f1s:
        row["oracle_worst_beat_f1"] = round(float(min(f1s)), 4)
        row["oracle_worst_bpm_mae"] = round(float(max(maes)), 4)
    print(json.dumps(row), flush=True)
    return row


def main():
    clean = write_native_files(max(N_FILES, NATIVE_BATCH))[:N_FILES]
    oob = write_oob_files(N_FILES)
    truths = [true_beat_times(s) for s in range(N_FILES)]
    if not os.path.exists(CPU_NATIVE_FILE):
        raise SystemExit("run bench.py (or tools/make_fleet_oracles.py) "
                         "first to cache the CPU oracles")
    with open(CPU_NATIVE_FILE) as f:
        oracle = json.load(f)["per_seed"]

    base = _bench_cfg(64, "auto", candidates=3072, work_factor=8,
                      prom_factor=2.0, extrema_capacity=32768)
    # The antialias path FIR-decimates inside the native decoder (round 5),
    # so it stages the same ~180k samples/file as compat and runs the same
    # 16-file chunks (round 4 chunked at 4: full-rate f32 intermediates on
    # device no longer exist).
    aa_cfg = dataclasses.replace(
        base, compat=dataclasses.replace(base.compat,
                                         antialias_decimation=True))

    # The folded tone floods the compat path's envelope with spurious peaks
    # (that's the failure being demonstrated); give the hostile fleet 4x
    # capacities so it can run to completion instead of overflowing.
    # Capacities are padding only — they never change results.
    oob_base = _bench_cfg(64, "auto", candidates=12288, work_factor=8,
                          prom_factor=4.0, extrema_capacity=131072)
    oob_aa = dataclasses.replace(
        oob_base, compat=dataclasses.replace(oob_base.compat,
                                             antialias_decimation=True))

    rows = [
        run_fleet(clean, base, "clean", "compat", truths, oracle=oracle),
        run_fleet(clean, aa_cfg, "clean", "antialias", truths, batch=16),
        run_fleet(oob, oob_base, "oob_1khz", "compat", truths, batch=16),
        run_fleet(oob, oob_aa, "oob_1khz", "antialias", truths, batch=16),
    ]
    out = {"rows": rows, "n_files": N_FILES,
           "oob_tone": {"hz": OOB_TONE_HZ, "amp": OOB_TONE_AMP},
           "note": ("both paths stage ~180k FIR/stride-decimated samples "
                    "per file (host-side decimation, round 5).  n_failed counts files whose "
                    "analysis returned ok=False (<2 final beats) — on the "
                    "oob fleet the folded tone swamps the compat path's "
                    "noise floor and NO beats survive")}
    with open(os.path.join(REPO, "ANTIALIAS_r05.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"comparison": {
        "clean_recall50": [rows[0]["truth_mean_recall50"],
                           rows[1]["truth_mean_recall50"]],
        "oob_recall50": [rows[2]["truth_mean_recall50"],
                         rows[3]["truth_mean_recall50"]],
        "rate_ratio": round(rows[1]["audio_min_per_sec"]
                            / rows[0]["audio_min_per_sec"], 3),
    }}))


if __name__ == "__main__":
    main()
