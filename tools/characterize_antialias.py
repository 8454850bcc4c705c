"""Characterize the north-star anti-aliased preprocessing path.

The reference decimates BEFORE filtering with no anti-alias filter
(bpm_analysis.py:1031-1045), folding everything above the post-decimation
Nyquist into the band the band-pass keeps.  ``compat.antialias_decimation``
(SURVEY §7 step 2) instead FIR-decimates at the native rate
(ops/filter.fir_decimate) and filters at the decimated rate.  This tool
answers the two questions that decide whether it should be the default:

1. accuracy — worst-case beat F1 / BPM MAE vs the float64 CPU reference
   oracles on the 64-file native fleet, compat vs antialias;
2. cost — end-to-end batched rate of each path on the same fleet (the
   antialias path must ship full 44.1 kHz samples to the device, so on a
   bandwidth-limited link it is H2D-bound; the compat path host-decimates
   and ships ~1/145th the bytes).

Usage: python tools/characterize_antialias.py [N_FILES]
Prints one JSON line per path plus a comparison line; paste the table into
README/ARCHITECTURE.
"""
import dataclasses
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

from bench import (  # noqa: E402
    CPU_NATIVE_FILE, MINUTES, NATIVE_BATCH, NATIVE_SR, _bench_cfg, beat_f1,
    bpm_mae, write_native_files)

N_FILES = int(sys.argv[1]) if len(sys.argv) > 1 else 64


def run_fleet(paths, cfg, tag):
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from bpm_analysis_tpu import host_batch
    from bpm_analysis_tpu.models import envelope as envm

    outdir = os.path.dirname(paths[0])
    # Warmup compile on one chunk.
    host_batch.analyze_files_batched(paths[:NATIVE_BATCH], cfg, outdir,
                                     max_batch=NATIVE_BATCH, render=False)
    lanes = {}
    t0 = time.time()
    results, errors = host_batch.analyze_files_batched(
        paths, cfg, outdir, max_batch=NATIVE_BATCH, render=False,
        lane_stats=lanes)
    elapsed = time.time() - t0
    if errors:
        raise RuntimeError(f"{tag}: per-file errors {errors[:3]}")

    rate = NATIVE_SR // envm.safe_downsample_factor(NATIVE_SR, cfg)
    with open(CPU_NATIVE_FILE) as f:
        oracle = json.load(f)["per_seed"]
    f1s, maes = [], []
    for seed, path in enumerate(paths):
        res = results[path]
        beats = np.asarray(res.final_positions)[: int(res.final_count)] / rate
        k = int(res.metrics.bpm.count)
        times = np.asarray(res.metrics.bpm.times)[:k]
        values = np.asarray(res.metrics.bpm.smoothed)[:k]
        o = oracle[str(seed)]
        f1s.append(beat_f1(beats, o["beat_times"]))
        maes.append(bpm_mae(o["bpm_times"], o["bpm_values"], times, values))
    row = {
        "path": tag,
        "audio_min_per_sec": round(len(paths) * MINUTES / elapsed, 2),
        "worst_beat_f1": round(float(min(f1s)), 4),
        "worst_bpm_mae": round(float(max(maes)), 4),
        "mean_bpm_mae": round(float(np.mean(maes)), 4),
        "n_files": len(paths),
        "lanes": {k: round(v, 2) for k, v in sorted(lanes.items())},
    }
    print(json.dumps(row), flush=True)
    return row


def main():
    paths = write_native_files(N_FILES)
    if not os.path.exists(CPU_NATIVE_FILE):
        raise SystemExit("run bench.py (or tools/make_fleet_oracles.py) "
                         "first to cache the CPU oracles")

    base = _bench_cfg(64, "auto", candidates=3072, work_factor=8,
                      prom_factor=2.0, extrema_capacity=32768)
    compat_row = run_fleet(paths, base, "compat (stride decimation)")

    aa_cfg = dataclasses.replace(
        base, compat=dataclasses.replace(base.compat,
                                         antialias_decimation=True))
    aa_row = run_fleet(paths, aa_cfg, "antialias (FIR decimation)")

    print(json.dumps({
        "comparison": {
            "f1_delta": round(aa_row["worst_beat_f1"]
                              - compat_row["worst_beat_f1"], 4),
            "mae_delta": round(aa_row["worst_bpm_mae"]
                               - compat_row["worst_bpm_mae"], 4),
            "rate_ratio": round(aa_row["audio_min_per_sec"]
                                / compat_row["audio_min_per_sec"], 3),
        }
    }))


if __name__ == "__main__":
    main()
