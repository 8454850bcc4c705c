"""One-seed ground-truth comparison of compat vs antialias decimation.

Regenerates the native fleet seed's TRUE beat schedule (the generator's
phase accumulator is deterministic), runs both preprocessing paths on the
same WAV, and prints count/F1/offset stats for each — the number that
decides whether the FIR path is a real accuracy win, independent of the
compat-path CPU oracle it is expected to diverge from.
"""
import dataclasses
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

from bench import (  # noqa: E402
    MINUTES, NATIVE_SR, SR, _bench_cfg, beat_f1, write_native_files)

SEED = int(sys.argv[1]) if len(sys.argv) > 1 else 0


def true_beats(seed: int, sr: int = NATIVE_SR) -> np.ndarray:
    """Beat sample positions the generator embedded (bench.synth_recording_native)."""
    rng = np.random.RandomState(10_000 + seed)
    n = sr * 60 * MINUTES
    t = np.arange(n) / sr
    dur = t[-1]
    walk = rng.standard_normal(n).cumsum() * (1e-4 / np.sqrt(sr / SR))
    hr = np.interp(t, [0, dur * 0.3, dur * 0.5, dur * 0.8, dur],
                   [80, 170, 150, 95, 95]) + walk
    hr = np.clip(hr, 60, 200)
    phase = np.cumsum(hr / 60.0 / sr)
    return np.nonzero(np.diff(np.floor(phase), prepend=0.0) > 0)[0] / sr


def main():
    paths = write_native_files(max(SEED + 1, 4))
    path = paths[SEED]
    truth = true_beats(SEED)

    from bpm_analysis_tpu import host_batch
    from bpm_analysis_tpu.models import envelope as envm

    base = _bench_cfg(64, "auto", candidates=3072, work_factor=8,
                      prom_factor=2.0, extrema_capacity=32768)
    aa = dataclasses.replace(
        base, compat=dataclasses.replace(base.compat,
                                         antialias_decimation=True))
    for tag, cfg in [("compat", base), ("antialias", aa)]:
        rate = NATIVE_SR // envm.safe_downsample_factor(NATIVE_SR, cfg)
        results, errors = host_batch.analyze_files_batched(
            [path], cfg, os.path.dirname(path), max_batch=1, render=False)
        assert not errors, errors
        res = results[path]
        beats = np.asarray(res.final_positions)[: int(res.final_count)] / rate
        f1 = beat_f1(beats, truth)
        # offset stats of matched beats
        j = np.searchsorted(truth, beats)
        j = np.clip(j, 1, len(truth) - 1)
        near = np.where(np.abs(truth[j] - beats) < np.abs(truth[j - 1] - beats),
                        truth[j], truth[j - 1])
        d = beats - near
        matched = np.abs(d) < 0.25
        print(f"{tag}: n={len(beats)} truth={len(truth)} F1_true={f1:.4f} "
              f"matched={int(matched.sum())} "
              f"offset mean={d[matched].mean()*1000:.1f}ms "
              f"sd={d[matched].std()*1000:.1f}ms "
              f"unmatched_head={beats[~matched][:5]}")


if __name__ == "__main__":
    main()
