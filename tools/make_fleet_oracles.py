"""Extend the cached CPU-reference accuracy oracles to the FULL bench fleets.

Round-3 verdict item 3: accuracy was sampled (4 seeds); the north-star claim
(beat F1 >= 0.99, BPM MAE < 0.5 vs the CPU reference) should be worst-case
over every recording in both bench configurations.  This script runs the
reference engine (/root/reference/bpm_analysis.py, stages 1-6, no reports)
on every recording of:

* the 302 Hz engine batch  (bench.synth_recording, seeds 0..127)
    -> bench_cpu_baseline.json
* the native 44.1 kHz fleet (bench.write_native_files, seeds 0..63)
    -> bench_cpu_native.json

and appends each per-seed oracle (beat times + smoothed BPM curve)
incrementally, so an interrupted run resumes where it stopped.  The oracles
are deterministic pure numpy/pandas, so the cache is machine-independent and
once-ever.  Run under ``nice -n 19``: one full pass is ~5 h of single-core
reference CPU.
"""
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402


def _flush(path: str, data: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(data, f)
    os.replace(tmp, path)


def extend_native(n_files: int = bench.NATIVE_FILES) -> None:
    paths = bench.write_native_files(n_files)
    with open(bench.CPU_NATIVE_FILE) as f:
        data = json.load(f)
    per_seed = data["per_seed"]
    with tempfile.TemporaryDirectory() as td:
        for seed in range(n_files):
            if str(seed) in per_seed:
                continue
            t0 = time.time()
            per_seed[str(seed)] = bench._run_reference_engine(paths[seed], td)
            _flush(bench.CPU_NATIVE_FILE, data)
            print(f"native oracle {seed}: {time.time() - t0:.1f}s", flush=True)


def extend_engine(n_seeds: int = bench.BATCH) -> None:
    from bpm_analysis_tpu.io import wav as wavio

    with open(bench.CPU_BASELINE_FILE) as f:
        data = json.load(f)
    per_seed = data["per_seed"]
    with tempfile.TemporaryDirectory() as td:
        for seed in range(n_seeds):
            if str(seed) in per_seed:
                continue
            t0 = time.time()
            path = os.path.join(td, f"bench_{seed}.wav")
            wavio.write(path, bench.SR,
                        bench._quantize_int16(bench.synth_recording(seed)))
            per_seed[str(seed)] = bench._run_reference_engine(path, td)
            os.remove(path)
            _flush(bench.CPU_BASELINE_FILE, data)
            print(f"engine oracle {seed}: {time.time() - t0:.1f}s", flush=True)


def extend_stress(n_seeds: int = bench.BATCH) -> None:
    from bpm_analysis_tpu.io import wav as wavio

    if os.path.exists(bench.CPU_STRESS_FILE):
        with open(bench.CPU_STRESS_FILE) as f:
            data = json.load(f)
    else:
        data = {"per_seed": {}}
    per_seed = data["per_seed"]
    with tempfile.TemporaryDirectory() as td:
        for seed in range(n_seeds):
            if str(seed) in per_seed:
                continue
            t0 = time.time()
            path = os.path.join(td, f"stress_{seed}.wav")
            wavio.write(path, bench.SR,
                        bench._quantize_int16(bench.synth_stress_recording(seed)))
            try:
                per_seed[str(seed)] = bench._run_reference_engine(path, td)
            except Exception as e:  # hostile input: agreement-on-failure seed
                per_seed[str(seed)] = {"error": str(e)[:200], "beat_times": []}
            os.remove(path)
            _flush(bench.CPU_STRESS_FILE, data)
            print(f"stress oracle {seed}: {time.time() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("native", "both"):
        extend_native()
    if which in ("engine", "both"):
        extend_engine()
    if which in ("stress", "both"):
        extend_stress()
    print("fleet oracles complete", flush=True)
