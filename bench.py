"""Benchmark: batched 10-minute PCG analysis throughput on one TPU chip.

Measures the BASELINE.json headline metric — audio-min/sec/chip on batched
10-minute recordings with auto initial-BPM estimation (configs[4]) — and
compares against the reference CPU engine (engine stages only, reports
excluded on both sides) on the same synthetic recording.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "audio-min/sec/chip", "vs_baseline": N}

The CPU baseline is measured once (imports the reference from
/root/reference with a plotly stub) and cached in ``bench_cpu_baseline.json``
so repeat runs don't re-pay it; delete the file to re-measure.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
CPU_BASELINE_FILE = os.path.join(REPO, "bench_cpu_baseline.json")

SR = 302
MINUTES = 10
N_SAMPLES = SR * 60 * MINUTES
BATCH = 64


def synth_recording(seed: int) -> np.ndarray:
    """Synthetic band-passed phonocardiogram: S1/S2 pulse train following an
    exertion/recovery HR profile (80 → 170 → 95 BPM), light noise."""
    rng = np.random.RandomState(seed)
    t = np.arange(N_SAMPLES) / SR
    dur = t[-1]
    hr = np.interp(t, [0, dur * 0.3, dur * 0.5, dur * 0.8, dur],
                   [80, 170, 150, 95, 95]) + rng.randn(N_SAMPLES).cumsum() * 1e-4
    hr = np.clip(hr, 60, 200)
    phase = np.cumsum(hr / 60.0 / SR)
    impulses = np.zeros(N_SAMPLES, np.float32)
    beat_mask = np.diff(np.floor(phase), prepend=0.0) > 0
    beats = np.nonzero(beat_mask)[0]
    impulses[beats] = 1000.0 * (1 + 0.1 * rng.randn(len(beats)))
    rr = 60.0 / hr[beats] * SR
    s2 = (beats + 0.33 * rr).astype(int)
    s2 = s2[s2 < N_SAMPLES]
    impulses[s2] = 450.0 * (1 + 0.1 * rng.randn(len(s2)))
    kernel = (np.exp(-np.arange(36) / 7.0) * np.cos(np.arange(36) * 0.85)).astype(np.float32)
    sig = np.convolve(impulses, kernel, mode="same")
    sig += rng.randn(N_SAMPLES).astype(np.float32) * 8.0
    return sig.astype(np.float32)


def measure_tpu(batch_size: int = BATCH, backend: str = "xla",
                stride: int = 64) -> float:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from bpm_analysis_tpu.config import AnalyzerConfig, RuntimeConfig
    from bpm_analysis_tpu.models import envelope as envm, pipeline

    cfg = AnalyzerConfig(runtime=RuntimeConfig(
        max_raw_peaks=4096, max_troughs=4096, max_candidates=2048, dtype="float32",
        noise_quantile_stride=stride, quantile_backend=backend))

    # Same int16 quantization the CPU reference reads from its WAV, and the
    # same full preprocessing (band-pass filtfilt at the 302 Hz rate —
    # downsample clamps to 1) so both engines see identical signals.
    def quantize(sig):
        peak = np.max(np.abs(sig)) or 1.0
        return (np.int16(sig / peak * 32767)).astype(np.float32)

    batch = np.stack([quantize(synth_recording(s)) for s in range(batch_size)])

    fn = jax.jit(lambda xs: pipeline.analyze_batch(
        jax.vmap(lambda x: envm.preprocess(x, SR, cfg)[0])(xs), SR, cfg))

    # Warmup / compile.
    res = fn(jnp.asarray(batch))
    counts = np.asarray(res.final_count)
    assert (counts > 100).all(), f"bench sanity: too few beats {counts[:4]}"
    beats0 = np.asarray(res.final_positions[0])[: counts[0]] / SR

    best = float("inf")
    for i in range(3):
        fresh = jnp.asarray(batch + np.float32(i + 1) * 1e-3)
        # Ensure the host->device transfer has completed before the clock
        # starts (jnp.asarray stages asynchronously; production overlaps
        # transfers with compute via the batched front-end).
        np.asarray(jnp.sum(fresh))
        t0 = time.time()
        res = fn(fresh)
        np.asarray(res.final_count)  # forces completion (block is lazy on axon)
        best = min(best, time.time() - t0)
    return batch_size * MINUTES / best, beats0


def measure_cpu_reference() -> float:
    """Reference engine throughput (audio-min/sec) on one synthetic
    recording, engine stages only (preprocess → noise floor → prelim →
    classifier → corrections → metrics)."""
    if os.path.exists(CPU_BASELINE_FILE):
        with open(CPU_BASELINE_FILE) as f:
            return json.load(f)["audio_min_per_sec"]

    import tempfile
    import types as pytypes

    # Stub plotly (reference imports it at module scope; not installed here).
    if "plotly" not in sys.modules:
        plotly = pytypes.ModuleType("plotly")
        go = pytypes.ModuleType("plotly.graph_objects")
        subplots = pytypes.ModuleType("plotly.subplots")
        go.Scatter = object
        subplots.make_subplots = lambda *a, **k: None
        plotly.graph_objects = go
        plotly.subplots = subplots
        sys.modules.update({"plotly": plotly, "plotly.graph_objects": go,
                            "plotly.subplots": subplots})
    sys.path.insert(0, "/root/reference")
    import bpm_analysis as ref
    import config as ref_config

    from bpm_analysis_tpu.io import wav as wavio

    sig = synth_recording(0)
    params = dict(ref_config.DEFAULT_PARAMS)
    params["save_filtered_wav"] = False
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "bench.wav")
        peak = np.max(np.abs(sig)) or 1.0
        wavio.write(path, SR, np.int16(sig / peak * 32767))

        t0 = time.time()
        envelope, sr2 = ref.preprocess_audio(path, params, td)
        floor, troughs = ref._calculate_dynamic_noise_floor(envelope, sr2, params)
        start_bpm, pk, rec = ref._run_preliminary_pass(envelope, sr2, params, floor,
                                                       troughs, None)
        clf = ref.PeakClassifier(envelope, sr2, params, start_bpm, floor, troughs, pk, rec)
        s1, raw, analysis = clf.classify_peaks()
        final, analysis = ref._refine_and_correct_peaks(s1, raw, analysis, envelope,
                                                        sr2, params)
        ref._calculate_final_metrics(final, sr2, params)
        elapsed = time.time() - t0

    value = MINUTES / elapsed
    with open(CPU_BASELINE_FILE, "w") as f:
        json.dump({"audio_min_per_sec": value, "elapsed_sec_per_10min_file": elapsed,
                   "final_beat_times_sec": (np.asarray(final) / sr2).tolist()},
                  f, indent=2)
    return value


def beat_f1(times_a, times_b, tol=0.05):
    """Beat-level F1 with a time-match tolerance (BASELINE accuracy metric)."""
    a = np.sort(np.asarray(times_a))
    b = np.sort(np.asarray(times_b))
    if len(a) == 0 or len(b) == 0:
        return 0.0
    idx = np.searchsorted(b, a)
    near = np.minimum(
        np.abs(a - b[np.clip(idx, 0, len(b) - 1)]),
        np.abs(a - b[np.clip(idx - 1, 0, len(b) - 1)]),
    )
    tp = np.sum(near <= tol)
    precision = tp / len(a)
    recall = tp / len(b)
    return 2 * precision * recall / max(precision + recall, 1e-9)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=BATCH,
                   help="recordings per device batch (default 64)")
    p.add_argument("--backend", default="auto", choices=["xla", "pallas", "auto"],
                   help="noise-floor quantile backend")
    p.add_argument("--stride", type=int, default=64,
                   help="noise-floor quantile anchor stride")
    p.add_argument("--sweep", action="store_true",
                   help="print a batch-size scaling curve (8/16/32/64) as extra "
                        "JSON lines before the headline line")
    args = p.parse_args()

    if args.sweep:
        for b in (8, 16, 32, 64):
            t, _ = measure_tpu(b, args.backend, args.stride)
            print(json.dumps({"metric": "sweep", "batch": b,
                              "value": round(t, 2), "unit": "audio-min/sec/chip"}),
                  file=sys.stderr)

    tpu, beats0 = measure_tpu(args.batch, args.backend, args.stride)
    try:
        cpu = measure_cpu_reference()
        with open(CPU_BASELINE_FILE) as f:
            ref_beats = json.load(f).get("final_beat_times_sec")
        f1 = beat_f1(beats0, ref_beats) if ref_beats else None
    except Exception:
        cpu, f1 = None, None
    out = {
        "metric": "batched 10-min PCG analysis throughput",
        "value": round(tpu, 2),
        "unit": "audio-min/sec/chip",
        "vs_baseline": round(tpu / cpu, 2) if cpu else None,
    }
    if f1 is not None:
        out["beat_f1_vs_cpu_reference"] = round(float(f1), 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
