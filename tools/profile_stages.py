"""Per-stage TPU timing of the batched pipeline at the bench config.

Usage: python tools/profile_stages.py [BATCH]
Prints per-stage best-of-3 wall times (jitted separately, inputs staged on
device) so perf work targets the measured hotspots (docs/ARCHITECTURE.md).
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from bench import SR, synth_recording  # noqa: E402
from bpm_analysis_tpu.config import AnalyzerConfig, RuntimeConfig  # noqa: E402
from bpm_analysis_tpu.models import envelope as envm  # noqa: E402
from bpm_analysis_tpu.models import classifier, corrections, noise_floor, pipeline, analytics  # noqa: E402

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 32
BACKEND = sys.argv[2] if len(sys.argv) > 2 else "xla"

if len(sys.argv) > 3 and sys.argv[3] == "bench":
    # The exact in-family engine-bench config (bench.measure_tpu) so stage
    # times sum to the headline wall.
    from bench import _bench_cfg

    cfg = _bench_cfg(64, BACKEND, prom_factor=2.5, raw_peaks=2560,
                     residual=512, raw_candidates=16384)
else:
    cfg = AnalyzerConfig(runtime=RuntimeConfig(
        max_raw_peaks=2560, max_troughs=4096, max_candidates=2048,
        dtype="float32",
        noise_quantile_stride=64, quantile_backend=BACKEND,
        prominence_work_factor=2.5,
        extrema_capacity=24576))


def _force(out):
    """block_until_ready is lazy on axon; fetching a reduced scalar forces
    the computation to actually finish (same workaround as bench.py)."""
    leaves = jax.tree_util.tree_leaves(out)
    np.asarray(_probe(leaves[0]))


@jax.jit
def _probe(x):
    return jnp.sum(jnp.abs(x.astype(jnp.float32)))


def timed(name, fn, *args):
    out = fn(*args)
    _force(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        out = fn(*args)
        _force(out)
        best = min(best, time.time() - t0)
    print(f"{name:18s} {best * 1e3:9.1f} ms", flush=True)
    return out


def main():
    rows = []
    for s in range(BATCH):
        sig = synth_recording(s)
        peak = max(np.abs(sig).max(), 1)
        rows.append(np.int16(sig / peak * 32767).astype(np.float32))
    batch = np.stack(rows)
    xs = jax.device_put(jnp.asarray(batch))
    print("data staged", flush=True)

    pre = jax.jit(jax.vmap(lambda x: envm.preprocess(x, SR, cfg)[0]))
    env = timed("preprocess", pre, xs)

    from bpm_analysis_tpu.ops import find_peaks as fpo
    from bpm_analysis_tpu.models import envelope as envmod

    ext_cap = (cfg.runtime.extrema_capacity
               or cfg.runtime.find_peaks_work_factor * cfg.runtime.max_raw_peaks)
    ext_fn = jax.jit(jax.vmap(
        lambda e: fpo.build_extrema(envmod.edge_held(e, None)[1], ext_cap)))
    ext = timed("build_extrema", ext_fn, env)

    nf_fn = jax.jit(jax.vmap(
        lambda e, x: noise_floor.dynamic_noise_floor(e, SR, cfg, extrema=x)))
    nf = timed("noise_floor", nf_fn, env, ext)

    rp_fn = jax.jit(jax.vmap(
        lambda e, f, x: pipeline.raw_peaks(e, f, SR, cfg, extrema=x)))
    peaks = timed("raw_peaks", rp_fn, env, nf.floor, ext)

    hints = jnp.full((BATCH,), jnp.nan, env.dtype)
    prelim_fn = jax.jit(jax.vmap(
        lambda e, f, pos, cnt, h: pipeline.preliminary_pass(
            e, f, type(peaks)(pos, cnt, jnp.zeros((), bool)), SR, h, cfg)))
    prelim = timed("preliminary", prelim_fn, env, nf.floor,
                   peaks.positions, peaks.count, hints)
    start_bpm, peak_time, recovery_end = prelim

    clf_fn = jax.jit(jax.vmap(
        lambda e, f, pos, cnt, sb, pt, re_: classifier.classify(
            e, f, pos, cnt, SR, sb, cfg, peak_bpm_time_sec=pt,
            recovery_end_time_sec=re_)))
    res = timed("classifier", clf_fn, env, nf.floor, peaks.positions,
                peaks.count, start_bpm, peak_time, recovery_end)

    corr_fn = jax.jit(jax.vmap(
        lambda s1p, s1c, pos, cnt, cls, e, f: corrections.refine_and_correct(
            s1p, s1c, pos, cnt, cls, e, f, SR, cfg)))
    corr = timed("corrections", corr_fn, res.s1_positions, res.s1_count,
                 peaks.positions, peaks.count, res.trace.peak_class, env, nf.floor)

    met_fn = jax.jit(jax.vmap(
        lambda p, c: analytics.compute_metrics(p, c, SR, cfg, env.dtype)))
    timed("metrics", met_fn, corr.positions, corr.count)

    full = jax.jit(lambda x: pipeline.analyze_batch(
        jax.vmap(lambda v: envm.preprocess(v, SR, cfg)[0])(x), SR, cfg))
    timed("FULL pipeline", full, xs)


if __name__ == "__main__":
    main()
