"""Sub-stage TPU timing of the preliminary pass + analytics at the bench
config (amortized timing: 10 dispatches per sync)."""
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
from bpm_analysis_tpu.models import analytics, classifier, noise_floor, pipeline  # noqa: E402

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 128
cfg = AnalyzerConfig(runtime=RuntimeConfig(
    max_raw_peaks=4096, max_troughs=4096, max_candidates=2048, dtype="float32",
    noise_quantile_stride=64, quantile_backend="pallas",
    extrema_capacity=24576, prominence_work_factor=2.0))


def _force(out):
    leaves = jax.tree_util.tree_leaves(out)
    np.asarray(_probe(leaves[0]))


@jax.jit
def _probe(x):
    return jnp.sum(jnp.abs(x.astype(jnp.float32)))


REPS = 10


def timed(name, fn, *args):
    out = fn(*args)
    _force(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(REPS):
            out = fn(*args)
        _force(out)
        best = min(best, (time.time() - t0) / REPS)
    print(f"{name:26s} {best * 1e3:9.1f} ms", flush=True)
    return out


def main():
    rows = []
    for s in range(BATCH):
        sig = synth_recording(s)
        peak = max(np.abs(sig).max(), 1)
        rows.append(np.int16(sig / peak * 32767).astype(np.float32))
    xs = jax.device_put(jnp.asarray(np.stack(rows)))
    env = jax.jit(jax.vmap(lambda v: envm.preprocess(v, SR, cfg)[0]))(xs)
    nf = jax.jit(jax.vmap(lambda e: noise_floor.dynamic_noise_floor(e, SR, cfg)))(env)
    peaks = jax.jit(jax.vmap(lambda e, f: pipeline.raw_peaks(e, f, SR, cfg)))(env, nf.floor)
    hints = jnp.full((BATCH,), jnp.nan, env.dtype)
    _force(peaks)
    print("setup done", flush=True)

    prelim_fn = jax.jit(jax.vmap(
        lambda e, f, pos, cnt, h: pipeline.preliminary_pass(
            e, f, type(peaks)(pos, cnt, jnp.zeros((), bool)), SR, h, cfg)))
    prelim = timed("preliminary (full)", prelim_fn, env, nf.floor,
                   peaks.positions, peaks.count, hints)

    cfg_hc = cfg.with_pairing_threshold(cfg.pairing.preliminary_confidence_threshold)
    clf_fn = jax.jit(jax.vmap(
        lambda e, f, pos, cnt, h: classifier.classify(
            e, f, pos, cnt, SR, h, cfg_hc)))
    cres = timed("  prelim classifier", clf_fn, env, nf.floor,
                 peaks.positions, peaks.count,
                 jnp.full((BATCH,), cfg.rhythm.default_start_bpm, env.dtype))

    bpm_fn = jax.jit(jax.vmap(
        lambda p, c: analytics.bpm_series(p, c, SR, cfg, env.dtype)))
    bpm = timed("  bpm_series", bpm_fn, cres.s1_positions, cres.s1_count)

    rec_fn = jax.jit(jax.vmap(lambda b: analytics.recovery_phase(b, cfg)))
    timed("  recovery_phase", rec_fn, bpm)

    met_fn = jax.jit(jax.vmap(
        lambda p, c: analytics.compute_metrics(p, c, SR, cfg, env.dtype)))
    timed("metrics (full)", met_fn, cres.s1_positions, cres.s1_count)

    hrv_fn = jax.jit(jax.vmap(
        lambda p, c: analytics.windowed_hrv(p, c, SR, cfg, env.dtype)))
    timed("  windowed_hrv", hrv_fn, cres.s1_positions, cres.s1_count)

    slopes_fn = jax.jit(jax.vmap(
        lambda b: (analytics.peak_recovery(b, cfg), analytics.peak_exertion(b, cfg))))
    timed("  peak slopes", slopes_fn, bpm)

    maj_fn = jax.jit(jax.vmap(
        lambda b: (analytics.major_slopes(b, cfg, True),
                   analytics.major_slopes(b, cfg, False))))
    timed("  major_slopes", maj_fn, bpm)

    hrr_fn = jax.jit(jax.vmap(lambda b: analytics.hrr(b, cfg)))
    timed("  hrr", hrr_fn, bpm)


if __name__ == "__main__":
    main()
