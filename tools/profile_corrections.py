"""Sub-stage TPU timing of the correction passes at the bench config.

Usage: python tools/profile_corrections.py [BATCH]
Splits the 600 ms corrections stage into the stage-4 scan, one stage-5
iteration, and stage-5's internal sorts/merges so the optimization target
is measured.
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
from bpm_analysis_tpu.models import classifier, corrections, noise_floor, pipeline  # noqa: E402
from bpm_analysis_tpu import types  # noqa: E402
from bpm_analysis_tpu.ops import series  # noqa: E402

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 128
if len(sys.argv) > 2 and sys.argv[2] == "bench":
    from bench import _bench_cfg

    cfg = _bench_cfg(64, "xla", prom_factor=2.5, raw_peaks=2560,
                     residual=512, raw_candidates=16384, candidates=1536)
else:
    cfg = AnalyzerConfig(runtime=RuntimeConfig(
        max_raw_peaks=4096, max_troughs=4096, max_candidates=2048,
        dtype="float32",
        noise_quantile_stride=64, quantile_backend="pallas",
        extrema_capacity=24576))


def _force(out):
    leaves = jax.tree_util.tree_leaves(out)
    np.asarray(_probe(leaves[0]))


@jax.jit
def _probe(x):
    return jnp.sum(jnp.abs(x.astype(jnp.float32)))


REPS = 10


def timed(name, fn, *args):
    """Queue REPS async dispatches per sync so the tunneled-TPU roundtrip
    (~30 ms) amortizes — small-kernel timings are meaningless otherwise."""
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

    res = jax.jit(lambda x: pipeline.analyze_batch(
        jax.vmap(lambda v: envm.preprocess(v, SR, cfg)[0])(x), SR, cfg))(xs)
    env = jax.jit(jax.vmap(lambda v: envm.preprocess(v, SR, cfg)[0]))(xs)
    nf = jax.jit(jax.vmap(lambda e: noise_floor.dynamic_noise_floor(e, SR, cfg)))(env)
    peaks = jax.jit(jax.vmap(lambda e, f: pipeline.raw_peaks(e, f, SR, cfg)))(env, nf.floor)
    hints = jnp.full((BATCH,), jnp.nan, env.dtype)
    prelim = jax.jit(jax.vmap(
        lambda e, f, pos, cnt, h: pipeline.preliminary_pass(
            e, f, type(peaks)(pos, cnt, jnp.zeros((), bool)), SR, h, cfg)))(
        env, nf.floor, peaks.positions, peaks.count, hints)
    cres = jax.jit(jax.vmap(
        lambda e, f, pos, cnt, sb, pt, re_: classifier.classify(
            e, f, pos, cnt, SR, sb, cfg, peak_bpm_time_sec=pt,
            recovery_end_time_sec=re_)))(
        env, nf.floor, peaks.positions, peaks.count, *prelim)
    _force(cres)
    print("setup done", flush=True)

    s1p, s1c = cres.s1_positions, cres.s1_count
    classes = cres.trace.peak_class

    full = jax.jit(jax.vmap(
        lambda a, b, c_, d, e, f, g: corrections.refine_and_correct(
            a, b, c_, d, e, f, g, SR, cfg)))
    timed("FULL corrections", full, s1p, s1c, peaks.positions, peaks.count,
          classes, env, nf.floor)

    r4 = jax.jit(jax.vmap(
        lambda p, c_, e: corrections.rhythm_correction(p, c_, e, SR, cfg)))
    pos4 = timed("stage-4 scan", r4, s1p, s1c, env)

    noise_flag = classes == types.NOISE
    rcap = peaks.positions.shape[1]

    def one_iter_fn(p, c_, rp, rc, nfg, cl, e, f):
        *arrs, cnt, over = corrections._static_candidates(
            rp, rc, nfg, e, f, p.shape[0], cfg)
        return corrections._fix_iteration(
            p, c_, (*arrs, cnt, over), rcap, cl, e, f, SR, cfg)

    one_iter = jax.jit(jax.vmap(one_iter_fn))
    timed("one fix_iteration", one_iter, pos4[0], pos4[1], peaks.positions,
          peaks.count, noise_flag, classes, env, nf.floor)

    # micro: sorts at the stage-5 shapes
    cap = s1p.shape[1]
    rr = jnp.abs(jax.random.normal(jax.random.PRNGKey(0), (BATCH, cap - 1),
                                   env.dtype))
    timed("sort (cap-1)", jax.jit(jax.vmap(jnp.sort)), rr)
    both = jnp.concatenate([s1p, peaks.positions[:, :cap]], axis=1)
    timed("sort (2*cap)", jax.jit(jax.vmap(jnp.sort)), both)
    keep = jnp.arange(cap)[None, :] < (s1c[:, None] - 3)
    timed("compact_valid", jax.jit(jax.vmap(
        lambda p, k: series.compact_valid(p, k, fill=0))), s1p, keep)


if __name__ == "__main__":
    main()
