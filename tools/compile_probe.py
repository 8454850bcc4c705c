"""Isolate slow TPU compiles: lower+compile one pipeline sub-kernel at a
time at the bench shapes and print wall times.  Usage:
    python tools/compile_probe.py troughs|rollq|quantile|nmsonly|floor
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from bpm_analysis_tpu.config import AnalyzerConfig, RuntimeConfig
from bpm_analysis_tpu.models import noise_floor
from bpm_analysis_tpu.ops import find_peaks as fp
from bpm_analysis_tpu.ops import quantile as q

cfg = AnalyzerConfig(runtime=RuntimeConfig(
    max_raw_peaks=4096, max_troughs=4096, max_candidates=2048, dtype="float32",
    noise_quantile_stride=64, quantile_backend="xla"))
SR = 302
N = SR * 600
B = 32
which = sys.argv[1] if len(sys.argv) > 1 else "floor"

rng = np.random.RandomState(0)
x = np.abs(rng.randn(B, N)).astype(np.float32) * 100

if which == "interp":
    # interpolate_dense alone at trough capacity over the bench length.
    from bpm_analysis_tpu.ops import series

    pos = np.sort(rng.choice(N, size=4096, replace=False)).astype(np.int32)

    def one(e):
        amp = e[jnp.asarray(pos)]
        return series.interpolate_dense(jnp.asarray(pos), amp,
                                        jnp.int32(1400), N, dtype=e.dtype)

    fn = jax.jit(jax.vmap(one))
elif which == "ti":
    # troughs -> interpolate_dense (no rolling quantile).
    from bpm_analysis_tpu.ops import series

    def one(e):
        tr = fp.find_peaks(-e, 4096, prominence=jnp.float32(1.0),
                           distance=int(0.28 * SR), work_capacity=16384)
        t_pos = jnp.where(jnp.arange(4096) < tr.count, tr.positions, 0)
        return series.interpolate_dense(t_pos, e[t_pos], tr.count, N,
                                        dtype=e.dtype)

    fn = jax.jit(jax.vmap(one))
elif which == "ti_nodist":
    # troughs WITHOUT the distance NMS -> interpolate_dense: isolates the
    # while-loop NMS as the compile-blowup suspect.
    from bpm_analysis_tpu.ops import series

    def one(e):
        tr = fp.find_peaks(-e, 4096, prominence=jnp.float32(1.0),
                           work_capacity=16384)
        t_pos = jnp.where(jnp.arange(4096) < tr.count, tr.positions, 0)
        return series.interpolate_dense(t_pos, e[t_pos], tr.count, N,
                                        dtype=e.dtype)

    fn = jax.jit(jax.vmap(one))
elif which == "troughs2":
    # Cache-busting variant of "troughs" (different constants): measures the
    # TRUE uncached compile cost of the find_peaks graph alone.
    fn = jax.jit(jax.vmap(lambda e: fp.find_peaks(
        -e, 4096, prominence=jnp.float32(1.1),
        distance=int(0.29 * SR), work_capacity=16384)))
elif which == "interp2":
    # Cache-busting variant of "interp" (different count constant).
    from bpm_analysis_tpu.ops import series

    pos = np.sort(rng.choice(N, size=4096, replace=False)).astype(np.int32)

    def one(e):
        amp = e[jnp.asarray(pos)]
        return series.interpolate_dense(jnp.asarray(pos), amp,
                                        jnp.int32(1401), N, dtype=e.dtype)

    fn = jax.jit(jax.vmap(one))
elif which == "ti_noprom":
    # troughs WITHOUT prominence (distance NMS only) -> interpolate_dense.
    from bpm_analysis_tpu.ops import series

    def one(e):
        tr = fp.find_peaks(-e, 4096, distance=int(0.28 * SR),
                           work_capacity=16384)
        t_pos = jnp.where(jnp.arange(4096) < tr.count, tr.positions, 0)
        return series.interpolate_dense(t_pos, e[t_pos], tr.count, N,
                                        dtype=e.dtype)

    fn = jax.jit(jax.vmap(one))
elif which == "tib":
    # ti with an optimization barrier between the stages.
    from bpm_analysis_tpu.ops import series

    def one(e):
        tr = fp.find_peaks(-e, 4096, prominence=jnp.float32(1.0),
                           distance=int(0.28 * SR), work_capacity=16384)
        pos, cnt = jax.lax.optimization_barrier((tr.positions, tr.count))
        t_pos = jnp.where(jnp.arange(4096) < cnt, pos, 0)
        return series.interpolate_dense(t_pos, e[t_pos], cnt, N,
                                        dtype=e.dtype)

    fn = jax.jit(jax.vmap(one))
elif which == "ir":
    # interpolate_dense -> strided rolling quantile.
    from bpm_analysis_tpu.ops import series

    pos = np.sort(rng.choice(N, size=4096, replace=False)).astype(np.int32)

    def one(e):
        amp = e[jnp.asarray(pos)]
        dense = series.interpolate_dense(jnp.asarray(pos), amp,
                                         jnp.int32(1400), N, dtype=e.dtype)
        return q.rolling_quantile_centered_strided(
            dense, int(10.0 * SR), 0.3, min_periods=3, stride=64, chunk=1024)

    fn = jax.jit(jax.vmap(one))
elif which == "tir":
    # troughs -> interpolate -> rolling quantile (one draft-floor pass).
    from bpm_analysis_tpu.ops import series

    def one(e):
        tr = fp.find_peaks(-e, 4096, prominence=jnp.float32(1.0),
                           distance=int(0.28 * SR), work_capacity=16384)
        t_pos = jnp.where(jnp.arange(4096) < tr.count, tr.positions, 0)
        dense = series.interpolate_dense(t_pos, e[t_pos], tr.count, N,
                                         dtype=e.dtype)
        return q.rolling_quantile_centered_strided(
            dense, int(10.0 * SR), 0.3, min_periods=3, stride=64, chunk=1024)

    fn = jax.jit(jax.vmap(one))
elif which == "troughs":
    fn = jax.jit(jax.vmap(lambda e: fp.find_peaks(
        -e, 4096, prominence=jnp.float32(1.0),
        distance=int(0.28 * SR), work_capacity=16384)))
elif which == "nmsonly":
    pos = np.sort(rng.choice(N, size=16384, replace=False)).astype(np.int32)
    prio = rng.rand(16384).astype(np.float32)
    valid = np.ones(16384, bool)
    fn = jax.jit(jax.vmap(lambda p, pr, v: fp._select_by_distance(p, pr, v, 84.0),
                          in_axes=(None, 0, None)))
    x = np.tile(prio, (B, 1))

    def lower():
        return fn.lower(jnp.asarray(pos), jnp.asarray(x), jnp.asarray(valid))
elif which == "rollq":
    fn = jax.jit(jax.vmap(lambda e: q.rolling_quantile_centered_strided(
        e, int(10.0 * SR), 0.3, min_periods=3, stride=64, chunk=1024)))
elif which == "quantile":
    fn = jax.jit(jax.vmap(lambda e: q.quantile_exact(e, 0.5)))
else:
    fn = jax.jit(jax.vmap(lambda e: noise_floor.dynamic_noise_floor(e, SR, cfg)))

if which != "nmsonly":
    def lower():
        return fn.lower(jnp.asarray(x))

t0 = time.time()
lowered = lower()
print(f"{which} lower: {time.time() - t0:.1f}s", flush=True)
t0 = time.time()
compiled = lowered.compile()
print(f"{which} compile: {time.time() - t0:.1f}s", flush=True)
