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
elif which == "interp_dyn":
    # interp with DATA-DEPENDENT (but trivially computed) indices/count:
    # distinguishes "dynamic scatter indices" from "find_peaks ancestry" as
    # the blowup trigger.
    from bpm_analysis_tpu.ops import series

    pos = np.sort(rng.choice(N, size=4096, replace=False)).astype(np.int32)

    def one(e):
        zero = (e[0] < -1e30).astype(jnp.int32)      # data-dependent 0
        dpos = jnp.asarray(pos) + zero
        amp = e[dpos]
        return series.interpolate_dense(dpos, amp, jnp.int32(1400) + zero,
                                        N, dtype=e.dtype)

    fn = jax.jit(jax.vmap(one))
elif which == "interp_ss":
    # Scatter-free interpolate_dense candidate: searchsorted + small-table
    # gathers, with data-dependent indices (the case that blows up today).
    def one(e):
        zero = (e[0] < -1e30).astype(jnp.int32)
        pos0 = np.sort(rng.choice(N, size=4096, replace=False)).astype(np.int32)
        cap = 4096
        count = jnp.int32(1400) + zero
        slot = jnp.arange(cap)
        kvalid = slot < count
        pos_s = jnp.where(kvalid, jnp.asarray(pos0) + zero, N).astype(jnp.int32)
        val = jnp.where(kvalid, e[jnp.asarray(pos0)], 0.0)
        grid = jnp.arange(N, dtype=jnp.int32)
        j = jnp.searchsorted(pos_s, grid, side="right").astype(jnp.int32) - 1
        j0 = jnp.clip(j, 0, cap - 1)
        has_next = (j + 1) < count
        j1 = jnp.clip(j + 1, 0, cap - 1)
        p0 = pos_s[j0]
        v0 = val[j0]
        p1 = jnp.where(has_next, pos_s[j1], p0)
        v1 = jnp.where(has_next, val[j1], v0)
        denom = jnp.maximum(p1 - p0, 1).astype(e.dtype)
        frac = (grid - p0).astype(e.dtype) / denom
        out = v0 + frac * (v1 - v0)
        out = jnp.where(j >= 0, out, jnp.nan)
        return jnp.where(count > 0, out, jnp.nan)

    fn = jax.jit(jax.vmap(one))
elif which == "tiss":
    # troughs -> searchsorted interp (the real producer).
    def one(e):
        tr = fp.find_peaks(-e, 4096, prominence=jnp.float32(1.0),
                           distance=int(0.28 * SR), work_capacity=16384)
        cap = 4096
        count = tr.count
        slot = jnp.arange(cap)
        kvalid = slot < count
        t_pos = jnp.where(kvalid, tr.positions, 0)
        pos_s = jnp.where(kvalid, tr.positions, N).astype(jnp.int32)
        val = jnp.where(kvalid, e[t_pos], 0.0)
        grid = jnp.arange(N, dtype=jnp.int32)
        j = jnp.searchsorted(pos_s, grid, side="right").astype(jnp.int32) - 1
        j0 = jnp.clip(j, 0, cap - 1)
        has_next = (j + 1) < count
        j1 = jnp.clip(j + 1, 0, cap - 1)
        p0 = pos_s[j0]
        v0 = val[j0]
        p1 = jnp.where(has_next, pos_s[j1], p0)
        v1 = jnp.where(has_next, val[j1], v0)
        denom = jnp.maximum(p1 - p0, 1).astype(e.dtype)
        frac = (grid - p0).astype(e.dtype) / denom
        out = v0 + frac * (v1 - v0)
        out = jnp.where(j >= 0, out, jnp.nan)
        return jnp.where(count > 0, out, jnp.nan)

    fn = jax.jit(jax.vmap(one))
elif which == "interp_hint":
    # OLD scatter+scan interp formulation, but with indices_are_sorted /
    # unique_indices hints on the scatter (positions ARE sorted unique):
    # tests whether hints alone defuse the compile bomb while keeping the
    # fast runtime.
    def one(e):
        tr = fp.find_peaks(-e, 4096, prominence=jnp.float32(1.0),
                           distance=int(0.28 * SR), work_capacity=16384)
        cap = 4096
        kvalid = jnp.arange(cap) < tr.count
        pos = jnp.where(kvalid, tr.positions, 0)
        val = jnp.where(kvalid, e[pos], 0.0)
        grid = jnp.arange(N)
        pos_w = jnp.where(kvalid, pos, N)
        dense_val = jnp.zeros((N,), e.dtype).at[pos_w].set(
            val, mode="drop", unique_indices=True, indices_are_sorted=True)
        dense_has = jnp.zeros((N,), jnp.bool_).at[pos_w].set(
            True, mode="drop", unique_indices=True, indices_are_sorted=True)
        dense_pos = jnp.where(dense_has, grid, 0)

        from bpm_analysis_tpu.ops.series import _bfill_pairs, _ffill_pairs
        v0, has0 = _ffill_pairs(dense_val, dense_has)
        p0, _ = _ffill_pairs(dense_pos, dense_has)
        v1, has1 = _bfill_pairs(dense_val, dense_has)
        p1, _ = _bfill_pairs(dense_pos, dense_has)
        denom = jnp.maximum(p1 - p0, 1).astype(e.dtype)
        frac = (grid - p0).astype(e.dtype) / denom
        interp = v0 + frac * (v1 - v0)
        out = jnp.where(has1, interp, v0)
        out = jnp.where(has0, out, jnp.nan)
        return jnp.where(tr.count > 0, out, jnp.nan)

    fn = jax.jit(jax.vmap(one))
elif which == "interp_sshint":
    # searchsorted interp with sorted-gather hints on the 4 small-table
    # gathers (j0/j1 are non-decreasing).
    from bpm_analysis_tpu.ops import series

    def one(e):
        tr = fp.find_peaks(-e, 4096, prominence=jnp.float32(1.0),
                           distance=int(0.28 * SR), work_capacity=16384)
        cap = 4096
        kvalid = jnp.arange(cap) < tr.count
        pos = jnp.where(kvalid, tr.positions, 0)
        val = jnp.where(kvalid, e[pos], 0.0)
        grid = jnp.arange(N, dtype=jnp.int32)
        pos_sorted = jnp.where(kvalid, pos, N).astype(jnp.int32)
        j = jnp.searchsorted(pos_sorted, grid, side="right").astype(jnp.int32) - 1
        j0 = jnp.clip(j, 0, cap - 1)
        has_next = (j + 1) < tr.count
        j1 = jnp.clip(j + 1, 0, cap - 1)
        p0 = pos_sorted.at[j0].get(indices_are_sorted=True, mode="clip")
        v0 = val.at[j0].get(indices_are_sorted=True, mode="clip")
        p1 = jnp.where(has_next,
                       pos_sorted.at[j1].get(indices_are_sorted=True, mode="clip"), p0)
        v1 = jnp.where(has_next,
                       val.at[j1].get(indices_are_sorted=True, mode="clip"), v0)
        denom = jnp.maximum(p1 - p0, 1).astype(e.dtype)
        frac = (grid - p0).astype(e.dtype) / denom
        out = v0 + frac * (v1 - v0)
        out = jnp.where(j >= 0, out, jnp.nan)
        return jnp.where(tr.count > 0, out, jnp.nan)

    fn = jax.jit(jax.vmap(one))
elif which == "tis_rb2":
    # Scan-free bfill_ffill candidate: cummax index computation + one gather.
    from bpm_analysis_tpu.ops import series

    def bf2(x):
        n = x.shape[0]
        idx = jnp.arange(n, dtype=jnp.int32)
        valid = ~jnp.isnan(x)
        rmax = jax.lax.cummax(jnp.where(jnp.flip(valid), idx, -1))
        nxt = jnp.flip(jnp.where(rmax >= 0, (n - 1) - rmax, n))
        last = jnp.max(jnp.where(valid, idx, -1))
        j = jnp.where(nxt < n, nxt, jnp.maximum(last, 0))
        out = x[jnp.clip(j, 0, n - 1)]
        return jnp.where((nxt < n) | (last >= 0), out, jnp.nan)

    def one(e):
        tr = fp.find_peaks(-e, 4096, prominence=jnp.float32(1.0),
                           distance=int(0.28 * SR), work_capacity=16384)
        t_pos = jnp.where(jnp.arange(4096) < tr.count, tr.positions, 0)
        dense = series.interpolate_dense(t_pos, e[t_pos], tr.count, N,
                                         dtype=e.dtype)
        draft = q.rolling_quantile_centered_strided(
            dense, int(10.0 * SR), 0.3, min_periods=3, stride=64, chunk=1024)
        return bf2(draft)

    fn = jax.jit(jax.vmap(one))
elif which in ("tis_r", "tis_rb", "tis_sane"):
    # Incremental floor bisect on top of the searchsorted interp:
    #   tis_r    troughs -> interp -> strided rolling quantile
    #   tis_rb   ... -> bfill_ffill
    #   tis_sane ... -> trough sanitize -> compact -> second interp
    from bpm_analysis_tpu.ops import series

    def one(e):
        tr = fp.find_peaks(-e, 4096, prominence=jnp.float32(1.0),
                           distance=int(0.28 * SR), work_capacity=16384)
        t_pos = jnp.where(jnp.arange(4096) < tr.count, tr.positions, 0)
        dense = series.interpolate_dense(t_pos, e[t_pos], tr.count, N,
                                         dtype=e.dtype)
        draft = q.rolling_quantile_centered_strided(
            dense, int(10.0 * SR), 0.3, min_periods=3, stride=64, chunk=1024)
        if which == "tis_r":
            return draft
        draft_filled = q.bfill_ffill(draft)
        if which == "tis_rb":
            return draft_filled
        t_valid = jnp.arange(4096) < tr.count
        floor_at = draft_filled[t_pos]
        keep = t_valid & ~jnp.isnan(floor_at) & (e[t_pos] <= 2.0 * floor_at)
        sane_pos, sane_count = series.compact_valid(t_pos, keep, fill=N)
        sane_amp = e[jnp.where(jnp.arange(4096) < sane_count, sane_pos, 0)]
        return series.interpolate_dense(sane_pos, sane_amp, sane_count, N,
                                        dtype=e.dtype)

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
elif which == "fullpipe":
    from bpm_analysis_tpu.models import pipeline

    fn = jax.jit(lambda xs: pipeline.analyze_batch(xs, SR, cfg))
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

if which != "nmsonly":
    args = (jnp.asarray(x),)

    @jax.jit
    def _reduce(leaves):
        return sum(jnp.sum(jnp.abs(l.astype(jnp.float32))) for l in leaves)

    def force(out):
        # Device-side reduction + scalar fetch: np.asarray on a large leaf
        # would measure the tunnel transfer, not the kernel.
        np.asarray(_reduce(jax.tree_util.tree_leaves(out)))

    force(compiled(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        force(compiled(*args))
        best = min(best, time.time() - t0)
    print(f"{which} run: {best * 1e3:.1f} ms", flush=True)
