"""Phase-level TPU timing of find_peaks at the trough-finder config.

Usage: python tools/profile_find_peaks.py [BATCH]
find_peaks is ~1.5 s of the 3.2 s B=128 pipeline (troughs + raw peaks);
this splits it into local-maxima mask, compaction, distance NMS, and
prominence descent so the optimization target is measured, not guessed.
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
from bpm_analysis_tpu.ops import find_peaks as fp  # noqa: E402
from bpm_analysis_tpu.ops import quantile as q  # noqa: E402

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 128

cfg = AnalyzerConfig(runtime=RuntimeConfig(
    max_raw_peaks=4096, max_troughs=4096, max_candidates=2048, dtype="float32",
    noise_quantile_stride=64, quantile_backend="pallas",
    extrema_capacity=24576))


def _force(out):
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
    print(f"{name:22s} {best * 1e3:9.1f} ms", flush=True)
    return out


def main():
    rows = []
    for s in range(BATCH):
        sig = synth_recording(s)
        peak = max(np.abs(sig).max(), 1)
        rows.append(np.int16(sig / peak * 32767).astype(np.float32))
    x = jax.device_put(jnp.asarray(np.stack(rows)))
    n = x.shape[1]

    env_fn = jax.jit(jax.vmap(lambda s: envm.preprocess(s, SR, cfg)[0]))
    env = env_fn(x)
    _force(env)

    min_dist = int(cfg.features.min_peak_distance_sec * SR)
    cap = min(cfg.runtime.max_troughs, fp.distance_capacity_bound(n, max(min_dist, 1)))
    work_capacity = cfg.runtime.find_peaks_work_factor * cfg.runtime.max_troughs
    prom_cap = int(cfg.runtime.prominence_work_factor * cap)
    print(f"batch {BATCH}, n={n}, cap={cap}, work={work_capacity}, "
          f"prom_cap={prom_cap}, dist={min_dist}", flush=True)

    def neg_env(e):
        _, env_m = envm.edge_held(e, None)
        return -env_m

    nx = jax.jit(jax.vmap(neg_env))(env)
    _force(nx)

    mask = timed("local_maxima_mask", jax.jit(jax.vmap(fp.local_maxima_mask)), nx)

    def compact(m):
        return fp._compact_mask(m, work_capacity)

    peaks = timed("compact_mask", jax.jit(jax.vmap(compact)), mask)

    def nms(xv, pk):
        slot = jnp.arange(work_capacity)
        valid = slot < pk.count
        pos = jnp.where(valid, pk.positions, n - 1)
        keep = fp._select_by_distance(pos, xv[pos], valid, min_dist)
        return fp._recompact(pos, keep, n)

    nms_out = timed("distance NMS", jax.jit(jax.vmap(nms)), nx, peaks)

    bound = n // max(min_dist, 1) + 2
    lim = min(work_capacity, -(-bound // 128) * 128, -(-prom_cap // 128) * 128)

    def prom_phase(xv, pos_cnt):
        pos, count = pos_cnt
        pos = pos[:lim]
        slot = jnp.arange(lim)
        valid = slot < jnp.minimum(count, lim)
        pos = jnp.where(valid, pos, n - 1)
        return fp.peak_prominences(xv, pos, valid)

    timed("prominence", jax.jit(jax.vmap(prom_phase)), nx, nms_out)

    def full(e):
        valid, env_m = envm.edge_held(e, None)
        prom_thresh = q.quantile_exact(
            e, cfg.features.trough_prominence_quantile, valid=valid)
        return fp.find_peaks(
            -env_m, cap, prominence=prom_thresh, distance=min_dist,
            work_capacity=work_capacity, prominence_capacity=prom_cap)

    timed("FULL find_peaks", jax.jit(jax.vmap(full)), env)


if __name__ == "__main__":
    main()
