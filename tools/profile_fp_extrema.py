"""Production-path find_peaks timing: the extrema-domain pipeline exactly as
models/pipeline.py wires it (shared build_extrema -> trough finder on -env ->
raw finder with height filter), split into sub-phases, plus a
prominence_sweep_window sensitivity sweep.

Usage: python tools/profile_fp_extrema.py [BATCH] [W ...]
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
from bpm_analysis_tpu.models import noise_floor as nfm  # noqa: E402
from bpm_analysis_tpu.models import pipeline  # noqa: E402
from bpm_analysis_tpu.ops import find_peaks as fp  # noqa: E402
from bpm_analysis_tpu.ops import quantile as q  # noqa: E402

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 128
WS = [int(w) for w in sys.argv[2:]] or [64, 32, 16]

cfg = AnalyzerConfig(runtime=RuntimeConfig(
    max_raw_peaks=4096, max_troughs=4096, max_candidates=2048, dtype="float32",
    noise_quantile_stride=64, quantile_backend="knots_pallas",
    prominence_work_factor=2.0, extrema_capacity=24576))


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
    print(f"{name:30s} {best * 1e3:9.1f} ms", flush=True)
    return out


def main():
    rows = []
    for s in range(BATCH):
        sig = synth_recording(s)
        peak = max(np.abs(sig).max(), 1)
        rows.append(np.int16(sig / peak * 32767).astype(np.float32))
    x = jax.device_put(jnp.asarray(np.stack(rows)))
    n = x.shape[1]
    ext_cap = cfg.runtime.extrema_capacity
    min_dist = int(cfg.features.min_peak_distance_sec * SR)
    print(f"batch {BATCH}, n={n}, ext_cap={ext_cap}, dist={min_dist}",
          flush=True)

    env = jax.jit(jax.vmap(lambda s: envm.preprocess(s, SR, cfg)[0]))(x)
    _force(env)

    def masks(e):
        _, em = envm.edge_held(e, None)
        return fp.local_extrema_masks(em)

    timed("local_extrema_masks", jax.jit(jax.vmap(masks)), env)

    def bex(e):
        _, em = envm.edge_held(e, None)
        return fp.build_extrema(em, ext_cap)

    ext = timed("build_extrema", jax.jit(jax.vmap(bex)), env)

    # build_extrema minus the two height gathers + virtuals (same top_k)
    def bex_nogather(e):
        _, em = envm.edge_held(e, None)
        mmax, mmin = fp.local_extrema_masks(em)
        both = mmax | mmin
        idx = jnp.arange(n, dtype=jnp.int32)
        enc_key = jnp.where(both, -(2 * idx + mmax.astype(jnp.int32)),
                            jnp.int32(-(1 << 30)))
        vals, _ = jax.lax.top_k(enc_key, 2 * (ext_cap - 2))
        return vals

    timed("  union top_k only", jax.jit(jax.vmap(bex_nogather)), env)

    cap_t = min(cfg.runtime.max_troughs, fp.distance_capacity_bound(n, min_dist))
    prom_cap = int(cfg.runtime.prominence_work_factor * cap_t)

    def nms_only(e, ex):
        _, em = envm.edge_held(e, None)
        wcap = ex.min_positions.shape[0]
        slot = jnp.arange(wcap)
        valid = slot < ex.min_count
        pos = jnp.where(valid, ex.min_positions, n - 1)
        prio = -ex.min_heights[1:-1]
        keep = fp._select_by_distance(pos, prio, valid, min_dist)
        return fp._recompact(pos, keep, n)

    nms_out = timed("trough distance NMS", jax.jit(jax.vmap(nms_only)), env, ext)

    lim = min(-(-(n // min_dist + 2) // 128) * 128, -(-prom_cap // 128) * 128)

    for W in WS:
        def prom_phase(ex, pos_cnt, W=W):
            pos, count = pos_cnt
            pos = pos[:lim]
            slot = jnp.arange(lim)
            valid = slot < jnp.minimum(count, lim)
            pos = jnp.where(valid, pos, n - 1)
            return fp.extrema_prominences(
                ex, pos, valid, negated=True, sweep_window=W,
                residual_capacity=cfg.runtime.prominence_residual_capacity)

        prom, ovf = timed(f"extrema_prominences W={W}",
                          jax.jit(jax.vmap(prom_phase)), ext, nms_out)
        print(f"    overflowed rows: {int(np.asarray(ovf).sum())}", flush=True)

    def troughs_full(e, ex):
        valid, em = envm.edge_held(e, None)
        prom_t = q.quantile_exact(e, cfg.features.trough_prominence_quantile,
                                  valid=valid)
        return fp.find_peaks(
            -em, cap_t, prominence=prom_t, distance=min_dist,
            prominence_capacity=prom_cap, extrema=ex, extrema_negated=True,
            candidates=fp.Peaks(ex.min_positions, ex.min_count, ex.overflowed),
            priorities=-ex.min_heights[1:-1],
            prominence_sweep_window=cfg.runtime.prominence_sweep_window,
            prominence_residual_capacity=cfg.runtime.prominence_residual_capacity)

    timed("FULL trough find_peaks", jax.jit(jax.vmap(troughs_full)), env, ext)

    def raw_full(e, ex):
        nf = nfm.dynamic_noise_floor(e, SR, cfg, extrema=ex)
        return pipeline.raw_peaks(e, nf.floor, SR, cfg, extrema=ex)

    timed("noise_floor+raw_peaks", jax.jit(jax.vmap(raw_full)), env, ext)


if __name__ == "__main__":
    main()
