"""Sub-stage TPU timing of the noise floor at the bench config.

Usage: python tools/profile_noise_floor.py [BATCH]
Breaks the noise-floor stage (the pipeline's hottest, per
tools/profile_stages.py) into its constituent kernels so perf work targets
the real cost.  Timings queue 10 async dispatches per sync so the tunneled
TPU's ~30 ms roundtrip amortizes.
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
from bpm_analysis_tpu.ops import find_peaks as fp  # noqa: E402
from bpm_analysis_tpu.ops import quantile as q  # noqa: E402
from bpm_analysis_tpu.ops import series  # noqa: E402

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
    x = jax.device_put(jnp.asarray(np.stack(rows)))
    n = x.shape[1]
    print(f"batch {BATCH}, n={n}", flush=True)

    env_fn = jax.jit(jax.vmap(lambda s: envm.preprocess(s, SR, cfg)[0]))
    env = timed("envelope", env_fn, x)

    ext_cap = cfg.runtime.extrema_capacity
    ext_fn = jax.jit(jax.vmap(
        lambda e: fp.build_extrema(envm.edge_held(e, None)[1], ext_cap)))
    ext = timed("build_extrema", ext_fn, env)

    ncfg = cfg.noise
    min_dist = int(cfg.features.min_peak_distance_sec * SR)
    cap = min(cfg.runtime.max_troughs, fp.distance_capacity_bound(n, max(min_dist, 1)))
    window = int(ncfg.noise_window_sec * SR)
    stride = cfg.runtime.noise_quantile_stride

    def troughs_only(e, ex):
        valid, env_m = envm.edge_held(e, None)
        prom = q.quantile_exact(e, cfg.features.trough_prominence_quantile, valid=valid)
        return fp.find_peaks(
            -env_m, cap, prominence=prom, distance=min_dist,
            prominence_capacity=int(cfg.runtime.prominence_work_factor * cap),
            extrema=ex, extrema_negated=True,
            candidates=fp.Peaks(ex.min_positions, ex.min_count, ex.overflowed),
            priorities=-ex.min_heights[1:-1],
            prominence_sweep_window=cfg.runtime.prominence_sweep_window,
            prominence_residual_capacity=cfg.runtime.prominence_residual_capacity)

    troughs = timed("trough find_peaks", jax.jit(jax.vmap(troughs_only)), env, ext)

    def qexact_only(e):
        valid, _ = envm.edge_held(e, None)
        return q.quantile_exact(e, cfg.features.trough_prominence_quantile,
                                valid=valid)

    timed("  quantile_exact", jax.jit(jax.vmap(qexact_only)), env)

    def densify(e, tr):
        _, env_m = envm.edge_held(e, None)
        slot = jnp.arange(cap)
        t_pos = jnp.where(slot < tr.count, tr.positions, 0)
        t_amp = env_m[t_pos]
        return series.interpolate_dense(t_pos, t_amp, tr.count, n,
                                        dtype=e.dtype, min_spacing=max(min_dist, 1))

    dense = timed("interpolate_dense", jax.jit(jax.vmap(densify)), env, troughs)

    from bpm_analysis_tpu.ops.pallas.quantile_kernel import (
        make_vmappable_rolling_quantile)
    rq = make_vmappable_rolling_quantile(window, ncfg.noise_floor_quantile, 3, stride)
    rolled = timed("pallas rolling_q", jax.jit(jax.vmap(rq)), dense)

    timed("edge_fill", jax.jit(jax.vmap(q.edge_fill)), rolled)

    def full_nf(e, ex):
        return nfm.dynamic_noise_floor(e, SR, cfg, extrema=ex)

    timed("FULL noise_floor", jax.jit(jax.vmap(full_nf)), env, ext)

    # --- fused knot-domain Pallas kernel (ops/pallas/knot_kernel.py) -------
    import dataclasses

    from bpm_analysis_tpu.ops.pallas.knot_kernel import (
        make_vmappable_knot_quantile)

    kq_fn = make_vmappable_knot_quantile(
        n, window, ncfg.noise_floor_quantile, 3, stride, max(min_dist, 1))

    def knot_anchors(e, tr):
        _, env_m = envm.edge_held(e, None)
        slot = jnp.arange(cap)
        t_pos = jnp.where(slot < tr.count, tr.positions, 0)
        t_amp = env_m[t_pos]
        return kq_fn(tr.positions, t_amp.astype(jnp.float32),
                     jnp.asarray(tr.count, jnp.int32),
                     jnp.asarray(n, jnp.int32))

    timed("knot kernel (fused)", jax.jit(jax.vmap(knot_anchors)), env, troughs)

    cfg_kp = dataclasses.replace(cfg, runtime=dataclasses.replace(
        cfg.runtime, quantile_backend="knots_pallas"))

    def full_nf_kp(e, ex):
        return nfm.dynamic_noise_floor(e, SR, cfg_kp, extrema=ex)

    timed("FULL nf knots_pallas", jax.jit(jax.vmap(full_nf_kp)), env, ext)


if __name__ == "__main__":
    main()
