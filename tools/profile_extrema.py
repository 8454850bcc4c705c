"""Micro-profile of the extrema-domain prominence path on TPU.

Usage: python tools/profile_extrema.py [BATCH]
Times build_extrema and extrema_prominences at several sweep widths /
residual capacities to locate the cost inside the new backend.
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
    print(f"{name:28s} {best * 1e3:9.1f} ms", flush=True)
    return out


def main():
    rows = []
    for s in range(BATCH):
        sig = synth_recording(s)
        peak = max(np.abs(sig).max(), 1)
        rows.append(np.int16(sig / peak * 32767).astype(np.float32))
    x = jax.device_put(jnp.asarray(np.stack(rows)))
    n = x.shape[1]

    env = jax.jit(jax.vmap(lambda s: envm.preprocess(s, SR, cfg)[0]))(x)
    _force(env)

    ext_cap = 16384

    def build(e):
        return fp.build_extrema(envm.edge_held(e, None)[1], ext_cap)

    ext = timed("build_extrema", jax.jit(jax.vmap(build)), env)

    def masks_only(e):
        em = envm.edge_held(e, None)[1]
        return fp.local_maxima_mask(em), fp.local_maxima_mask(-em)

    masks = timed("  2x local_maxima_mask", jax.jit(jax.vmap(masks_only)), env)

    def compacts_only(mm):
        a, _ = fp._compact_mask_rank(mm[0], ext_cap - 2)
        b, _ = fp._compact_mask_rank(mm[1], ext_cap - 2)
        return a, b

    timed("  2x compact_rank", jax.jit(jax.vmap(compacts_only)), masks)

    def tables_only(e):
        em = envm.edge_held(e, None)[1]
        mh = jnp.where(jnp.arange(ext_cap) < 11000, em[:ext_cap], -jnp.inf)
        return (fp._sparse_table(mh, jnp.maximum),
                fp._sparse_table(mh, jnp.minimum))

    timed("  2x sparse_table(16k)", jax.jit(jax.vmap(tables_only)), env)

    # fake peak positions: every 16th slot
    cap_pos = 6144
    pos = jnp.tile(jnp.arange(0, cap_pos * 16, 16, dtype=jnp.int32)[None], (BATCH, 1))
    valid = jnp.ones((BATCH, cap_pos), bool)

    # sweep-only cost: a variant with residual_capacity so small that the
    # descent is negligible, minus the overhead baseline at W=1.
    for W, RC in ((64, 1024), (32, 1024), (64, 128), (1, 128)):
        def prom_fn(ex, p, v, W=W, RC=RC):
            return fp.extrema_prominences(ex, p, v, negated=False,
                                          sweep_window=W, residual_capacity=RC)
        timed(f"extrema_prom W={W} RC={RC}", jax.jit(jax.vmap(prom_fn)), ext, pos, valid)


if __name__ == "__main__":
    main()
