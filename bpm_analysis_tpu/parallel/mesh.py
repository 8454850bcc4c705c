"""Device mesh + sharded batch execution — the framework's scaling layer.

The reference has no distributed runtime at all (its "batch" is a serial
Python loop over files, gui.py:202; SURVEY.md §2 parallelism inventory).
The TPU-native equivalents introduced here:

* **dp** — batch data-parallelism: recordings shard across chips; each chip
  runs the identical traced pipeline on its slice, collectives only appear
  for fleet-level summary reductions (``fleet_summary``) and ride ICI.
* **sp** — intra-recording sequence sharding for the convolutional DSP
  front-end on very long recordings (see ``parallel.seqshard`` — blockwise
  rolling windows with halo exchange via ``ppermute``).

Meshes are plain ``jax.sharding.Mesh`` objects; the batched pipeline is the
single-recording program under ``vmap`` with batch-dim shardings, so XLA
partitions it with zero communication in the steady state (the per-recording
stages are independent by construction).
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import AnalyzerConfig
from ..models import envelope as envm
from ..models import pipeline


def make_mesh(devices: Optional[Sequence] = None, sp: int = 1) -> Mesh:
    """1-D data-parallel mesh by default; pass ``sp > 1`` to reserve a
    sequence-sharding axis (devices = dp × sp)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % sp:
        raise ValueError(f"{n} devices not divisible by sp={sp}")
    arr = np.asarray(devices).reshape(n // sp, sp)
    return Mesh(arr, axis_names=("dp", "sp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Recordings shard over dp; the sample axis stays replicated (the
    per-recording pipeline is not sequence-sharded — see seqshard for the
    DSP-only sp path)."""
    return NamedSharding(mesh, P("dp"))


def shard_batch(mesh: Mesh, envelopes: jnp.ndarray) -> jnp.ndarray:
    return jax.device_put(envelopes, batch_sharding(mesh))


def analyze_batch_sharded(
    mesh: Mesh,
    envelopes: jnp.ndarray,
    sample_rate: int,
    cfg: AnalyzerConfig,
    start_bpm_hints: Optional[jnp.ndarray] = None,
):
    """jit the vmapped pipeline with batch-dim shardings over ``mesh``.

    The batch size must be divisible by the dp axis size.  Returns a
    PipelineResult whose leading axis is the (sharded) batch.
    """
    in_shard = batch_sharding(mesh)

    @jax.jit
    def run(envs, hints):
        envs = jax.lax.with_sharding_constraint(envs, in_shard)
        return pipeline.analyze_batch(envs, sample_rate, cfg, hints)

    if start_bpm_hints is None:
        start_bpm_hints = jnp.full((envelopes.shape[0],), jnp.nan, envelopes.dtype)
    return run(shard_batch(mesh, envelopes), jax.device_put(start_bpm_hints, in_shard))


def fleet_summary(mesh: Mesh, result) -> dict:
    """Cross-recording reductions over the sharded batch — the collective
    layer (psum-style means over dp; XLA lowers these to ICI all-reduces
    because the operands are dp-sharded)."""
    ok = result.ok

    @jax.jit
    def reduce_stats(ok, avg, mn, mx, hrr, hrr_found, count):
        okf = ok.astype(jnp.float32)
        n = jnp.maximum(jnp.sum(okf), 1.0)
        return {
            "recordings_ok": jnp.sum(okf),
            "mean_avg_bpm": jnp.sum(jnp.where(ok, avg, 0.0)) / n,
            "min_bpm": jnp.min(jnp.where(ok, mn, jnp.inf)),
            "max_bpm": jnp.max(jnp.where(ok, mx, -jnp.inf)),
            "mean_hrr": jnp.sum(jnp.where(hrr_found, hrr, 0.0))
            / jnp.maximum(jnp.sum(hrr_found.astype(jnp.float32)), 1.0),
            "total_beats": jnp.sum(jnp.where(ok, count, 0)),
        }

    m = result.metrics
    return reduce_stats(ok, m.avg_bpm, m.min_bpm, m.max_bpm,
                        m.hrr.hrr, m.hrr.found, result.final_count)
