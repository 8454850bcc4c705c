"""Sequence-sharded DSP front-end — the "SP/CP" analog for this workload.

The classifier scan is inherently sequential per recording, but every DSP
stage ahead of it is convolutional (band-pass, rectified envelope, rolling
windows) and therefore blockwise-shardable with halo exchange (SURVEY.md §5
"long-context" entry).  This module shards the *sample* axis of a recording
across the mesh's ``sp`` axis under ``shard_map``: each device computes its
block's centered rolling mean after fetching ``halo`` edge samples from its
neighbors with ``lax.ppermute`` — the collectives ride ICI, no host hops.

For ~300 Hz envelopes this is overkill (a 10-minute recording is 180k
samples); it exists for the very-long-recording regime (hours of Holter
audio) and as the pattern to extend to the noise-floor kernel.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops.rolling import centered_bounds


def _halo_exchange(block: jnp.ndarray, halo_left: int, halo_right: int, axis: str):
    """Fetch the right edge of the left neighbor and the left edge of the
    right neighbor along mesh axis ``axis`` (edge devices pad with zeros)."""
    n_dev = lax.axis_size(axis)
    idx = lax.axis_index(axis)
    # Send our right edge rightward (it becomes the receiver's left halo).
    right_edge = block[-halo_left:] if halo_left else block[:0]
    from_left = lax.ppermute(right_edge, axis,
                             [(i, i + 1) for i in range(n_dev - 1)])
    # Send our left edge leftward (it becomes the receiver's right halo).
    left_edge = block[:halo_right] if halo_right else block[:0]
    from_right = lax.ppermute(left_edge, axis,
                              [(i + 1, i) for i in range(n_dev - 1)])
    from_left = jnp.where(idx == 0, jnp.zeros_like(from_left), from_left)
    from_right = jnp.where(idx == n_dev - 1, jnp.zeros_like(from_right), from_right)
    return from_left, from_right


def sequence_sharded_envelope(mesh: Mesh, signal: jnp.ndarray, window: int,
                              batched: bool = False) -> jnp.ndarray:
    """abs → centered rolling mean, sample axis sharded over mesh axis 'sp'.

    Matches ``ops.rolling.rolling_mean_centered(|x|, window)`` exactly
    (tests/test_sharding.py), including the truncated-window edge counts:
    each block computes its local windowed sums over [halo | block | halo]
    and divides by the *global* valid count for its positions.
    """
    left, right = centered_bounds(window)
    n = signal.shape[-1]
    sp = mesh.shape["sp"]
    if n % sp:
        raise ValueError(f"sample count {n} not divisible by sp={sp}")
    block_len = n // sp
    if block_len < max(left, right):
        raise ValueError(
            f"block length {block_len} smaller than halo {max(left, right)}; "
            f"use fewer sp shards for this window"
        )

    def kernel(x):
        x = jnp.abs(x)
        from_left, from_right = _halo_exchange(x, left, right, "sp")
        ext = jnp.concatenate([from_left, x, from_right])
        sums = lax.reduce_window(
            ext, jnp.zeros((), x.dtype), lax.add,
            window_dimensions=(window,), window_strides=(1,), padding="valid",
        )  # one output per block position
        # Global position of each output and its true (edge-truncated) count.
        start = lax.axis_index("sp") * block_len
        gpos = start + jnp.arange(block_len)
        counts = (jnp.minimum(gpos + right, n - 1) - jnp.maximum(gpos - left, 0) + 1
                  ).astype(x.dtype)
        return sums / counts

    spec = P(None, "sp") if batched else P("sp")
    fn = shard_map(
        jax.vmap(kernel) if batched else kernel, mesh=mesh,
        in_specs=(spec,), out_specs=spec,
    )
    return fn(signal)
