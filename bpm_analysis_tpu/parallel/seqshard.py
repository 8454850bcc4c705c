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


def _halo_exchange(block: jnp.ndarray, halo_left: int, halo_right: int, axis: str,
                   fill=0.0):
    """Fetch the right edge of the left neighbor and the left edge of the
    right neighbor along mesh axis ``axis`` (edge devices pad with ``fill`` —
    zeros for windowed sums, NaN for "missing" in quantile windows)."""
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
    fillv = jnp.asarray(fill, block.dtype)
    from_left = jnp.where(idx == 0, jnp.full_like(from_left, fillv), from_left)
    from_right = jnp.where(idx == n_dev - 1, jnp.full_like(from_right, fillv),
                           from_right)
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


def sequence_sharded_rolling_quantile(
    mesh: Mesh,
    x: jnp.ndarray,
    window: int,
    q: float,
    min_periods: int = 1,
    stride: int = 8,
    batched: bool = False,
) -> jnp.ndarray:
    """The noise-floor quantile (``ops.quantile.rolling_quantile_centered_strided``)
    with the sample axis sharded over mesh axis 'sp' — the long-recording
    path for the pipeline's heaviest kernel (reference noise floor,
    bpm_analysis.py:1081-1106).

    Each device computes the exact strided anchor quantiles for its block
    after a ``window//2``-sample halo exchange (NaN fill at the global edges
    == pandas truncation), then interpolates densely; the interpolation at a
    block's last span needs its right neighbor's first anchor, fetched with a
    second (tiny) ``ppermute``.  Matches the local kernel exactly
    (tests/test_sharding.py)."""
    from ..ops.quantile import _rowwise_select_kth

    left, right = centered_bounds(window)
    n = x.shape[-1]
    sp = mesh.shape["sp"]
    if n % sp:
        raise ValueError(f"sample count {n} not divisible by sp={sp}")
    block_len = n // sp
    if block_len % stride:
        raise ValueError(f"block length {block_len} not divisible by stride={stride}")
    if block_len < max(left, right):
        raise ValueError(
            f"block length {block_len} smaller than halo {max(left, right)}")
    na = block_len // stride
    dtype = x.dtype

    def kernel(blk):
        from_left, from_right = _halo_exchange(blk, left, right, "sp",
                                               fill=jnp.nan)
        ext = jnp.concatenate([from_left, blk, from_right])
        valid = ~jnp.isnan(ext)
        big = jnp.finfo(dtype).max
        extv = jnp.where(valid, ext, big)

        # Anchor windows: global anchor grid positions fall at local
        # multiples of stride because block_len % stride == 0; the window at
        # local position p covers ext[p : p + window).
        gidx = (jnp.arange(na)[:, None] * stride) + jnp.arange(window)[None, :]
        wins = extv[gidx]
        wvalid = valid[gidx]
        counts = jnp.sum(wvalid.astype(jnp.int32), axis=1)
        qf = jnp.asarray(q, dtype)
        p = qf * jnp.maximum(counts - 1, 0).astype(dtype)
        k_lo = jnp.clip(jnp.floor(p), 0, window - 1).astype(jnp.int32)
        frac = p - k_lo.astype(dtype)
        vlo = _rowwise_select_kth(wins, wvalid, k_lo)
        cnt_le = jnp.sum((wvalid & (wins <= vlo[:, None])).astype(jnp.int32), axis=1)
        above = jnp.where(wvalid & (wins > vlo[:, None]), wins,
                          jnp.asarray(jnp.inf, dtype))
        nxt_stat = jnp.min(above, axis=1)
        vhi = jnp.where(cnt_le >= k_lo + 2, vlo, nxt_stat)
        anchors = jnp.where(frac > 0, vlo + frac * (vhi - vlo), vlo)
        anchors = jnp.where(counts >= min_periods, anchors, jnp.nan)

        # Dense interpolation: each span [j*stride, (j+1)*stride) blends
        # anchor j toward anchor j+1; the last span's right anchor lives on
        # the right neighbor (global last block: held constant, which is
        # exactly ``interp_anchors``' serial behavior).
        first = anchors[:1]
        nxt_first = lax.ppermute(first, "sp",
                                 [(i + 1, i) for i in range(lax.axis_size("sp") - 1)])
        is_last = lax.axis_index("sp") == lax.axis_size("sp") - 1
        nxt_first = jnp.where(is_last, anchors[-1:], nxt_first)
        a_ext = jnp.concatenate([anchors, nxt_first])
        fracs = (jnp.arange(stride).astype(dtype) / stride)
        a0 = a_ext[:-1][:, None]
        a1 = a_ext[1:][:, None]
        dense = jnp.where(fracs > 0, a0 + fracs * (a1 - a0), a0)
        return dense.reshape(block_len)

    spec = P(None, "sp") if batched else P("sp")
    fn = shard_map(
        jax.vmap(kernel) if batched else kernel, mesh=mesh,
        in_specs=(spec,), out_specs=spec,
    )
    return fn(x)
