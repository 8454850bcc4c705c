"""Sliding-window quantile — the noise-floor workhorse.

The reference computes its dynamic noise floor as a centered rolling quantile
(window ``noise_window_sec * sr`` ≈ 3000 samples, ``min_periods=3``,
q = ``noise_floor_quantile``) of the densely-interpolated trough series — run
twice per recording (draft + sanitized; bpm_analysis.py:1085,1105).  Pandas
semantics reproduced exactly (tests/test_quantile.py):

* window at i = ``[i - w//2, i + (w-1)//2]`` truncated at the array edges,
* NaNs in the window are skipped; output is NaN when fewer than
  ``min_periods`` valid values remain,
* the quantile uses linear interpolation between order statistics:
  ``v[k] + frac * (v[k+1] - v[k])`` at position ``(n_valid - 1) * q``.

TPU-first implementation: windows are materialized in fixed-size chunks
(``chunk`` outputs × window length, gathered from a shared slice) and sorted
along the window axis — an embarrassingly parallel shape-static computation
that XLA maps onto the VPU's bitonic sorter.  ``lax.map`` over chunks bounds
memory to ``chunk * window`` floats.  For the vulpine workload that is
~115k windows × ~3k: fine on-chip; a rank-select (wavelet-tree) variant is a
planned optimization for very long recordings.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from .rolling import centered_bounds


def rolling_quantile_centered(
    x: jnp.ndarray,
    window: int,
    q: float,
    min_periods: int = 1,
    chunk: int = 1024,
) -> jnp.ndarray:
    """pandas ``rolling(window, min_periods, center=True).quantile(q)``.

    NaN entries of ``x`` are treated as missing.  Returns an array of the
    same shape/dtype as ``x``.
    """
    n = x.shape[0]
    left, right = centered_bounds(window)
    dtype = x.dtype
    big = jnp.finfo(dtype).max

    n_chunks = -(-n // chunk)
    padded_n = n_chunks * chunk
    # Pre-pad so every chunk's gather window is in bounds: chunk c covers
    # input positions [c*chunk - left, c*chunk + chunk - 1 + right].
    xpad = jnp.full((padded_n + left + right,), big, dtype)
    xpad = lax.dynamic_update_slice(xpad, jnp.where(jnp.isnan(x), big, x), (left,))
    validpad = jnp.zeros((padded_n + left + right,), jnp.bool_)
    validpad = lax.dynamic_update_slice(validpad, ~jnp.isnan(x), (left,))

    win_idx = jnp.arange(window)
    out_idx = jnp.arange(chunk)
    gather_idx = out_idx[:, None] + win_idx[None, :]  # (chunk, window)

    qf = jnp.asarray(q, dtype)

    def one_chunk(c):
        start = c * chunk
        xs = lax.dynamic_slice(xpad, (start,), (chunk + window - 1,))
        vs = lax.dynamic_slice(validpad, (start,), (chunk + window - 1,))
        wins = xs[gather_idx]              # (chunk, window), invalid -> +big
        wvalid = vs[gather_idx]
        counts = jnp.sum(wvalid.astype(jnp.int32), axis=1)
        swins = jnp.sort(wins, axis=1)     # valids first (big sorts last)
        pos = qf * (counts - 1).astype(dtype)
        lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, window - 1)
        hi = jnp.clip(jnp.ceil(pos).astype(jnp.int32), 0, window - 1)
        frac = pos - lo.astype(dtype)
        vlo = jnp.take_along_axis(swins, lo[:, None], axis=1)[:, 0]
        vhi = jnp.take_along_axis(swins, hi[:, None], axis=1)[:, 0]
        res = vlo * (1 - frac) + vhi * frac
        return jnp.where(counts >= min_periods, res, jnp.nan)

    out = lax.map(one_chunk, jnp.arange(n_chunks))
    return out.reshape(padded_n)[:n]


def bfill_ffill(x: jnp.ndarray) -> jnp.ndarray:
    """pandas ``.bfill().ffill()``: back-fill NaNs from the next valid value,
    then forward-fill any remaining trailing NaNs (bpm_analysis.py:1086)."""
    n = x.shape[0]
    idx = jnp.arange(n)
    valid = ~jnp.isnan(x)
    # next valid index at or after i (reverse cummin)
    nxt = jnp.flip(lax.cummin(jnp.flip(jnp.where(valid, idx, n))))
    bf = jnp.where(nxt < n, x[jnp.minimum(nxt, n - 1)], jnp.nan)
    valid2 = ~jnp.isnan(bf)
    prv = lax.cummax(jnp.where(valid2, idx, -1))
    return jnp.where(prv >= 0, bf[jnp.maximum(prv, 0)], jnp.nan)
