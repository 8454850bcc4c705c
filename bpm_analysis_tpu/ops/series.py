"""Sparse-series primitives: linear interpolation over sparse knots, asof
lookups, and masked order statistics.

These replace the reference's pandas idioms — ``reindex(arange).interpolate()``
(bpm_analysis.py:1082,1104), ``Series.asof`` (:234), ``np.median`` /
``np.percentile`` on masked interval arrays (:1269,1324) — with shape-static,
vmappable jnp equivalents operating on fixed-capacity knot arrays plus
validity masks.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def _ffill_pairs(value: jnp.ndarray, valid: jnp.ndarray):
    """Forward-fill (value, valid) with one associative scan — the TPU-cheap
    replacement for gather-by-last-valid-index patterns."""
    def combine(a, b):
        av, af = a
        bv, bf = b
        return jnp.where(bf, bv, av), af | bf

    return lax.associative_scan(combine, (value, valid))


def _bfill_pairs(value: jnp.ndarray, valid: jnp.ndarray):
    # Same "prefer the element nearest to the output position" combine as
    # the forward fill — reverse=True handles the direction.
    def combine(a, b):
        av, af = a
        bv, bf = b
        return jnp.where(bf, bv, av), af | bf

    return lax.associative_scan(combine, (value, valid), reverse=True)


def compact_valid(idx: jnp.ndarray, valid: jnp.ndarray, fill: int):
    """Stable-compact the valid entries of ``idx`` to the front.

    Returns (compacted_idx, count).  Invalid slots are filled with ``fill``.
    ``idx`` must be sorted ascending over valid entries (it stays sorted).
    """
    n = idx.shape[0]
    key = jnp.where(valid, jnp.arange(n), n + jnp.arange(n))
    order = jnp.argsort(key)
    count = jnp.sum(valid.astype(jnp.int32))
    compacted = jnp.where(jnp.arange(n) < count, idx[order], fill)
    return compacted, count


def interpolate_dense(
    knot_pos: jnp.ndarray,
    knot_val: jnp.ndarray,
    count,
    n: int,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Dense piecewise-linear interpolation of a sparse series.

    Equivalent to ``pd.Series(val, index=pos).reindex(arange(n)).interpolate()``
    (reference noise floor, bpm_analysis.py:1081-1082): linear between knots,
    NaN before the first knot, constant (last value) after the last knot.

    ``knot_pos`` is a fixed-capacity int array whose first ``count`` entries
    are the sorted knot positions; slots >= count are ignored.
    """
    cap = knot_pos.shape[0]
    slot = jnp.arange(cap)
    kvalid = slot < count
    pos = jnp.where(kvalid, jnp.clip(knot_pos, 0, n - 1), 0)
    val = jnp.where(kvalid, knot_val, 0).astype(dtype)

    # Scatter knots onto the dense grid, then forward/backward-fill both the
    # positions and the values with associative scans — no searchsorted, no
    # large gathers (both are pathologically slow on TPU at 100k+ scale).
    grid = jnp.arange(n)
    pos_w = jnp.where(kvalid, pos, n)  # out-of-bounds for padded slots
    dense_val = jnp.zeros((n,), dtype).at[pos_w].set(val, mode="drop")
    dense_has = jnp.zeros((n,), jnp.bool_).at[pos_w].set(True, mode="drop")
    dense_pos = jnp.where(dense_has, grid, 0)

    v0, has0 = _ffill_pairs(dense_val, dense_has)
    p0, _ = _ffill_pairs(dense_pos, dense_has)
    v1, has1 = _bfill_pairs(dense_val, dense_has)
    p1, _ = _bfill_pairs(dense_pos, dense_has)

    denom = jnp.maximum(p1 - p0, 1).astype(dtype)
    frac = (grid - p0).astype(dtype) / denom
    interp = v0 + frac * (v1 - v0)
    out = jnp.where(has1, interp, v0)        # past the last knot: hold value
    out = jnp.where(has0, out, jnp.nan)      # before the first knot: NaN
    out = jnp.where(count > 0, out, jnp.nan)
    return out


def asof(index: jnp.ndarray, values: jnp.ndarray, count, query: jnp.ndarray) -> jnp.ndarray:
    """``pd.Series(values, index).asof(query)``: value at the last index
    <= query; NaN if query precedes the first index (bpm_analysis.py:234)."""
    cap = index.shape[0]
    big = jnp.finfo(jnp.float32).max
    idxf = jnp.where(jnp.arange(cap) < count, index, big)
    j = jnp.searchsorted(idxf, query, side="right") - 1
    out = values[jnp.clip(j, 0, jnp.maximum(count - 1, 0))]
    return jnp.where(j < 0, jnp.nan, out)


def masked_quantile(x: jnp.ndarray, valid: jnp.ndarray, q) -> jnp.ndarray:
    """``np.quantile(x[valid], q)`` with linear interpolation on a
    fixed-capacity masked array.  NaN when no valid entries."""
    big = jnp.finfo(x.dtype).max
    xv = jnp.where(valid, x, big)
    s = jnp.sort(xv)
    n = jnp.sum(valid.astype(jnp.int32))
    pos = q * (n - 1).astype(x.dtype)
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, jnp.maximum(n - 1, 0))
    hi = jnp.clip(jnp.ceil(pos).astype(jnp.int32), 0, jnp.maximum(n - 1, 0))
    frac = pos - lo.astype(x.dtype)
    out = s[lo] * (1 - frac) + s[hi] * frac
    return jnp.where(n > 0, out, jnp.nan)


def masked_median(x: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """``np.median`` over valid entries (= quantile 0.5, linear)."""
    return masked_quantile(x, valid, 0.5)
