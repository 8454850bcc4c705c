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


def rolling_quantile_centered_sort(
    x: jnp.ndarray,
    window: int,
    q: float,
    min_periods: int = 1,
    chunk: int = 1024,
) -> jnp.ndarray:
    """Reference implementation of the sliding quantile via per-window sorts.

    Exact but O(N·W log W) — ~11 s per vulpine recording on a v5e chip
    (TPU sorts are expensive).  Kept for cross-checking the wavelet-tree
    path in tests; production uses :func:`rolling_quantile_centered`.
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


def _key_info(dtype):
    if dtype == jnp.float64:
        return jnp.uint64, jnp.int64, 64
    return jnp.uint32, jnp.int32, 32


def _sortable_key(x: jnp.ndarray) -> jnp.ndarray:
    """Monotone float → uint key (IEEE trick: flip all bits of negatives,
    flip the sign bit of non-negatives)."""
    utype, itype, nbits = _key_info(x.dtype)
    bits = lax.bitcast_convert_type(x, itype)
    sign = itype(-(1 << (nbits - 1)))
    u = jnp.where(bits < 0, ~bits, bits ^ sign)
    return u.astype(utype)


def _key_to_float(u: jnp.ndarray, dtype) -> jnp.ndarray:
    utype, itype, nbits = _key_info(dtype)
    sign_mask = utype(1 << (nbits - 1))
    bits = jnp.where((u & sign_mask) != 0,
                     (u ^ sign_mask).astype(itype), (~u).astype(itype))
    return lax.bitcast_convert_type(bits.astype(itype), dtype)


def select_kth(x: jnp.ndarray, valid: jnp.ndarray, k) -> jnp.ndarray:
    """Exact k-th smallest valid element — radix bisection over 4-bit digits
    of the sortable key: 8 (16 for f64) masked-count passes instead of a sort
    (TPU 1-D sorts are serial and ~500 ms at 100k elements).  Per round the
    15 digit-boundary counts are a single fused (n, 15) broadcast-compare
    sweep, so round count — the sequential-latency term that dominates on
    chip — drops 4x vs bit-at-a-time bisection.  ``k`` must be < number of
    valid elements."""
    utype, itype, nbits = _key_info(x.dtype)
    keys = jnp.where(valid, _sortable_key(x), utype((1 << nbits) - 1))
    k = jnp.asarray(k, jnp.int32)
    R = 4
    radix = jnp.arange(1, 1 << R, dtype=utype)            # (15,)

    def body(i, state):
        prefix, k = state
        sh = jnp.asarray(nbits - R * (i + 1), utype)
        high_mask = (~((utype(1) << (sh + utype(R))) - utype(1))).astype(utype)
        # Guard the i == 0 round: shifting by nbits is UB-ish; no high bits.
        high_mask = jnp.where(i == 0, utype(0), high_mask)
        cand = (keys & high_mask) == (prefix & high_mask)
        digit = ((keys >> sh) & utype((1 << R) - 1))
        cnt = jnp.sum((cand[:, None] & (digit[:, None] < radix[None, :])),
                      axis=0).astype(jnp.int32)           # (15,) boundary counts
        d = jnp.sum((cnt <= k).astype(jnp.int32))         # digit of the k-th
        below = jnp.sum(jnp.where(jnp.arange(1 << R)[1:] == d, cnt, 0))
        k = (k - below).astype(jnp.int32)
        prefix = (prefix | (d.astype(utype) << sh)).astype(utype)
        return prefix, k

    prefix, _ = lax.fori_loop(0, nbits // R, body, (utype(0), k))
    return _key_to_float(prefix, x.dtype)


def quantile_exact(x: jnp.ndarray, q: float, valid=None) -> jnp.ndarray:
    """``np.quantile(x[valid], q)`` (linear interpolation) without sorting —
    one radix selection for the lower order statistic, then the upper one in
    two fused sweeps (duplicates spanning rank k+1 keep v_lo, else the
    smallest valid value strictly above it)."""
    if valid is None:
        valid = ~jnp.isnan(x)
    n = jnp.sum(valid.astype(jnp.int32))
    pos = jnp.asarray(q, x.dtype) * jnp.maximum(n - 1, 0).astype(x.dtype)
    k_lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, jnp.maximum(n - 1, 0))
    frac = pos - k_lo.astype(x.dtype)
    v_lo = select_kth(x, valid, k_lo)
    cnt_le = jnp.sum((valid & (x <= v_lo)).astype(jnp.int32))
    above = jnp.where(valid & (x > v_lo), x, jnp.asarray(jnp.inf, x.dtype))
    nxt = jnp.min(above)
    v_hi = jnp.where((cnt_le >= k_lo + 2) | (k_lo + 1 >= n), v_lo, nxt)
    out = jnp.where(frac > 0, v_lo + frac * (v_hi - v_lo), v_lo)
    return jnp.where(n > 0, out, jnp.nan).astype(x.dtype)


def _build_wavelet_levels(x: jnp.ndarray):
    """Build a wavelet tree over the ranks of ``x`` (NaN → +inf ranks).

    Returns (levels, sorted_vals, L) where ``levels`` is an (L, n+1) int32
    array of per-level prefix-sums of the bit planes (ones counts), laid out
    so that level d's array order is the stable partition of the original
    positions by the top-d bits of their rank.

    Construction is O(L) fully-vectorized passes (searchsorted + cumsum +
    scatter), L = ceil(log2(n)) — no sequential loops, no sorts beyond the
    initial argsort.
    """
    n = x.shape[0]
    L = max(1, (n - 1).bit_length())
    big = jnp.where(jnp.isnan(x), jnp.inf, x)
    order = jnp.argsort(big, stable=True)
    ranks = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
    sorted_vals = big[order]

    p = jnp.arange(n, dtype=jnp.int32)

    def build_level(d, state):
        levels, R = state
        bit = (R >> (L - 1 - d)) & 1
        C = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                             jnp.cumsum(bit, dtype=jnp.int32)])
        levels = lax.dynamic_update_slice(levels, C[None, :], (d, 0))
        # Stable partition by this bit within each top-d-bit node to get the
        # next level's order.  Node boundaries = runs of equal top-d bits
        # (non-decreasing along the array) found with associative scans —
        # cheaper than searchsorted on TPU.
        g = R >> (L - d)
        neq_prev = jnp.concatenate([jnp.array([True]), g[1:] != g[:-1]])
        neq_next = jnp.concatenate([g[:-1] != g[1:], jnp.array([True])])
        nlo = lax.cummax(jnp.where(neq_prev, p, -1))
        nhi = jnp.flip(lax.cummin(jnp.flip(jnp.where(neq_next, p, n)))) + 1
        zeros_before = (p - nlo) - (C[p] - C[nlo])
        ones_before = C[p] - C[nlo]
        nzeros = (nhi - nlo) - (C[nhi] - C[nlo])
        newpos = jnp.where(bit == 0, nlo + zeros_before, nlo + nzeros + ones_before)
        R = jnp.zeros((n,), jnp.int32).at[newpos].set(R)
        return levels, R

    levels0 = jnp.zeros((L, n + 1), jnp.int32)
    levels, _ = lax.fori_loop(0, L, build_level, (levels0, ranks))
    return levels, sorted_vals, L


def _wavelet_select(levels, sorted_vals, L, lo, hi, k):
    """Vectorized range k-th-smallest: for each query i, the k_i-th smallest
    element (by rank) among positions [lo_i, hi_i).  O(L) gather rounds."""
    n = sorted_vals.shape[0]

    def level(d, state):
        lo, hi, nlo, nhi, k, rank = state
        C = levels[d]
        ones_range = C[hi] - C[lo]
        cnt0 = (hi - lo) - ones_range
        C_nlo = C[nlo]
        nzeros = (nhi - nlo) - (C[nhi] - C_nlo)
        zeros_lo = (lo - nlo) - (C[lo] - C_nlo)
        zeros_hi = (hi - nlo) - (C[hi] - C_nlo)
        ones_lo = C[lo] - C_nlo
        ones_hi = C[hi] - C_nlo
        go_left = k < cnt0
        lo = jnp.where(go_left, nlo + zeros_lo, nlo + nzeros + ones_lo)
        hi = jnp.where(go_left, nlo + zeros_hi, nlo + nzeros + ones_hi)
        new_nhi = jnp.where(go_left, nlo + nzeros, nhi)
        nlo = jnp.where(go_left, nlo, nlo + nzeros)
        nhi = new_nhi
        k = jnp.where(go_left, k, k - cnt0)
        rank = rank * 2 + (~go_left).astype(jnp.int32)
        return (lo, hi, nlo, nhi, k, rank)

    state = (lo, hi, jnp.zeros_like(lo), jnp.full_like(lo, n),
             k.astype(jnp.int32), jnp.zeros_like(lo))
    _, _, _, _, _, rank = lax.fori_loop(0, L, level, state)
    return sorted_vals[jnp.clip(rank, 0, n - 1)]


def rolling_quantile_centered(
    x: jnp.ndarray,
    window: int,
    q: float,
    min_periods: int = 1,
    chunk: int = 1024,  # unused; kept for API compatibility
) -> jnp.ndarray:
    """pandas ``rolling(window, min_periods, center=True).quantile(q)``.

    NaN entries of ``x`` are treated as missing.  Exact pandas semantics
    (linear interpolation between the two straddling order statistics of the
    non-NaN window population; NaN when fewer than ``min_periods`` valid).

    TPU-native algorithm: a wavelet tree over the value ranks answers every
    window's range-rank-selection in O(log n) gathers, all windows in
    parallel — O(n log n) total versus O(n·w log w) for per-window sorts
    (≈ 4 orders of magnitude fewer ops at the reference's 3000-sample noise
    window).  NaNs rank as +inf, so selecting k < n_valid never touches
    them.
    """
    n = x.shape[0]
    left, right = centered_bounds(window)
    dtype = x.dtype

    levels, sorted_vals, L = _build_wavelet_levels(x)

    idx = jnp.arange(n, dtype=jnp.int32)
    lo = jnp.maximum(idx - left, 0)
    hi = jnp.minimum(idx + right + 1, n)

    valid = (~jnp.isnan(x)).astype(jnp.int32)
    vsum = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(valid, dtype=jnp.int32)])
    cnt = vsum[hi] - vsum[lo]

    qf = jnp.asarray(q, dtype)
    pos = qf * jnp.maximum(cnt - 1, 0).astype(dtype)
    k_lo = jnp.floor(pos).astype(jnp.int32)
    k_hi = jnp.minimum(k_lo + 1, jnp.maximum(cnt - 1, 0))
    frac = pos - k_lo.astype(dtype)

    v_lo = _wavelet_select(levels, sorted_vals, L, lo, hi, k_lo)
    v_hi = _wavelet_select(levels, sorted_vals, L, lo, hi, k_hi)
    out = jnp.where(frac > 0, v_lo + frac * (v_hi - v_lo), v_lo)
    return jnp.where(cnt >= min_periods, out, jnp.nan).astype(dtype)


def _rowwise_select_kth(wins: jnp.ndarray, valid: jnp.ndarray,
                        k: jnp.ndarray) -> jnp.ndarray:
    """k_r-th smallest valid element of each row of ``wins`` ((R, W) float)
    via joint radix bisection over the sortable-key bit planes: nbits
    compare+row-sum passes, no sorting.  (Bit-at-a-time on purpose: this
    kernel is compute-bound over materialized window rows, where a 4-bit
    digit round costs 15 broadcast compares per element — a net loss.  The
    global ``select_kth`` is reduction-latency-bound and uses 4-bit digits.)
    """
    dtype = wins.dtype
    utype, _, nbits = _key_info(dtype)
    keys = jnp.where(valid, _sortable_key(wins), utype((1 << nbits) - 1))
    k = k.astype(jnp.int32)

    def body(i, state):
        prefix, k = state
        b = jnp.asarray(nbits - 1 - i, utype)
        bit = (utype(1) << b).astype(utype)
        high_mask = (~((bit << utype(1)) - utype(1))).astype(utype)
        cand = (keys & high_mask) == (prefix[:, None] & high_mask)
        c0 = jnp.sum((cand & ((keys & bit) == 0)).astype(jnp.int32), axis=1)
        take1 = k >= c0
        k = jnp.where(take1, k - c0, k).astype(jnp.int32)
        prefix = jnp.where(take1, prefix | bit, prefix).astype(utype)
        return prefix, k

    # init derived from ``keys`` (not a fresh zeros) so its varying-manual-
    # axes match the loop output under shard_map.
    prefix0 = jnp.zeros_like(keys[:, 0])
    prefix, _ = lax.fori_loop(0, nbits, body, (prefix0, k))
    return _key_to_float(prefix, dtype)


def rolling_quantile_centered_strided(
    x: jnp.ndarray,
    window: int,
    q: float,
    min_periods: int = 1,
    stride: int = 8,
    chunk: int = 512,
) -> jnp.ndarray:
    """Fast-path sliding quantile: exact pandas quantiles computed every
    ``stride`` samples, linearly interpolated in between.

    The noise floor is a ~10-second-scale smooth statistic sampled at
    ~300 Hz, so a sub-window stride is far below its variation scale; this
    trades bitwise parity (use :func:`rolling_quantile_centered` for that)
    for an order-of-magnitude cheaper kernel: the strided anchor windows are
    gathered into (chunk, window) rows and reduced with a row-wise radix
    select (bit-plane counting — no sorts, no data movement at all).
    Output positions i = j*stride hold the exact pandas value; intermediate
    positions are linear blends of their two anchors.
    """
    n = x.shape[0]
    left, right = centered_bounds(window)
    dtype = x.dtype
    big = jnp.finfo(dtype).max

    n_anchor = -(-n // stride)           # anchors at 0, stride, 2*stride, ...
    n_chunks = -(-n_anchor // chunk)
    padded_anchors = n_chunks * chunk

    xpad = jnp.full((n + left + right,), big, dtype)
    xpad = lax.dynamic_update_slice(xpad, jnp.where(jnp.isnan(x), big, x), (left,))
    vpad = jnp.zeros((n + left + right,), jnp.bool_)
    vpad = lax.dynamic_update_slice(vpad, ~jnp.isnan(x), (left,))

    win_idx = jnp.arange(window)
    qf = jnp.asarray(q, dtype)

    def one_chunk(c):
        # Anchor positions for this chunk; window start in xpad coords = pos.
        pos = (c * chunk + jnp.arange(chunk)) * stride
        pos = jnp.minimum(pos, n - 1)
        gidx = pos[:, None] + win_idx[None, :]
        wins = xpad[gidx]
        wvalid = vpad[gidx]
        counts = jnp.sum(wvalid.astype(jnp.int32), axis=1)
        p = qf * jnp.maximum(counts - 1, 0).astype(dtype)
        k_lo = jnp.clip(jnp.floor(p).astype(jnp.int32), 0, window - 1)
        frac = p - k_lo.astype(dtype)
        # Row-wise radix select instead of sorting 3000-wide windows for one
        # order statistic each: bit-plane descent with per-row masked counts
        # (pure VPU reductions, no data movement — ~5x cheaper than the
        # bitonic sort this replaced).
        vlo = _rowwise_select_kth(wins, wvalid, k_lo)
        # Next order statistic: equals v_lo when duplicates span rank k+1,
        # else the smallest window element strictly above v_lo.
        cnt_le = jnp.sum((wvalid & (wins <= vlo[:, None])).astype(jnp.int32), axis=1)
        above = jnp.where(wvalid & (wins > vlo[:, None]), wins,
                          jnp.asarray(jnp.inf, dtype))
        nxt = jnp.min(above, axis=1)
        vhi = jnp.where(cnt_le >= k_lo + 2, vlo, nxt)
        res = jnp.where(frac > 0, vlo + frac * (vhi - vlo), vlo)
        return jnp.where(counts >= min_periods, res, jnp.nan)

    anchors = lax.map(one_chunk, jnp.arange(n_chunks)).reshape(padded_anchors)
    return interp_anchors(anchors[:n_anchor], n, stride, dtype)


def interp_anchors(anchors: jnp.ndarray, n: int, stride: int, dtype) -> jnp.ndarray:
    """Expand per-stride anchors to the dense grid by linear interpolation —
    broadcast/reshape only (a gather of (n,) indices is pathologically slow
    on TPU).  NaN anchors propagate to their span."""
    n_anchor = anchors.shape[-1]
    nxt = jnp.concatenate([anchors[..., 1:], anchors[..., -1:]], axis=-1)
    frac = (jnp.arange(stride).astype(dtype) / stride)
    a0 = anchors[..., :, None]
    a1 = nxt[..., :, None]
    dense = jnp.where(frac > 0, a0 + frac * (a1 - a0), a0)
    dense = dense.reshape(*anchors.shape[:-1], n_anchor * stride)
    return dense[..., :n].astype(dtype)


def bfill_ffill(x: jnp.ndarray) -> jnp.ndarray:
    """pandas ``.bfill().ffill()``: back-fill NaNs from the next valid value,
    then forward-fill any remaining trailing NaNs (bpm_analysis.py:1086).

    Computed as "fetch the first valid value at or after i, else the last
    valid value": one native ``cummax`` index scan + one gather.  The earlier
    (value, flag)-tuple associative scans compiled fine in isolation but sent
    the TPU compiler into a multi-minute compile when composed downstream of
    the rolling quantile (see docs/ARCHITECTURE.md, compile-time discipline).
    """
    n = x.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    valid = ~jnp.isnan(x)
    # rmax[k] = max k' <= k with valid[n-1-k']  ==>  first valid >= i, or n.
    rmax = lax.cummax(jnp.where(jnp.flip(valid), idx, -1))
    nxt = jnp.flip(jnp.where(rmax >= 0, (n - 1) - rmax, n))
    last = jnp.max(jnp.where(valid, idx, -1))      # last valid overall, or -1
    j = jnp.where(nxt < n, nxt, jnp.maximum(last, 0))
    out = x[jnp.clip(j, 0, n - 1)]
    return jnp.where((nxt < n) | (last >= 0), out, jnp.nan)


def edge_fill(x: jnp.ndarray) -> jnp.ndarray:
    """``bfill().ffill()`` specialized to edge-NaN runs: fill the leading NaN
    run with the first valid value and the trailing run with the last.

    Exactly equal to :func:`bfill_ffill` whenever the NaNs form a prefix
    and/or suffix run — which is the only NaN structure a centered rolling
    quantile of a dense interpolation can produce (min_periods edges and the
    masked padded tail; interior windows always hold >= min_periods valid
    samples).  The general version pays a full-length scattered gather
    (~3 ms/row on TPU); this is two scalar gathers and two selects.
    All-NaN input stays all-NaN, matching bfill_ffill.
    """
    n = x.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    valid = ~jnp.isnan(x)
    any_valid = jnp.any(valid)
    first = jnp.argmax(valid)                      # first valid index (0 if none)
    last = (n - 1) - jnp.argmax(jnp.flip(valid))   # last valid index
    head = x[first]
    tail = x[last]
    out = jnp.where(idx < first, head, jnp.where(idx > last, tail, x))
    return jnp.where(any_valid, out, x)
