"""scipy.signal.find_peaks semantics on TPU, shape-static and vmappable.

The reference calls ``find_peaks`` in four places: raw peaks with an
array-valued height threshold + prominence + distance (bpm_analysis.py:227),
troughs on the negated envelope with distance + prominence (:1070), and the
incline/decline endpoint searches on the BPM curve (:1496-1497,1529-1530).

Exact scipy behaviors reproduced (verified against scipy in
tests/test_find_peaks.py):

* local maxima use strict neighbors with plateau support — a flat top emits
  one peak at ``(left_edge + right_edge) // 2`` (scipy ``_local_maxima_1d``),
* filter order is height → distance → prominence (scipy find_peaks applies
  conditions in that sequence, so the distance NMS never sees peaks already
  dropped by height, and prominences are only evaluated for NMS survivors),
* the distance filter is a greedy highest-first suppression over peaks sorted
  by height, ties broken toward the *later* peak, with ``ceil(distance)``
  spacing, strict ``<`` comparison.  NOTE: scipy itself iterates a
  *non-stable* ``np.argsort`` in reverse, so its order among EQUAL heights is
  implementation-defined (quicksort partition order); this implementation
  fixes the deterministic later-peak-first convention, which matches scipy on
  all distinct-height inputs and may legitimately differ on exact ties
  (observed on int16-quantized synthetics),
* prominence of a peak is ``x[p] - max(min(x[lb..p]), min(x[p..rb]))`` where
  lb/rb sit one past the nearest strictly-greater sample on each side
  (``wlen=None``), falling back to the signal edges.

Everything is fixed-capacity: peak positions are compacted into a
``capacity``-length int32 array plus a count, so downstream stages stay
shape-static under ``vmap``/``pjit``.  The distance NMS is a ``lax.scan`` of
O(capacity) masked vector updates; prev/next-greater lookups use O(1)
sparse-table range-max queries inside an O(log n) monotone binary search.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from .quantile import _sortable_key


class Peaks(NamedTuple):
    positions: jnp.ndarray  # (capacity,) int32; slots >= count hold n (past end)
    count: jnp.ndarray      # () int32
    overflowed: jnp.ndarray  # () bool: a capacity truncated the population


def local_maxima_mask(x: jnp.ndarray) -> jnp.ndarray:
    """Boolean mask of plateau-midpoint local maxima (scipy semantics).

    The boundary checks (value before the run start / after the run end must
    be lower) are propagated from the run boundaries with a ``2*i + bit``
    cummax trick instead of dense data-dependent gathers — run starts are
    increasing, so the cummax of that code carries each run's boundary flag
    in its low bit (dense gathers cost ~60 ms per 32x181k batch on chip)."""
    n = x.shape[0]
    idx = jnp.arange(n)
    neq_prev = jnp.concatenate([jnp.array([True]), x[1:] != x[:-1]])
    neq_next = jnp.concatenate([x[:-1] != x[1:], jnp.array([True])])
    run_start = lax.cummax(jnp.where(neq_prev, idx, -1))
    run_end = jnp.flip(lax.cummin(jnp.flip(jnp.where(neq_next, idx, n))))
    rs = jnp.maximum(run_start, 0)
    re = jnp.minimum(run_end, n - 1)
    ok = (rs >= 1) & (re <= n - 2)
    prev_v = jnp.concatenate([x[:1], x[:-1]])          # x[i-1]
    next_v = jnp.concatenate([x[1:], x[-1:]])          # x[i+1]
    lcode = jnp.where(neq_prev, 2 * idx + (prev_v < x), -1)
    left_lower = (lax.cummax(lcode) & 1) == 1
    rcode = jnp.where(jnp.flip(neq_next),
                      2 * idx + jnp.flip(next_v < x), -1)
    right_lower = jnp.flip((lax.cummax(rcode) & 1) == 1)
    midpoint = (rs + re) // 2
    return ok & left_lower & right_lower & (idx == midpoint)


def local_extrema_masks(x: jnp.ndarray):
    """(maxima mask, minima mask) in one pass — the run/boundary machinery
    of ``local_maxima_mask`` is sign-invariant, so both kinds share it and
    only the neighbor comparisons flip."""
    n = x.shape[0]
    idx = jnp.arange(n)
    neq_prev = jnp.concatenate([jnp.array([True]), x[1:] != x[:-1]])
    neq_next = jnp.concatenate([x[:-1] != x[1:], jnp.array([True])])
    run_start = lax.cummax(jnp.where(neq_prev, idx, -1))
    run_end = jnp.flip(lax.cummin(jnp.flip(jnp.where(neq_next, idx, n))))
    rs = jnp.maximum(run_start, 0)
    re = jnp.minimum(run_end, n - 1)
    ok = (rs >= 1) & (re <= n - 2)
    prev_v = jnp.concatenate([x[:1], x[:-1]])
    next_v = jnp.concatenate([x[1:], x[-1:]])
    midpoint = ok & (idx == (rs + re) // 2)
    neq_next_f = jnp.flip(neq_next)

    def boundary(prev_lower, next_lower):
        lcode = jnp.where(neq_prev, 2 * idx + prev_lower, -1)
        left = (lax.cummax(lcode) & 1) == 1
        rcode = jnp.where(neq_next_f, 2 * idx + jnp.flip(next_lower), -1)
        right = jnp.flip((lax.cummax(rcode) & 1) == 1)
        return left & right

    mmax = midpoint & boundary(prev_v < x, next_v < x)
    mmin = midpoint & boundary(prev_v > x, next_v > x)
    return mmax, mmin


def _compact_mask(mask: jnp.ndarray, capacity: int) -> Peaks:
    """Stable compaction of mask indices via ``lax.top_k`` on negated
    indices — TPU top_k runs ~3.7x faster than the rank-scatter this
    replaces (scatter costs ~5 ns per dense element; top_k's partial sort
    ~1.3 ns) and ~10x faster than a full sort.  Identical outputs."""
    n = mask.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    key = jnp.where(mask, -idx, jnp.int32(-(1 << 30)))
    k = min(capacity, n)
    vals, _ = lax.top_k(key, k)
    total = jnp.sum(mask.astype(jnp.int32))
    count = jnp.minimum(total, capacity)
    out = jnp.where(jnp.arange(k) < count, -vals, n)
    if k < capacity:
        out = jnp.concatenate([out, jnp.full((capacity - k,), n, jnp.int32)])
    return Peaks(out, count, total > capacity)


def _sparse_table(x: jnp.ndarray, op, levels: Optional[int] = None) -> jnp.ndarray:
    """Table T[k, i] = op-reduction of x[i : i + 2^k] (clamped at the end).

    ``levels`` caps the table height when every query range is known to be
    short (range length < 2^levels) — e.g. distance-NMS neighborhoods span
    at most 2*ceil(distance)+1 slots."""
    n = x.shape[0]
    if levels is None:
        levels = max(1, (n - 1).bit_length())
    levels = max(1, min(levels, (n - 1).bit_length() or 1))
    rows = [x]
    cur = x
    for k in range(1, levels):
        shift = 1 << (k - 1)
        shifted = jnp.concatenate([cur[shift:], cur[-1:].repeat(shift)])
        cur = op(cur, shifted)
        rows.append(cur)
    return jnp.stack(rows)


def _range_query(table: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray, op) -> jnp.ndarray:
    """op-reduction over x[a..b] inclusive, a <= b, via two overlapping
    power-of-two windows.  a/b may be traced arrays."""
    length = b - a + 1
    # floor(log2(length)): position of highest set bit.
    k = (31 - lax.clz(jnp.maximum(length, 1).astype(jnp.int32))).astype(jnp.int32)
    left = table[k, a]
    right = table[k, jnp.maximum(b - (1 << k) + 1, 0)]
    return op(left, right)


def _last_above(max_table: jnp.ndarray, v: jnp.ndarray, r: jnp.ndarray,
                flip: bool = False) -> jnp.ndarray:
    """Largest i in [0, r] with x[i] > v, or -1 — dyadic sparse-table
    descent: walk left from r+1, skipping each power-of-two block whose max
    is <= v.  One aligned row-gather per level (the bisection this replaced
    cost four scattered gathers per step).

    ``flip=True`` reads ``max_table`` as the MIN-table of ``-x`` (and ``v``
    as ``-v``): the skip test becomes ``seg >= v``.  Lets a caller searching
    a negated signal reuse the other sign's tables without materializing
    negated copies."""
    levels = max_table.shape[0]
    pos = r + 1                       # elements [0, pos) remain candidates
    for k in reversed(range(levels)):  # static unroll, ~log2(n) levels
        step = 1 << k
        seg = max_table[k, jnp.maximum(pos - step, 0)]
        move = (pos >= step) & ((seg >= v) if flip else (seg <= v))
        pos = jnp.where(move, pos - step, pos)
    return pos - 1                    # pos == 0 -> no element above v


def _first_above(max_table: jnp.ndarray, v: jnp.ndarray, l: jnp.ndarray,
                 flip: bool = False) -> jnp.ndarray:
    """Smallest i in [l, n-1] with x[i] > v, or n — mirror descent walking
    right from l (table rows clamp at the array end, so a partial trailing
    block reduces over the remaining elements, which is exactly the skip
    test needed).  ``flip`` as in ``_last_above``."""
    n = max_table.shape[1]
    levels = max_table.shape[0]
    pos = l
    for k in reversed(range(levels)):
        step = 1 << k
        seg = max_table[k, jnp.minimum(pos, n - 1)]
        move = (pos < n) & ((seg >= v) if flip else (seg <= v))
        pos = jnp.minimum(jnp.where(move, pos + step, pos), n)
    return pos                        # n -> no element above v


def peak_prominences(
    x: jnp.ndarray,
    positions: jnp.ndarray,
    valid: jnp.ndarray,
    max_table: Optional[jnp.ndarray] = None,
    min_table: Optional[jnp.ndarray] = None,
    tables_negated: bool = False,
) -> jnp.ndarray:
    """Prominence of each (valid) peak position, scipy ``wlen=None``.

    ``tables_negated=True`` declares the supplied tables were built on
    ``-x`` (e.g. the trough finder searching ``-env`` reusing the raw-peak
    finder's envelope tables): descents flip their comparisons and range
    results flip sign, avoiding two table-sized negation copies."""
    n = x.shape[0]
    if max_table is None or min_table is None:
        max_table = _sparse_table(x, jnp.maximum)
        min_table = _sparse_table(x, jnp.minimum)
        tables_negated = False
    p = jnp.clip(positions, 0, n - 1)
    v = x[p]
    if tables_negated:
        # max of x over a block == -(min of -x); min of x == -(max of -x).
        lb = _last_above(min_table, -v, p, flip=True) + 1
        rb = _first_above(min_table, -v, p, flip=True) - 1
        left_min = -_range_query(max_table, jnp.maximum(lb, 0), p, jnp.maximum)
        right_min = -_range_query(max_table, p, jnp.minimum(rb, n - 1),
                                  jnp.maximum)
    else:
        lb = _last_above(max_table, v, p) + 1           # in [0, p]
        rb = _first_above(max_table, v, p) - 1          # in [p, n-1]
        left_min = _range_query(min_table, jnp.maximum(lb, 0), p, jnp.minimum)
        right_min = _range_query(min_table, p, jnp.minimum(rb, n - 1),
                                 jnp.minimum)
    prom = v - jnp.maximum(left_min, right_min)
    return jnp.where(valid, prom, 0.0)


class Extrema(NamedTuple):
    """Shared extrema decomposition of a signal for ``extrema_prominences``.

    The signal between consecutive local extrema is monotone (or flat), so a
    peak's prominence bases reduce to extrema-domain queries: the nearest
    strictly-taller *sample* on each side lies on the flank of the nearest
    strictly-taller *maximum*, and the range-min between them is the min of
    the valley minima strictly between that maximum and the peak.  Both
    arrays carry virtual entries for the signal edges: slot 0 holds ``x[0]``
    (the leading run's extreme value) and slot ``count+1`` holds ``x[n-1]``,
    reproducing scipy's edge fallback exactly.

    ``max_heights`` pads with -inf and ``min_heights`` with +inf: in BOTH
    orientations (peaks on x, or troughs on -x with roles swapped) padding
    then never stops a taller-search and never perturbs a valley reduction.
    """
    max_heights: jnp.ndarray   # (cap,) maxima heights; [0]=x0, [cm+1]=x[-1]
    min_heights: jnp.ndarray   # (cap,) minima heights; [0]=x0, [cv+1]=x[-1]
    max_positions: jnp.ndarray  # (cap-2,) int32 real maxima positions, fill n
    min_positions: jnp.ndarray  # (cap-2,) int32 real minima positions, fill n
    first_is_max: jnp.ndarray  # () bool: first real extremum is a maximum
    max_count: jnp.ndarray     # () int32 real maxima count
    min_count: jnp.ndarray     # () int32 real minima count
    union_rank: jnp.ndarray    # (n,) int32 1-based rank among ALL extrema
    max_table: jnp.ndarray     # (L, cap) sparse MAX table of max_heights
    min_table: jnp.ndarray     # (L, cap) sparse MIN table of min_heights
    overflowed: jnp.ndarray    # () bool: an extrema population was truncated


def build_extrema(x: jnp.ndarray, capacity: int) -> Extrema:
    """Extrema arrays of ``x`` (edge-held already, if padded).  ``capacity``
    includes the two virtual edge slots, i.e. at most ``capacity - 2`` real
    maxima (resp. minima) are representable before the overflow flag fires.

    The maxima|minima union is compacted by ``lax.top_k`` on a negated
    encoded key (~1.3 ns/element vs ~5 ns for the rank-scatter it replaced
    — paying it once for the union instead of per-kind), with each entry's
    kind bit packed into the key (``2*idx + is_max``).  Extrema strictly
    ALTERNATE
    (exactly one minimum between consecutive maxima under plateau-midpoint
    semantics), so the per-kind arrays split off by union-slot parity —
    free strided slices, and per-kind ranks are closed-form in the union
    rank (no further cumsums or scatters)."""
    n = x.shape[0]
    real_cap = capacity - 2
    union_cap = 2 * real_cap
    mmax, mmin = local_extrema_masks(x)
    both = mmax | mmin

    idx = jnp.arange(n, dtype=jnp.int32)
    rank_u1 = jnp.cumsum(both.astype(jnp.int32))
    # Compaction by top_k on the negated encoded key (monotone in idx, so
    # the result is in position order with the kind bit carried along) —
    # ~3.7x faster than the rank-scatter it replaces at this width.
    enc_key = jnp.where(both, -(2 * idx + mmax.astype(jnp.int32)),
                        jnp.int32(-(1 << 30)))
    uk = min(union_cap, n)
    enc_vals, _ = lax.top_k(enc_key, uk)
    u_total = rank_u1[-1]
    u_count = jnp.minimum(u_total, union_cap)
    enc = jnp.where(jnp.arange(uk) < u_count, -enc_vals, 2 * n)
    if uk < union_cap:
        enc = jnp.concatenate(
            [enc, jnp.full((union_cap - uk,), 2 * n, jnp.int32)])
    first_is_max = (u_count > 0) & ((enc[0] & 1) == 1)

    dtype = x.dtype
    neg_inf = jnp.array(-jnp.inf, dtype)
    pos_inf = jnp.array(jnp.inf, dtype)
    even, odd = enc[0::2], enc[1::2]           # (real_cap,) each
    # Alternation: starting-kind extrema sit at even union slots.
    enc_max = jnp.where(first_is_max, even, odd)
    enc_min = jnp.where(first_is_max, odd, even)
    cm = (u_count + first_is_max.astype(jnp.int32)) // 2
    cv = u_count - cm
    slot_r = jnp.arange(real_cap, dtype=jnp.int32)

    def unpack(enc_k, cnt, fill_h):
        ok = slot_r < cnt
        pos = jnp.where(ok, enc_k >> 1, n)
        hts = jnp.where(ok, x[jnp.clip(pos, 0, n - 1)], fill_h)
        return pos, hts

    max_pos, max_h = unpack(enc_max, cm, neg_inf)
    min_pos, min_h = unpack(enc_min, cv, pos_inf)

    def with_virtuals(hts, cnt, fill):
        out = jnp.full((capacity,), fill, dtype)
        out = lax.dynamic_update_slice(out, hts, (1,))
        out = out.at[0].set(x[0])
        return out.at[cnt + 1].set(x[n - 1])

    mh = with_virtuals(max_h, cm, neg_inf)
    vh = with_virtuals(min_h, cv, pos_inf)
    return Extrema(
        max_heights=mh, min_heights=vh,
        max_positions=max_pos, min_positions=min_pos,
        first_is_max=first_is_max, max_count=cm, min_count=cv,
        union_rank=rank_u1,
        max_table=_sparse_table(mh, jnp.maximum),
        min_table=_sparse_table(vh, jnp.minimum),
        overflowed=u_total > union_cap,
    )


def compact_slots(keep: jnp.ndarray, capacity: int, arrays_with_fills):
    """Stable compaction of several aligned arrays by one mask: top_k on
    negated slot indices picks the kept slots in order, then each array
    gathers through them (top_k beats both the rank-scatter and a sort on
    TPU).  Returns (list, count, overflow)."""
    n = keep.shape[0]
    slot = jnp.arange(n, dtype=jnp.int32)
    key = jnp.where(keep, -slot, jnp.int32(-(1 << 30)))
    vals, _ = lax.top_k(key, min(capacity, n))
    total = jnp.sum(keep.astype(jnp.int32))
    count = jnp.minimum(total, capacity)
    ok = jnp.arange(min(capacity, n)) < count
    src = jnp.where(ok, -vals, 0)
    outs = []
    for arr, fill in arrays_with_fills:
        o = jnp.where(ok, arr[src], fill)
        if o.shape[0] < capacity:
            o = jnp.concatenate(
                [o, jnp.full((capacity - o.shape[0],), fill, o.dtype)])
        outs.append(o)
    return outs, count, total > capacity


def _shift_right(a: jnp.ndarray, m: int, fill) -> jnp.ndarray:
    """a[i - m] with out-of-range slots = fill."""
    return jnp.concatenate([jnp.full((m,), fill, a.dtype), a[:-m]])


def _shift_left(a: jnp.ndarray, m: int, fill) -> jnp.ndarray:
    """a[i + m] with out-of-range slots = fill."""
    return jnp.concatenate([a[m:], jnp.full((m,), fill, a.dtype)])


def extrema_prominences(
    ext: Extrema,
    positions: jnp.ndarray,
    valid: jnp.ndarray,
    negated: bool = False,
    sweep_window: int = 64,
    residual_capacity: int = 2048,
):
    """Prominences of peaks that are local maxima of the signal ``ext`` was
    built on (``negated=False``) or of its negation (troughs;
    ``negated=True``) — bit-identical to ``peak_prominences`` on the dense
    signal, at extrema-domain cost.

    Strategy: compute every maxima slot's nearest-strictly-taller maximum
    within ``sweep_window`` slots by dense shifted compares (no gathers) and
    the valley min up to it by a running reduction over the same shifts; the
    rare residual (slots taller than their whole ``sweep_window``
    neighborhood — locally record-setting peaks, ~count/window of them) is
    compacted to ``residual_capacity`` slots and resolved by the dyadic
    sparse-table descent.  Residuals beyond capacity set the returned
    overflow flag (the standard truncate-with-flag contract; the host
    surfaces it).

    Returns ``(prominences_at_positions, overflowed)``.
    """
    W = sweep_window
    cap = ext.max_heights.shape[0]
    dtype = ext.max_heights.dtype
    if negated:
        # Troughs of x == peaks of -x: the minima array plays the peaks and
        # the maxima array plays the valleys; every comparison flips and the
        # valley reduction becomes a running max.  prominence on -x is
        # min(left_max, right_max) - vh[s] (exact sign-flip algebra).
        peak_h, valley_h = ext.min_heights, ext.max_heights
        fim = ~ext.first_is_max
        peak_count = ext.min_count
        fillP, fillV = jnp.array(jnp.inf, dtype), jnp.array(-jnp.inf, dtype)
        taller = lambda a, b: a < b
        vred = jnp.maximum
        desc_table, desc_flip = ext.min_table, True
        valley_table, valley_op = ext.max_table, jnp.maximum
    else:
        peak_h, valley_h = ext.max_heights, ext.min_heights
        fim = ext.first_is_max
        peak_count = ext.max_count
        fillP, fillV = jnp.array(-jnp.inf, dtype), jnp.array(jnp.inf, dtype)
        taller = lambda a, b: a > b
        vred = jnp.minimum
        desc_table, desc_flip = ext.max_table, False
        valley_table, valley_op = ext.min_table, jnp.minimum

    slot = jnp.arange(cap, dtype=jnp.int32)
    # Valley immediately left / right of peak-role slot s.  With alternation
    # (exactly one minimum between consecutive maxima, plateau-midpoint
    # semantics) the offset depends only on which extremum comes first.
    VL = jnp.where(fim, _shift_right(valley_h, 1, fillV), valley_h)
    VR = jnp.where(fim, valley_h, _shift_left(valley_h, 1, fillV))

    def sweep(shift, vsel):
        found = jnp.zeros((cap,), bool)
        res = jnp.full((cap,), fillV, dtype)
        acc = vsel
        for m in range(1, W + 1):
            t = taller(shift(peak_h, m, fillP), peak_h)
            res = jnp.where(t & ~found, acc, res)
            found = found | t
            acc = vred(acc, shift(vsel, m, fillV))
        return res, found, acc

    l_res, l_found, l_acc = sweep(_shift_right, VL)
    r_res, r_found, r_acc = sweep(_shift_left, VR)
    # Searches that exhausted to a signal edge within the window are resolved
    # with the full running reduction (virtual edge entries included; slots
    # past the edge contribute the no-effect fill).
    left_min = jnp.where(l_found, l_res, l_acc)
    right_min = jnp.where(r_found, r_res, r_acc)
    l_resolved = l_found | (slot <= W)
    r_resolved = r_found | (slot + W >= peak_count + 1)

    # Residual: real peak slots whose search must continue past the window.
    # Position -> peak slot: one union-rank gather, then closed-form parity
    # arithmetic (alternation puts this kind at union parity ``1 - fim``).
    n = ext.union_rank.shape[0]
    u = ext.union_rank[jnp.clip(positions, 0, n - 1)] - 1
    off = 1 - fim.astype(jnp.int32)
    ranks_at = jnp.maximum(u - off, 0) // 2 + 1
    ranks_at = jnp.where(valid, ranks_at, cap)
    is_peak = jnp.zeros((cap + 1,), bool).at[ranks_at].set(True,
                                                           mode="drop")[:cap]
    fim_off = fim.astype(jnp.int32)

    def residual(resolved, desc, vlo, vhi):
        need = is_peak & ~resolved
        sel = _compact_mask(need, residual_capacity)
        s = jnp.clip(sel.positions, 0, cap - 1)
        v = peak_h[s]
        j = desc(v, s)
        val = _range_query(valley_table, vlo(s, j), vhi(s, j), valley_op)
        ok = jnp.arange(residual_capacity) < sel.count
        return jnp.where(ok, val, fillV), jnp.where(ok, sel.positions,
                                                    cap), sel.overflowed

    lv, ls, lo = residual(
        l_resolved,
        lambda v, s: _last_above(desc_table, v, s - W - 1, flip=desc_flip),
        lambda s, j: jnp.maximum(j + 1 - fim_off, 0),
        lambda s, j: s - fim_off)
    rv, rs, ro = residual(
        r_resolved,
        lambda v, s: _first_above(desc_table, v, s + W + 1, flip=desc_flip),
        lambda s, j: s + 1 - fim_off,
        lambda s, j: jnp.minimum(j - fim_off, cap - 1))
    left_min = left_min.at[ls].set(lv, mode="drop")
    right_min = right_min.at[rs].set(rv, mode="drop")

    # The deeper base wins: scipy takes max(left_min, right_min) — on the
    # negated orientation that flips to min(left_max, right_max).
    if negated:
        prom_slots = jnp.minimum(left_min, right_min) - peak_h
    else:
        prom_slots = peak_h - jnp.maximum(left_min, right_min)
    prom = prom_slots[jnp.clip(ranks_at, 0, cap - 1)]
    prom = jnp.where(valid, prom, jnp.zeros((), dtype))
    return prom, lo | ro | ext.overflowed


def _select_by_distance(
    positions: jnp.ndarray, priority: jnp.ndarray, valid: jnp.ndarray, distance
) -> jnp.ndarray:
    """scipy ``_select_by_peak_distance``: greedy keep-highest suppression.

    ``positions`` sorted ascending over valid slots.  Returns keep mask.
    """
    cap = positions.shape[0]
    dist = jnp.ceil(jnp.asarray(distance, jnp.float32))
    neg_inf = jnp.finfo(jnp.float32).min
    prio = jnp.where(valid, priority.astype(jnp.float32), neg_inf)
    # Highest priority first; among equal priorities the later (larger-index)
    # peak first — a deterministic convention (scipy's own np.argsort is
    # non-stable, so its tie order is implementation-defined; see module
    # docstring).  The short-window branch below never materializes that
    # order: ranks are only ever *compared within distance windows*, so the
    # lexicographic (priority, slot) maximum decides each window directly and
    # the full argsort (~15 ns/element: the single most expensive op of the
    # NMS at realistic slot widths) plus its rank scatter are skipped.  The
    # wide-window sparse-table branch still builds explicit ranks.

    # In scipy's greedy pass a peak removes its neighbors only if it is
    # itself still alive when processed, and a peak alive at its processing
    # time is never removed afterwards (only higher-priority peaks could, and
    # they were already processed).  Hence the survivor set is the unique
    # fixed point of  survives(j) ⟺ ∄ surviving k ≠ j within `dist` with
    # rank[k] < rank[j]  — computed here by parallel rounds: every alive peak
    # that is the min-rank among the alive peaks of its neighborhood survives
    # greedy (nothing can remove it), and its alive neighbors are removed by
    # it (it beats them all).  Each round decides at least the global
    # min-rank alive peak, so the loop terminates in ≤ cap rounds (a handful
    # in practice).  Positions are sorted ascending, so each neighborhood is
    # a contiguous slot range answered by sparse-table range-min queries.
    # Spread padding slots beyond every real window (pairwise gaps > dist):
    # with a shared fill position they would all land in one neighborhood,
    # making slot ranges O(cap) and defeating the table-height cap below.
    slots_f = jnp.arange(cap, dtype=jnp.float32)
    base = jnp.max(jnp.where(valid, positions.astype(jnp.float32),
                             -jnp.inf)) + dist + 1.0
    posf = jnp.where(valid, positions.astype(jnp.float32),
                     base + slots_f * (dist + 1.0))
    # Neighborhood slot bounds.  Positions are local-maxima outputs, so
    # adjacent slots are >= 2 samples apart and a distance window holds at
    # most ceil(dist)/2 + 1 of them — for static distances that bounds the
    # predecessor/successor scan to a short unrolled shifted-compare stack
    # (a dense 16k x 16k searchsorted costs ~160 ms per 32-batch on chip).
    win = (int(-(-distance // 1)) // 2 + 2) if isinstance(distance,
                                                          (int, float)) else cap
    slot_idx = jnp.arange(cap, dtype=jnp.int32)
    if win <= 128:
        neg, pos_inf = jnp.float32(-jnp.inf), jnp.float32(jnp.inf)
        cnt_prev = jnp.zeros((cap,), jnp.int32)
        cnt_next = jnp.zeros((cap,), jnp.int32)
        for m in range(1, win + 1):
            prev_m = jnp.concatenate([jnp.full((m,), neg), posf[:-m]])
            cnt_prev += (prev_m > posf - dist).astype(jnp.int32)
            next_m = jnp.concatenate([posf[m:], jnp.full((m,), pos_inf)])
            cnt_next += (next_m < posf + dist).astype(jnp.int32)
        lo = slot_idx - cnt_prev
        hi = slot_idx + cnt_next
    else:
        lo = jnp.searchsorted(posf, posf - dist, side="right").astype(jnp.int32)
        hi = (jnp.searchsorted(posf, posf + dist, side="left") - 1).astype(jnp.int32)
    # Neighborhoods span <= 2*ceil(distance)+1 distinct positions, hence that
    # many slots — cap the per-round table height accordingly (static
    # distance only; traced distances get full-height tables).
    if isinstance(distance, (int, float)):
        nms_levels = (2 * int(-(-distance // 1)) + 1).bit_length()
    else:
        nms_levels = None

    def cond(state):
        _, alive = state
        return jnp.any(alive)

    if win <= 32:
        # Gather- AND sort-free rounds over the (short) neighborhoods: the
        # processing-order relation "k beats j" is the lexicographic order on
        # (priority, slot), so each round's window winner is the running
        # lexicographic max over a stack of static shifts — key equality
        # breaking toward the larger slot — with the [lo, hi] bounds applied
        # as masks.  One sweep decides the winners, one windowed-any marks
        # their suppressed neighbors.  (The sparse-table + gather formulation
        # below costs ~4 scattered gathers per round, which dominated NMS
        # time at small distances; the explicit-rank variant this replaces
        # paid a full ~15 ns/element argsort + rank scatter up front — the
        # single most expensive op of the NMS at realistic slot widths.)
        # ``+ 0.0`` flushes a -0.0 priority to +0.0 so key equality coincides
        # with float equality (the argsort treated ±0.0 as tied; so must the
        # key).  Key 0 sits below every real key (-inf maps to 0x007fffff)
        # and marks masked-out candidates.
        key = _sortable_key(prio + 0.0)
        key0 = jnp.zeros((), key.dtype)
        offs = range(-win, win + 1)
        i_ms = [slot_idx + m for m in offs]
        ok_ms = [(i_m >= lo) & (i_m <= hi) for i_m in i_ms]

        def _shifted(vals, m, fill):
            if m < 0:
                return jnp.concatenate([jnp.full((-m,), fill, vals.dtype),
                                        vals[:m]])
            if m > 0:
                return jnp.concatenate([vals[m:],
                                        jnp.full((m,), fill, vals.dtype)])
            return vals

        def body(state):
            keep, alive = state
            akey = jnp.where(alive, key, key0)
            best = jnp.full((cap,), 0, key.dtype)
            winner = jnp.full((cap,), -1, jnp.int32)
            for m, i_m, ok in zip(offs, i_ms, ok_ms):
                k_m = jnp.where(ok, _shifted(akey, m, key0), key0)
                better = (k_m > best) | ((k_m == best) & (i_m > winner)
                                         & (k_m > key0))
                best = jnp.where(better, k_m, best)
                winner = jnp.where(better, i_m, winner)
            new_keep = alive & (winner == slot_idx)
            killed = jnp.zeros((cap,), bool)
            for m, i_m, ok in zip(offs, i_ms, ok_ms):
                killed = killed | (ok & _shifted(new_keep, m, False))
            alive = alive & ~new_keep & ~killed
            return keep | new_keep, alive
    else:
        # Wide / traced-distance fallback: explicit processing-order ranks
        # (stable argsort descending, later slot first among equal
        # priorities) + sparse-table range-min per round.
        order = jnp.flip(jnp.argsort(prio, stable=True))
        rank = jnp.zeros((cap,), jnp.int32).at[order].set(
            jnp.arange(cap, dtype=jnp.int32))
        big = jnp.int32(cap)

        def body(state):
            keep, alive = state
            t_alive = _sparse_table(jnp.where(alive, rank, big), jnp.minimum,
                                    levels=nms_levels)
            new_keep = alive & (_range_query(t_alive, lo, hi, jnp.minimum) == rank)
            t_keep = _sparse_table(jnp.where(new_keep, rank, big), jnp.minimum,
                                   levels=nms_levels)
            killed = _range_query(t_keep, lo, hi, jnp.minimum) < big
            alive = alive & ~new_keep & ~killed
            return keep | new_keep, alive

    keep, _ = lax.while_loop(cond, body, (jnp.zeros((cap,), jnp.bool_), valid))
    return keep & valid


def distance_capacity_bound(n: int, distance) -> int:
    """Static upper bound on distance-NMS survivors: spacing >= ceil(distance)
    caps them at n/ceil(distance)+1 (rounded up to a 128 lane multiple).
    Sizing peak-slot arrays with ``min(capacity, bound)`` shrinks every
    downstream per-slot computation (classifier scan, corrections, trace)
    with zero semantic change."""
    return -(-(n // max(int(-(-distance // 1)), 1) + 2) // 128) * 128


def find_peaks(
    x: jnp.ndarray,
    capacity: int,
    height: Optional[jnp.ndarray] = None,
    prominence: Optional[jnp.ndarray] = None,
    distance: Optional[float] = None,
    work_capacity: Optional[int] = None,
    prominence_capacity: Optional[int] = None,
    max_table: Optional[jnp.ndarray] = None,
    min_table: Optional[jnp.ndarray] = None,
    tables_negated: bool = False,
    extrema: Optional[Extrema] = None,
    extrema_negated: bool = False,
    prominence_sweep_window: int = 64,
    prominence_residual_capacity: int = 2048,
    candidates: Optional[Peaks] = None,
    priorities: Optional[jnp.ndarray] = None,
) -> Peaks:
    """scipy.signal.find_peaks(x, height=height, prominence=prominence,
    distance=distance) with fixed output capacity.

    ``height`` may be a per-sample array (evaluated at peak positions, as the
    reference's dynamic noise floor threshold, bpm_analysis.py:227) or a
    scalar; ``prominence`` and ``distance`` are scalars (possibly traced).

    ``work_capacity`` bounds the *intermediate* peak population (local maxima
    surviving the height filter, before distance/prominence pruning) — on the
    vulpine sample that is ~11k maxima funneling down to 1.5k raw peaks.
    Populations beyond it are truncated from the tail and the returned
    ``Peaks.overflowed`` flag is set (as it is when the final survivor count
    exceeds ``capacity``), so size it generously (default 4x capacity).

    ``prominence_capacity`` additionally bounds the slot axis of the
    prominence evaluation (the descent gathers there are the most expensive
    step in the pipeline at ~11 ns per gathered element: cost scales with
    slots x levels).  Distance-NMS survivors beyond it are truncated with the
    overflow flag set — the same contract as every other capacity.  None
    keeps the sound static bound (n / ceil(distance) survivors max).

    ``max_table``/``min_table``: precomputed sparse tables of ``x`` (see
    ``_sparse_table``) for the prominence step.  The trough and raw-peak
    calls run on the same masked envelope up to sign, so the orchestrator
    builds the pair once and shares it (max(-x) == -min(x)); each build
    costs ~75 ms per 128x181k batch on chip.
    """
    n = x.shape[0]
    if candidates is not None:
        # Pre-compacted candidate maxima (from a shared Extrema; height
        # pre-applied by the caller) — skips the dense local-maxima mask and
        # the ~5 ns/element dense-axis compaction scatter entirely.
        work_capacity = candidates.positions.shape[0]
        peaks = candidates
        prio_arr = priorities
    else:
        work_capacity = work_capacity or 4 * capacity
        mask = local_maxima_mask(x)
        if height is not None:
            h = jnp.broadcast_to(jnp.asarray(height, x.dtype), (n,))
            mask = mask & (x >= h)
        peaks = _compact_mask(mask, work_capacity)
        prio_arr = None
    slot = jnp.arange(work_capacity)
    valid = slot < peaks.count
    pos = jnp.where(valid, peaks.positions, n - 1)
    truncated = peaks.overflowed

    if distance is not None:
        keep = _select_by_distance(
            pos, x[pos] if prio_arr is None else prio_arr, valid, distance)
        pos, count = _recompact(pos, keep, n)
        if isinstance(distance, (int, float)):
            # Static survivor bound: spacing >= ceil(distance) caps survivors
            # at n/ceil(distance)+1.  Slicing the slot axis here makes the
            # prominence step (whose binary-search gathers dominate
            # find_peaks runtime) ~4-8x cheaper at realistic capacities.
            bound = n // max(int(-(-distance // 1)), 1) + 2
            lim = min(work_capacity, -(-bound // 128) * 128)
            if prominence_capacity is not None:
                lim = min(lim, -(-prominence_capacity // 128) * 128)
            pos = pos[:lim]
            truncated = truncated | (count > lim)
            count = jnp.minimum(count, lim)
        slot = jnp.arange(pos.shape[0])
        valid = slot < count
        pos = jnp.where(valid, pos, n - 1)
    else:
        count = peaks.count

    if prominence is not None:
        if extrema is not None:
            prom, prom_ovf = extrema_prominences(
                extrema, pos, valid, negated=extrema_negated,
                sweep_window=prominence_sweep_window,
                residual_capacity=prominence_residual_capacity)
            truncated = truncated | prom_ovf
        else:
            prom = peak_prominences(x, pos, valid, max_table=max_table,
                                    min_table=min_table,
                                    tables_negated=tables_negated)
        keep = valid & (prom >= jnp.asarray(prominence, x.dtype))
        pos, count = _recompact(pos, keep, n)
        valid = slot < count
        pos = jnp.where(valid, pos, n - 1)

    out = jnp.where(valid, pos, n)
    if out.shape[0] < capacity:
        out = jnp.concatenate(
            [out, jnp.full((capacity - out.shape[0],), n, out.dtype)])
    out_pos = out[:capacity].astype(jnp.int32)
    overflowed = truncated | (count > capacity)
    return Peaks(out_pos, jnp.minimum(count, capacity), overflowed)


def _recompact(pos: jnp.ndarray, keep: jnp.ndarray, n: int):
    cap = pos.shape[0]
    rank = jnp.cumsum(keep.astype(jnp.int32)) - 1
    write = jnp.where(keep, rank, cap)
    out = jnp.full((cap + 1,), n, pos.dtype).at[write].set(pos)[:cap]
    count = jnp.sum(keep.astype(jnp.int32))
    return out, count
