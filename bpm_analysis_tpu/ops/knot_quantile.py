"""Rolling quantile computed directly in the knot domain.

The noise floor (reference bpm_analysis.py:1081-1106) is a centered rolling
quantile of a *piecewise-linear* series: the dense interpolation of ~2k
trough knots over ~181k samples.  The strided kernels in ``quantile.py``
materialize each anchor's 3020-sample window and rank-select it, paying
O(window) data movement and O(nbits * window) compare/count work per anchor
even though the window's value population is fully described by the <= ~40
knot segments that intersect it.

This kernel never materializes the dense series.  Per anchor it gathers the
segment descriptors (knot pairs) that can intersect the window — a static
bound of ``window // min_spacing + 3`` segments, guaranteed by the trough
finder's distance-NMS spacing — and computes the window's order statistics
by *closed-form counting over arithmetic progressions*: a window sample is
``y(i) = v0 + (i - p0) * (v1 - v0) / (p1 - p0)`` for the segment containing
``i``, so ``#{i : y(i) <= v}`` per segment is one floor/ceil expression.
The k-th order statistic is found by a 32-step bit-prefix descent over the
float's sortable-key space (exact on the sample-value lattice, like
``select_kth``), with each step costing one closed-form count pass over the
segment table instead of a pass over window samples.

Semantics match ``interpolate_dense`` + ``rolling_quantile_centered_strided``
(pandas ``rolling(window, min_periods, center=True).quantile(q)`` anchored
every ``stride`` samples): NaN before the first knot, linear between knots,
constant after the last knot, NaN output where fewer than ``min_periods``
samples are valid, linear interpolation between straddling order statistics.
Counts are evaluated in float32 closed form while the dense path rounds per
sample, so an anchor can land on the neighboring dense sample of a ramp —
sub-ULP-of-the-floor differences, bounded by one sample step per segment
(the bit-parity stride=1 wavelet path is unaffected; golden tests pin it).
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from .quantile import _key_info, _key_to_float
from .rolling import centered_bounds


def rolling_quantile_knots(
    knot_pos: jnp.ndarray,
    knot_val: jnp.ndarray,
    count,
    n: int,
    window: int,
    q: float,
    min_periods: int = 1,
    stride: int = 8,
    min_spacing: int = 1,
    n_valid=None,
    chunk: int = 1024,
    dtype=None,
) -> jnp.ndarray:
    """Anchor values (``ceil(n / stride)``,) of the centered rolling quantile
    of the dense piecewise-linear interpolation of ``(knot_pos, knot_val)``.

    ``knot_pos`` is a fixed-capacity sorted int array whose first ``count``
    entries are valid (slots >= count ignored); adjacent knots must be
    >= ``min_spacing`` samples apart (static).  ``n_valid`` (traced) marks a
    valid prefix: dense positions >= n_valid are treated as missing, matching
    ``mask_tail`` on the dense path.  Expand with ``interp_anchors``.
    """
    cap = knot_pos.shape[0]
    if dtype is None:
        dtype = knot_val.dtype
    left, right = centered_bounds(window)
    nseg = min(cap + 1, window // max(min_spacing, 1) + 3)

    slot = jnp.arange(cap)
    kvalid = slot < count
    pos_sorted = jnp.where(kvalid, jnp.clip(knot_pos, 0, n - 1), n).astype(jnp.int32)
    val = jnp.where(kvalid, knot_val, 0).astype(dtype)

    n_anchor = -(-n // stride)
    n_chunks = -(-n_anchor // chunk)
    hi_cap = jnp.asarray(n if n_valid is None else jnp.minimum(n_valid, n),
                         jnp.int32)

    utype, _, nbits = _key_info(dtype)
    qf = jnp.asarray(q, dtype)
    m = jnp.arange(nseg, dtype=jnp.int32)

    def one_chunk(c):
        apos = jnp.minimum((c * chunk + jnp.arange(chunk)) * stride, n - 1)
        w_lo = jnp.maximum(apos - left, 0)
        w_hi = jnp.minimum(apos + right + 1, hi_cap)

        # Last knot at or before the window start; candidate segments follow.
        base = jnp.searchsorted(pos_sorted, w_lo, side="right").astype(jnp.int32) - 1
        kidx = base[:, None] + m[None, :]                       # (chunk, nseg)
        in_range = (kidx >= 0) & (kidx < count)
        kc = jnp.clip(kidx, 0, cap - 1)
        p0 = jnp.where(in_range, pos_sorted[kc], n)
        v0 = jnp.where(in_range, val[kc], 0)
        has_next = (kidx + 1) < count
        kn = jnp.clip(kidx + 1, 0, cap - 1)
        # Final segment: constant v0 up to the validity horizon.
        p1 = jnp.where(has_next, pos_sorted[kn], hi_cap)
        v1 = jnp.where(has_next, val[kn], v0)

        s = jnp.maximum(p0, w_lo[:, None])
        e = jnp.minimum(p1, w_hi[:, None])
        seg_len = jnp.maximum(e - s, 0)
        seg_ok = in_range & (seg_len > 0)
        seg_len = jnp.where(seg_ok, seg_len, 0)

        dv = jnp.where(seg_ok, v1 - v0, 0)
        denom = jnp.maximum(p1 - p0, 1).astype(dtype)
        sf = s.astype(dtype)
        ef = e.astype(dtype)
        p0f = p0.astype(dtype)
        lenf = seg_len.astype(dtype)

        def cnt_le(v):
            """#window samples <= v (v: (chunk,) float) — closed form."""
            rel = (v[:, None] - v0) / jnp.where(dv == 0, 1, dv) * denom
            up = jnp.clip(jnp.floor(rel) + 1 + (p0f - sf), 0, lenf)
            down = jnp.clip(ef - jnp.maximum(jnp.ceil(rel) + p0f, sf), 0, lenf)
            const = jnp.where(v0 <= v[:, None], lenf, 0)
            per = jnp.where(dv > 0, up, jnp.where(dv < 0, down, const))
            return jnp.sum(jnp.where(seg_ok, per, 0), axis=1)

        cnt = jnp.sum(seg_len, axis=1)
        p = qf * jnp.maximum(cnt - 1, 0).astype(dtype)
        k_lo = jnp.floor(p).astype(dtype)
        frac = p - k_lo
        target = k_lo + 1                                        # cnt_le >= k+1

        def bit_step(i, prefix):
            b = jnp.asarray(nbits - 1 - i, utype)
            bit = (utype(1) << b).astype(utype)
            probe = prefix | (bit - utype(1))                    # bit=0, ones below
            c = cnt_le(_key_to_float(probe, dtype))
            return jnp.where(c >= target, prefix, prefix | bit).astype(utype)

        prefix0 = jnp.zeros((chunk,), utype)
        key_lo = lax.fori_loop(0, nbits, bit_step, prefix0)
        v_lo = _key_to_float(key_lo, dtype)

        # Next distinct sample value above v_lo, per segment, closed form.
        rel = (v_lo[:, None] - v0) / jnp.where(dv == 0, 1, dv) * denom
        i_up = jnp.maximum(jnp.floor(rel) + 1 + p0f, sf)         # first y > v on +slope
        i_dn = jnp.minimum(jnp.ceil(rel) + p0f, ef) - 1          # last y > v on -slope
        inf = jnp.asarray(jnp.inf, dtype)

        def y_at(i):
            return v0 + (i - p0f) / denom * dv

        cand_up = jnp.where(i_up < ef, y_at(i_up), inf)
        cand_dn = jnp.where(i_dn >= sf, y_at(i_dn), inf)
        cand_const = jnp.where(v0 > v_lo[:, None], v0, inf)
        cand = jnp.where(dv > 0, cand_up, jnp.where(dv < 0, cand_dn, cand_const))
        cand = jnp.where(seg_ok & (cand > v_lo[:, None]), cand, inf)
        nxt = jnp.min(cand, axis=1)

        v_hi = jnp.where(cnt_le(v_lo) >= target + 1, v_lo,
                         jnp.where(jnp.isfinite(nxt), nxt, v_lo))
        res = jnp.where(frac > 0, v_lo + frac * (v_hi - v_lo), v_lo)
        return jnp.where(cnt >= min_periods, res, jnp.nan).astype(dtype)

    anchors = lax.map(one_chunk, jnp.arange(n_chunks)).reshape(n_chunks * chunk)
    anchors = anchors[:n_anchor]
    return jnp.where(count > 0, anchors, jnp.nan)


def anchors_at(anchors: jnp.ndarray, query: jnp.ndarray, n: int,
               stride: int, n_valid=None) -> jnp.ndarray:
    """Evaluate the dense expansion of ``anchors`` (``interp_anchors``
    semantics, including the ``fix_tail_span`` pin past the last full-stride
    anchor of a valid prefix) at integer ``query`` positions — a 2-gather
    sparse evaluation replacing a dense materialize + gather."""
    n_anchor = anchors.shape[0]
    dtype = anchors.dtype
    qpos = jnp.clip(query, 0, n - 1)
    j = qpos // stride
    if n_valid is not None:
        last = (jnp.asarray(n_valid, jnp.int32) - 1) // stride
        j = jnp.minimum(j, last)
        in_tail = qpos >= last * stride
    else:
        in_tail = jnp.zeros(qpos.shape, bool)
    j0 = jnp.clip(j, 0, n_anchor - 1)
    j1 = jnp.clip(j + 1, 0, n_anchor - 1)
    a0 = anchors[j0]
    a1 = anchors[j1]
    frac = (qpos - j0 * stride).astype(dtype) / stride
    out = jnp.where(frac > 0, a0 + frac * (a1 - a0), a0)
    return jnp.where(in_tail, a0, out)
