"""Pallas TPU kernel: knot-domain rolling-quantile anchors.

Fuses the noise floor's two hottest steps — dense piecewise-linear
interpolation of the trough knots (``series.interpolate_dense``) and the
strided centered rolling quantile (``quantile_kernel.py``) — into one kernel
that never materializes the dense series (reference noise floor:
bpm_analysis.py:1081-1106).  The math is ``ops/knot_quantile.py``'s
closed-form counting over arithmetic progressions; what the Pallas lowering
adds is VMEM residency: the XLA lowering of that file spills its
(chunk, nseg) segment tables to HBM on every one of the 32 bisection steps,
which measured 2.3x slower than the dense Pallas kernel — here the tables
live in VMEM registers across the whole descent, and per anchor the work is
O(R) table columns instead of O(window) samples (R ~ window/min_spacing + a
few: the trough finder's distance-NMS guarantees knot spacing).

Layout: anchors on SUBLANES (A per group, G groups stacked = G*A sublane
rows), candidate knots on LANES (R_pad = 128).  Everything the descent
touches is a (G*A, R_pad) f32 matrix or a (G*A, 1) column; the single
orientation change — the final (G*A, 1) result column into the (1, G*A)
output row — is one identity matmul on the MXU.

The segment tables (p0, v0, p1, v1 per candidate slot) are gathered once in
XLA (sorted-knot slices per anchor group, found with one searchsorted) —
~R_pad/stride times fewer gathered elements than the dense interpolation
they replace — and streamed to the kernel through the BlockSpec pipeline.

Values must be non-positive-NaN floats; knots are envelope amplitudes
(non-negative), and the bit-prefix descent uses the full sortable-key
mapping (sign-flip trick), so negatives would work too.  Positions up to
2^24 stay exact in the f32 table math (10-min recordings are ~181k).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..rolling import centered_bounds

A = 128          # anchors per group (one lane-width of output)
LANE = 128
# In-kernel stand-in for NaN (see the permutation-matmul note in _kernel);
# far below any envelope amplitude, decoded back to NaN by the caller.
_NAN_SENTINEL = -3.0e38


def _plan(window: int, stride: int, min_spacing: int):
    """(G, R_pad): groups stacked per program and candidate-knot slots per
    group.  R bounds the knots whose segments can intersect any window of a
    group's A anchors: the group spans A*stride dense positions plus the
    window extent, over knots >= min_spacing apart, plus the straddling knot
    on each side and the final constant-extension segment."""
    span = A * stride + window
    r = span // max(min_spacing, 1) + 4
    r_pad = -(-r // LANE) * LANE
    # Stack groups until the working set is ~a few hundred KB of VMEM
    # (each live (G*A, R_pad) matrix is G*A*R_pad*4 bytes; ~8 live).
    g = max(1, min(4, (2 << 20) // (A * r_pad * 4 * 8)))
    return g, r_pad


def _kernel(p0_ref, v0_ref, p1_ref, v1_ref, out_ref, *,
            n: int, window: int, stride: int, q: float, min_periods: int,
            g_groups: int, r_pad: int):
    left, right = centered_bounds(window)
    ga = g_groups * A
    blk = pl.program_id(1)

    def rep(ref):
        # TILE semantics (concatenate A copies): row r of the result holds
        # group r % G's table.  Rows are therefore processed in tile order —
        # row r computes anchor a(r) = (r % G)*A + r//G — and the final
        # matmul permutes them back to consecutive-anchor order.
        return pltpu.repeat(ref[0, 0], repeats=A, axis=0)   # (G, R) -> (G*A, R)

    p0 = rep(p0_ref)
    v0 = rep(v0_ref)
    p1 = rep(p1_ref)
    v1 = rep(v1_ref)

    # Row r's anchor within the block (tile order, see rep()).
    row_i = lax.broadcasted_iota(jnp.int32, (ga, 1), 0)
    a_local = (row_i % g_groups) * A + row_i // g_groups
    apos = jnp.minimum((blk * ga + a_local).astype(jnp.float32) * stride,
                       float(n - 1))
    w_lo = jnp.maximum(apos - left, 0.0)
    # The valid horizon (n_valid) is folded into the p0/p1 tables by the
    # caller (segments are clamped to it), so the window's right edge needs
    # no per-row cap here.
    w_hi = apos + right + 1.0

    s = jnp.maximum(p0, w_lo)
    e = jnp.minimum(p1, w_hi)
    ln = jnp.maximum(e - s, 0.0)
    dv = v1 - v0
    denom = jnp.maximum(p1 - p0, 1.0)
    safe_dv = jnp.where(dv == 0, 1.0, dv)
    inv = denom / safe_dv                                   # rel slope^-1
    slope = dv / denom                                      # y'(i)

    cnt = jnp.sum(ln, axis=1, keepdims=True)
    p = jnp.float32(q) * jnp.maximum(cnt - 1.0, 0.0)
    k_lo = jnp.floor(p)
    frac = p - k_lo
    target = k_lo + 1.0                                     # cnt_le >= k+1

    def cnt_le(v):
        """#window samples <= v per anchor — closed form per segment.
        ln == 0 rows clip every branch to 0, so no seg_ok mask is needed."""
        rel = (v - v0) * inv
        up = jnp.clip(jnp.floor(rel) + 1.0 + (p0 - s), 0.0, ln)
        down = jnp.clip(e - jnp.maximum(jnp.ceil(rel) + p0, s), 0.0, ln)
        const = jnp.where(v0 <= v, ln, 0.0)
        per = jnp.where(dv > 0, up, jnp.where(dv < 0, down, const))
        return jnp.sum(per, axis=1, keepdims=True)

    def key_to_float(u):
        sign = jnp.uint32(0x80000000)
        bits = jnp.where((u & sign) != 0,
                         (u ^ sign).astype(jnp.int32),
                         (~u).astype(jnp.int32))
        return lax.bitcast_convert_type(bits, jnp.float32)

    def bit_step(i, prefix):
        b = jnp.uint32(31) - jnp.asarray(i, jnp.uint32)
        bit = (jnp.uint32(1) << b).astype(jnp.uint32)
        probe = prefix | (bit - jnp.uint32(1))              # bit=0, ones below
        c = cnt_le(key_to_float(probe))
        return jnp.where(c >= target, prefix, prefix | bit).astype(jnp.uint32)

    prefix0 = jnp.zeros((ga, 1), jnp.uint32)
    key_lo = lax.fori_loop(0, 32, bit_step, prefix0)
    v_lo = key_to_float(key_lo)

    # Next distinct sample value above v_lo, per segment, closed form.
    rel = (v_lo - v0) * inv
    i_up = jnp.maximum(jnp.floor(rel) + 1.0 + p0, s)        # first y > v, +slope
    i_dn = jnp.minimum(jnp.ceil(rel) + p0, e) - 1.0         # last y > v, -slope
    inf = jnp.float32(jnp.inf)

    def y_at(i):
        return v0 + (i - p0) * slope

    cand_up = jnp.where(i_up < e, y_at(i_up), inf)
    cand_dn = jnp.where(i_dn >= s, y_at(i_dn), inf)
    cand_const = jnp.where(v0 > v_lo, v0, inf)
    cand = jnp.where(dv > 0, cand_up, jnp.where(dv < 0, cand_dn, cand_const))
    cand = jnp.where((ln > 0) & (cand > v_lo), cand, inf)
    nxt = jnp.min(cand, axis=1, keepdims=True)

    v_hi = jnp.where(cnt_le(v_lo) >= target + 1.0, v_lo,
                     jnp.where(jnp.isfinite(nxt), nxt, v_lo))
    res = jnp.where(frac > 0, v_lo + frac * (v_hi - v_lo), v_lo)
    # min_periods misses become a finite sentinel, NOT NaN: the permutation
    # matmul below computes sum_r res[r]*perm[r,j], and a single NaN row
    # would poison every column (NaN*0 == NaN).  Decoded to NaN by the
    # caller after the kernel.
    res = jnp.where(cnt >= min_periods, res, _NAN_SENTINEL)

    # (G*A, 1) column -> (1, G*A) output row: one permutation matmul (MXU)
    # that also undoes the tile-order row layout (row r holds anchor
    # (r % G)*A + r//G; output column j must be anchor j).
    i_iota = lax.broadcasted_iota(jnp.int32, (ga, ga), 0)
    j_iota = lax.broadcasted_iota(jnp.int32, (ga, ga), 1)
    a_of_row = (i_iota % g_groups) * A + i_iota // g_groups
    perm = (a_of_row == j_iota).astype(jnp.float32)
    out_ref[0, 0, 0, :] = lax.dot_general(
        res, perm, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)[0]


def knot_quantile_anchors_pallas(
    knot_pos: jnp.ndarray,   # (B, cap) int — sorted valid prefix per row
    knot_val: jnp.ndarray,   # (B, cap) float
    count: jnp.ndarray,      # (B,) int32 valid knots per row
    n: int,
    window: int,
    q: float,
    min_periods: int = 1,
    stride: int = 8,
    min_spacing: int = 1,
    n_valid=None,            # (B,) or None — valid dense prefix per row
    interpret: bool = False,
) -> jnp.ndarray:
    """Centered rolling-quantile anchors (every ``stride`` samples) of the
    dense piecewise-linear interpolation of each row's knots — semantics of
    ``knot_quantile.rolling_quantile_knots`` (pandas
    ``rolling(window, min_periods, center=True).quantile(q)``), batched.
    Returns (B, ceil(n / stride)) float32."""
    B, cap = knot_pos.shape
    g_groups, r_pad = _plan(window, stride, min_spacing)
    n_anchor = -(-n // stride)
    ga = g_groups * A
    n_blocks = -(-n_anchor // ga)
    n_groups = n_blocks * g_groups
    left, _ = centered_bounds(window)

    slot = jnp.arange(cap)
    kvalid = slot[None, :] < count[:, None]
    pos_sorted = jnp.where(kvalid, jnp.clip(knot_pos, 0, n - 1),
                           n).astype(jnp.float32)
    val = jnp.where(kvalid, knot_val, 0).astype(jnp.float32)
    hi_cap = (jnp.full((B,), n, jnp.float32) if n_valid is None
              else jnp.minimum(jnp.asarray(n_valid, jnp.float32), n))

    # Next-knot tables once per row: segment g is [pos[g], pos[g+1]) with the
    # last valid knot extending constant to the validity horizon.
    pos_next = jnp.concatenate(
        [pos_sorted[:, 1:], jnp.full((B, 1), n, jnp.float32)], axis=1)
    val_next = jnp.concatenate([val[:, 1:], val[:, -1:]], axis=1)
    has_next = (slot[None, :] + 1) < count[:, None]
    p1_row = jnp.where(has_next, pos_next, hi_cap[:, None])
    v1_row = jnp.where(has_next, val_next, val)

    # Per-group candidate slices: R_pad knots from the last knot at or before
    # the group's first window start (one searchsorted per group).
    grp_w_lo = jnp.maximum(
        jnp.arange(n_groups, dtype=jnp.int32) * (A * stride) - left, 0
    ).astype(jnp.float32)
    base = jax.vmap(
        lambda ps: jnp.searchsorted(ps, grp_w_lo, side="right"))(pos_sorted)
    base = jnp.maximum(base.astype(jnp.int32) - 1, 0)        # (B, n_groups)
    gidx = base[:, :, None] + jnp.arange(r_pad, dtype=jnp.int32)[None, None, :]
    in_cap = gidx < cap
    gc = jnp.minimum(gidx, cap - 1).reshape(B, -1)

    def table(row_tbl, sentinel):
        t = jnp.take_along_axis(row_tbl, gc, axis=1).reshape(B, n_groups, r_pad)
        return jnp.where(in_cap, t, sentinel).reshape(
            B, n_blocks, g_groups, r_pad)

    # Fold the per-row valid horizon into the segment tables (clamping both
    # endpoints makes out-of-horizon and padding segments zero-length), so
    # the kernel needs no per-row scalar input (Mosaic's block-shape rules
    # make tiny SMEM blocks awkward).  Slope-safe because no interpolating
    # segment straddles the horizon: knots come from the masked envelope, so
    # every knot is < n_valid, and the only segment reaching hi is the
    # dv == 0 constant extension (clamping p1 there changes length, not
    # slope).
    hi4 = hi_cap[:, None, None, None]
    p0_t = jnp.minimum(table(pos_sorted, jnp.float32(n)), hi4)
    v0_t = table(val, 0.0)
    p1_t = jnp.minimum(table(p1_row, jnp.float32(n)), hi4)
    v1_t = table(v1_row, 0.0)

    kernel = functools.partial(
        _kernel, n=n, window=window, stride=stride, q=q,
        min_periods=min_periods, g_groups=g_groups, r_pad=r_pad)

    tbl_spec = pl.BlockSpec((1, 1, g_groups, r_pad), lambda b, j: (b, j, 0, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(B, n_blocks),
        in_specs=[tbl_spec, tbl_spec, tbl_spec, tbl_spec],
        # 4-D so the block's last two dims EQUAL the array's (1, ga) — the
        # Mosaic lowering requires (8,128)-divisible or full-dim blocks.
        out_specs=pl.BlockSpec((1, 1, 1, ga), lambda b, j: (b, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_blocks, 1, ga), jnp.float32),
        interpret=interpret,
    )(p0_t, v0_t, p1_t, v1_t)

    anchors = out.reshape(B, n_blocks * ga)[:, :n_anchor]
    anchors = jnp.where(anchors <= _NAN_SENTINEL / 2, jnp.nan, anchors)
    return jnp.where(count[:, None] > 0, anchors, jnp.nan)


def make_vmappable_knot_quantile(n: int, window: int, q: float,
                                 min_periods: int, stride: int,
                                 min_spacing: int, interpret: bool = False):
    """Single-recording ``(pos, val, count, n_valid) -> (n_anchor,)`` anchor
    function whose vmap rule dispatches the whole batch to the Pallas kernel
    (same pattern as ``make_vmappable_rolling_quantile``)."""

    def batched(pos, val, count, nv):
        return knot_quantile_anchors_pallas(
            pos, val, count, n, window, q, min_periods=min_periods,
            stride=stride, min_spacing=min_spacing, n_valid=nv,
            interpret=interpret)

    @jax.custom_batching.custom_vmap
    def fn(pos, val, count, nv):
        return batched(pos[None], val[None], count[None], nv[None])[0]

    @fn.def_vmap
    def _rule(axis_size, in_batched, pos, val, count, nv):
        del axis_size
        pos_b, val_b, count_b, nv_b = in_batched
        assert pos_b and val_b
        if not count_b:
            count = jnp.broadcast_to(count, pos.shape[:1])
        if not nv_b:
            nv = jnp.broadcast_to(nv, pos.shape[:1])
        return batched(pos, val, count, nv), True

    return fn
