"""Pallas TPU kernel: knot-domain rolling-quantile anchors.

Fuses the noise floor's two hottest steps — dense piecewise-linear
interpolation of the trough knots (``series.interpolate_dense``) and the
strided centered rolling quantile (``quantile_kernel.py``) — into one kernel
that never materializes the dense series (reference noise floor:
bpm_analysis.py:1081-1106).  The math is ``ops/knot_quantile.py``'s
closed-form counting over arithmetic progressions; what the Pallas lowering
adds is VMEM residency: the XLA lowering of that file spills its
(chunk, nseg) segment tables to HBM on every one of the 32 bisection steps,
which measured 2.3x slower than the dense Pallas kernel.

Layout (v2): anchors on LANES (AB = 512 per program), candidate knots on
SUBLANES (R rows, R = window/min_spacing + slack rounded to 8).  A first
version put anchors on sublanes and candidates on lanes with A = 128
anchors sharing one per-group candidate slice — but a group then spans
A*stride dense positions, so its slice needs A*stride/min_spacing + ...
candidates (256 lanes at the bench config) even though any ONE anchor's
window only intersects ~window/min_spacing + 2 (~14) segments; the descent
burned 16x more VPU work than the windows required, measuring 144 ms/call
vs 113 ms for dense interpolate+rolling.  Per-anchor tables make the
working set exactly the segments each window can see: every descent op is
(R, AB) with R ~ 16, and the bisection state is a (1, AB) register row.

The segment tables (p0, v0, p1, v1 per candidate slot) are gathered once in
XLA (one searchsorted per anchor finds the straddling knot) and streamed to
the kernel through the BlockSpec pipeline; the gather volume is
n_anchor * R * 4 tables ~ 4x the dense series length at stride 64 — but it
replaces BOTH the dense interpolation materialization and the rolling
kernel's window reads.

Values must be non-NaN floats; knots are envelope amplitudes
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

AB = 512         # anchors per program (lanes; 4 lane-tiles)
# In-kernel stand-in for NaN (min_periods misses); far below any envelope
# amplitude, decoded back to NaN by the caller.  Keeping NaN out of the
# kernel's result row costs nothing and keeps the final store a plain copy.
_NAN_SENTINEL = -3.0e38


def _plan(window: int, min_spacing: int) -> int:
    """Candidate rows per anchor: the window spans ``window + 1`` dense
    positions over knots >= min_spacing apart, plus the straddling knot on
    each side and the constant-extension segment; rounded to the f32
    sublane tile (8)."""
    r = window // max(min_spacing, 1) + 4
    return -(-r // 8) * 8


def _kernel(p0_ref, v0_ref, p1_ref, v1_ref, out_ref, *,
            n: int, window: int, stride: int, q: float, min_periods: int):
    left, right = centered_bounds(window)
    blk = pl.program_id(1)
    p0 = p0_ref[0, 0]                                       # (R, AB)
    v0 = v0_ref[0, 0]
    p1 = p1_ref[0, 0]
    v1 = v1_ref[0, 0]

    # Mosaic's iota is integer-only; convert after.
    lane = lax.broadcasted_iota(jnp.int32, (1, AB), 1).astype(jnp.float32)
    # blk*AB + lane <= n_anchor < 2^24: exact in f32, as is * stride.
    apos = jnp.minimum((jnp.float32(blk * AB) + lane) * stride,
                       jnp.float32(n - 1))
    w_lo = jnp.maximum(apos - left, 0.0)
    # The valid horizon (n_valid) is folded into the p0/p1 tables by the
    # caller (segments are clamped to it), so the window's right edge needs
    # no per-row cap here.
    w_hi = apos + right + 1.0

    s = jnp.maximum(p0, w_lo)                               # (R, AB)
    e = jnp.minimum(p1, w_hi)
    ln = jnp.maximum(e - s, 0.0)
    dv = v1 - v0
    denom = jnp.maximum(p1 - p0, 1.0)
    safe_dv = jnp.where(dv == 0, 1.0, dv)
    inv = denom / safe_dv                                   # rel slope^-1
    slope = dv / denom                                      # y'(i)

    cnt = jnp.sum(ln, axis=0, keepdims=True)                # (1, AB)
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
        return jnp.sum(per, axis=0, keepdims=True)

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

    prefix0 = jnp.zeros((1, AB), jnp.uint32)
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
    nxt = jnp.min(cand, axis=0, keepdims=True)              # (1, AB)

    v_hi = jnp.where(cnt_le(v_lo) >= target + 1.0, v_lo,
                     jnp.where(jnp.isfinite(nxt), nxt, v_lo))
    res = jnp.where(frac > 0, v_lo + frac * (v_hi - v_lo), v_lo)
    res = jnp.where(cnt >= min_periods, res, _NAN_SENTINEL)
    out_ref[0, 0, 0, :] = res[0]


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
    r_rows = _plan(window, min_spacing)
    n_anchor = -(-n // stride)
    n_blocks = -(-n_anchor // AB)
    n_pad = n_blocks * AB
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

    # Per-anchor candidate slices: r_rows knots from the last knot at or
    # before the anchor's window start (one searchsorted per anchor).
    anchor_w_lo = jnp.maximum(
        jnp.arange(n_pad, dtype=jnp.int32) * stride - left, 0
    ).astype(jnp.float32)
    base = jax.vmap(
        lambda ps: jnp.searchsorted(ps, anchor_w_lo, side="right"))(pos_sorted)
    base = jnp.maximum(base.astype(jnp.int32) - 1, 0)        # (B, n_pad)
    gidx = base[:, :, None] + jnp.arange(r_rows, dtype=jnp.int32)[None, None, :]
    in_cap = gidx < cap
    gc = jnp.minimum(gidx, cap - 1).reshape(B, -1)

    # Fold the per-row valid horizon into the segment tables (clamping both
    # endpoints makes out-of-horizon and padding segments zero-length), so
    # the kernel needs no per-row scalar input (Mosaic's block-shape rules
    # make tiny SMEM blocks awkward).  Slope-safe because no interpolating
    # segment straddles the horizon: knots come from the masked envelope, so
    # every knot is < n_valid, and the only segment reaching hi is the
    # dv == 0 constant extension (clamping p1 there changes length, not
    # slope).
    def table(row_tbl, sentinel, clamp_hi: bool):
        t = jnp.take_along_axis(row_tbl, gc, axis=1)
        t = jnp.where(in_cap.reshape(B, -1), t, sentinel)
        if clamp_hi:
            t = jnp.minimum(t, hi_cap[:, None])
        # (B, n_pad, R) -> (B, n_blocks, R, AB): candidates to sublanes,
        # anchors to lanes.
        return t.reshape(B, n_blocks, AB, r_rows).transpose(0, 1, 3, 2)

    p0_t = table(pos_sorted, jnp.float32(n), True)
    v0_t = table(val, 0.0, False)
    p1_t = table(p1_row, jnp.float32(n), True)
    v1_t = table(v1_row, 0.0, False)

    kernel = functools.partial(
        _kernel, n=n, window=window, stride=stride, q=q,
        min_periods=min_periods)

    tbl_spec = pl.BlockSpec((1, 1, r_rows, AB), lambda b, j: (b, j, 0, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(B, n_blocks),
        in_specs=[tbl_spec, tbl_spec, tbl_spec, tbl_spec],
        # 4-D so the block's last two dims EQUAL the array's (1, AB) — the
        # Mosaic lowering requires (8,128)-divisible or full-dim blocks.
        out_specs=pl.BlockSpec((1, 1, 1, AB), lambda b, j: (b, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_blocks, 1, AB), jnp.float32),
        interpret=interpret,
    )(p0_t, v0_t, p1_t, v1_t)

    anchors = out.reshape(B, n_blocks * AB)[:, :n_anchor]
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
