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

Layout (v3): anchors on SUBLANES (AB = 512 per program), candidate knots on
LANES (R columns, R = window/min_spacing + slack rounded to 8), with the
per-anchor candidate tables built IN-KERNEL.  v2 gathered the tables in XLA
(one searchsorted per anchor plus a (n_anchor, R)-wide take_along_axis):
the gather shipped ~R-times-redundant data through HBM and measured ~500 ms
at the bench config — an order of magnitude more than the 47 ms descent it
fed.  v3 exploits the modular structure of the candidate windows instead:

  the candidates of anchor ``a`` are R CONSECUTIVE knot indices
  [base(a), base(a)+R), so candidate column r holds the UNIQUE knot
  g === r  (mod R) in that range, namely g = r + R*ceil((base(a)-r)/R).

Reshaping the per-recording knot arrays (cap,) -> (M, R) — knot g lands at
row g // R, column g % R — therefore puts every anchor's column-r candidate
somewhere in the M ~ cap/R rows of column r, and which row is a closed-form
function of ``base(a)``.  The kernel computes base(a) itself (a masked
count of pos <= w_lo over the same (M, R) table — no searchsorted) and
assembles the (AB, R) tables with M masked sublane-row selects.  The whole
input is the raw knot table: O(B * cap) HBM instead of O(B * n_anchor * R),
nothing per-anchor is materialized anywhere, and the tables the descent
sees are bit-identical to v2's gathered ones (same sentinels, same clamps),
so results are unchanged.  (Anchors moved from lanes to sublanes so the
per-row select broadcasts a (1, R) table row across anchor sublanes — a
free relayout; v1's sublane-anchor waste came from sharing one candidate
slice per GROUP, not from the orientation.)

The segment tables (p0, v0, p1, v1 per candidate column) then feed the same
bit-prefix descent as v2: every descent op is (AB, R) with the bisection
state an (AB, 1) register column.

Values must be non-NaN floats; knots are envelope amplitudes
(non-negative), and the bit-prefix descent uses the full sortable-key
mapping (sign-flip trick), so negatives would work too.  Positions up to
2^24 stay exact in the f32 table math (10-min recordings are ~181k).

Caller contract (v2 and v3 alike): valid knots are sorted and
>= ``min_spacing`` apart — that is what bounds the number of segments a
window can intersect to R.  The noise-floor callers satisfy it by
construction (troughs come out of the distance NMS).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..rolling import centered_bounds

AB = 512         # anchors per program (sublanes; 64 sublane-tiles)
# In-kernel stand-in for NaN (min_periods misses); far below any envelope
# amplitude, decoded back to NaN by the caller.  Keeping NaN out of the
# kernel's result row costs nothing and keeps the final store a plain copy.
_NAN_SENTINEL = -3.0e38


def _plan(window: int, min_spacing: int) -> int:
    """Candidate columns per anchor: the window spans ``window + 1`` dense
    positions over knots >= min_spacing apart, plus the straddling knot on
    each side and the constant-extension segment; rounded to the f32
    sublane tile (8)."""
    r = window // max(min_spacing, 1) + 4
    return -(-r // 8) * 8


def _kernel(pos_ref, v0r_ref, p1r_ref, v1r_ref, out_ref, *,
            n: int, window: int, stride: int, q: float, min_periods: int,
            r_cols: int, m_rows: int):
    left, right = centered_bounds(window)
    blk = pl.program_id(1)
    pos_t = pos_ref[0]                                      # (M, R)
    v0_t = v0r_ref[0]
    p1_t = p1r_ref[0]
    v1_t = v1r_ref[0]

    # Mosaic's iota is integer-only; convert after.
    arow = lax.broadcasted_iota(jnp.int32, (AB, 1), 0).astype(jnp.float32)
    # blk*AB + arow <= n_anchor < 2^24: exact in f32, as is * stride.
    apos = jnp.minimum((jnp.float32(blk * AB) + arow) * stride,
                       jnp.float32(n - 1))
    w_lo = jnp.maximum(apos - left, 0.0)                    # (AB, 1)
    # The valid horizon (n_valid) is folded into the p1 table by the caller
    # (segments are clamped to it), so the window's right edge needs no
    # per-row cap here.
    w_hi = apos + right + 1.0

    # --- in-kernel table build (v3) ----------------------------------------
    # base(a) = (# knots with pos <= w_lo) - 1, clamped to 0 — identical to
    # v2's XLA-side searchsorted(side="right") - 1 with the max(.,0) clamp
    # (invalid/padding slots hold pos = n > w_lo, so they never count).
    acc = jnp.zeros((AB, r_cols), jnp.float32)
    for m in range(m_rows):
        acc = acc + (pos_t[m:m + 1, :] <= w_lo).astype(jnp.float32)
    base = jnp.maximum(jnp.sum(acc, axis=1, keepdims=True) - 1.0, 0.0)

    # Candidate of column r = knot  r + R*m  with  m = ceil((base - r)/R)
    # (the unique index === r mod R inside [base, base+R)).  All quantities
    # are small integers, exact in f32 (incl. the /R: quotients <= M).
    rcol = lax.broadcasted_iota(jnp.int32, (1, r_cols), 1).astype(jnp.float32)
    msel = jnp.floor((base - rcol + jnp.float32(r_cols - 1))
                     * jnp.float32(1.0 / r_cols))
    p0 = jnp.zeros((AB, r_cols), jnp.float32)
    v0 = jnp.zeros((AB, r_cols), jnp.float32)
    p1 = jnp.zeros((AB, r_cols), jnp.float32)
    v1 = jnp.zeros((AB, r_cols), jnp.float32)
    for m in range(m_rows):
        hit = msel == jnp.float32(m)
        p0 = jnp.where(hit, pos_t[m:m + 1, :], p0)
        v0 = jnp.where(hit, v0_t[m:m + 1, :], v0)
        p1 = jnp.where(hit, p1_t[m:m + 1, :], p1)
        v1 = jnp.where(hit, v1_t[m:m + 1, :], v1)

    # --- v2 descent (axes flipped: anchors on sublanes) ---------------------
    s = jnp.maximum(p0, w_lo)                               # (AB, R)
    e = jnp.minimum(p1, w_hi)
    ln = jnp.maximum(e - s, 0.0)
    dv = v1 - v0
    denom = jnp.maximum(p1 - p0, 1.0)
    safe_dv = jnp.where(dv == 0, 1.0, dv)
    inv = denom / safe_dv                                   # rel slope^-1
    slope = dv / denom                                      # y'(i)

    cnt = jnp.sum(ln, axis=1, keepdims=True)                # (AB, 1)
    p = jnp.float32(q) * jnp.maximum(cnt - 1.0, 0.0)
    k_lo = jnp.floor(p)
    frac = p - k_lo
    target = k_lo + 1.0                                     # cnt_le >= k+1

    def cnt_le(v):
        """#window samples <= v per anchor — closed form per segment.
        ln == 0 columns clip every branch to 0, so no seg_ok mask is
        needed."""
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

    prefix0 = jnp.zeros((AB, 1), jnp.uint32)
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
    nxt = jnp.min(cand, axis=1, keepdims=True)              # (AB, 1)

    v_hi = jnp.where(cnt_le(v_lo) >= target + 1.0, v_lo,
                     jnp.where(jnp.isfinite(nxt), nxt, v_lo))
    res = jnp.where(frac > 0, v_lo + frac * (v_hi - v_lo), v_lo)
    res = jnp.where(cnt >= min_periods, res, _NAN_SENTINEL)
    out_ref[0, 0] = res


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
    r_cols = _plan(window, min_spacing)
    n_anchor = -(-n // stride)
    n_blocks = -(-n_anchor // AB)
    # Knot slots mod-R-reshaped: M rows of R columns hold the whole padded
    # knot table; M*R >= cap + R so the largest candidate index
    # (base + R - 1 <= cap + R - 1) stays inside the padded array.
    m_rows = -(-cap // r_cols) + 1
    cap_pad = m_rows * r_cols

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

    # Fold the per-row valid horizon into the p1 table (clamping the segment
    # end makes out-of-horizon spans zero-length), so the kernel needs no
    # per-row scalar input (Mosaic's block-shape rules make tiny SMEM blocks
    # awkward).  Slope-safe because no interpolating segment straddles the
    # horizon: knots come from the masked envelope, so every knot is
    # < n_valid, and the only segment reaching hi is the dv == 0 constant
    # extension (clamping p1 there changes length, not slope).  p0 needs no
    # clamp: valid knots already sit below the horizon, and invalid slots
    # (p0 = n > hi >= p1) yield ln = max(e - s, 0) = 0 regardless — the
    # unclamped pos table therefore serves as BOTH the base-count input and
    # the descent's p0, bit-identical to v2's clamped gather.
    p1_row = jnp.minimum(p1_row, hi_cap[:, None])

    # Mod-R layout: pad to M*R slots (sentinels = the same values v2 used
    # for beyond-cap candidate indices: pos = n, p1 = min(n, hi), values 0),
    # then reshape (M, R) so slot g lands at [g // R, g % R] — column r then
    # holds every knot === r (mod R), which is exactly the per-anchor
    # candidate structure the kernel rebuilds with masked row selects.
    def modr(row_tbl, sentinel, clamp_hi: bool):
        fill = jnp.full((B, cap_pad - cap), sentinel, jnp.float32)
        if clamp_hi:
            fill = jnp.minimum(fill, hi_cap[:, None])
        t = jnp.concatenate([row_tbl, fill], axis=1)
        return t.reshape(B, m_rows, r_cols)

    pos_t = modr(pos_sorted, jnp.float32(n), False)  # base count + p0
    v0_t = modr(val, 0.0, False)
    p1_t = modr(p1_row, jnp.float32(n), True)
    v1_t = modr(v1_row, 0.0, False)

    kernel = functools.partial(
        _kernel, n=n, window=window, stride=stride, q=q,
        min_periods=min_periods, r_cols=r_cols, m_rows=m_rows)

    tbl_spec = pl.BlockSpec((1, m_rows, r_cols), lambda b, j: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(B, n_blocks),
        in_specs=[tbl_spec, tbl_spec, tbl_spec, tbl_spec],
        # Anchors on sublanes: the block's last dim is 1 (full-dim — the
        # Mosaic lowering requires (8,128)-divisible or full-dim blocks).
        out_specs=pl.BlockSpec((1, 1, AB, 1), lambda b, j: (b, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_blocks, AB, 1), jnp.float32),
        interpret=interpret,
    )(pos_t, v0_t, p1_t, v1_t)

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
