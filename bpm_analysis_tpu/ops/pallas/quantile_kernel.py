"""Pallas TPU kernel: strided sliding-window quantile anchors.

The noise-floor quantile is the pipeline's hottest kernel.  The XLA
formulation (ops/quantile.rolling_quantile_centered_strided) gathers each
anchor's ~3000-sample window into HBM-resident rows and re-reads them for
every radix pass — ~hundreds of GB of HBM traffic per batch.  This kernel
keeps everything on-chip:

* grid = (batch-row tiles, anchor blocks); each instance DMAs its block's
  shared span (ANCHORS·stride + window samples ≈ 28 KB) from HBM into VMEM
  **once** per batch row,
* materializes the (ANCHORS, window) bit-key matrix in VMEM with purely
  STATIC slices: anchors are grouped by ``a mod (LANE/stride)`` so that
  within a group consecutive windows shift by exactly one 128-lane row —
  each group's window matrix is a concat of 128-shifted static slices
  (Mosaic rejects unaligned *dynamic* 1-D loads; static ones lower fine),
* runs the 32-plane radix selection + the next-order-statistic pass as VPU
  reductions over the VMEM-resident keys — zero HBM traffic in the search.

The group construction permutes anchor order (row r*QROWS+q holds anchor
q*GROUPS+r); the host-side wrapper unpermutes.  Values must be non-negative
(envelope-derived series are), so raw float32 bits are monotone keys;
NaN/padding bits sort past +inf and validity is one threshold compare.
``stride`` must divide 128.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..rolling import centered_bounds

ANCHORS = 512          # anchors per kernel instance
BROWS = 8              # batch rows per output tile (TPU sublane alignment)
LANE = 128

INF_BITS = np.uint32(0x7F800000)   # +inf; anything >= is invalid


def _kernel(x_hbm, out_ref, span_vmem, span_bits_vmem, sem, *, window, stride,
            q, min_periods, span_len, n_anchor, pad_total):
    groups = LANE // stride            # anchors per lane-period
    qrows = ANCHORS // groups          # anchors per group
    j_rows = -(-((groups - 1) * stride + window) // LANE)
    width = j_rows * LANE

    bq = pl.program_id(0)
    blk = pl.program_id(1)
    start = blk * (ANCHORS * stride)

    col = jax.lax.broadcasted_iota(jnp.int32, (qrows, width), 1)
    col_valid = col < window

    def one_row(r_row, _):
        row = bq * BROWS + r_row
        # x is flattened 1-D in HBM: 2-D HBM refs are (8,128)-tiled and
        # reject single-row slices; 1-D DMAs are offset-free.
        copy = pltpu.make_async_copy(
            x_hbm.at[pl.ds(row * pad_total + start, span_len)], span_vmem, sem)
        copy.start()
        copy.wait()
        span_bits_vmem[:] = lax.bitcast_convert_type(span_vmem[:], jnp.uint32)

        res_groups = []
        for r in range(groups):        # static unroll
            # Group r holds anchors a = q*groups + r, whose windows start at
            # stride*(q*groups + r) = r*stride + q*LANE: one lane-row apart.
            blocks = []
            for j in range(j_rows):    # static unroll
                off = r * stride + j * LANE
                flat = span_bits_vmem[pl.ds(off, qrows * LANE)]
                blocks.append(flat.reshape(qrows, LANE))
            keys = jnp.concatenate(blocks, axis=1)        # (qrows, width)
            keys = jnp.where(col_valid, keys, INF_BITS | jnp.uint32(0x400000))

            valid = keys < INF_BITS
            counts = jnp.sum(valid.astype(jnp.int32), axis=1, keepdims=True)
            qf = jnp.float32(q)
            pos = qf * jnp.maximum(counts - 1, 0).astype(jnp.float32)
            k_lo = jnp.floor(pos).astype(jnp.int32)
            frac = pos - k_lo.astype(jnp.float32)

            def plane(i, state):
                prefix, k = state
                b_ = jnp.uint32(31) - jnp.asarray(i, jnp.uint32)
                bit = (jnp.uint32(1) << b_).astype(jnp.uint32)
                high = (~((bit << jnp.uint32(1)) - jnp.uint32(1))).astype(jnp.uint32)
                cand = (keys & high) == (prefix & high)
                c0 = jnp.sum((cand & ((keys & bit) == 0)).astype(jnp.int32),
                             axis=1, keepdims=True).astype(jnp.int32)
                take1 = k >= c0
                k = jnp.where(take1, k - c0, k).astype(jnp.int32)
                prefix = jnp.where(take1, prefix | bit, prefix).astype(jnp.uint32)
                return prefix, k

            prefix0 = jnp.zeros((qrows, 1), jnp.uint32)
            prefix, _k = lax.fori_loop(0, 32, plane, (prefix0, k_lo))
            v_lo = lax.bitcast_convert_type(prefix, jnp.float32)

            # Next order statistic (int32 min: valid keys are < 2^31).
            le = valid & (keys <= prefix)
            cnt_le = jnp.sum(le.astype(jnp.int32), axis=1, keepdims=True)
            above = jnp.where(valid & (keys > prefix), keys,
                              INF_BITS).astype(jnp.int32)
            nxt = lax.bitcast_convert_type(
                jnp.min(above, axis=1, keepdims=True), jnp.float32)
            v_hi = jnp.where(cnt_le >= k_lo + 2, v_lo, nxt)

            res = jnp.where(frac > 0, v_lo + frac * (v_hi - v_lo), v_lo)
            res = jnp.where(counts >= min_periods, res, jnp.float32(jnp.nan))
            res_groups.append(res)                         # (qrows, 1)

        # Column r of the (qrows, groups) tile holds group r's anchors, so
        # the row-major flatten q*groups + r IS the natural anchor order —
        # no permutation needed.  Mask the tail block's overhang.
        M = jnp.concatenate(res_groups, axis=1)            # (qrows, groups)
        q_iota = jax.lax.broadcasted_iota(jnp.int32, (qrows, groups), 0)
        r_iota = jax.lax.broadcasted_iota(jnp.int32, (qrows, groups), 1)
        anchor = blk * ANCHORS + q_iota * groups + r_iota
        M = jnp.where(anchor < n_anchor, M, jnp.float32(jnp.nan))
        out_ref[r_row, :, :] = M
        return 0

    lax.fori_loop(0, BROWS, one_row, 0)


def strided_quantile_anchors_pallas(
    x: jnp.ndarray, window: int, q: float, min_periods: int, stride: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Anchor quantiles at positions j*stride for a batch (B, n) of
    non-negative series (NaN = missing).  Returns (B, n_anchor) float32."""
    if LANE % stride:
        raise ValueError(f"stride {stride} must divide {LANE}")
    B, n = x.shape
    left, right = centered_bounds(window)
    n_anchor = -(-n // stride)
    n_blocks = -(-n_anchor // ANCHORS)
    groups = LANE // stride
    qrows = ANCHORS // groups
    j_rows = -(-((groups - 1) * stride + window) // LANE)
    # Span must cover the largest static slice: off_max + qrows*LANE.
    span_len = (groups - 1) * stride + (j_rows - 1) * LANE + qrows * LANE
    span_len = max(span_len, ANCHORS * stride + window)
    # 1-D HBM refs are 1024-tiled: DMA offsets and sizes must be provable
    # 1024-multiples (row starts and block starts are, since
    # ANCHORS*stride = 4096 and pad_total is rounded below).
    span_len = -(-span_len // 1024) * 1024

    B_pad = -(-B // BROWS) * BROWS
    pad_total = left + n_blocks * ANCHORS * stride + window + span_len
    pad_total = -(-pad_total // 1024) * 1024
    xpad = jnp.full((B_pad, pad_total), jnp.nan, jnp.float32)
    xpad = lax.dynamic_update_slice(xpad, x.astype(jnp.float32), (0, left))

    kernel = functools.partial(
        _kernel, window=window, stride=stride, q=q, min_periods=min_periods,
        span_len=span_len, n_anchor=n_anchor, pad_total=pad_total)

    out = pl.pallas_call(
        kernel,
        grid=(B_pad // BROWS, n_blocks),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((BROWS, qrows, groups), lambda b, j: (b, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B_pad, n_blocks * qrows, groups),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((span_len,), jnp.float32),
            pltpu.VMEM((span_len,), jnp.uint32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xpad.reshape(-1))

    # Row-major flatten of (qrows, groups) is the natural anchor order.
    out = out.reshape(B_pad, n_blocks * ANCHORS)
    return out[:B, :n_anchor]


def rolling_quantile_strided_pallas(
    x: jnp.ndarray, window: int, q: float, min_periods: int = 1,
    stride: int = 8, interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in batched equivalent of ``rolling_quantile_centered_strided``
    using the Pallas anchor kernel + XLA linear interpolation."""
    from ..quantile import interp_anchors

    squeeze = x.ndim == 1
    if squeeze:
        x = x[None, :]
    B, n = x.shape
    anchors = strided_quantile_anchors_pallas(x, window, q, min_periods, stride,
                                              interpret=interpret)
    out = interp_anchors(anchors, n, stride, x.dtype)
    return out[0] if squeeze else out


def make_vmappable_rolling_quantile(window: int, q: float, min_periods: int,
                                    stride: int):
    """A single-recording ``(n,) -> (n,)`` rolling-quantile function whose
    vmap rule dispatches the whole batch to the Pallas kernel — so the
    per-recording pipeline stays a plain ``vmap`` while the hot kernel runs
    batched on-chip."""

    @jax.custom_batching.custom_vmap
    def fn(x):
        return rolling_quantile_strided_pallas(x, window, q, min_periods, stride)

    @fn.def_vmap
    def _rule(axis_size, in_batched, x):
        (x_batched,) = in_batched
        assert x_batched
        return rolling_quantile_strided_pallas(x, window, q, min_periods, stride), True

    return fn
