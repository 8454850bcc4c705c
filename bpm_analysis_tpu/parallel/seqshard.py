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
from ..ops.filter import (_block_filter_tables, _df2t_matrices, butter_bandpass,
                          lfilter_zi)


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


def _divisor_block(n: int, target: int = 256, lo: int = 8) -> int:
    """Largest divisor of ``n`` that is <= target (>= lo if one exists)."""
    best = 1
    for d in range(1, target + 1):
        if n % d == 0:
            best = d
    if best < lo:
        raise ValueError(f"no usable filter block length divides {n}")
    return best


def sequence_sharded_bandpass_filtfilt(
    mesh: Mesh,
    x: jnp.ndarray,
    fs: float,
    low_hz: float,
    high_hz: float,
    order: int = 2,
    batched: bool = False,
) -> jnp.ndarray:
    """Zero-phase Butterworth band-pass (``ops.filter.bandpass_filtfilt``)
    with the sample axis sharded over mesh axis 'sp' — the third and last
    convolutional phase of SURVEY §5's long-context entry (reference
    bpm_analysis.py:1044-1045).

    Unlike the envelope/quantile kernels (finite windows -> halo exchange),
    an IIR's state reaches across the whole signal, so the sharding relays
    the 2*order-dim filter state through the device chain instead: each
    device reduces its block to carry contributions once (the MXU-heavy
    ``X @ U`` einsum), then a ``ppermute`` relay of the tiny state vector
    walks the chain in ``sp-1`` steps — per step only the length-``nb``
    affine carry scan re-runs, so the relay costs O(sp * nb) 4-vector ops
    and sp-1 ICI hops, nothing more.  The forward pass relays left-to-right,
    the backward (time-reversed) pass right-to-left.  scipy's odd end
    extensions are reproduced exactly: the first/last ``padlen+1`` samples
    are broadcast from the edge devices (masked psum), and every device
    redundantly integrates the tiny extension recurrences to obtain the
    entry states.
    """
    b, a = butter_bandpass(order, low_hz, high_hz, fs)
    zi_np = lfilter_zi(b, a)
    padlen = 3 * max(len(a), len(b))
    n = x.shape[-1]
    sp = mesh.shape["sp"]
    if n % sp:
        raise ValueError(f"sample count {n} not divisible by sp={sp}")
    blk = n // sp
    if blk <= padlen:
        raise ValueError(f"block length {blk} must exceed padlen {padlen}")
    L = _divisor_block(blk)
    dtype = x.dtype

    A_np, B_np, b0 = _df2t_matrices(b, a)
    A_L_np, G_np, U_np, T_np, _ = _block_filter_tables(b, a, L)
    hi = "highest"

    def kernel(xb):
        A = jnp.asarray(A_np, dtype)
        Bv = jnp.asarray(B_np, dtype)
        A_L = jnp.asarray(A_L_np, dtype)
        G = jnp.asarray(G_np, dtype)
        U = jnp.asarray(U_np, dtype)
        T = jnp.asarray(T_np, dtype)
        zi = jnp.asarray(zi_np, dtype)
        b0j = jnp.asarray(b0, dtype)
        idx = lax.axis_index("sp")
        ndev = lax.axis_size("sp")

        def edge_broadcast(values, device):
            """Broadcast ``values`` (same shape everywhere) from ``device``
            to the whole sp axis."""
            contrib = jnp.where(idx == device, values, jnp.zeros_like(values))
            return lax.psum(contrib, "sp")

        def steps(s, us):
            """DF2T recurrence over a short sample vector: y = b0*u + s[0];
            s' = A s + B u.  Returns (final state, outputs)."""

            def body(si, u):
                y = b0j * u + si[0]
                return jnp.einsum("ij,j->i", A, si, precision=hi) + Bv * u, y

            return lax.scan(body, s, us)

        def local_reduce(xloc):
            """Block carries for the local samples (heavy part, done once)."""
            X = xloc.reshape(blk // L, L)
            C = jnp.einsum("kl,lm->km", X, U, precision=hi)
            return X, C

        def exit_from(C, entry):
            def step(s, c):
                return jnp.einsum("ij,j->i", A_L, s, precision=hi) + c, s

            s_exit, S0 = lax.scan(step, entry, C)
            return s_exit, S0

        def relay(C, s_first, reverse):
            """Sequential entry-state relay along the device chain.  Device
            order follows sample order (reversed for the backward pass);
            only the cheap carry scan re-runs per step."""
            first_dev = ndev - 1 if reverse else 0
            perm = ([(i + 1, i) for i in range(ndev - 1)] if reverse
                    else [(i, i + 1) for i in range(ndev - 1)])
            entry = jnp.where(idx == first_dev, s_first, jnp.zeros_like(s_first))
            for i in range(sp - 1):
                s_exit, _ = exit_from(C, entry)
                passed = lax.ppermute(s_exit, "sp", perm)
                target = (ndev - 2 - i) if reverse else (i + 1)
                entry = jnp.where(idx == target, passed, entry)
            s_exit, S0 = exit_from(C, entry)
            return entry, s_exit, S0

        def local_apply(X, S0):
            Y = (b0j * X
                 + jnp.einsum("km,lm->kl", S0, G, precision=hi)
                 + jnp.einsum("ki,il->kl", X, T, precision=hi))
            return Y.reshape(-1)

        # --- forward pass ---------------------------------------------------
        head = edge_broadcast(xb[: padlen + 1], 0)          # x[0 .. padlen]
        tail = edge_broadcast(xb[-(padlen + 1):], ndev - 1)  # x[n-padlen-1 ..]
        front_ext = 2 * head[0] - head[padlen:0:-1]
        s_fwd0, _ = steps(zi * front_ext[0], front_ext)
        X, C = local_reduce(xb)
        _, s_exit, S0 = relay(C, s_fwd0, reverse=False)
        y = local_apply(X, S0)

        # --- forward-filter the back extension (redundant on all devices) --
        back_ext = 2 * tail[-1] - tail[-2::-1][:padlen]
        s_fwd_end = edge_broadcast(s_exit, ndev - 1)
        _, y_back = steps(s_fwd_end, back_ext)

        # --- backward pass over the reversed signal -------------------------
        s_bwd0, _ = steps(zi * y_back[-1], y_back[::-1])
        Xr, Cr = local_reduce(y[::-1])
        _, _, S0r = relay(Cr, s_bwd0, reverse=True)
        z = local_apply(Xr, S0r)
        return z[::-1]

    spec = P(None, "sp") if batched else P("sp")
    fn = shard_map(
        jax.vmap(kernel) if batched else kernel, mesh=mesh,
        in_specs=(spec,), out_specs=spec,
    )
    return fn(x)


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
