"""Butterworth band-pass + zero-phase filtering (scipy ``filtfilt`` parity).

Reference: ``butter(2, [low, high], btype='band')`` + ``filtfilt``
(bpm_analysis.py:1044-1045).  Two parts:

* **Host-side design** (:func:`butter_bandpass`, :func:`lfilter_zi`) — pure
  numpy reimplementation of the analog Butterworth prototype → band
  transform → bilinear transform pipeline and of scipy's steady-state
  initial conditions.  Coefficients are tiny static constants baked into the
  jitted program; no scipy at runtime.

* **Device-side filtering** (:func:`filtfilt`) — an IIR is a linear
  recurrence ``s[n] = A s[n-1] + B x[n]``; the blocked formulation turns it
  into MXU matmuls.  Split the signal into length-``L`` blocks.  Within a
  block starting at state ``s0``:

      y[j] = b0 x[j] + (A^j s0)[0] + sum_{i<j} h[j-1-i] x[i],
      h[d] = (A^d B)[0]

  so the in-block output is one ``(nb, L) @ (L, L)`` Toeplitz matmul plus a
  rank-``m`` correction ``S0 @ G^T`` (``G[j] = (A^j)[0,:]``), and the block
  carries compose through a tiny length-``nb`` affine scan
  (``s0' = A^L s0 + X_block @ U``).  All the heavy terms are dense matmuls
  over MXU-friendly shapes; the only sequential object is the ``nb``-element
  carry scan.  (The naive alternative — ``lax.associative_scan`` over
  per-sample ``(n, 4, 4)`` affine maps — pads the 4×4 trailing dims to
  (8, 128) vector tiles, a ~64x memory blowup, and measured ~10x slower.)

scipy ``filtfilt`` default semantics reproduced: odd extension of
``padlen = 3 * max(len(a), len(b))`` samples at both ends, forward pass with
``zi * x_ext[0]``, reversed backward pass with ``zi * y_rev[0]``
(tests/test_filter.py checks parity to ~1e-9 in float64).
"""
from __future__ import annotations

from typing import Tuple

import numpy as np
import jax.numpy as jnp
from jax import lax


def _butter_analog_poles(order: int) -> np.ndarray:
    k = np.arange(order)
    return np.exp(1j * np.pi * (2 * k + order + 1) / (2 * order))


def butter_bandpass(order: int, low_hz: float, high_hz: float, fs: float
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """``scipy.signal.butter(order, [low, high], btype='band', fs=fs)``.

    Analog lowpass prototype → lp2bp (zpk) → bilinear (zpk) → tf.
    Uses the same frequency pre-warping as scipy (fs2 = 2, warped =
    2*fs2*tan(pi*Wn/fs2) with Wn normalized to Nyquist).
    """
    nyq = fs / 2.0
    wn = np.array([low_hz, high_hz]) / nyq
    fs2 = 2.0
    warped = 2 * fs2 * np.tan(np.pi * wn / fs2)
    bw = warped[1] - warped[0]
    wo = np.sqrt(warped[0] * warped[1])

    # Analog prototype (zpk): no zeros, Butterworth poles, gain 1.
    p = _butter_analog_poles(order)
    k = 1.0

    # lp2bp_zpk
    p_lp = p * bw / 2
    p_bp = np.concatenate([
        p_lp + np.sqrt(p_lp ** 2 - wo ** 2),
        p_lp - np.sqrt(p_lp ** 2 - wo ** 2),
    ])
    z_bp = np.zeros(order)
    k_bp = k * bw ** order

    # bilinear_zpk
    fs2x = 2 * fs2
    z_d = (fs2x + z_bp) / (fs2x - z_bp)
    p_d = (fs2x + p_bp) / (fs2x - p_bp)
    z_d = np.concatenate([z_d, -np.ones(len(p_bp) - len(z_bp))])
    k_d = k_bp * np.real(np.prod(fs2x - z_bp) / np.prod(fs2x - p_bp))

    b = k_d * np.real(np.poly(z_d))
    a = np.real(np.poly(p_d))
    return b, a


def lfilter_zi(b: np.ndarray, a: np.ndarray) -> np.ndarray:
    """scipy.signal.lfilter_zi: steady-state DF2T initial conditions."""
    n = len(a)
    A = np.zeros((n - 1, n - 1))
    A[:, 0] = -a[1:]
    A[:-1, 1:] = np.eye(n - 2)
    B = b[1:] - a[1:] * b[0]
    return np.linalg.solve(np.eye(n - 1) - A, B)


def _df2t_matrices(b: np.ndarray, a: np.ndarray):
    """State-space (A, B, b0) of the direct-form-II-transposed recurrence
    with y folded out: s[n] = A s[n-1] + B x[n]; y[n] = b0 x[n] + s[n-1][0]."""
    n = len(a)
    A = np.zeros((n - 1, n - 1))
    A[:, 0] = -a[1:]
    A[:-1, 1:] = np.eye(n - 2)
    B = b[1:] - a[1:] * b[0]
    return A, B, b[0]


def _block_filter_tables(b: np.ndarray, a: np.ndarray, L: int):
    """Host-side (float64) tables for the blocked lfilter formulation.

    Returns (A_L, G, U, T, b0) where, with m = order states and
    h[d] = (A^d B)[0]:

    * ``A_L``: (m, m) block transition ``A^L``,
    * ``G``:   (L, m) rows ``G[j] = (A^j)[0, :]`` (carry-in → output),
    * ``U``:   (L, m) rows ``U[i] = A^{L-1-i} B`` (block input → carry-out),
    * ``T``:   (L, L) strict-upper Toeplitz ``T[i, j] = h[j-1-i]`` for j > i
      (in-block causal response).
    """
    A, B, b0 = _df2t_matrices(b, a)
    m = A.shape[0]
    powers = np.empty((L + 1, m, m))
    powers[0] = np.eye(m)
    for j in range(1, L + 1):
        powers[j] = powers[j - 1] @ A
    G = powers[:L, 0, :]
    U = np.einsum("lij,j->li", powers[L - 1::-1], B)
    h = np.einsum("lij,j->li", powers[:L], B)[:, 0]
    ii, jj = np.indices((L, L))
    d = jj - 1 - ii
    T = np.where(d >= 0, h[np.clip(d, 0, L - 1)], 0.0)
    return powers[L], G, U, T, b0


def lfilter(b: np.ndarray, a: np.ndarray, x: jnp.ndarray, zi: jnp.ndarray,
            block: int = 256) -> jnp.ndarray:
    """scipy ``lfilter(b, a, x, zi=zi)[0]`` via the blocked formulation."""
    dtype = x.dtype
    n = x.shape[0]
    L = min(block, max(8, n))
    A_L_np, G_np, U_np, T_np, b0 = _block_filter_tables(b, a, L)
    A_L = jnp.asarray(A_L_np, dtype)
    G = jnp.asarray(G_np, dtype)
    U = jnp.asarray(U_np, dtype)
    T = jnp.asarray(T_np, dtype)

    nb = -(-n // L)
    xp = jnp.concatenate([x, jnp.zeros((nb * L - n,), dtype)])
    X = xp.reshape(nb, L)

    # precision='highest': TPU matmuls default to bf16 multiplies, which is
    # catastrophic inside a recursive filter (errors re-amplify every
    # carry-composition step) — float32 classification parity requires
    # full-precision products throughout.
    hi = "highest"
    C = jnp.einsum("kl,lm->km", X, U, precision=hi)  # (nb, m) carry contribs

    def step(s, c):
        s_next = jnp.einsum("ij,j->i", A_L, s, precision=hi) + c
        return s_next, s  # emit the carry-IN of each block

    _, S0 = lax.scan(step, zi.astype(dtype), C)

    Y = (jnp.asarray(b0, dtype) * X
         + jnp.einsum("km,lm->kl", S0, G, precision=hi)
         + jnp.einsum("ki,il->kl", X, T, precision=hi))
    return Y.reshape(-1)[:n]


def filtfilt(b: np.ndarray, a: np.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """scipy ``filtfilt(b, a, x)`` with default odd padding."""
    padlen = 3 * max(len(a), len(b))
    if x.shape[0] <= padlen:
        raise ValueError(f"input length {x.shape[0]} must exceed padlen {padlen}")
    zi = lfilter_zi(b, a)
    front = 2 * x[0] - x[padlen:0:-1]
    back = 2 * x[-1] - x[-2:-padlen - 2:-1]
    ext = jnp.concatenate([front, x, back])
    zi_j = jnp.asarray(zi, x.dtype)
    y = lfilter(b, a, ext, zi_j * ext[0])
    y = jnp.flip(lfilter(b, a, jnp.flip(y), zi_j * y[-1]))
    return y[padlen:-padlen]


def _reverse_prefix(y: jnp.ndarray, m) -> jnp.ndarray:
    """Reverse the first ``m`` (traced) elements of ``y`` into the front of
    the result; slots >= m are unspecified.  Implemented as flip + dynamic
    roll (two slices of a doubled buffer) — no large gathers."""
    n = y.shape[0]
    f = jnp.flip(y)
    return lax.dynamic_slice(jnp.concatenate([f, f]), (n - m,), (n,))


def filtfilt_masked(b: np.ndarray, a: np.ndarray, x: jnp.ndarray,
                    n_valid) -> jnp.ndarray:
    """scipy ``filtfilt(b, a, x[:n_valid])`` where ``n_valid`` is a *traced*
    length — the primitive that lets mixed-length recordings share one
    padded batch shape while reproducing the serial per-file result exactly.

    The odd end extension and the backward pass anchor at the dynamic
    boundary ``n_valid`` (tiny dynamic gathers + two dynamic rolls); outputs
    at positions >= n_valid are unspecified.
    """
    padlen = 3 * max(len(a), len(b))
    n = x.shape[0]
    if n <= padlen:
        raise ValueError(f"input length {n} must exceed padlen {padlen}")
    nv = jnp.asarray(n_valid, jnp.int32)
    zi = lfilter_zi(b, a)

    front = 2 * x[0] - x[padlen:0:-1]
    ext = jnp.concatenate([front, x, jnp.zeros((padlen,), x.dtype)])
    # Odd extension about the dynamic end: 2*x[nv-1] - x[nv-2 .. nv-padlen-1].
    back = 2 * x[nv - 1] - x[jnp.maximum(nv - 2 - jnp.arange(padlen), 0)]
    ext = lax.dynamic_update_slice(ext, back, (padlen + nv,))
    n_ext = n + 2 * padlen          # valid extended length = nv + 2*padlen

    zi_j = jnp.asarray(zi, x.dtype)
    y = lfilter(b, a, ext, zi_j * ext[0])
    yr = _reverse_prefix(y, nv + 2 * padlen)
    z = lfilter(b, a, yr, zi_j * yr[0])
    # Undo the reversal and strip the pads: out[k] = z[nv + padlen - 1 - k].
    zf = jnp.flip(z)
    out = lax.dynamic_slice(jnp.concatenate([zf, zf]), (n_ext - nv - padlen,),
                            (n_ext,))
    return out[:n]


def bandpass_filtfilt(x: jnp.ndarray, fs: float, low_hz: float, high_hz: float,
                      order: int = 2, n_valid=None) -> jnp.ndarray:
    b, a = butter_bandpass(order, low_hz, high_hz, fs)
    if n_valid is None:
        return filtfilt(b, a, x)
    return filtfilt_masked(b, a, x, n_valid)


def fir_decimate(x: jnp.ndarray, factor: int, taps_per_phase: int = 8) -> jnp.ndarray:
    """Anti-aliased decimation: Hann-windowed-sinc low-pass at 90% of the
    new Nyquist, evaluated only at the kept samples (a strided convolution —
    the TPU-native way to decimate, in contrast to the reference's bare
    stride slicing which folds aliases into the band,
    bpm_analysis.py:1031-1033).

    Running a *recursive* band-pass at a 44.1 kHz native rate is numerically
    infeasible in float32 (the 20-150 Hz poles sit ~1e-4 inside the unit
    circle and the companion-matrix transients overflow), so the north-star
    preprocessing path decimates with this FIR first and applies the IIR
    band-pass at the decimated rate where it is well-conditioned.
    """
    if factor <= 1:
        return x
    half = taps_per_phase * factor // 2
    n_taps = 2 * half + 1
    t = np.arange(n_taps) - half
    cutoff = 0.9 / factor  # fraction of the *input* Nyquist
    h = np.sinc(cutoff * t) * cutoff
    h *= np.hanning(n_taps)
    h /= h.sum()

    # Polyphase matmul instead of a strided conv_general_dilated: under vmap
    # a [B, 1, N] single-channel conv makes XLA lay the batch dim on lanes
    # (T(1,128) tiling pads B -> 128, a 32x HBM blow-up that OOMs native-rate
    # fleets).  Splitting the tap index k = j*factor + p turns the strided
    # conv into one [M, factor] @ [factor, J] matmul (reads x once, MXU) plus
    # J shifted column adds on the decimated grid:
    #   y[m] = sum_k h[k] * xp[m*factor + k] = sum_j Y[m + j, j],
    #   Y = X @ Hp,  X[m, p] = xp[m*factor + p],  Hp[p, j] = h[j*factor + p].
    n = x.shape[0]
    out_len = -(-n // factor)
    n_phases = -(-n_taps // factor)  # J
    hp = np.zeros((n_phases, factor), dtype=h.dtype)
    hp.flat[:n_taps] = h
    m_rows = out_len + n_phases - 1
    xp = jnp.pad(x, (half, m_rows * factor - n - half))
    y2 = jnp.matmul(xp.reshape(m_rows, factor),
                    jnp.asarray(hp.T, x.dtype),
                    precision=lax.Precision.HIGHEST)
    res = y2[0:out_len, 0]
    for j in range(1, n_phases):
        res = res + y2[j:j + out_len, j]
    return res
