"""Butterworth band-pass + zero-phase filtering (scipy ``filtfilt`` parity).

Reference: ``butter(2, [low, high], btype='band')`` + ``filtfilt``
(bpm_analysis.py:1044-1045).  Two parts:

* **Host-side design** (:func:`butter_bandpass`, :func:`lfilter_zi`) — pure
  numpy reimplementation of the analog Butterworth prototype → band
  transform → bilinear transform pipeline and of scipy's steady-state
  initial conditions.  Coefficients are tiny static constants baked into the
  jitted program; no scipy at runtime.

* **Device-side filtering** (:func:`filtfilt`) — an IIR is a linear
  recurrence, so instead of a sequential per-sample loop (hostile to TPU)
  the direct-form-II-transposed state update ``s[n] = A s[n-1] + B x[n]`` is
  evaluated with ``lax.associative_scan`` over affine maps
  ``(M, v) ∘ (M', v') = (M'M, M'v + v')`` — O(N log N) work, fully parallel
  on the VPU.  The constant ``A`` is 4×4 for the order-2 band-pass
  (2N-order polynomial), so each element is a 4×4 matmul.

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


def lfilter(b: np.ndarray, a: np.ndarray, x: jnp.ndarray, zi: jnp.ndarray) -> jnp.ndarray:
    """scipy ``lfilter(b, a, x, zi=zi)[0]`` via associative scan."""
    A_np, B_np, b0 = _df2t_matrices(b, a)
    dtype = x.dtype
    A = jnp.asarray(A_np, dtype)
    B = jnp.asarray(B_np, dtype)
    n = x.shape[0]
    m = A.shape[0]

    Ms = jnp.broadcast_to(A, (n, m, m))
    vs = x[:, None] * B[None, :]

    # precision='highest': TPU matmuls default to bf16 multiplies, which is
    # catastrophic inside a recursive filter (errors re-amplify every
    # composition step) — float32 classification parity requires full-
    # precision 4x4 products here.
    def combine(e1, e2):
        M1, v1 = e1
        M2, v2 = e2
        return (jnp.einsum("...ij,...jk->...ik", M2, M1, precision="highest"),
                jnp.einsum("...ij,...j->...i", M2, v1, precision="highest") + v2)

    cumM, cumv = lax.associative_scan(combine, (Ms, vs))
    s = jnp.einsum("nij,j->ni", cumM, zi.astype(dtype), precision="highest") + cumv
    s_prev = jnp.concatenate([zi.astype(dtype)[None, :], s[:-1]], axis=0)
    return jnp.asarray(b0, dtype) * x + s_prev[:, 0]


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


def bandpass_filtfilt(x: jnp.ndarray, fs: float, low_hz: float, high_hz: float,
                      order: int = 2) -> jnp.ndarray:
    b, a = butter_bandpass(order, low_hz, high_hz, fs)
    return filtfilt(b, a, x)


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
    kernel = jnp.asarray(h, x.dtype)

    n = x.shape[0]
    out_len = -(-n // factor)
    xp = jnp.pad(x, (half, half + factor * out_len - n + half))
    res = lax.conv_general_dilated(
        xp[None, None, :], kernel[None, None, :],
        window_strides=(factor,), padding="VALID",
        precision=lax.Precision.HIGHEST,
    )[0, 0]
    return res[:out_len]
