"""Preprocessing: filtered signal → amplitude envelope (device-side).

Reference: ``preprocess_audio`` (bpm_analysis.py:1007-1062) — mono mix →
stride decimation → 2nd-order Butterworth band-pass 20-150 Hz (filtfilt) →
abs → centered rolling mean of ``sr // 10`` samples.

Two entry points:

* :func:`envelope_from_filtered` — the envelope stage alone, for inputs that
  are already band-passed (the bundled golden sample ships the post-filter
  signal; the reference's labeler recomputes the envelope from it the same
  way, heartbeat_labeler.py:62-67).
* :func:`preprocess` — the full chain from raw PCM.  The compat path
  reproduces the reference's quirk of decimating *before* filtering with no
  anti-alias filter (bpm_analysis.py:1031-1045 — despite README.md:6
  claiming the reverse); ``compat.antialias_decimation=True`` filters at the
  native rate first (the north-star path).

The decimation factor clamp is host-side (it only depends on the static
sample rate): ``min(factor, max(1, sr // (2*highcut) - 1))``
(bpm_analysis.py:1021-1029).
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ..config import AnalyzerConfig
from ..ops import rolling
from ..ops.filter import bandpass_filtfilt


def safe_downsample_factor(sample_rate: int, cfg: AnalyzerConfig) -> int:
    """Reference clamp: ``int(sr / (highcut*2) - 1)`` floor, min 1
    (bpm_analysis.py:1021-1029)."""
    factor = cfg.preprocess.downsample_factor
    max_safe = int(sample_rate / (cfg.preprocess.bandpass_high_hz * 2) - 1)
    if factor > max_safe:
        factor = max(1, max_safe)
    return factor


def edge_held(x: jnp.ndarray, n_valid):
    """(valid mask, x with the padded tail held at ``x[n_valid-1]``) — the
    shared masking every peak-finding stage applies so prominence/edge
    semantics see the same "signal edge" the unpadded serial run sees.
    ``n_valid=None`` returns ``(None, x)``."""
    if n_valid is None:
        return None, x
    valid = jnp.arange(x.shape[0]) < n_valid
    return valid, jnp.where(valid, x, x[jnp.maximum(n_valid - 1, 0)])


def envelope_from_filtered(filtered: jnp.ndarray, sample_rate: int,
                           n_valid=None) -> jnp.ndarray:
    """abs → centered rolling mean of ``sr // 10`` samples
    (bpm_analysis.py:1052-1054).  With a traced ``n_valid``, windows truncate
    at the valid boundary exactly as pandas truncates at the series end."""
    window = sample_rate // 10
    if n_valid is None:
        return rolling.rolling_mean_centered(jnp.abs(filtered), window)
    valid = jnp.arange(filtered.shape[0]) < n_valid
    return rolling.rolling_mean_centered_masked(jnp.abs(filtered), valid, window)


def preprocess(
    audio: jnp.ndarray, sample_rate: int, cfg: AnalyzerConfig, n_valid=None
) -> Tuple[jnp.ndarray, jnp.ndarray, int]:
    """Full preprocessing from mono PCM at the native rate.

    Returns (envelope, filtered_signal, new_sample_rate).  The filtered
    signal is what the reference writes as ``*_filtered_debug.wav``
    (bpm_analysis.py:1047-1050).

    ``n_valid`` (traced) marks the valid prefix of a zero-padded ``audio``;
    the result at positions < ceil(n_valid / factor) equals the unpadded
    serial run bit-for-bit (the batching contract, see ``host_batch``).
    Returns the decimated valid length as a fourth element in that case.
    """
    factor = safe_downsample_factor(sample_rate, cfg)
    low = cfg.preprocess.bandpass_low_hz
    high = cfg.preprocess.bandpass_high_hz
    order = cfg.preprocess.bandpass_order
    masked = n_valid is not None
    if masked:
        audio = jnp.where(jnp.arange(audio.shape[0]) < n_valid, audio, 0)

    if cfg.compat.antialias_decimation:
        # North-star path: FIR anti-alias decimation (strided windowed-sinc
        # convolution), then the IIR band-pass at the decimated rate where
        # its poles are well-conditioned (see ops.filter.fir_decimate).
        from ..ops.filter import fir_decimate

        decimated = fir_decimate(audio, factor)
        new_rate = sample_rate // factor if factor > 1 else sample_rate
    else:
        # Compat path: stride-decimate first (aliases above the new Nyquist
        # fold in — reproducing bpm_analysis.py:1031-1045 exactly).
        decimated = audio[::factor] if factor > 1 else audio
        new_rate = sample_rate // factor if factor > 1 else sample_rate
        if high >= 0.5 * new_rate:
            raise ValueError(
                f"Cannot create a {high:g}Hz filter: effective rate {new_rate}Hz too low"
            )

    if not masked:
        filtered = bandpass_filtfilt(decimated, new_rate, low, high, order)
        return envelope_from_filtered(filtered, new_rate), filtered, new_rate

    nv_dec = -(-jnp.asarray(n_valid, jnp.int32) // factor) if factor > 1 \
        else jnp.asarray(n_valid, jnp.int32)
    filtered = bandpass_filtfilt(decimated, new_rate, low, high, order,
                                 n_valid=nv_dec)
    env = envelope_from_filtered(filtered, new_rate, n_valid=nv_dec)
    return env, filtered, new_rate, nv_dec
