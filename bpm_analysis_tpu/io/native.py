"""ctypes bindings for the native host ingest library (native/wav_decoder.cpp).

Loads ``native/libbpmwav.so``, (re)building it with ``make`` on first use when
a compiler is available; all entry points fall back to the pure-numpy decoder
(``io.wav``) if the library can't be built or a decode fails, so the native
path is a pure acceleration layer for the batch feeder.

Decodes are *strided*: passing ``stride`` > 1 emits every stride-th mono
frame — the host half of the compat decimation path (a pure slice,
bpm_analysis.py:1031-1045), done inside the decoder so skipped frames are
never even converted.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import List, Optional, Sequence, Tuple

import numpy as np

from . import wav as pywav

_NATIVE_DIR = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..", "native"))
_LIB_PATH = os.path.join(_NATIVE_DIR, "libbpmwav.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    src = os.path.join(_NATIVE_DIR, "wav_decoder.cpp")
    stale = (not os.path.exists(_LIB_PATH)
             or (os.path.exists(src)
                 and os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)))
    if stale:
        try:
            subprocess.run(["make", "-B", "-C", _NATIVE_DIR],
                           check=True, capture_output=True)
        except (OSError, subprocess.CalledProcessError) as e:
            logging.debug(f"native wav library build failed: {e}")
            if not os.path.exists(_LIB_PATH):
                return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.bpmwav_decode.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64)]
        lib.bpmwav_decode.restype = ctypes.c_int
        lib.bpmwav_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
        lib.bpmwav_decode_batch.restype = ctypes.c_int
        lib.bpmwav_decode_batch_i16.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int16), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
        lib.bpmwav_decode_batch_i16.restype = ctypes.c_int
        lib.bpmwav_decode_batch_fir.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
        lib.bpmwav_decode_batch_fir.restype = ctypes.c_int
        _lib = lib
    except OSError as e:
        logging.debug(f"native wav library load failed: {e}")
    return _lib


def available() -> bool:
    return _load() is not None


def decode_mono_f32(path: str, max_samples: int, stride: int = 1
                    ) -> Tuple[int, np.ndarray]:
    """Decode one WAV to mono float32 (channel mean, scipy value convention),
    keeping every ``stride``-th frame.  Falls back to the numpy decoder."""
    lib = _load()
    if lib is not None:
        out = np.zeros(max_samples, np.float32)
        sr = ctypes.c_int32(0)
        n = ctypes.c_int64(0)
        rc = lib.bpmwav_decode(
            path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            max_samples, stride, ctypes.byref(sr), ctypes.byref(n))
        if rc == 0:
            return int(sr.value), out[: int(n.value)]
        logging.debug(f"native decode failed ({rc}) for {path}; numpy fallback")
    sr2, data = pywav.read(path)
    mono = pywav.to_mono(data).astype(np.float32)
    if stride > 1:
        mono = mono[::stride]
    return sr2, np.ascontiguousarray(mono[:max_samples])


def decode_batch_f32(paths: List[str], max_samples: int,
                     strides: Optional[Sequence[int]] = None,
                     num_threads: int = 0,
                     out: Optional[np.ndarray] = None,
                     ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Parallel native decode of ``paths`` into a zero-padded
    (batch, max_samples) float32 buffer, each file decimated by its own
    ``strides[i]``.  Returns (buffer, sample_rates, lengths) where lengths
    are the post-stride emitted counts.  Per-file failures fall back to the
    numpy decoder; files that still fail get length 0.

    ``out`` lets the caller decode straight into (the head of) a staging
    buffer it owns — must be C-contiguous float32 with row width
    ``max_samples`` and at least ``len(paths)`` rows.
    """
    batch = len(paths)
    if out is None:
        out = np.zeros((batch, max_samples), np.float32)
    else:
        assert out.dtype == np.float32 and out.flags.c_contiguous
        assert out.shape[0] >= batch and out.shape[1] == max_samples
    rates = np.zeros(batch, np.int32)
    lengths = np.zeros(batch, np.int64)
    stride_arr = np.ones(batch, np.int64) if strides is None \
        else np.asarray(list(strides), np.int64)
    lib = _load()
    if lib is not None and batch:
        errors = np.zeros(batch, np.int32)
        arr = (ctypes.c_char_p * batch)(*[p.encode() for p in paths])
        lib.bpmwav_decode_batch(
            arr, batch, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            max_samples,
            stride_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            rates.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            errors.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), num_threads)
        failed = np.nonzero(errors != 0)[0]
    else:
        failed = np.arange(batch)
    for i in failed:
        try:
            sr, mono = decode_mono_f32(paths[i], max_samples,
                                       int(stride_arr[i]))
            out[i, : len(mono)] = mono
            out[i, len(mono):] = 0.0
            rates[i] = sr
            lengths[i] = len(mono)
        except Exception as e:
            logging.warning(f"decode failed for {paths[i]}: {e}")
            lengths[i] = 0
    return out, rates, lengths


def decode_batch_i16(paths: List[str], max_samples: int,
                     strides: Optional[Sequence[int]] = None,
                     num_threads: int = 0,
                     out: Optional[np.ndarray] = None,
                     ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Parallel strided decode of mono-PCM16 WAVs into a zero-padded
    (batch, max_samples) **int16** buffer — the staging fast path: device
    programs cast int16 rows to float on-chip (exact), so the host->device
    transfer ships half the bytes of the float32 path.  Per-file failures
    (including files that turn out not to be mono PCM16) fall back to the
    float decoder and are round-tripped through int16 — exact whenever the
    fallback's values are int16-representable (the caller pre-screens
    formats with ``wav.probe_full``, so a lossy cast here means the file
    changed between probe and decode); files that still fail get length 0.
    """
    batch = len(paths)
    if out is None:
        out = np.zeros((batch, max_samples), np.int16)
    else:
        assert out.dtype == np.int16 and out.flags.c_contiguous
        assert out.shape[0] >= batch and out.shape[1] == max_samples
    rates = np.zeros(batch, np.int32)
    lengths = np.zeros(batch, np.int64)
    stride_arr = np.ones(batch, np.int64) if strides is None \
        else np.asarray(list(strides), np.int64)
    lib = _load()
    if lib is not None and batch:
        errors = np.zeros(batch, np.int32)
        arr = (ctypes.c_char_p * batch)(*[p.encode() for p in paths])
        lib.bpmwav_decode_batch_i16(
            arr, batch, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            max_samples,
            stride_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            rates.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            errors.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), num_threads)
        failed = np.nonzero(errors != 0)[0]
    else:
        failed = np.arange(batch)
    for i in failed:
        try:
            sr, mono = decode_mono_f32(paths[i], max_samples,
                                       int(stride_arr[i]))
            if len(mono) and (np.abs(mono) > 32767).any():
                # The probe said mono PCM16 but the decoded values don't fit
                # int16 — the file changed between probe and decode (or was
                # misprobed).  A wrapping cast would silently corrupt the
                # signal; treat it as a decode failure instead.
                raise ValueError("fallback decode produced values outside "
                                 "int16 range (file changed since probe?)")
            out[i, : len(mono)] = mono.astype(np.int16)
            out[i, len(mono):] = 0
            rates[i] = sr
            lengths[i] = len(mono)
        except Exception as e:
            logging.warning(f"decode failed for {paths[i]}: {e}")
            lengths[i] = 0
    return out, rates, lengths


def fir_taps(factor: int, taps_per_phase: int = 8) -> np.ndarray:
    """The antialias decimation taps (float32) — the same Hann-windowed-sinc
    design as the device path (ops/filter.py:fir_decimate) and the native
    decoder's in-loop FIR (wav_decoder.cpp:decode_one_fir)."""
    half = taps_per_phase * factor // 2
    n_taps = 2 * half + 1
    t = np.arange(n_taps) - half
    cutoff = 0.9 / factor
    h = np.sinc(cutoff * t) * cutoff
    h *= np.hanning(n_taps)
    h /= h.sum()
    return h.astype(np.float32)


def _fir_decimate_np(mono: np.ndarray, factor: int,
                     taps_per_phase: int = 8) -> np.ndarray:
    """Numpy fallback of the decoder's streaming FIR (zero-padded edges,
    y[m] = sum_k h[k] * x[m*factor + k - half])."""
    if factor <= 1:
        return mono.astype(np.float32)
    h = fir_taps(factor, taps_per_phase)
    half = (len(h) - 1) // 2
    n = len(mono)
    out_len = -(-n // factor)
    xp = np.zeros(half + n + len(h), np.float32)
    xp[half: half + n] = mono
    y = np.empty(out_len, np.float32)
    for m in range(out_len):
        y[m] = np.dot(h, xp[m * factor: m * factor + len(h)])
    return y


def decode_batch_fir(paths: List[str], max_samples: int,
                     factors: Sequence[int], taps_per_phase: int = 8,
                     num_threads: int = 0,
                     out: Optional[np.ndarray] = None,
                     ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Parallel anti-alias-decimating decode: each file is low-passed with
    the device FIR's Hann-windowed-sinc taps and decimated by ``factors[i]``
    inside the native streaming decode loop — the host half of the
    ``compat.antialias_decimation`` path.  Shipping the ~180k decimated
    samples instead of full native-rate PCM is what makes the robust path
    batch-viable on tunneled devices (ANTIALIAS_r04 measured 5 vs 156
    audio-min/s shipping full 44.1 kHz rows).  Same buffer/result contract
    as ``decode_batch_f32``; per-file failures fall back to a numpy decode +
    FIR with identical semantics."""
    batch = len(paths)
    if out is None:
        out = np.zeros((batch, max_samples), np.float32)
    else:
        assert out.dtype == np.float32 and out.flags.c_contiguous
        assert out.shape[0] >= batch and out.shape[1] == max_samples
    rates = np.zeros(batch, np.int32)
    lengths = np.zeros(batch, np.int64)
    factor_arr = np.asarray(list(factors), np.int64)
    lib = _load()
    if lib is not None and batch and hasattr(lib, "bpmwav_decode_batch_fir"):
        errors = np.zeros(batch, np.int32)
        arr = (ctypes.c_char_p * batch)(*[p.encode() for p in paths])
        lib.bpmwav_decode_batch_fir(
            arr, batch, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            max_samples,
            factor_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            taps_per_phase,
            rates.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            errors.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), num_threads)
        failed = np.nonzero(errors != 0)[0]
    else:
        failed = np.arange(batch)
    for i in failed:
        try:
            sr, data = pywav.read(paths[i])
            mono = pywav.to_mono(data).astype(np.float32)
            y = _fir_decimate_np(mono, int(factor_arr[i]), taps_per_phase)
            y = y[:max_samples]
            out[i, : len(y)] = y
            out[i, len(y):] = 0.0
            rates[i] = sr
            lengths[i] = len(y)
        except Exception as e:
            logging.warning(f"FIR decode failed for {paths[i]}: {e}")
            lengths[i] = 0
    return out, rates, lengths
