"""ctypes bindings for the native host ingest library (native/wav_decoder.cpp).

Loads ``native/libbpmwav.so``, building it with ``make`` on first use when a
compiler is available; all entry points fall back to the pure-numpy decoder
(``io.wav``) if the library can't be built or a decode fails, so the native
path is a pure acceleration layer for the batch feeder.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

from . import wav as pywav

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libbpmwav.so"))
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                           check=True, capture_output=True)
        except (OSError, subprocess.CalledProcessError) as e:
            logging.debug(f"native wav library build failed: {e}")
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.bpmwav_decode.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64)]
        lib.bpmwav_decode.restype = ctypes.c_int
        lib.bpmwav_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
        lib.bpmwav_decode_batch.restype = ctypes.c_int
        _lib = lib
    except OSError as e:
        logging.debug(f"native wav library load failed: {e}")
    return _lib


def available() -> bool:
    return _load() is not None


def decode_mono_f32(path: str, max_samples: int) -> Tuple[int, np.ndarray]:
    """Decode one WAV to mono float32 (channel mean, scipy value convention).
    Falls back to the numpy decoder."""
    lib = _load()
    if lib is not None:
        out = np.zeros(max_samples, np.float32)
        sr = ctypes.c_int32(0)
        n = ctypes.c_int64(0)
        rc = lib.bpmwav_decode(
            path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            max_samples, ctypes.byref(sr), ctypes.byref(n))
        if rc == 0:
            return int(sr.value), out[: int(n.value)]
        logging.debug(f"native decode failed ({rc}) for {path}; numpy fallback")
    sr2, data = pywav.read(path)
    mono = pywav.to_mono(data).astype(np.float32)[:max_samples]
    return sr2, mono


def decode_batch_f32(paths: List[str], max_samples: int, num_threads: int = 0
                     ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Parallel native decode of ``paths`` into a zero-padded
    (batch, max_samples) float32 buffer.  Returns (buffer, sample_rates,
    lengths).  Per-file failures fall back to the numpy decoder; files that
    still fail get length 0."""
    batch = len(paths)
    out = np.zeros((batch, max_samples), np.float32)
    rates = np.zeros(batch, np.int32)
    lengths = np.zeros(batch, np.int64)
    lib = _load()
    if lib is not None and batch:
        errors = np.zeros(batch, np.int32)
        arr = (ctypes.c_char_p * batch)(*[p.encode() for p in paths])
        lib.bpmwav_decode_batch(
            arr, batch, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            max_samples, rates.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            errors.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), num_threads)
        failed = np.nonzero(errors != 0)[0]
    else:
        failed = np.arange(batch)
    for i in failed:
        try:
            sr, mono = decode_mono_f32(paths[i], max_samples)
            out[i, : len(mono)] = mono
            rates[i] = sr
            lengths[i] = len(mono)
        except Exception as e:
            logging.warning(f"decode failed for {paths[i]}: {e}")
            lengths[i] = 0
    return out, rates, lengths
