"""Host-side orchestration: file in → device pipeline → artifact files out.

This is the TPU framework's equivalent of the reference's
``analyze_wav_file`` orchestrator (bpm_analysis.py:1725-1768) plus the GUI
worker's convert-or-copy step (gui.py:202-245).  Host does decode, I/O and
report rendering; everything between PCM and metrics is the jitted device
program (``models.pipeline``).
"""
from __future__ import annotations

import logging
import os
import shutil
import subprocess
import time
from typing import Optional

import numpy as np
import jax.numpy as jnp

import functools

import jax

from .config import AnalyzerConfig, DEFAULT_CONFIG
from .io import wav
from .models import envelope as envm
from .models import pipeline
from .reports import csvout, debug_log, plot, settings, summary
from .reports import trace as trace_mod


def _length_bucket(n: int, min_bucket: int = 1 << 15) -> int:
    """Smallest power-of-two >= n (>= min_bucket).  The serial path pads
    every recording to a bucket and passes the true length as a traced
    ``n_valid``, so analyzing a directory of arbitrary-length files compiles
    O(log) programs instead of one per length (the masked program computes
    exactly the unpadded analysis — tests/test_masked_length.py)."""
    b = min_bucket
    while b < n:
        b <<= 1
    return b


@functools.partial(jax.jit,
                   static_argnames=("sample_rate", "cfg", "pre_filtered"))
def _analyze_padded_jit(audio, hint, n_valid, sample_rate: int,
                        cfg: AnalyzerConfig, pre_filtered: bool):
    """One jitted program per (bucket length, rate, cfg): preprocess +
    pipeline.  Jitting end-to-end keeps the serial path bit-identical to the
    batched bucket program (XLA:CPU's eager kernels associate windowed sums
    differently from its jitted fusions; everything jitted agrees across
    shapes — the serial-vs-batched artifact contract depends on it, see
    tests/test_host_batch.py)."""
    if pre_filtered:
        env = envm.envelope_from_filtered(audio, sample_rate, n_valid=n_valid)
        res = pipeline.analyze_envelope(env, sample_rate, cfg, hint,
                                        n_valid=n_valid)
        return env, None, n_valid, res
    env, filtered, new_rate, nv_dec = envm.preprocess(audio, sample_rate, cfg,
                                                      n_valid=n_valid)
    res = pipeline.analyze_envelope(env, new_rate, cfg, hint, n_valid=nv_dec)
    return env, filtered, nv_dec, res

SUPPORTED_EXTENSIONS = (".wav", ".mp3", ".m4a", ".flac", ".ogg", ".mp4", ".mkv", ".mov")


def convert_to_wav(file_path: str, target_path: str) -> bool:
    """Any format → mono WAV.  The reference shells out to FFmpeg via pydub
    (bpm_analysis.py:989-1005); we invoke the ffmpeg CLI directly."""
    ffmpeg = shutil.which("ffmpeg")
    if ffmpeg is None:
        raise RuntimeError("ffmpeg is required for non-WAV inputs but was not found on PATH")
    logging.info(f"Converting {os.path.basename(file_path)} to WAV format...")
    try:
        subprocess.run(
            [ffmpeg, "-y", "-i", file_path, "-ac", "1", target_path],
            check=True, capture_output=True,
        )
        return True
    except subprocess.CalledProcessError as e:
        logging.error(f"Could not convert file {file_path}. Error: {e.stderr[-500:]}")
        return False


def check_overflow(result, original_file_path: str) -> None:
    if bool(result.overflowed):
        raise RuntimeError(
            f"{os.path.basename(original_file_path)}: analysis capacity "
            "overflow — a fixed-size buffer (RuntimeConfig.max_raw_peaks/"
            "max_troughs/max_candidates) truncated detected events and the "
            "output would silently omit beats. Re-run with larger capacities."
        )


class SampledEnv:
    """Duck-typed stand-in for a dense per-sample array that only holds the
    values the renderers actually read — event positions (peaks/troughs) and
    the SVG downsample grid.  The batched front-end gathers these on DEVICE
    (host_batch render pack), cutting the per-chunk D2H from the full dense
    rows (~25 MB per 16-file chunk at ~20 MB/s on tunneled links) to a few
    hundred KB, byte-identical artifacts (the gathered values ARE the dense
    entries).

    Supports exactly the renderer access patterns: ``len(a)``, ``a[i]`` for
    scalar event positions, ``a[np.ndarray]`` for marker position arrays,
    and ``a[::step]`` for the SVG line (``step`` must be the grid step this
    view was built with).  Anything else raises — a loud contract, so a new
    renderer access pattern becomes a test failure, not silent corruption.
    """

    def __init__(self, n: int, positions: np.ndarray, values: np.ndarray,
                 ds_step: int, ds_values: np.ndarray):
        order = np.argsort(positions, kind="stable")
        self._pos = np.asarray(positions)[order]
        self._val = np.asarray(values)[order]
        self._n = int(n)
        self._ds_step = int(ds_step)
        self._ds = np.asarray(ds_values)

    def __len__(self):
        return self._n

    def _lookup(self, pos):
        pos = np.asarray(pos)
        i = np.searchsorted(self._pos, pos)
        ok = (i < len(self._pos))
        if not np.all(ok & (self._pos[np.minimum(i, len(self._pos) - 1)] == pos)):
            missing = np.asarray(pos)[~(ok & (self._pos[np.minimum(
                i, len(self._pos) - 1)] == pos))]
            raise KeyError(
                f"SampledEnv: positions {missing[:5]} were not gathered on "
                "device — extend the render pack for this access")
        return self._val[i]

    def __getitem__(self, key):
        if isinstance(key, slice):
            if key.start is None and key.stop is None \
                    and (key.step or 1) == self._ds_step:
                return self._ds
            raise KeyError(f"SampledEnv: unsupported slice {key} "
                           f"(grid step is {self._ds_step})")
        if np.isscalar(key) or getattr(key, "ndim", 1) == 0:
            return float(self._lookup(np.asarray([key]))[0])
        return self._lookup(key)


def save_filtered_wav(filtered: np.ndarray, new_rate: int,
                      original_file_path: str, output_directory: str,
                      beside_wav_path: Optional[str] = None) -> None:
    """``*_filtered_debug.wav`` (int16-normalized) in the output directory
    (bpm_analysis.py:1056-1060) and — when ``beside_wav_path`` is given and
    resolves to a different file — beside the analyzed wav too, reproducing
    the reference's duplicate write (bpm_analysis.py:1047-1050)."""
    base = os.path.basename(os.path.splitext(original_file_path)[0])
    peak = np.max(np.abs(filtered)) or 1.0
    norm = np.int16(filtered / peak * 32767)
    write_filtered_wav_i16(norm, new_rate, original_file_path,
                           output_directory, beside_wav_path)


def write_filtered_wav_i16(norm: np.ndarray, new_rate: int,
                           original_file_path: str, output_directory: str,
                           beside_wav_path: Optional[str] = None) -> None:
    """Write an already int16-normalized filtered signal — the batched
    front-end normalizes ON DEVICE (same peak/scale/truncation arithmetic in
    float32, bit-identical samples) and fetches int16, halving the D2H bytes
    of the heaviest render-mode leaf."""
    base = os.path.basename(os.path.splitext(original_file_path)[0])
    out_path = os.path.join(output_directory, f"{base}_filtered_debug.wav")
    wav.write(out_path, new_rate, norm)
    if beside_wav_path is not None:
        beside = f"{os.path.splitext(beside_wav_path)[0]}_filtered_debug.wav"
        if os.path.abspath(beside) != os.path.abspath(out_path):
            wav.write(beside, new_rate, norm)


def render_artifacts(result, cfg: AnalyzerConfig, env_np: np.ndarray,
                     new_rate: int, original_file_path: str,
                     output_directory: str, start_bpm_hint=None):
    """Persist the reference's artifact set for one analyzed recording:
    settings JSON, BPM CSV, summary MD, debug log MD, HTML plot
    (bpm_analysis.py:1756-1765).  Returns the result, or None when fewer
    than 2 final beats (the reference's no-report outcome)."""
    base = os.path.basename(os.path.splitext(original_file_path)[0])
    settings.save(output_directory, base, start_bpm_hint)
    check_overflow(result, original_file_path)
    if not bool(result.ok):
        logging.warning("Not enough S1 peaks detected to generate full report.")
        return None
    times, bpm = csvout.bpm_rows(result)
    csvout.write_bpm_csv(os.path.join(output_directory, f"{base}_bpm_plot.csv"),
                         times, bpm)
    summary.save(result, original_file_path, output_directory)
    # debug_strings is read by BOTH the debug log and the plot tooltips;
    # build it once per file (it walks every classified peak building
    # reason strings — the heaviest shared piece of host rendering).
    debug = trace_mod.debug_strings(result, cfg)
    debug_log.save(result, cfg, env_np, new_rate, original_file_path,
                   output_directory, debug=debug)
    plot.save(result, cfg, env_np, new_rate, original_file_path, output_directory,
              debug=debug)
    return result


def analyze_wav_file(
    wav_file_path: str,
    cfg: AnalyzerConfig = DEFAULT_CONFIG,
    start_bpm_hint: Optional[float] = None,
    original_file_path: Optional[str] = None,
    output_directory: str = ".",
    pre_filtered: bool = False,
):
    """Single-file pipeline producing the reference's artifact set:
    ``{base}_bpm_plot.html`` + ``.csv``, ``{base}_Analysis_Summary.md``,
    ``{base}_Debug_Log.md``, ``{base}_Analysis_Settings.json`` and (unless
    ``pre_filtered``) ``{base}_filtered_debug.wav``.

    Returns the PipelineResult, or None when fewer than 2 final beats were
    found (reference bpm_analysis.py:1752-1754).
    """
    start = time.time()
    original_file_path = original_file_path or wav_file_path
    logging.info(f"--- Processing file: {os.path.basename(original_file_path)} ---")
    os.makedirs(output_directory, exist_ok=True)

    sample_rate, data = wav.read(wav_file_path)
    mono = wav.to_mono(data).astype(np.float32 if cfg.runtime.dtype == "float32" else np.float64)
    dtype = jnp.float32 if cfg.runtime.dtype == "float32" else jnp.float64

    n = int(mono.shape[0])
    if pre_filtered:
        # Input is already the band-passed (decimated) signal — e.g. a
        # ``*_filtered_debug.wav`` artifact; skip decimation/filtering the
        # way the reference's labeler does (heartbeat_labeler.py:62-67).
        new_rate = sample_rate
    else:
        factor = envm.safe_downsample_factor(sample_rate, cfg)
        new_rate = sample_rate // factor if factor > 1 else sample_rate
        # Same host-side guard as host_batch: the masked filtfilt clamps
        # (garbage) instead of erroring when n_valid <= padlen, so reject
        # too-short recordings before tracing.
        padlen = 3 * (2 * cfg.preprocess.bandpass_order + 1)
        n_dec = -(-n // factor) if factor > 1 else n
        if n_dec <= padlen:
            raise ValueError(
                f"decimated length {n_dec} must exceed filter padlen "
                f"{padlen} (recording too short at rate {sample_rate})")

    bucket = _length_bucket(n)
    if bucket > n:
        mono = np.pad(mono, (0, bucket - n))
    hint = float(start_bpm_hint) if start_bpm_hint else float("nan")
    env, filtered, nv_dec, result = _analyze_padded_jit(
        jnp.asarray(mono, dtype), jnp.asarray(hint, dtype),
        jnp.int32(n), sample_rate, cfg, pre_filtered)
    nv = int(nv_dec)
    if not pre_filtered and cfg.preprocess.save_filtered_wav:
        save_filtered_wav(
            np.asarray(filtered)[:nv], new_rate, original_file_path,
            output_directory,
            beside_wav_path=(wav_file_path
                             if cfg.compat.filtered_wav_beside_input
                             else None))
    # Pull the whole result to host in ONE transfer before rendering: the
    # report renderers index trace fields per event, and doing that against
    # device arrays costs thousands of tiny device->host roundtrips (minutes
    # over the tunneled-TPU link; the batched path already device_gets).
    result = jax.device_get(result)

    out = render_artifacts(result, cfg, np.asarray(env)[:nv], new_rate,
                           original_file_path, output_directory, start_bpm_hint)
    logging.info(f"--- Analysis finished in {time.time() - start:.2f} seconds. ---")
    return out


def analyze_any_file(
    file_path: str,
    cfg: AnalyzerConfig = DEFAULT_CONFIG,
    start_bpm_hint: Optional[float] = None,
    output_directory: str = "processed_files",
    pre_filtered: bool = False,
):
    """Convert-or-copy then analyze — the per-file body of the reference's
    batch worker (gui.py:202-245)."""
    os.makedirs(output_directory, exist_ok=True)
    base, ext = os.path.splitext(os.path.basename(file_path))
    if ext.lower() == ".wav":
        target = os.path.join(output_directory, f"{base}.wav")
        if os.path.abspath(target) != os.path.abspath(file_path):
            shutil.copyfile(file_path, target)
    else:
        target = os.path.join(output_directory, f"{base}.wav")
        if not convert_to_wav(file_path, target):
            raise RuntimeError(f"conversion failed for {file_path}")
    return analyze_wav_file(target, cfg, start_bpm_hint, file_path, output_directory,
                            pre_filtered=pre_filtered)
