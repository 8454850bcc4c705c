"""Batched multi-file analysis — the TPU-parallel replacement for the
reference's serial per-file worker loop (gui.py:202-245).

This is the framework's raison d'être (BASELINE.json configs[4]: 64x 10-min
mixed-format recordings across a chip mesh): files are decoded in parallel by
the native C++ loader, bucketed by (sample_rate, padded length) into a small
set of static shapes, analyzed as vmapped device batches with per-recording
traced valid lengths (``n_valid`` — the masked program computes exactly the
serial per-file analysis, see tests/test_masked_length.py), and rendered to
the same per-file artifact set the serial front-end produces.

Artifact contract (tests/test_host_batch.py): every decision, peak position,
count, CSV row, summary and settings file is byte-identical to the serial
path.  The only tolerated difference is a one-quantum formatting flip in the
debug log's amplitude *display* fields: XLA:CPU's GEMM kernels block (hence
associate f32 sums) differently per batch shape, which can move a raw
envelope value half an ULP across a 0.1-rounding boundary.

Shape discipline: lengths pad to power-of-two buckets (>= ``min_bucket``) and
batches pad to power-of-two sizes, so a fleet of mixed-length recordings
compiles O(log) distinct programs instead of one per (batch, length) pair.
"""
from __future__ import annotations

import dataclasses
import functools
import logging
import os
import shutil
import time
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, List, NamedTuple, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .config import AnalyzerConfig, DEFAULT_CONFIG
from .io import native, wav
from .models import envelope as envm
from .models import pipeline
from . import host


def length_bucket(n: int, min_bucket: int = 1 << 15) -> int:
    """Smallest size from the half-octave grid {2^k, 1.5 * 2^k} that is
    >= n (>= min_bucket).  The 1.5 * 2^k steps cap padding waste at ~33%
    (pure powers of two waste up to 2x) — padding is paid three times over:
    host->device transfer bytes (the bottleneck on tunneled devices), the
    dense-axis device compute, and the staging buffer.  The grid still
    yields O(log) distinct compiled programs across arbitrary file lengths;
    every 1.5 * 2^k size (k >= 8) stays divisible by 128 for the Pallas
    kernel tilings."""
    b = min_bucket
    while b < n:
        b <<= 1
    half = 3 * (b >> 2)
    if half >= n and half >= min_bucket:
        return half
    return b


def batch_bucket(n: int, max_batch: int) -> int:
    """Smallest power-of-two >= n, capped at max_batch."""
    b = 1
    while b < n and b < max_batch:
        b <<= 1
    return b


def doubled_capacities(cfg: AnalyzerConfig) -> AnalyzerConfig:
    """The overflow-retry config: every fixed event capacity doubled.  The
    work/slot factors are multiples of these capacities, so the derived
    buffers (extrema work space, prominence slots) scale with them; analysis
    parameters are untouched, so results on non-overflowing rows are
    unchanged and the retried rows are exact (the capacity contract is
    exactness-or-flag, never truncation)."""
    rt = cfg.runtime
    return dataclasses.replace(cfg, runtime=dataclasses.replace(
        rt,
        max_raw_peaks=rt.max_raw_peaks * 2,
        max_troughs=rt.max_troughs * 2,
        max_candidates=rt.max_candidates * 2,
        extrema_capacity=rt.extrema_capacity * 2))


# SVG downsample-grid slots gathered on device for the render pack: the SVG
# line reads env[::step] with step = max(1, nv // 2400), whose length tops
# out just below 2 * 2400 (nv just under a step increment).
_DS_CAP = 4800


class RenderPack(NamedTuple):
    """Device-gathered values the artifact renderers read — everything the
    debug log / SVG plot / filtered-WAV writer needs from the dense
    per-sample arrays, so render mode never fetches a dense f32 row (~25 MB
    per 16-file chunk over a ~20 MB/s tunneled D2H link)."""
    peak_env: jnp.ndarray    # env at raw_peak_positions (clipped)
    peak_floor: jnp.ndarray  # floor at raw_peak_positions
    trough_env: jnp.ndarray
    trough_floor: jnp.ndarray
    ds_env: jnp.ndarray      # env at the SVG grid (i*step, clipped; _DS_CAP)
    ds_floor: jnp.ndarray
    filt_i16: Optional[jnp.ndarray]  # int16-normalized filtered signal


def _render_pack(env, floor, filtered, res, nv_dec) -> RenderPack:
    n = env.shape[0]
    rp = jnp.clip(res.raw_peak_positions, 0, n - 1)
    tp = jnp.clip(res.trough_positions, 0, n - 1)
    step = jnp.maximum(nv_dec // 2400, 1)
    ds_idx = jnp.minimum(jnp.arange(_DS_CAP) * step, nv_dec - 1)
    if filtered is None:
        norm = None
    else:
        mask = jnp.arange(n) < nv_dec
        peak = jnp.max(jnp.abs(jnp.where(mask, filtered, 0.0)))
        peak = jnp.where(peak > 0, peak, jnp.ones((), filtered.dtype))
        # Same arithmetic as host.save_filtered_wav: /peak then *32767 in
        # float32, truncating int16 cast — bit-identical samples.
        norm = (filtered / peak * 32767).astype(jnp.int16)
    return RenderPack(env[rp], floor[rp], env[tp], floor[tp],
                      env[ds_idx], floor[ds_idx], norm)


@functools.partial(jax.jit,
                   static_argnames=("sample_rate", "cfg", "render_pack"))
def _analyze_padded_batch(audio, hints, n_valid, sample_rate: int,
                          cfg: AnalyzerConfig, render_pack: bool = False):
    """One bucket: (B, L) zero-padded PCM + per-row valid lengths → per-row
    (envelope, filtered, decimated valid length, PipelineResult, pack).
    With ``render_pack`` the dense leaves the renderers read are gathered on
    device into a RenderPack (returned fifth) so the fetch thread never
    ships dense rows."""

    def one(x, h, nv):
        if jnp.issubdtype(x.dtype, jnp.integer):
            # int16 staging fast path: rows arrive as raw PCM16 samples
            # (half the host->device bytes); the cast is exact — every
            # int16 is representable in float32.
            x = x.astype(jnp.dtype(cfg.runtime.dtype))
        env, filtered, _rate, nv_dec = envm.preprocess(x, sample_rate, cfg,
                                                       n_valid=nv)
        res = pipeline.analyze_envelope(env, _post_rate(sample_rate, cfg), cfg,
                                        h, n_valid=nv_dec)
        if render_pack:
            return None, None, nv_dec, res, _render_pack(
                env, res.floor, filtered, res, nv_dec)
        return env, filtered, nv_dec, res, None

    return jax.vmap(one)(audio, hints, n_valid)


def _post_rate(sample_rate: int, cfg: AnalyzerConfig) -> int:
    factor = envm.safe_downsample_factor(sample_rate, cfg)
    return sample_rate // factor if factor > 1 else sample_rate


def _tree_row(tree, i):
    return jax.tree_util.tree_map(lambda a: a[i], tree)


def _have_plotly() -> bool:
    from .reports import plot

    return plot._plotly_modules()[0] is not None


def _pack_views(pk: "RenderPack", res_i, nv: int):
    """(env view, floor view) for one recording from its fetched RenderPack
    row — the SampledEnv instances the renderers index instead of dense
    arrays.  Gathered positions are the CLIPPED raw-peak/trough slots plus
    the SVG grid; padding slots were clipped to n-1 on device, but only
    positions < the respective counts are ever read."""
    n_rp = int(res_i.raw_peak_count)
    n_tr = int(res_i.trough_count)
    rp = np.asarray(res_i.raw_peak_positions)[:n_rp]
    tp = np.asarray(res_i.trough_positions)[:n_tr]
    step = max(1, nv // 2400)
    n_ds = -(-nv // step)
    grid = np.arange(n_ds) * step
    positions = np.concatenate([rp, tp, grid])
    env_vals = np.concatenate([np.asarray(pk.peak_env)[:n_rp],
                               np.asarray(pk.trough_env)[:n_tr],
                               np.asarray(pk.ds_env)[:n_ds]])
    floor_vals = np.concatenate([np.asarray(pk.peak_floor)[:n_rp],
                                 np.asarray(pk.trough_floor)[:n_tr],
                                 np.asarray(pk.ds_floor)[:n_ds]])
    env_view = host.SampledEnv(nv, positions, env_vals, step,
                               np.asarray(pk.ds_env)[:n_ds])
    floor_view = host.SampledEnv(nv, positions, floor_vals, step,
                                 np.asarray(pk.ds_floor)[:n_ds])
    return env_view, floor_view


def prepare_wavs(paths: Sequence[str], output_dir: str,
                 errors: Optional[List[Tuple[str, str]]] = None
                 ) -> List[Tuple[Optional[str], str]]:
    """Convert-or-copy each input into ``output_dir`` (gui.py:202-245).
    Returns [(wav_path, original_path)] in input order.  A failed conversion
    is isolated per file (the batch keeps going, matching serial mode's
    per-file rosters): its entry carries ``wav_path=None`` and a message is
    appended to ``errors``."""
    os.makedirs(output_dir, exist_ok=True)
    out: List[Tuple[Optional[str], str]] = []
    for p in paths:
        base, ext = os.path.splitext(os.path.basename(p))
        target = os.path.join(output_dir, f"{base}.wav")
        try:
            if ext.lower() == ".wav":
                if os.path.abspath(target) != os.path.abspath(p):
                    shutil.copyfile(p, target)
            elif not host.convert_to_wav(p, target):
                raise RuntimeError("conversion failed")
        except Exception as e:
            logging.warning(f"conversion failed for {p}: {e}")
            if errors is not None:
                errors.append((p, str(e)))
            out.append((None, p))
            continue
        out.append((target, p))
    return out


def analyze_files_batched(
    paths: Sequence[str],
    cfg: AnalyzerConfig = DEFAULT_CONFIG,
    output_dir: str = "processed_files",
    hints: Optional[Sequence[Optional[float]]] = None,
    max_batch: int = 128,
    min_bucket: int = 1 << 15,
    pre_filtered: bool = False,
    render: bool = True,
    mesh=None,
    lane_stats: Optional[Dict[str, float]] = None,
    overflow_retries: int = 1,
) -> Tuple[Dict[str, object], List[Tuple[str, str]]]:
    """Analyze many files in device batches.  Returns (results, errors):
    ``results[original_path]`` is the per-file PipelineResult (or None when
    fewer than 2 beats — the reference's "no report" outcome), and errors is
    a per-file roster of (path, message).

    Artifacts rendered per file match the serial ``host.analyze_wav_file``
    output exactly (masked-length contract).  With ``mesh``, batches are
    sharded over its ``dp`` axis (batch buckets pad to the dp size).

    Field contract under ``render=False``: only the result fields a fleet
    summary reads are fetched from device — ``final_positions``,
    ``final_count``, ``metrics``, ``ok`` and the overflow flags.  The dense
    per-sample leaves (``floor``, ``trace``, ``smoothed_deviation``) and the
    capacity-shaped event sets (``classes``, ``precorrection_classes``,
    ``s1_positions``, ``trough_positions``, ``raw_peak_positions``) are
    returned as ``None`` — on tunneled devices D2H runs at ~20 MB/s, and not
    fetching them is most of the end-to-end win.  Pass ``render=True`` (the
    default) for on-disk artifacts.

    ``render=True`` leaf contract: artifacts are rendered from
    device-gathered values (``RenderPack`` — event/grid samples plus the
    int16-normalized filtered signal), so the dense ``floor`` and
    ``smoothed_deviation`` leaves come back ``None`` here too (the
    renderers never read other dense entries; artifacts stay byte-identical
    to the serial path, tests/test_host_batch.py).  Only when the real
    plotly is importable are dense rows fetched (its figure plots
    ``envelope[::factor]`` at the configured factor).  Serial
    ``host.analyze_wav_file`` keeps returning the full dense pytree.

    ``lane_stats``, if given, accumulates per-lane busy seconds across the
    run: ``decode`` (host decode + pad, decode thread), ``h2d`` (transfer +
    DMA wait, h2d thread), ``compute_wait`` (time until the device
    program's results are ready, fetch thread), ``d2h`` (result fetch, fetch
    thread), ``render`` (artifact writing, fetch thread), plus ``chunks``.
    Lanes overlap across threads, so their sum normally exceeds wall-clock;
    each lane's value bounds what a further-overlapped schedule could save.

    ``overflow_retries``: when a chunk trips a capacity overflow flag (an
    event buffer would have truncated detected events), the chunk is re-run
    up to this many times with all capacities doubled each time (one extra
    compile per retry config; the staged device inputs are reused).  Results
    stay exact — the retry just buys the buffers the recording needed.  Only
    a chunk that still overflows after the retries surfaces the serial
    path's capacity-overflow error on its per-file roster.  Set 0 to raise
    immediately (the serial-mode contract).
    """
    errors: List[Tuple[str, str]] = []
    results: Dict[str, object] = {}
    if hints is None:
        hints = [None] * len(paths)

    def _lane(key: str, dt: float = 1.0) -> None:
        # Each key is written from exactly one thread (decode: decode
        # thread; h2d: h2d thread; compute_wait/d2h/render: fetch thread),
        # so the read-add-write is race-free under the GIL.
        if lane_stats is not None:
            lane_stats[key] = lane_stats.get(key, 0.0) + dt

    pairs = prepare_wavs(paths, output_dir, errors)

    # Serial mode raises for recordings too short to odd-extend in filtfilt
    # (ops/filter.py); reject them here at probe time so the masked batch
    # program never sees a traced n_valid <= padlen (which would clamp the
    # extension indices and silently produce garbage).
    padlen = 3 * (2 * cfg.preprocess.bandpass_order + 1)

    # Compat decimation (the default) is a pure stride slice — identical
    # elements whether taken host- or device-side.  Doing it on host before
    # staging cuts the host->device transfer by the decimation factor
    # (~146x for 44.1 kHz input: 2 GB -> 16 MB per 16-file chunk), which is
    # THE bottleneck on tunneled devices; the device program then runs at
    # the post-decimation rate (its clamp resolves to factor 1).  The
    # anti-aliased path used to ship the full native-rate signal (measured
    # 5 vs 156 audio-min/s, H2D-bound — ANTIALIAS_r04); it now runs the SAME
    # windowed-sinc FIR inside the native decoder's streaming loop
    # (wav_decoder.cpp:decode_one_fir — float32 taps identical to
    # ops/filter.fir_decimate), so both paths stage ~180k samples/file and
    # the device program starts at the decimated rate either way.
    host_decimate = not pre_filtered and not cfg.compat.antialias_decimation
    host_fir = not pre_filtered and cfg.compat.antialias_decimation

    # --- probe + bucket ------------------------------------------------------
    groups: Dict[Tuple[int, int], List[int]] = {}
    meta = []
    for i, (wav_path, orig) in enumerate(pairs):
        if wav_path is None:
            meta.append(None)  # conversion failure already on the roster
            continue
        try:
            sr, nframes, audio_fmt, channels, bits = wav.probe_full(wav_path)
            if nframes < 16:
                raise ValueError("empty or near-empty recording")
            factor = 1
            n_dec = nframes
            if not pre_filtered:
                factor = envm.safe_downsample_factor(sr, cfg)
                n_dec = -(-nframes // factor) if factor > 1 else nframes
                if n_dec <= padlen:
                    raise ValueError(
                        f"decimated length {n_dec} must exceed filter padlen "
                        f"{padlen} (recording too short at rate {sr})")
            host_factor = factor if (host_decimate or host_fir) \
                and factor > 1 else 1
            if host_factor > 1 and envm.safe_downsample_factor(
                    sr // factor, cfg) > 1:
                # Ultra-high source rate whose post rate would be decimated
                # AGAIN by the device program's own clamp — ship the native
                # signal and let the device decimate once, as serial does.
                host_factor = 1
            fir = bool(host_fir and host_factor > 1)
            # Mono PCM16 sources stage as raw int16 (half the H2D bytes;
            # the device casts to float, exactly).  The flag is part of the
            # group key so a chunk's staging buffer has one dtype.  FIR
            # decode emits filtered floats, so it never stages int16.
            i16 = bool(audio_fmt == 1 and bits == 16 and channels == 1
                       and not fir)
            meta.append((sr, nframes, host_factor, i16, fir))
            if host_factor > 1:
                # Program key: post-decimation rate + decimated bucket (files
                # of different native rates can share one compiled program).
                key = (sr // factor, length_bucket(n_dec, min_bucket), i16, fir)
            else:
                key = (sr, length_bucket(nframes, min_bucket), i16, fir)
            groups.setdefault(key, []).append(i)
        except Exception as e:
            meta.append(None)
            errors.append((orig, str(e)))
            logging.warning(f"probe failed for {orig}: {e}")

    dp = 1
    if mesh is not None:
        dp = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))

    # --- chunk work list -----------------------------------------------------
    chunks: List[Tuple[int, int, bool, bool, List[int]]] = []
    for (sr, bucket_len, i16, fir), idxs in sorted(groups.items()):
        for chunk_start in range(0, len(idxs), max_batch):
            chunks.append((sr, bucket_len, i16, fir,
                           idxs[chunk_start:chunk_start + max_batch]))

    def decode_chunk(sr: int, bucket_len: int, i16: bool, fir: bool,
                     chunk: List[int]):
        """Decode + pad one chunk into a host staging buffer.  Runs on the
        decode thread, overlapping the H2D transfer of the PREVIOUS chunk
        (h2d_chunk below releases the GIL during the DMA wait, and the C++
        decoder releases it while converting).  Returns (chunk, ok_rows,
        host_arrays, staging_errors) — errors are merged on the main thread
        to keep the roster order deterministic."""
        t0 = time.perf_counter()
        staging_errors: List[Tuple[str, str]] = []
        b = batch_bucket(len(chunk), max_batch)
        if mesh is not None:
            b = max(b, dp)
            b = -(-b // dp) * dp
        wav_paths = [pairs[i][0] for i in chunk]
        # Strided decode straight into the staging buffer: the decoder emits
        # only every host_factor-th frame (the compat decimation slice) or,
        # on the antialias path, the FIR-decimated samples — so for 44.1 kHz
        # sources it writes ~180k samples/file instead of converting all 26M
        # (and on the stride path the skipped frames are never converted).
        audio = np.zeros((b, bucket_len), np.int16 if i16 else np.float32)
        if fir:
            _, rates, lengths = native.decode_batch_fir(
                wav_paths, bucket_len, factors=[meta[i][2] for i in chunk],
                out=audio)
        else:
            decode = (native.decode_batch_i16 if i16
                      else native.decode_batch_f32)
            _, rates, lengths = decode(
                wav_paths, bucket_len, strides=[meta[i][2] for i in chunk],
                out=audio)
        ok_rows = []
        for row, i in enumerate(chunk):
            if lengths[row] <= 0:
                staging_errors.append((pairs[i][1], "decode failed"))
            else:
                ok_rows.append(row)
        if not ok_rows:
            return chunk, ok_rows, None, staging_errors

        n_valid = np.full((b,), 1, np.int32)
        hint_arr = np.full((b,), np.nan, np.float32)
        if len(ok_rows) != len(chunk):
            # Rare repair path: compact failed rows out of the buffer so
            # slots stay dense (slot order == ok_rows order).
            audio[: len(ok_rows)] = audio[ok_rows]
            audio[len(ok_rows):] = 0.0
        for slot, row in enumerate(ok_rows):
            n_valid[slot] = int(lengths[row])
            h = hints[chunk[row]]
            hint_arr[slot] = np.nan if not h else float(h)
        # batch padding rows duplicate row 0 (results discarded).
        for slot in range(len(ok_rows), b):
            audio[slot] = audio[0]
            n_valid[slot] = n_valid[0]

        dt = time.perf_counter() - t0
        _lane("decode", dt)
        _lane("chunks")
        logging.debug("decode_chunk[%d files, bucket %d]: %.3fs",
                      len(chunk), bucket_len, dt)
        return chunk, ok_rows, (audio, hint_arr, n_valid), staging_errors

    def h2d_chunk(decode_future):
        """Host->device transfer of one decoded chunk.  Runs on the H2D
        thread: it waits for the decode future, stages the arrays and blocks
        until they are device-resident — so the transfer of chunk k+1 rides
        the (tunneled, bandwidth-bound) link while the decode thread chews
        chunk k+2 and the device computes chunk k."""
        chunk, ok_rows, host_arrays, staging_errors = decode_future.result()
        if host_arrays is None:
            return chunk, ok_rows, None, staging_errors
        t0 = time.perf_counter()
        args = tuple(jnp.asarray(a) for a in host_arrays)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            shard = NamedSharding(mesh, P(mesh.axis_names))
            args = tuple(jax.device_put(a, shard) for a in args)
        # Block until the input rows are resident on device: completing the
        # transfer here (rather than lazily inside the next dispatch) keeps
        # the lane attribution honest and lets the device program start the
        # moment it is enqueued.
        jax.block_until_ready(args[0])
        dt = time.perf_counter() - t0
        _lane("h2d", dt)
        logging.debug("h2d_chunk[%d files]: %.3fs", len(chunk), dt)
        return chunk, ok_rows, args, staging_errors

    # Render-pack mode: gather the renderer-read values on device instead of
    # fetching dense rows.  Only when the real plotly is importable does the
    # figure need dense arrays (envelope[::factor] at factor 1); the SVG
    # fallback reads exactly the pack.
    use_pack = render and not _have_plotly()

    def dispatch_chunk(sr: int, staged):
        """Enqueue the device program for one staged chunk (async under JAX
        dispatch; returns device arrays immediately).  Runs on the main
        thread so chunk k+1's compute is on the device queue while chunk k's
        results stream back over the (slow, high-latency on tunneled
        devices) D2H link in the fetch thread."""
        chunk, ok_rows, args, staging_errors = staged
        errors.extend(staging_errors)
        if args is None:
            return None
        run = _analyze_prefiltered_batch if pre_filtered else _analyze_padded_batch
        # args travel with the dispatch so the fetch thread can re-run the
        # chunk under a doubled-capacity config on overflow (the staged
        # device inputs are reused; nothing is re-decoded or re-transferred).
        return chunk, ok_rows, run(*args, sr, cfg, render_pack=use_pack), args

    def finish_chunk(sr: int, dispatched) -> List[Tuple[str, str]]:
        """Fetch + render one dispatched chunk on the fetch thread.  Returns
        its post-processing errors instead of appending to the shared roster:
        the caller merges them in chunk order after all fetch futures resolve,
        so the roster order is deterministic across runs (staging errors
        first, in chunk order, then post-processing errors in chunk order)."""
        post_errors: List[Tuple[str, str]] = []
        if dispatched is None:
            return post_errors
        chunk, ok_rows, (env_b, filt_b, nvd_b, res_b, pack_b), args = dispatched
        t0 = time.perf_counter()
        # One tiny leaf first: returns when the device program has finished,
        # so t_ready - t0 is pure compute wait and t1 - t_ready is pure D2H.
        np.asarray(res_b.final_count)
        # Overflow auto-retry: if any live row's capacity flag tripped,
        # re-run this chunk with doubled capacities (exact results, one
        # extra compile) instead of surfacing the serial path's error.
        run = _analyze_prefiltered_batch if pre_filtered else _analyze_padded_batch
        retry_cfg = cfg
        for _ in range(overflow_retries):
            if not bool(np.asarray(res_b.overflowed)[: len(ok_rows)].any()):
                break
            retry_cfg = doubled_capacities(retry_cfg)
            logging.warning(
                "capacity overflow in a %d-file chunk; retrying with "
                "capacities %dx the configured sizes",
                len(chunk), retry_cfg.runtime.max_raw_peaks
                // cfg.runtime.max_raw_peaks)
            env_b, filt_b, nvd_b, res_b, pack_b = run(*args, sr, retry_cfg,
                                                      render_pack=use_pack)
            np.asarray(res_b.final_count)
        t_ready = time.perf_counter()
        new_rate = sr if pre_filtered else _post_rate(sr, cfg)
        pack_np = None
        if render and pack_b is not None:
            # Render-pack fetch: the pack plus the result WITHOUT its dense
            # per-sample leaves — the renderers read event/grid values from
            # the pack (host.SampledEnv), and the filtered WAV ships as
            # device-normalized int16.  D2H per 16-file chunk drops from
            # ~25 MB of dense f32 rows to the pack's ~2 MB.
            env_np = filt_np = None
            res_np = jax.device_get(res_b._replace(
                floor=None, smoothed_deviation=None))
            pack_np = jax.device_get(pack_b)
        elif render:
            env_np = np.asarray(env_b)
            filt_np = None if filt_b is None else np.asarray(filt_b)
            res_np = jax.device_get(res_b)
        else:
            # No artifacts to draw: fetch only what render=False callers
            # (bench.py, fleet summaries) actually read — final peaks,
            # metrics, counts, status flags.  The dense (B, L) envelope /
            # filtered / floor rows and the capacity-shaped intermediates
            # (classifier trace, per-peak classes, pre-correction sets) stay
            # on device; on tunneled devices D2H runs at ~20 MB/s and the
            # full pytree is ~17 MB per 32-file chunk, so this trim is most
            # of the end-to-end win.  (results[...].floor/trace/classes are
            # None in this mode.)
            env_np = filt_np = None
            res_np = jax.device_get(res_b._replace(
                floor=None, trace=None, smoothed_deviation=None,
                classes=None, precorrection_classes=None,
                s1_positions=None, trough_positions=None,
                raw_peak_positions=None))
        nvd_np = np.asarray(nvd_b)
        t1 = time.perf_counter()
        _lane("compute_wait", t_ready - t0)
        _lane("d2h", t1 - t_ready)
        for slot, row in enumerate(ok_rows):
            orig = pairs[chunk[row]][1]
            res_i = _tree_row(res_np, slot)
            nv_dec = int(nvd_np[slot])
            beside = (pairs[chunk[row]][0]
                      if cfg.compat.filtered_wav_beside_input else None)
            try:
                if render and pack_np is not None:
                    pk = _tree_row(pack_np, slot)
                    if (pk.filt_i16 is not None
                            and cfg.preprocess.save_filtered_wav):
                        host.write_filtered_wav_i16(
                            pk.filt_i16[:nv_dec], new_rate, orig, output_dir,
                            beside_wav_path=beside)
                    env_view, floor_view = _pack_views(pk, res_i, nv_dec)
                    out = host.render_artifacts(
                        res_i._replace(floor=floor_view), cfg, env_view,
                        new_rate, orig, output_dir, hints[chunk[row]])
                    if out is not None:
                        # Callers get the same leaf contract as render=False
                        # for the dense arrays (the artifacts already hold
                        # the rendered views).
                        out = out._replace(floor=None)
                elif render:
                    if (filt_np is not None
                            and cfg.preprocess.save_filtered_wav):
                        host.save_filtered_wav(
                            filt_np[slot][:nv_dec], new_rate, orig, output_dir,
                            beside_wav_path=beside)
                    out = host.render_artifacts(
                        res_i, cfg, env_np[slot][:nv_dec], new_rate, orig,
                        output_dir, hints[chunk[row]])
                else:
                    host.check_overflow(res_i, orig)
                    out = res_i if bool(res_i.ok) else None
                results[orig] = out
            except Exception as e:
                logging.exception(f"post-processing failed for {orig}")
                post_errors.append((orig, str(e)))
        _lane("render", time.perf_counter() - t1)
        logging.debug("finish_chunk[%d files]: compute-wait %.3fs d2h %.3fs "
                      "render %.3fs", len(chunk), t_ready - t0, t1 - t_ready,
                      time.perf_counter() - t1)
        return post_errors

    # --- five-lane pipeline ----------------------------------------------------
    # Overlapped lanes, one single-worker pool each so chunk order (and with
    # it the result/error rosters) stays deterministic:
    #   decode thread: chunk k+2 decodes into a host buffer, while
    #   h2d thread:    chunk k+1 rides the (bandwidth-bound, tunneled) link,
    #   device:        chunk k computes (dispatch stays on the main thread,
    #                  enqueue-only, so the device queue never waits on a
    #                  result fetch), and
    #   fetch thread:  chunk k-1's results stream back D2H and render.
    # Decode look-ahead is bounded by buffer bytes so the antialias path
    # (full native-rate chunks, ~0.8 GB each) holds one buffer while the
    # compat path (host-decimated, ~6 MB) keeps the decoder continuously
    # busy.  Post-processing errors are merged in chunk order after the
    # futures resolve (staging errors first, then post-processing).
    if chunks:
        from collections import deque

        def _staged_rows(n_rows: int) -> int:
            # decode_chunk pads the batch up to the mesh dp size, so the
            # staged buffer can be larger than batch_bucket alone implies —
            # the look-ahead byte bound must see the same rounding.
            b = batch_bucket(n_rows, max_batch)
            if mesh is not None:
                b = -(-max(b, dp) // dp) * dp
            return b

        max_chunk_bytes = max(
            _staged_rows(len(c)) * bl * (2 if i16 else 4)
            for (_, bl, i16, _fir, c) in chunks)
        lookahead = max(1, min(3, int((256 << 20) // max(max_chunk_bytes, 1))))
        with ThreadPoolExecutor(max_workers=1) as decode_pool, \
                ThreadPoolExecutor(max_workers=1) as h2d_pool, \
                ThreadPoolExecutor(max_workers=1) as fetch_pool:
            dec: deque = deque()
            h2ds: deque = deque()
            next_decode = 0
            for _ in range(min(lookahead, len(chunks))):
                dec.append(decode_pool.submit(decode_chunk,
                                              *chunks[next_decode]))
                next_decode += 1
            h2ds.append(h2d_pool.submit(h2d_chunk, dec.popleft()))
            fetches = []
            for ci in range(len(chunks)):
                staged = h2ds.popleft().result()
                if next_decode < len(chunks):
                    dec.append(decode_pool.submit(decode_chunk,
                                                  *chunks[next_decode]))
                    next_decode += 1
                if dec:
                    h2ds.append(h2d_pool.submit(h2d_chunk, dec.popleft()))
                dispatched = dispatch_chunk(chunks[ci][0], staged)
                fetches.append(fetch_pool.submit(finish_chunk, chunks[ci][0],
                                                 dispatched))
            for f in fetches:
                errors.extend(f.result())

    return results, errors


@functools.partial(jax.jit,
                   static_argnames=("sample_rate", "cfg", "render_pack"))
def _analyze_prefiltered_batch(audio, hints, n_valid, sample_rate: int,
                               cfg: AnalyzerConfig, render_pack: bool = False):
    """Bucket runner for already-filtered inputs (``*_filtered_debug.wav``):
    envelope straight from the signal, no decimation (n_valid unchanged).
    The filtered leaf is None: serial mode deliberately writes no
    ``*_filtered_debug.wav`` for pre-filtered inputs (host.analyze_wav_file),
    and the batched path must match that artifact contract."""

    def one(x, h, nv):
        if jnp.issubdtype(x.dtype, jnp.integer):
            x = x.astype(jnp.dtype(cfg.runtime.dtype))  # exact (PCM16 values)
        env = envm.envelope_from_filtered(x, sample_rate, n_valid=nv)
        res = pipeline.analyze_envelope(env, sample_rate, cfg, h, n_valid=nv)
        if render_pack:
            return None, None, nv, res, _render_pack(env, res.floor, None,
                                                     res, nv)
        return env, None, nv, res, None

    return jax.vmap(one)(audio, hints, n_valid)
