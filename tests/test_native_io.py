"""Native C++ WAV decoder vs the pure-numpy decoder and scipy."""
import numpy as np
import pytest

from bpm_analysis_tpu.io import native, wav as pywav


@pytest.fixture(scope="module")
def built():
    if not native.available():
        pytest.skip("native library unavailable (no compiler?)")


def test_decode_matches_numpy_int16(built, tmp_path):
    rng = np.random.RandomState(0)
    sig = (rng.randn(5000) * 10000).astype(np.int16)
    path = str(tmp_path / "a.wav")
    pywav.write(path, 302, sig)
    sr, mono = native.decode_mono_f32(path, 10000)
    assert sr == 302
    np.testing.assert_allclose(mono, sig.astype(np.float32))


def test_decode_matches_numpy_stereo_float(built, tmp_path):
    rng = np.random.RandomState(1)
    sig = rng.randn(1000, 2).astype(np.float32)
    path = str(tmp_path / "b.wav")
    pywav.write(path, 44100, sig)
    sr, mono = native.decode_mono_f32(path, 10000)
    assert sr == 44100
    np.testing.assert_allclose(mono, sig.mean(axis=1), rtol=1e-6)


def test_decode_matches_scipy_on_vulpine(built):
    from scipy.io import wavfile

    path = "/root/reference/samples/vulpine_filtered_debug.wav"
    sr_ref, data_ref = wavfile.read(path)
    sr, mono = native.decode_mono_f32(path, 200000)
    assert sr == sr_ref
    np.testing.assert_allclose(mono, data_ref.astype(np.float32))


def test_batch_decode_parallel(built, tmp_path):
    rng = np.random.RandomState(2)
    paths = []
    sigs = []
    for i in range(8):
        sig = (rng.randn(1000 + i * 100) * 1000).astype(np.int16)
        p = str(tmp_path / f"r{i}.wav")
        pywav.write(p, 302, sig)
        paths.append(p)
        sigs.append(sig)
    paths.append(str(tmp_path / "missing.wav"))  # failure isolation
    buf, rates, lengths = native.decode_batch_f32(paths, 2000)
    for i, sig in enumerate(sigs):
        n = min(len(sig), 2000)
        assert lengths[i] == n
        np.testing.assert_allclose(buf[i, :n], sig[:n].astype(np.float32))
        assert np.all(buf[i, n:] == 0)
    assert lengths[-1] == 0


@pytest.mark.parametrize("stride,channels,dtype", [
    (7, 1, np.int16), (146, 1, np.int16), (5, 2, np.float32), (3, 3, np.int16),
])
def test_strided_decode_equals_slice(built, tmp_path, stride, channels, dtype):
    rng = np.random.RandomState(3)
    n = 40000
    if channels == 1:
        sig = (rng.randn(n) * 1000).astype(dtype)
    else:
        sig = (rng.randn(n, channels) * 1000).astype(dtype)
    p = str(tmp_path / f"s{stride}_{channels}.wav")
    pywav.write(p, 44100, sig)
    full = pywav.to_mono(sig).astype(np.float32)
    sr, mono = native.decode_mono_f32(p, n, stride)
    assert sr == 44100
    np.testing.assert_allclose(mono, full[::stride], rtol=1e-6)


def test_batch_strided_decode_into_caller_buffer(built, tmp_path):
    rng = np.random.RandomState(4)
    paths, refs, strides = [], [], [1, 4, 9]
    for i, s in enumerate(strides):
        sig = (rng.randn(9000 + 500 * i) * 1000).astype(np.int16)
        p = str(tmp_path / f"b{i}.wav")
        pywav.write(p, 302, sig)
        paths.append(p)
        refs.append(sig.astype(np.float32)[::s])
    out = np.full((4, 10000), 7.0, np.float32)  # extra row + dirty fill
    buf, rates, lengths = native.decode_batch_f32(paths, 10000,
                                                  strides=strides, out=out)
    assert buf is out
    for i, ref in enumerate(refs):
        assert lengths[i] == len(ref)
        np.testing.assert_allclose(out[i, : len(ref)], ref)
        assert np.all(out[i, len(ref):] == 0)  # tail zeroed, not dirty


def test_fir_decode_matches_device_fir(built, tmp_path):
    """decode_batch_fir (streaming C++ FIR) == the device FIR
    (ops/filter.fir_decimate) == the numpy fallback, to float32 rounding —
    the host half of the antialias decimation path."""
    import jax
    import jax.numpy as jnp

    from bpm_analysis_tpu.ops.filter import fir_decimate

    rng = np.random.RandomState(11)
    sr, factor = 4830, 15
    sig = (rng.randn(sr * 4) * 1000).astype(np.float32)
    sig += 4000 * np.sin(2 * np.pi * 900 * np.arange(sr * 4) / sr).astype(np.float32)
    q = np.int16(np.clip(sig, -32768, 32767))
    p = str(tmp_path / "fir.wav")
    pywav.write(p, sr, q)
    mono = q.astype(np.float32)

    out, rates, lengths = native.decode_batch_fir([p], 4096, [factor])
    n = int(lengths[0])
    assert rates[0] == sr and n == -(-len(mono) // factor)

    dev = np.asarray(fir_decimate(jnp.asarray(mono), factor))
    scale = np.abs(dev).max()
    np.testing.assert_allclose(out[0][:n], dev[:n], atol=2e-5 * scale)

    ref = native._fir_decimate_np(mono, factor)
    np.testing.assert_allclose(out[0][:n], ref[:n], atol=2e-5 * scale)
    # Tail past the decoded length stays zero (staging contract).
    assert np.all(out[0][n:] == 0)
