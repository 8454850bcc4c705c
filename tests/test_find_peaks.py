import numpy as np
import jax.numpy as jnp
import pytest
from scipy.signal import find_peaks as scipy_find_peaks, peak_prominences as scipy_proms

from bpm_analysis_tpu.ops import find_peaks as fp


def _positions(res):
    count = int(res.count)
    return np.asarray(res.positions)[:count]


def test_local_maxima_with_plateaus():
    x = np.array([0, 1, 0, 2, 2, 2, 0, 3, 3, 0, 1, 1], dtype=float)
    expected, _ = scipy_find_peaks(x)
    mask = np.asarray(fp.local_maxima_mask(jnp.asarray(x)))
    np.testing.assert_array_equal(np.nonzero(mask)[0], expected)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_signals_all_filters(seed):
    rng = np.random.RandomState(seed)
    x = np.cumsum(rng.randn(2000))
    x += 0.3 * rng.randn(2000)
    height = np.full_like(x, np.quantile(x, 0.3))
    prom = 0.5
    dist = 7
    expected, _ = scipy_find_peaks(x, height=height, prominence=prom, distance=dist)
    got = _positions(fp.find_peaks(jnp.asarray(x), 1024, height=jnp.asarray(height),
                                   prominence=prom, distance=dist))
    np.testing.assert_array_equal(got, expected)


def test_prominences_match_scipy():
    rng = np.random.RandomState(3)
    x = np.cumsum(rng.randn(1000))
    peaks, _ = scipy_find_peaks(x)
    expected = scipy_proms(x, peaks)[0]
    cap = 512
    pos = np.full(cap, len(x) - 1)
    pos[: len(peaks)] = peaks
    valid = np.arange(cap) < len(peaks)
    got = np.asarray(fp.peak_prominences(jnp.asarray(x), jnp.asarray(pos), jnp.asarray(valid)))
    np.testing.assert_allclose(got[: len(peaks)], expected, rtol=1e-12)


def test_distance_tie_breaking():
    # Equal heights within distance: scipy keeps the *later* one.
    x = np.array([0, 5, 0, 5, 0], dtype=float)
    expected, _ = scipy_find_peaks(x, distance=3)
    got = _positions(fp.find_peaks(jnp.asarray(x), 8, distance=3))
    np.testing.assert_array_equal(got, expected)


@pytest.mark.slow
def test_raw_peaks_on_vulpine(oracle):
    """Raw peak finding: height = dynamic noise floor, prominence = envelope
    quantile, distance = 0.05 s (reference bpm_analysis.py:223-229)."""
    env = oracle["envelope"]
    sr = int(oracle["sample_rate"])
    floor = oracle["noise_floor"]
    prom = np.quantile(env, 0.1)
    dist = int(0.05 * sr)
    got = _positions(
        fp.find_peaks(jnp.asarray(env), 4096, height=jnp.asarray(floor),
                      prominence=prom, distance=dist)
    )
    np.testing.assert_array_equal(got, oracle["all_raw_peaks"])


def test_troughs_on_vulpine(oracle):
    """Trough finding on the negated envelope (bpm_analysis.py:1070)."""
    env = oracle["envelope"]
    sr = int(oracle["sample_rate"])
    prom = np.quantile(env, 0.1)
    dist = int(0.05 * sr)
    got = _positions(fp.find_peaks(jnp.asarray(-env), 4096, prominence=prom, distance=dist))
    np.testing.assert_array_equal(got, oracle["all_troughs"])


# --- extrema-domain prominence backend ------------------------------------

def _signals_for_extrema(seed):
    rng = np.random.RandomState(seed)
    n = 1500
    yield rng.randn(n)                                     # generic
    yield np.round(rng.randn(n) * 3) / 3                   # plateaus + ties
    yield np.sin(np.linspace(0, 40, n)) + 0.3 * rng.randn(n)
    spiky = np.abs(rng.randn(n)); spiky[::7] *= 3
    yield spiky


@pytest.mark.parametrize("seed", [
    pytest.param(0, marks=pytest.mark.slow),  # twin coverage per tier:
    1,                                        # seed 1 stays fast
])
def test_extrema_prominence_matches_dense(seed):
    """extrema_prominences is bit-identical to the dense descent path (same
    mins over the same sets) in both orientations, including plateau and
    equal-height signals."""
    for x in _signals_for_extrema(seed):
        x = x.astype(np.float64)
        prom_t = max(float(np.quantile(x, 0.3)), 1e-9)
        ext = fp.build_extrema(jnp.asarray(x), 1024)
        for sgn, neg in ((1.0, False), (-1.0, True)):
            xs = jnp.asarray(sgn * x)
            dense = fp.find_peaks(xs, 512, prominence=prom_t, distance=7)
            got = fp.find_peaks(xs, 512, prominence=prom_t, distance=7,
                                extrema=ext, extrema_negated=neg,
                                prominence_sweep_window=8,
                                prominence_residual_capacity=128)
            np.testing.assert_array_equal(_positions(got), _positions(dense))
            assert not bool(got.overflowed)


def test_extrema_prominence_values_match_scipy():
    rng = np.random.RandomState(5)
    x = np.round(np.cumsum(rng.randn(1200)) * 2) / 2      # drifting + plateaus
    peaks, _ = scipy_find_peaks(x, distance=5)
    expected = scipy_proms(x, peaks)[0]
    cap = 512
    pos = np.full(cap, len(x) - 1)
    pos[: len(peaks)] = peaks
    valid = np.arange(cap) < len(peaks)
    ext = fp.build_extrema(jnp.asarray(x), 1024)
    got, ovf = fp.extrema_prominences(ext, jnp.asarray(pos), jnp.asarray(valid),
                                      sweep_window=8, residual_capacity=256)
    assert not bool(ovf)
    np.testing.assert_array_equal(np.asarray(got)[: len(peaks)], expected)


def test_extrema_residual_overflow_flag():
    """Monotone-ascending peak heights leave every peak unresolved by the
    sweep; residual slots beyond capacity must raise the overflow flag (the
    truncate-with-flag contract) instead of failing silently."""
    n = 600
    x = np.zeros(n)
    x[1::4] = np.arange(1, len(x[1::4]) + 1)               # ascending spikes
    ext = fp.build_extrema(jnp.asarray(x), 1024)
    peaks, _ = scipy_find_peaks(x)
    cap = 256
    pos = np.full(cap, n - 1)
    pos[: len(peaks)] = peaks
    valid = np.arange(cap) < len(peaks)
    _, ovf_small = fp.extrema_prominences(ext, jnp.asarray(pos), jnp.asarray(valid),
                                          sweep_window=4, residual_capacity=16)
    assert bool(ovf_small)
    got, ovf_ok = fp.extrema_prominences(ext, jnp.asarray(pos), jnp.asarray(valid),
                                         sweep_window=4, residual_capacity=256)
    assert not bool(ovf_ok)
    np.testing.assert_array_equal(np.asarray(got)[: len(peaks)],
                                  scipy_proms(x, peaks)[0])


def test_compact_slots_capacity_exceeds_axis():
    """capacity > input axis: top_k clamps to the axis and pads with fills."""
    keep = jnp.asarray([True, False, True, True])
    arr = jnp.asarray([10, 20, 30, 40], jnp.int32)
    (out,), count, over = fp.compact_slots(keep, 8, [(arr, jnp.int32(-1))])
    np.testing.assert_array_equal(np.asarray(out), [10, 30, 40, -1, -1, -1, -1, -1])
    assert int(count) == 3 and not bool(over)


def test_compact_mask_small_n_large_capacity():
    mask = jnp.asarray([False, True, False, True, True])
    pk = fp._compact_mask(mask, 16)
    np.testing.assert_array_equal(np.asarray(pk.positions)[:3], [1, 3, 4])
    assert int(pk.count) == 3 and not bool(pk.overflowed)
    assert np.all(np.asarray(pk.positions)[3:] == 5)


@pytest.mark.slow
def test_distance_nms_tie_oracle_fuzz():
    """The sort-free NMS (lexicographic (priority, slot) window max) must
    reproduce the deterministic greedy convention exactly — descending
    priority, equal priorities toward the later slot — including under heavy
    ties.  Oracle: the literal sequential greedy suppression."""
    import math

    def oracle_nms(pos, prio, dist):
        d = math.ceil(dist)
        order = sorted(range(len(pos)), key=lambda i: (-prio[i], -i))
        keep = np.zeros(len(pos), bool)
        alive = np.ones(len(pos), bool)
        for i in order:
            if not alive[i]:
                continue
            keep[i] = True
            for j in range(len(pos)):
                if j != i and alive[j] and abs(int(pos[j]) - int(pos[i])) < d:
                    alive[j] = False
        return keep

    rng = np.random.default_rng(7)
    cap = 64
    # fixed set: one compile per distance; 70.0 exercises the wide-window
    # sparse-table branch (win > 32), the others the sort-free branch
    for dist in (2.0, 7.0, 19.0, 33.0, 70.0):
        for _ in range(8):
            n = int(rng.integers(5, 60))
            pos = np.sort(rng.choice(1500, size=n, replace=False)).astype(np.int32)
            prio = rng.integers(0, 3, size=n).astype(np.float32)  # heavy ties
            p = jnp.full((cap,), 1500, jnp.int32).at[:n].set(pos)
            pr = jnp.full((cap,), -np.inf, jnp.float32).at[:n].set(prio)
            valid = jnp.arange(cap) < n
            keep = np.asarray(fp._select_by_distance(p, pr, valid, dist))[:n]
            np.testing.assert_array_equal(keep, oracle_nms(pos, prio, dist))
