"""End-to-end golden test: full device pipeline vs the reference's shipped
vulpine artifacts (SURVEY.md §4 test strategy)."""
import numpy as np
import jax.numpy as jnp
import pytest

from bpm_analysis_tpu import types
from bpm_analysis_tpu.config import DEFAULT_CONFIG
from bpm_analysis_tpu.models import envelope as envm, pipeline

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def result(oracle):
    env = envm.envelope_from_filtered(
        jnp.asarray(oracle["raw_signal"].astype(np.float64)), int(oracle["sample_rate"])
    )
    return pipeline.analyze_envelope(env, int(oracle["sample_rate"]), DEFAULT_CONFIG)


def test_pipeline_stage_outputs(oracle, result):
    assert bool(result.ok)
    assert int(result.trough_count) == len(oracle["sanitized_troughs"])
    assert int(result.raw_peak_count) == len(oracle["all_raw_peaks"])
    np.testing.assert_allclose(float(result.start_bpm), oracle["start_bpm"], rtol=1e-9)
    np.testing.assert_allclose(float(result.peak_bpm_time), oracle["peak_time"], rtol=1e-9)
    count = int(result.final_count)
    np.testing.assert_array_equal(
        np.asarray(result.final_positions)[:count], oracle["final_peaks"]
    )


def test_pipeline_classifications(oracle, result):
    n = len(oracle["all_raw_peaks"])
    got = np.asarray(result.classes)[:n]
    exp = types.labels_to_codes(oracle["final_labels"])
    mism = np.nonzero(got != exp)[0]
    assert mism.size == 0, f"{mism.size} mismatches"


def test_pipeline_bpm_csv_parity(oracle, result):
    """The headline artifact: BPM-vs-time curve vs the shipped golden CSV
    (values as printed at 3 decimals)."""
    import csv, os

    golden = os.path.join("/root/reference/samples", "vulpine_bpm_plot.csv")
    rows = list(csv.reader(open(golden)))[1:]
    gt = np.array([float(r[0]) for r in rows])
    gb = np.array([float(r[1]) for r in rows])

    m = result.metrics.bpm
    count = int(m.count)
    times = np.asarray(m.times)[:count]
    bpm = np.asarray(m.smoothed)[:count]
    keep = ~np.isnan(bpm)
    assert keep.sum() == len(gt)
    np.testing.assert_allclose(times[keep], gt, atol=5.1e-4)  # CSV has 3 decimals
    np.testing.assert_allclose(bpm[keep], gb, atol=5.1e-4)


def test_pipeline_bpm_mae(result):
    """North-star accuracy clause #2 (BASELINE.json): BPM MAE < 0.5 vs the
    CPU reference.  Computed against the shipped golden CSV
    (/root/reference/samples/vulpine_bpm_plot.csv) by evaluating our smoothed
    curve at the golden beat times.  The float64 path is value-exact, so this
    pins the metric itself (bench.py measures it per batch on TPU)."""
    import csv, os

    golden = os.path.join("/root/reference/samples", "vulpine_bpm_plot.csv")
    rows = list(csv.reader(open(golden)))[1:]
    gt = np.array([float(r[0]) for r in rows])
    gb = np.array([float(r[1]) for r in rows])

    m = result.metrics.bpm
    count = int(m.count)
    times = np.asarray(m.times)[:count]
    bpm = np.asarray(m.smoothed)[:count]
    keep = ~np.isnan(bpm)
    mae = float(np.mean(np.abs(np.interp(gt, times[keep], bpm[keep]) - gb)))
    assert mae < 0.5, f"BPM MAE {mae:.4f} >= 0.5"
    assert mae < 1e-3  # float64 path is value-exact up to CSV rounding


def test_pipeline_summary_metrics(oracle, result):
    m = result.metrics
    np.testing.assert_allclose(float(m.avg_bpm), 122.2, atol=0.05)
    np.testing.assert_allclose(float(m.min_bpm), 78.6, atol=0.05)
    np.testing.assert_allclose(float(m.max_bpm), 163.3, atol=0.05)
    np.testing.assert_allclose(float(m.avg_rmssdc), 117.97, atol=0.005)
    np.testing.assert_allclose(float(m.avg_sdnn), 70.29, atol=0.005)
    np.testing.assert_allclose(float(m.peak_exertion.slope), 3.35, atol=0.005)
    np.testing.assert_allclose(float(m.peak_recovery.slope), -3.11, atol=0.005)


def test_pipeline_float32():
    """The TPU production dtype: classification parity must stay near-exact
    in float32 (beat F1 target >= 0.99, BASELINE.md)."""
    oracle = np.load("tests/golden/vulpine_oracle.npz")
    env = envm.envelope_from_filtered(
        jnp.asarray(oracle["raw_signal"].astype(np.float32)), int(oracle["sample_rate"])
    )
    res = pipeline.analyze_envelope(env, int(oracle["sample_rate"]), DEFAULT_CONFIG)
    count = int(res.final_count)
    got = set(np.asarray(res.final_positions)[:count].tolist())
    exp = set(oracle["final_peaks"].tolist())
    inter = len(got & exp)
    precision = inter / max(len(got), 1)
    recall = inter / len(exp)
    f1 = 2 * precision * recall / (precision + recall)
    assert f1 >= 0.99, f"float32 beat F1 {f1:.4f} (got {len(got)} peaks, exp {len(exp)})"
