"""dp-mesh sharding parity of the batched front-end.

Split out of test_host_batch.py so the slow tier's per-file process
isolation (tests/conftest.py) also bounds per-file wall-clock: each of these
compiles several full-pipeline programs, and together with the rest of the
batched-front-end suite they exceeded a 10-minute budget on a 1-core host.
"""

import os

import numpy as np
import pytest

from bpm_analysis_tpu import host_batch
from bpm_analysis_tpu.config import AnalyzerConfig, RuntimeConfig

from test_host_batch import CFG, make_wav, _normalized, _assert_log_equal, ARTIFACTS

pytestmark = pytest.mark.slow

def test_batched_mesh_parity(tmp_path):
    """`analyze_files_batched(mesh=...)` — the dp-sharded batched front-end —
    must produce the same artifacts as the unsharded path on a mixed-length
    mini-fleet (batch buckets pad up to the dp size; padding rows are
    discarded)."""
    import jax
    from jax.sharding import Mesh

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = Mesh(np.array(devs[:4]), ("dp",))

    src = tmp_path / "src"
    src.mkdir()
    seconds = [21.0, 34.5, 22.8]
    files = []
    for i, sec in enumerate(seconds):
        p = str(src / f"rec{i}.wav")
        make_wav(p, sec, seed=70 + i, bpm=92.0 + 8 * i)
        files.append(p)

    plain_dir = str(tmp_path / "plain")
    results_p, errors_p = host_batch.analyze_files_batched(
        files, CFG, plain_dir, max_batch=4, min_bucket=1 << 13)
    mesh_dir = str(tmp_path / "mesh")
    results_m, errors_m = host_batch.analyze_files_batched(
        files, CFG, mesh_dir, max_batch=4, min_bucket=1 << 13, mesh=mesh)
    assert errors_p == [] and errors_m == []
    assert set(results_m) == set(files)

    for i in range(len(files)):
        for suffix in ARTIFACTS:
            a = os.path.join(plain_dir, f"rec{i}{suffix}")
            b = os.path.join(mesh_dir, f"rec{i}{suffix}")
            assert os.path.exists(b), b
            if suffix == "_Debug_Log.md":
                # Same amplitude-display tolerance as serial-vs-batched:
                # the sharded compilation may block f32 sums differently.
                _assert_log_equal(a, b, f"rec{i}{suffix}")
            else:
                assert _normalized(a) == _normalized(b), \
                    f"artifact mismatch: rec{i}{suffix}"
