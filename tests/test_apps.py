"""App-layer tests: CLI plumbing, labeler persistence/pairing, web batch."""
import json
import os
import threading
import urllib.request

import numpy as np
import pytest

from bpm_analysis_tpu.apps import labeler
from bpm_analysis_tpu.apps.cli import build_parser
from bpm_analysis_tpu.io import wav as wavio
from bpm_analysis_tpu.reports import settings


def test_cli_parser():
    args = build_parser().parse_args(["a.wav", "b.mp3", "--bpm-hint", "120",
                                      "--pre-filtered"])
    assert args.files == ["a.wav", "b.mp3"]
    assert args.bpm_hint == 120.0
    assert args.pre_filtered


def test_settings_roundtrip(tmp_path):
    settings.save(str(tmp_path), "rec", 123.5)
    assert settings.load_hint(str(tmp_path), "rec") == 123.5
    settings.save(str(tmp_path), "rec2", None)
    assert settings.load_hint(str(tmp_path), "rec2") is None
    assert settings.load_hint(str(tmp_path), "missing") is None


def test_labeler_pairing_and_groups():
    labels = [
        {"time": 1.0, "bpm": 100.0, "type": "S1"},
        {"time": 1.3, "bpm": 100.0, "type": "S2"},
        {"time": 2.0, "bpm": 101.0, "type": "S1"},
        {"time": 2.3, "bpm": 101.0, "type": "S2"},
        # gap > 3s -> new group
        {"time": 9.0, "bpm": 110.0, "type": "S1"},
        {"time": 9.4, "bpm": 110.0, "type": "S2"},
    ]
    pairs = labeler.s1_s2_pairs(labels)
    assert len(pairs) == 3
    np.testing.assert_allclose(pairs[0][2], 0.3)
    # Reference grouping (heartbeat_labeler.py:244-308): S1 gaps < 5 s chain
    # a group; the lone trailing S1 forms a single-S1 group that is skipped.
    groups = labeler.group_stats(labels)
    assert len(groups) == 1
    assert groups[0]["s1_count"] == 2
    np.testing.assert_allclose(groups[0]["avg_delta_t"], 0.3)


def test_labeler_save_load_roundtrip(tmp_path):
    labels = [
        {"time": 1.0, "bpm": 100.0, "type": "S1"},
        {"time": 1.3, "bpm": 100.0, "type": "S2"},
    ]
    labeler.save_labels(str(tmp_path), "rec", labels)
    path = tmp_path / "rec_labels.csv"
    text = path.read_text()
    assert "# Peak Labels" in text
    assert "# S1-S2 Intervals" in text
    loaded = labeler.load_labels(str(tmp_path), "rec")
    assert loaded == [{"time": 1.0, "bpm": 100.0, "type": "S1"},
                      {"time": 1.3, "bpm": 100.0, "type": "S2"}]


def test_labeler_http_server(tmp_path):
    # Minimal artifact set for one recording.
    sr = 302
    sig = (np.sin(np.arange(sr * 5) * 0.3) * 1000).astype(np.int16)
    wavio.write(str(tmp_path / "rec_filtered_debug.wav"), sr, sig)
    (tmp_path / "rec_bpm_plot.csv").write_text(
        "Time (s),Average BPM\n1.000,100.000\n2.000,101.000\n")

    labeler.Handler.directory = str(tmp_path)
    server = labeler.ThreadingHTTPServer(("127.0.0.1", 0), labeler.Handler)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        files = json.load(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/api/files"))
        assert files == ["rec"]
        data = json.load(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/api/data?file=rec"))
        assert data["sr"] == sr and len(data["env"]) > 100
        assert data["bpm_t"] == [1.0, 2.0]
        body = json.dumps({"file": "rec", "labels": [
            {"time": 1.0, "bpm": 100.0, "type": "S1"},
            {"time": 1.25, "bpm": 100.0, "type": "S2"},
            {"time": 2.0, "bpm": 100.0, "type": "S1"},
            {"time": 2.25, "bpm": 100.0, "type": "S2"}]}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/save", data=body,
            headers={"Content-Type": "application/json"})
        out = json.load(urllib.request.urlopen(req))
        assert os.path.exists(out["saved"])
        assert out["groups"][0]["n_pairs"] == 2
    finally:
        server.shutdown()


def test_webapp_batch_no_files():
    from bpm_analysis_tpu.apps import webapp

    status, artifacts, plots, summaries = webapp.process_audio_batch([], 0)
    assert "No files" in status and artifacts == []


def test_webapp_remote_upload_cache(tmp_path, monkeypatch):
    """The gated HF-Hub upload checkpoint (reference hugging-face-space/
    app.py:14-36): skip without a token, skip already-cached files, upload
    otherwise — exercised via an injected huggingface_hub stub (no network
    egress here)."""
    import sys
    import types as pytypes

    from bpm_analysis_tpu.apps import webapp

    f = tmp_path / "a.wav"
    f.write_bytes(b"RIFF")

    # No token -> skipped before any import.
    assert "HF_TOKEN" in webapp.cache_file_remote(str(f), "r/p", None)

    calls = {"exists": [], "uploads": []}

    class _Api:
        def file_exists(self, repo_id, filename, repo_type, token):
            calls["exists"].append((repo_id, filename, repo_type))
            return filename == "cached.wav"

        def upload_file(self, path_or_fileobj, path_in_repo, repo_id, token,
                        repo_type):
            calls["uploads"].append((path_or_fileobj, path_in_repo, repo_id,
                                     repo_type))

    hub = pytypes.ModuleType("huggingface_hub")
    hub.HfApi = _Api
    monkeypatch.setitem(sys.modules, "huggingface_hub", hub)

    assert webapp.cache_file_remote(str(f), "user/repo", "tok") is None
    assert calls["uploads"] == [(str(f), "a.wav", "user/repo", "dataset")]

    cached = tmp_path / "cached.wav"
    cached.write_bytes(b"RIFF")
    assert "already cached" in webapp.cache_file_remote(str(cached), "user/repo", "tok")
    assert len(calls["uploads"]) == 1  # no re-upload


def test_labeler_range_average():
    labels = [
        {"time": 1.0, "bpm": 100.0, "type": "S1"},
        {"time": 1.3, "bpm": 100.0, "type": "S2"},
        {"time": 2.0, "bpm": 104.0, "type": "S1"},
        {"time": 2.4, "bpm": 104.0, "type": "S2"},
        {"time": 9.0, "bpm": 110.0, "type": "S1"},
        {"time": 9.5, "bpm": 110.0, "type": "S2"},
    ]
    # Range covering the first two pairs only (S1 time filter, reference
    # heartbeat_labeler.py:219-243).
    avg_dt, avg_bpm, pairs = labeler.avg_delta_t_in_range(labels, 0.5, 2.5)
    assert len(pairs) == 2
    np.testing.assert_allclose(avg_dt, (0.3 + 0.4) / 2)
    np.testing.assert_allclose(avg_bpm, 102.0)
    # Empty range
    avg_dt, avg_bpm, pairs = labeler.avg_delta_t_in_range(labels, 3.0, 8.0)
    assert avg_dt is None and pairs == []


def test_labeler_group_stats_reference_semantics():
    # Groups split on >=5 s gaps between consecutive S1 peaks; single-S1
    # groups skipped (heartbeat_labeler.py:244-308).
    labels = [
        {"time": 1.0, "bpm": 100.0, "type": "S1"},
        {"time": 1.3, "bpm": 100.0, "type": "S2"},
        {"time": 2.0, "bpm": 104.0, "type": "S1"},
        {"time": 2.4, "bpm": 104.0, "type": "S2"},
        # 5s gap -> new group, but alone -> skipped
        {"time": 9.0, "bpm": 110.0, "type": "S1"},
        {"time": 9.5, "bpm": 110.0, "type": "S2"},
    ]
    groups = labeler.group_stats(labels, gap_threshold=5.0)
    assert len(groups) == 1
    g = groups[0]
    assert g["s1_count"] == 2 and g["n_pairs"] == 2
    np.testing.assert_allclose(g["avg_delta_t"], 0.35)
    np.testing.assert_allclose(g["avg_bpm"], 102.0)


def test_labeler_range_avg_http(tmp_path):
    import json as jsonlib
    import threading
    import urllib.request

    labeler.Handler.directory = str(tmp_path)
    server = labeler.ThreadingHTTPServer(("127.0.0.1", 0), labeler.Handler)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        payload = jsonlib.dumps({
            "labels": [
                {"time": 1.0, "bpm": 100.0, "type": "S1"},
                {"time": 1.25, "bpm": 100.0, "type": "S2"},
            ],
            "start": 0.0, "end": 2.0,
        }).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/range_avg", data=payload,
            headers={"Content-Type": "application/json"})
        out = jsonlib.loads(urllib.request.urlopen(req, timeout=10).read())
        np.testing.assert_allclose(out["avg_delta_t"], 0.25)
        assert out["n_pairs"] == 1
    finally:
        server.shutdown()


def test_gui_hint_precedence(tmp_path):
    from bpm_analysis_tpu.apps.gui import BPMApp
    from bpm_analysis_tpu.reports import settings as settings_mod

    # No saved hint -> the global hint applies.
    assert BPMApp.resolve_hint(str(tmp_path), "a/rec.wav", 77.0) == 77.0
    # A saved per-file hint takes precedence over the global one.
    settings_mod.save(str(tmp_path), "rec", 123.0)
    assert BPMApp.resolve_hint(str(tmp_path), "a/rec.wav", 77.0) == 123.0
    # Other files keep the global hint.
    assert BPMApp.resolve_hint(str(tmp_path), "other.wav", 77.0) == 77.0


def test_gui_headless_smoke(tmp_path, monkeypatch):
    """Construct the Tk app headlessly (skipped when no display/Tk)."""
    tk = pytest.importorskip("tkinter")
    try:
        root = tk.Tk()
    except Exception:
        pytest.skip("no Tk display available")
    from bpm_analysis_tpu.apps.gui import BPMApp, UIMessage, UIMessageType

    monkeypatch.chdir(tmp_path)
    app = BPMApp(root, output_directory=str(tmp_path / "out"))
    assert app.current_files == []
    app.status_var.set("x")
    app.log_queue.put(UIMessage(UIMessageType.STATUS, "hello"))
    app._poll_queue()
    assert app.status_var.get() == "hello"
    # Analyze with no files selected -> friendly status, no worker.
    app.start_analysis()
    assert app.worker is None
    assert "No files" in app.status_var.get()
    root.destroy()


def test_zipapp_build(tmp_path):
    """One-file distribution (reference BPM_Analyzer.spec analog): the .pyz
    builds and its embedded CLI parser responds."""
    import subprocess
    import sys as _sys

    _sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import build_zipapp

    out = build_zipapp.build(str(tmp_path / "bpm-analyzer.pyz"))
    assert os.path.getsize(out) > 10_000
    res = subprocess.run([_sys.executable, out, "--help"],
                         capture_output=True, text=True, timeout=120)
    assert res.returncode == 0
    assert "bpm-analyze" in res.stdout
