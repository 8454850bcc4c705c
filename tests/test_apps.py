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
    groups = labeler.group_stats(labels)
    assert len(groups) == 2
    np.testing.assert_allclose(groups[1]["avg_delta_t"], 0.4)


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
            {"time": 1.25, "bpm": 100.0, "type": "S2"}]}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/save", data=body,
            headers={"Content-Type": "application/json"})
        out = json.load(urllib.request.urlopen(req))
        assert os.path.exists(out["saved"])
        assert out["groups"][0]["n_pairs"] == 1
    finally:
        server.shutdown()


def test_webapp_batch_no_files():
    from bpm_analysis_tpu.apps import webapp

    status, artifacts, plots, summaries = webapp.process_audio_batch([], 0)
    assert "No files" in status and artifacts == []
