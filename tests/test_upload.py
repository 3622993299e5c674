"""Remote experiment upload seam (the reference's Neptune surface).

The reference streams per-epoch scalars + checkpoint files to Neptune
(`/root/reference/mm_masking/train_icp_weights.py:347-352,570-579`). The
rebuild's `utils/upload.py` provides the same capability vendor-free: plain
HTTP POST of JSON records, disabled unless MM_UPLOAD_URL is set, and
failures never propagate into training.
"""
from __future__ import annotations

import base64
import json
import os
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np
import pytest

from mm_masking_tpu.train.metrics import MetricsLogger
from mm_masking_tpu.utils.upload import ExperimentUploader


class _Collector(BaseHTTPRequestHandler):
    received: list = []

    def do_POST(self):
        body = self.rfile.read(int(self.headers["Content-Length"]))
        type(self).received.append(json.loads(body))
        self.send_response(200)
        self.end_headers()

    def log_message(self, *a):  # silence request lines in pytest output
        pass


@pytest.fixture()
def collector():
    _Collector.received = []
    srv = HTTPServer(("127.0.0.1", 0), _Collector)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/", _Collector.received
    srv.shutdown()


def test_disabled_without_url(monkeypatch):
    monkeypatch.delenv("MM_UPLOAD_URL", raising=False)
    up = ExperimentUploader()
    assert not up.enabled
    assert up.log_event("r", {"a": 1}) is False  # hard no-op


def test_events_params_and_files_arrive(collector, tmp_path):
    url, received = collector
    up = ExperimentUploader(url=url)
    assert up.enabled

    assert up.log_params("run1", {"lr": 3e-4})
    assert up.log_event("run1", {"event": "epoch", "loss": 0.5})
    p = tmp_path / "mask.npy"
    np.save(p, np.arange(4.0))
    assert up.upload_file("run1", str(p))

    kinds = [r["kind"] for r in received]
    assert kinds == ["params", "event", "file"]
    assert received[0]["params"]["lr"] == 3e-4
    assert received[1]["record"]["loss"] == 0.5
    blob = base64.b64decode(received[2]["data"])
    (tmp_path / "back.npy").write_bytes(blob)
    np.testing.assert_array_equal(np.load(tmp_path / "back.npy"), np.arange(4.0))


def test_upload_dir_ships_regular_files(collector, tmp_path):
    url, received = collector
    (tmp_path / "a.bin").write_bytes(b"x")
    (tmp_path / "b.bin").write_bytes(b"y")
    (tmp_path / "sub").mkdir()
    n = ExperimentUploader(url=url).upload_dir("run", str(tmp_path))
    assert n == 2
    assert sorted(r["name"] for r in received) == ["a.bin", "b.bin"]


def test_dead_collector_degrades_silently(tmp_path):
    # Port 9 (discard) refuses; after max_failures the uploader disables
    # itself, and no exception ever reaches the caller (the trainer must
    # survive a dead collector — unlike the reference, where Neptune
    # outages kill the run).
    up = ExperimentUploader(url="http://127.0.0.1:9/", timeout=0.2,
                            max_failures=2)
    assert up.log_event("r", {"a": 1}) is False
    assert up.log_event("r", {"a": 2}) is False
    assert not up.enabled  # gave up
    assert up.log_event("r", {"a": 3}) is False  # no network attempt


def test_metrics_logger_streams_records(collector, tmp_path, monkeypatch):
    url, received = collector
    monkeypatch.setenv("MM_UPLOAD_URL", url)
    log = MetricsLogger(str(tmp_path), run_name="runX")
    log.log("epoch", {"epoch": 0, "loss": 1.25})
    art = log.log_array("mask", np.zeros((2, 2)), step=0)
    log.close()

    # Local JSONL stays the source of truth...
    rows = [json.loads(l) for l in open(log.path)]
    assert rows[0]["loss"] == 1.25
    assert os.path.exists(art)
    # ...and the same records arrived remotely.
    assert received[0]["kind"] == "event"
    assert received[0]["record"]["loss"] == 1.25
    assert received[1]["kind"] == "file"
    assert received[1]["name"] == "mask_0.npy"


def test_metrics_logger_no_url_no_network(tmp_path, monkeypatch):
    monkeypatch.delenv("MM_UPLOAD_URL", raising=False)
    log = MetricsLogger(str(tmp_path), run_name="runY", verbose=False)
    assert not log.uploader.enabled
    log.log("epoch", {"loss": 0.1})
    log.close()
    assert json.loads(open(log.path).read())["loss"] == 0.1
