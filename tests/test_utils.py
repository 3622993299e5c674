"""Utils: metrics logger, span timer, figure dumps."""
import json
import os

import numpy as np

from mm_masking_tpu.train.metrics import MetricsLogger
from mm_masking_tpu.utils.profiling import SpanTimer
from mm_masking_tpu.utils.visualize import (
    save_mask_image,
    save_pointclouds,
    save_weighted_scan,
)


def test_metrics_logger_jsonl_and_arrays(tmp_path):
    log = MetricsLogger(str(tmp_path), run_name="t", verbose=False)
    log.log("epoch", {"epoch": 0, "loss": 1.5, "arr0d": np.float32(2.0)})
    log.log("final", {"norm": 0.1})
    path = log.log_array("mask", np.ones((4, 4)), step=3)
    log.close()
    lines = [json.loads(l) for l in open(log.path)]
    assert lines[0]["event"] == "epoch" and lines[0]["loss"] == 1.5
    assert lines[0]["arr0d"] == 2.0  # scalars converted to plain python
    assert lines[1]["event"] == "final"
    assert os.path.exists(path)
    np.testing.assert_array_equal(np.load(path), np.ones((4, 4)))


def test_span_timer():
    t = SpanTimer()
    with t.span("load", n_samples=4):
        pass
    with t.span("load", n_samples=4):
        pass
    s = t.summary()
    assert "load_total_s" in s and "load_per_sample_s" in s
    assert t.counts["load"] == 8


def test_visualize_dumps(tmp_path):
    rng = np.random.default_rng(0)
    d = str(tmp_path)
    p1 = save_mask_image(rng.uniform(size=(16, 16)), d, "mask")
    scan = rng.normal(size=(50, 3)).astype(np.float32)
    mp = rng.normal(size=(80, 3)).astype(np.float32)
    p2 = save_pointclouds(scan, mp, d, "pc")
    p3 = save_weighted_scan(scan, rng.uniform(size=50).astype(np.float32), d, "w")
    for p in (p1, p2, p3):
        assert os.path.exists(p) and os.path.getsize(p) > 0
