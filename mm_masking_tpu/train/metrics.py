"""Metrics logging: JSONL scalars + stdout (replaces the reference's Neptune).

The reference logs ~20 scalars per epoch plus image artifacts to Neptune
(`/root/reference/mm_masking/train_icp_weights.py:347-352,570-579`; SURVEY.md
§5). Here every scalar goes to a `metrics.jsonl` stream (one JSON object per
event) that any dashboard can tail; mask/BEV images can be dumped as `.npy`
artifacts on demand. No network dependency by default; setting
``MM_UPLOAD_URL`` additionally streams every record to a remote HTTP
collector via `mm_masking_tpu.utils.upload` (the reference's remote-
experiment-tracking capability, vendor-free).
"""
from __future__ import annotations

import json
import os
import time
from typing import Any, Mapping

import numpy as np

from mm_masking_tpu.utils.upload import ExperimentUploader


def _to_py(v: Any):
    if hasattr(v, "item") and getattr(v, "ndim", 1) == 0:
        return v.item()
    if isinstance(v, (np.floating, np.integer)):
        return v.item()
    return v


class MetricsLogger:
    def __init__(self, directory: str, run_name: str = "run", verbose: bool = True,
                 uploader: ExperimentUploader | None = None):
        os.makedirs(directory, exist_ok=True)
        self.run_name = run_name
        self.path = os.path.join(directory, f"{run_name}_metrics.jsonl")
        self.art_dir = os.path.join(directory, f"{run_name}_artifacts")
        self.verbose = verbose
        self._fh = open(self.path, "a")
        # Default uploader reads MM_UPLOAD_URL; with it unset this is a no-op.
        self.uploader = uploader if uploader is not None else ExperimentUploader()

    def log(self, event: str, payload: Mapping[str, Any]) -> None:
        rec = {"event": event, "time": time.time()}
        rec.update({k: _to_py(v) for k, v in payload.items()})
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()
        if self.verbose:
            short = {k: v for k, v in rec.items() if k not in ("time",)}
            print(f"[{event}] " + json.dumps(short, default=str))
        self.uploader.log_event(self.run_name, rec)

    def log_array(self, name: str, array, step: int | None = None) -> str:
        os.makedirs(self.art_dir, exist_ok=True)
        suffix = f"_{step}" if step is not None else ""
        path = os.path.join(self.art_dir, f"{name}{suffix}.npy")
        np.save(path, np.asarray(array))
        self.uploader.upload_file(self.run_name, path)
        return path

    def close(self) -> None:
        self._fh.close()
