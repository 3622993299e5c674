"""Metrics logging: JSONL scalars + stdout (replaces the reference's Neptune).

The reference logs ~20 scalars per epoch plus image artifacts to Neptune
(SURVEY.md §5). Here every scalar goes to a `metrics.jsonl` stream (one JSON
object per event) that any dashboard can tail; mask/BEV images can be dumped as
`.npy` artifacts on demand. No network dependency.
"""
from __future__ import annotations

import json
import os
import time
from typing import Any, Mapping

import numpy as np


def _to_py(v: Any):
    if hasattr(v, "item") and getattr(v, "ndim", 1) == 0:
        return v.item()
    if isinstance(v, (np.floating, np.integer)):
        return v.item()
    return v


class MetricsLogger:
    def __init__(self, directory: str, run_name: str = "run", verbose: bool = True):
        os.makedirs(directory, exist_ok=True)
        self.path = os.path.join(directory, f"{run_name}_metrics.jsonl")
        self.art_dir = os.path.join(directory, f"{run_name}_artifacts")
        self.verbose = verbose
        self._fh = open(self.path, "a")

    def log(self, event: str, payload: Mapping[str, Any]) -> None:
        rec = {"event": event, "time": time.time()}
        rec.update({k: _to_py(v) for k, v in payload.items()})
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()
        if self.verbose:
            short = {k: v for k, v in rec.items() if k not in ("time",)}
            print(f"[{event}] " + json.dumps(short, default=str))

    def log_array(self, name: str, array, step: int | None = None) -> str:
        os.makedirs(self.art_dir, exist_ok=True)
        suffix = f"_{step}" if step is not None else ""
        path = os.path.join(self.art_dir, f"{name}{suffix}.npy")
        np.save(path, np.asarray(array))
        return path

    def close(self) -> None:
        self._fh.close()
