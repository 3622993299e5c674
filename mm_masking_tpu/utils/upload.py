"""Optional remote experiment upload (the reference's Neptune seam).

The reference streams ~20 scalars/epoch plus checkpoint files to Neptune
(`/root/reference/mm_masking/train_icp_weights.py:347-352` run init,
`:570-579` per-epoch appends + ``upload_files``). This rebuild logs
everything to local JSONL/artifacts by design (`train/metrics.py`); this
module adds the one missing capability — shipping those records to a remote
collector — WITHOUT adopting a vendor SDK:

* Transport is plain HTTP POST of JSON lines (stdlib ``urllib``), so any
  collector (a Neptune proxy, a logstash endpoint, ``nc -l`` in a pinch)
  can receive it. The endpoint comes from ``MM_UPLOAD_URL`` (or the ctor).
* Disabled by default and a hard NO-OP when no endpoint is configured —
  training environments here have zero egress, and the trainer must never
  gain a network dependency.
* Failures never propagate: a dead collector degrades to a one-line
  warning and the run continues (the local JSONL remains the source of
  truth, unlike the reference where a Neptune outage kills logging).
"""
from __future__ import annotations

import base64
import json
import os
import sys
import urllib.error
import urllib.request

ENV_URL = "MM_UPLOAD_URL"


class ExperimentUploader:
    """Ships metric records / files to a remote HTTP collector.

    Each call POSTs one JSON object: ``{"run": ..., "kind": "event" |
    "params" | "file", ...}``. ``enabled`` is False when no URL is
    configured; every method is then a no-op.
    """

    def __init__(self, url: str | None = None, timeout: float = 5.0,
                 max_failures: int = 3):
        self.url = url or os.environ.get(ENV_URL) or None
        self.timeout = timeout
        self.max_failures = max_failures
        self._failures = 0

    @property
    def enabled(self) -> bool:
        return self.url is not None and self._failures < self.max_failures

    def _post(self, payload: dict) -> bool:
        if not self.enabled:
            return False
        data = json.dumps(payload, default=str).encode()
        req = urllib.request.Request(
            self.url, data=data,
            headers={"Content-Type": "application/json"})
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                resp.read()
            return True
        except (urllib.error.URLError, OSError) as e:  # degrade, never raise
            self._failures += 1
            print(f"[upload] POST failed ({e}); "
                  f"{self.max_failures - self._failures} retries left",
                  file=sys.stderr)
            return False

    def log_params(self, run: str, params: dict) -> bool:
        """The reference's run-init params dict (`train_icp_weights.py:354`)."""
        return self._post({"run": run, "kind": "params", "params": params})

    def log_event(self, run: str, record: dict) -> bool:
        """One metrics record (the JSONL row, already JSON-serializable)."""
        return self._post({"run": run, "kind": "event", "record": record})

    def upload_file(self, run: str, path: str) -> bool:
        """Ship one artifact file (the reference's ``upload_files``),
        base64-wrapped so binary checkpoints/images survive JSON."""
        try:
            with open(path, "rb") as fh:
                blob = base64.b64encode(fh.read()).decode()
        except OSError as e:
            print(f"[upload] cannot read {path}: {e}", file=sys.stderr)
            return False
        return self._post({"run": run, "kind": "file",
                           "name": os.path.basename(path), "data": blob})

    def upload_dir(self, run: str, directory: str) -> int:
        """``upload_files(checkpoint_dir)`` equivalent: every regular file
        directly under ``directory``. Returns the number shipped."""
        if not self.enabled:
            return 0
        n = 0
        for name in sorted(os.listdir(directory)):
            p = os.path.join(directory, name)
            if os.path.isfile(p) and self.upload_file(run, p):
                n += 1
        return n
