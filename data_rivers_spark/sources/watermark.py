"""Incremental-extraction watermark state (SURVEY.md §2.5).

The reference keeps a JSON run log per source
(``successful_run_log/log.json``: find_last_successful_run
gcs_utils.py:893-904, written after each extract qalert_requests_gcs.py:62-68)
and extracts '?since=<watermark>'. Identical mechanism here: a JSON state
file per source, written atomically.
"""

from __future__ import annotations

import json
import os
import time


class RunLog:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, source: str) -> str:
        return os.path.join(self.root, f"{source}.json")

    def last_successful_run(self, source: str, default: str | None = None) -> str | None:
        """Return the stored watermark ('since' value) or default on first run."""
        try:
            with open(self._path(source)) as f:
                return json.load(f)["watermark"]
        except (OSError, ValueError, KeyError):
            return default

    def record_successful_run(self, source: str, watermark: str, **extra) -> None:
        tmp = self._path(source) + f".tmp.{time.time_ns()}"
        with open(tmp, "w") as f:
            json.dump(
                {"watermark": watermark, "recorded_ns": time.time_ns(), **extra}, f
            )
        os.replace(tmp, self._path(source))
