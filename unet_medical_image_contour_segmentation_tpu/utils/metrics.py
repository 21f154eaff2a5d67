"""Structured metric logging: per-step JSONL + console summaries.

The reference's observability is tqdm postfixes and three Dice numbers per
validation (SURVEY.md §5).  MetricLogger writes one JSON object per event to
a ``metrics.jsonl`` so loss terms, Dice triples, learning rate, and
throughput are machine-readable across the run.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

__all__ = ["MetricLogger"]


class MetricLogger:
    def __init__(self, path: Optional[str] = None):
        self.path = path
        self._fh = None
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
            self._fh = open(path, "a", buffering=1)
        self._start = time.time()

    def log(self, kind: str, **fields):
        if self._fh is None:
            return
        record = {"t": round(time.time() - self._start, 3), "kind": kind}
        for k, v in fields.items():
            try:
                record[k] = float(v)
            except (TypeError, ValueError):
                record[k] = v
        self._fh.write(json.dumps(record) + "\n")

    def close(self):
        if self._fh:
            self._fh.close()
            self._fh = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
