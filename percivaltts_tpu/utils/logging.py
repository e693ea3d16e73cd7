"""Logging + structured metrics.

Reference parity: percivaltts's ``print_log``-style stdout logging and the
pickled training-curve bookkeeping in its trainers (SURVEY.md §5
"Metrics/logging"). Rebuilt as: timestamped stdout logging plus append-only
JSONL metrics records (one object per step/epoch event) — machine-readable,
crash-safe, and the same artifact the bench harness reads.
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Any, Dict, IO, Optional


def print_log(msg: str, file: Optional[IO] = None) -> None:
    """Timestamped log line (reference: utils.print_log). The stream is
    resolved at CALL time so redirecting sys.stdout (pytest capture,
    contextlib.redirect_stdout) is honored."""
    ts = time.strftime("%Y-%m-%d %H:%M:%S")
    print(f"[{ts}] {msg}", file=file if file is not None else sys.stdout, flush=True)


class MetricsLogger:
    """Append-only JSONL metrics log.

    Each record carries a wall-clock timestamp, a ``kind`` tag
    (e.g. "train_step", "valid", "objective") and arbitrary numeric fields.

    ``enabled=False`` turns every write into a no-op (still returns the
    record): multi-host training passes ``enabled=(process_index == 0)`` so
    N processes on a shared workdir don't interleave N copies of every
    record into the same file.
    """

    def __init__(self, path: str, enabled: bool = True):
        self.path = path
        self._f = None
        if enabled:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._f = open(path, "a", buffering=1)

    def log(self, kind: str, **fields: Any) -> Dict[str, Any]:
        rec = {"ts": time.time(), "kind": kind}
        for k, v in fields.items():
            # unwrap jax/numpy scalars so the record is plain JSON
            if hasattr(v, "item"):
                try:
                    v = v.item()
                except Exception:
                    v = float(v)
            rec[k] = v
        if self._f is not None:
            self._f.write(json.dumps(rec) + "\n")
        return rec

    def close(self) -> None:
        if self._f is not None:
            self._f.close()

    def __enter__(self) -> "MetricsLogger":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def read_metrics(path: str, kind: Optional[str] = None):
    """Read a JSONL metrics file back into a list of dicts."""
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            if kind is None or rec.get("kind") == kind:
                out.append(rec)
    return out
