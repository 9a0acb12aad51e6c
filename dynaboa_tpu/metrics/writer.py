"""Lightweight scalar/metrics writer.

Replaces the reference's TensorBoard SummaryWriter (base_adaptor.py:43,
445-447) with an append-only JSONL scalar log plus rolling aggregates —
trivially greppable, no proto dependency, and safe to flush from a streaming
loop.  The same key names the reference logs (ll/*, ul/*, teacher/*,
feat_sim/*, metrics/*) are preserved so downstream dashboards port over.
"""

from __future__ import annotations

import json
import os
import time


class ScalarWriter:
    def __init__(self, logdir: str, filename: str = "scalars.jsonl",
                 flush_secs: float = 5.0):
        os.makedirs(logdir, exist_ok=True)
        self.path = os.path.join(logdir, filename)
        # block-buffered: per-frame line flushes measurably tax the hot
        # recording loop; a time-based flush (every ``flush_secs``) bounds
        # how much a crash mid-run can lose and keeps `tail -f` live
        # without paying a syscall per frame
        self._f = open(self.path, "a")
        self._t0 = time.time()
        self._flush_secs = flush_secs
        self._last_flush = self._t0

    def write(self, step: int, scalars: dict) -> None:
        now = time.time()
        rec = {"step": int(step), "t": round(now - self._t0, 4)}
        for k, v in scalars.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                continue
        self._f.write(json.dumps(rec) + "\n")
        if now - self._last_flush >= self._flush_secs:
            self._f.flush()
            self._last_flush = now

    def flush(self):
        self._f.flush()
        self._last_flush = time.time()

    def close(self):
        self._f.close()

