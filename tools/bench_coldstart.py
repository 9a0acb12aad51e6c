#!/usr/bin/env python
"""Measure warm-start time: process start -> first adapted frame done, with
the persistent compilation cache populated (VERDICT r2 item 8).

Runs N child processes, each building the flagship system and executing one
full bilevel step, and reports the spread of (import+build, cache-load+first
-step) times.  Run AFTER bench.py has populated .jax_cache for the same
config.

Usage: python tools/bench_coldstart.py [--runs 3]
"""

from __future__ import annotations

import argparse
import json
import os.path as osp
import subprocess
import sys
import time

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))

CHILD = r"""
import sys, time
sys.path.insert(0, %(root)r)
t0 = time.perf_counter()
import numpy as np
import dynaboa_tpu; dynaboa_tpu.enable_compilation_cache()
from bench import make_frames, build
from dynaboa_tpu.config import AdaptConfig
s = build(AdaptConfig(record_lowerlevel=False, compute_dtype="bfloat16"))
t_build = time.perf_counter() - t0
frames = make_frames(1)
t1 = time.perf_counter()
state = s.engine.init_state(s.params)
state, out = s.engine.step(state, frames[0])
float(np.asarray(out["mpjpe"]).sum())
t_first = time.perf_counter() - t1
print("CHILD", t_build, t_first)
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    results = []
    for i in range(args.runs):
        t0 = time.perf_counter()
        out = subprocess.run(
            [sys.executable, "-c", CHILD % {"root": ROOT}],
            capture_output=True, text=True, cwd=ROOT)
        wall = time.perf_counter() - t0
        line = [ln for ln in out.stdout.splitlines()
                if ln.startswith("CHILD")]
        if not line:
            print(out.stdout[-2000:], out.stderr[-2000:])
            raise SystemExit(f"run {i} failed")
        _, t_build, t_first = line[0].split()
        results.append({"run": i, "build_s": round(float(t_build), 1),
                        "first_step_s": round(float(t_first), 1),
                        "process_wall_s": round(wall, 1)})
        print(results[-1])
    print(json.dumps(results))


if __name__ == "__main__":
    main()
