#!/usr/bin/env python
"""Attribute the worst-case (8-updates-per-frame) step cost to its components.

The dynamic-BOA protocol (reference dynaboa_benchmark.py:161-192) prices each
extra optimization step at: one batched loss forward+backward (frame + motion
history + retrieved exemplar), one teacher forward, Adam + teacher EMA, and
one post-update forward (the convergence signal AND the next iteration's
retrieval key).  This script measures worst-case streaming fps (similarity
threshold forced to -1 so every frame runs 1 + optim_steps updates) under
flag ablations that remove one component at a time, yielding a per-component
ms/update attribution table for docs/PERF.md.

Run on the real TPU (one process may hold it); each variant is a separate
XLA program (fresh compile, cached thereafter).
"""

from __future__ import annotations

import argparse
import json
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure(cfg, label, n_frames=24, compute_metrics=True):
    import jax

    from bench import make_frames
    from dynaboa_tpu.apps.common import build_system
    from dynaboa_tpu.config import Paths

    system = build_system(cfg, Paths(), synthetic_fallback=True,
                          compute_metrics=compute_metrics)
    frames = make_frames(8)
    engine = system.engine
    state = engine.init_state(system.params)
    t0 = time.perf_counter()
    state, out = engine.step(state, frames[0], cos_sim_threshold=-1.0)
    jax.block_until_ready(out["mpjpe"])
    compile_s = time.perf_counter() - t0
    log(f"[{label}] compile+first: {compile_s:.1f}s")

    t0 = time.perf_counter()
    for i in range(n_frames):
        state, out = engine.step(state, frames[(i + 1) % len(frames)],
                                 cos_sim_threshold=-1.0)
    float(np.asarray(out["mpjpe"]).sum())   # value fetch: honest sync
    dt = time.perf_counter() - t0
    ms_frame = 1000.0 * dt / n_frames
    log(f"[{label}] {n_frames} frames -> {ms_frame:.2f} ms/frame "
        f"({n_frames / dt:.2f} fps)")
    return dict(label=label, ms_per_frame=round(ms_frame, 2),
                fps=round(n_frames / dt, 2), compile_s=round(compile_s, 1))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/ablate_worstcase.json")
    p.add_argument("--variants", default="all")
    args = p.parse_args()

    import dynaboa_tpu

    dynaboa_tpu.enable_compilation_cache()
    import jax

    from dynaboa_tpu.config import AdaptConfig

    log("devices:", jax.devices())
    base = AdaptConfig(record_lowerlevel=False, compute_dtype="bfloat16")

    variants = {
        "base": dict(cfg=base),
        "base_norec": dict(cfg=base.replace(record_dynamic=False)),
        "no_teacher": dict(cfg=base.replace(use_meanteacher=False)),
        "no_metrics": dict(cfg=base, compute_metrics=False),
        "no_mixtrain": dict(cfg=base.replace(
            retrieval=False, lower_level_mixtrain=False,
            upper_level_mixtrain=False)),
        "no_motion": dict(cfg=base.replace(use_motion=False)),
        "fp32": dict(cfg=base.replace(compute_dtype="float32")),
        "no_inner": dict(cfg=base.replace(use_boa=False)),
    }
    if args.variants != "all":
        keep = args.variants.split(",")
        variants = {k: v for k, v in variants.items() if k in keep}

    results = []
    for label, kw in variants.items():
        cfg = kw.pop("cfg")
        results.append(measure(cfg, label, **kw))

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
