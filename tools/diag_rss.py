#!/usr/bin/env python
"""Find the per-frame host RSS growth seen in the sequential soak.

Runs the full-model StreamRunner on a synthetic stream and samples RSS +
tracemalloc every --sample frames.  tracemalloc sees numpy/python
allocations (numpy reports its data buffers) but NOT jaxlib/C++ client
allocations — so "tracemalloc flat, RSS growing" implicates the runtime
client, while matching growth pinpoints the python holder via top-diffs.

Arms (--arm):
  runner      full StreamRunner path (records, writer, deferred fetches)
  bare        engine.step loop only, outputs dropped on device (no fetches)
  fetch       engine.step + per-window pack/fetch, results discarded
"""

from __future__ import annotations

import argparse
import os.path as osp
import sys
import time
import tracemalloc

import numpy as np

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, ROOT)


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return float("nan")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arm", default="runner",
                    choices=["runner", "bare", "fetch"])
    ap.add_argument("--frames", type=int, default=400)
    ap.add_argument("--sample", type=int, default=50)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--checkpoint_every", type=int, default=0)
    ap.add_argument("--expdir", default="/tmp/diag_rss_exp")
    ap.add_argument("--tracemalloc", action="store_true",
                    help="retain per-sample snapshots for top-diffs; the "
                    "snapshots themselves cost ~85 MB RSS each (untracked), "
                    "so RSS numbers are only meaningful without this")
    args = ap.parse_args()

    import dynaboa_tpu

    dynaboa_tpu.enable_compilation_cache()
    import jax

    from dynaboa_tpu.apps.common import build_system
    from dynaboa_tpu.config import AdaptConfig, Paths
    from dynaboa_tpu.data import SyntheticStream
    from dynaboa_tpu.engine.runner import (StreamRunner, frame_from_item,
                                           pack_outputs_async,
                                           unpack_outputs)

    cfg = AdaptConfig(record_lowerlevel=False, compute_dtype="bfloat16")
    kw = (dict(model_kwargs=dict(layers=(1, 1, 1, 1), width=16,
                                 regressor_dim=128), num_vertices=256)
          if args.tiny else {})
    system = build_system(cfg, Paths(), synthetic_fallback=True, **kw)
    engine, params = system.engine, system.params
    stream = SyntheticStream(num_frames=args.frames, seed=11)

    if args.tracemalloc:
        tracemalloc.start(10)
    else:
        tracemalloc.start(1)
    snaps = []

    def sample(i):
        snap = tracemalloc.take_snapshot() if args.tracemalloc else None
        cur, _ = tracemalloc.get_traced_memory()
        live = jax.live_arrays()
        live_mb = sum(int(np.prod(a.shape)) * a.dtype.itemsize
                      for a in live) / 1e6
        snaps.append((i, rss_mb(), cur / 1e6, snap))
        print(f"frame {i:5d}: rss {snaps[-1][1]:8.1f} MB  "
              f"pymem {snaps[-1][2]:8.1f} MB  "
              f"live_arrays {len(live)} ({live_mb:.1f} MB)", flush=True)

    state = engine.init_state(params)
    t0 = time.time()
    if args.arm == "runner":
        runner = StreamRunner(engine, args.expdir,
                              checkpoint_every=args.checkpoint_every,
                              log_every=10 ** 9)
        # sample via the stream: wrap __getitem__
        base_make = stream._make

        def make(i):
            if i % args.sample == 0:
                sample(i)
            return base_make(i)

        stream._make = make
        runner.run(stream, state)
    else:
        deferred = []
        for i in range(args.frames):
            if i % args.sample == 0:
                sample(i)
            frame = frame_from_item(stream[i])
            state, out = engine.step(state, jax.device_put(frame))
            if args.arm == "fetch":
                deferred.append(out)
                if len(deferred) >= 32:
                    unpack_outputs(pack_outputs_async(deferred))
                    deferred.clear()
            else:
                del out
        # force completion
        float(np.asarray(jax.tree.leaves(state.params)[0]).ravel()[0])
    sample(args.frames)
    wall = time.time() - t0

    print(f"\n=== {args.arm}: {args.frames} frames in {wall:.1f}s ===")
    first_i, first_rss, first_py, first_snap = snaps[1]  # skip compile frame
    last_i, last_rss, last_py, last_snap = snaps[-1]
    nframes = last_i - first_i
    print(f"RSS growth frames {first_i}..{last_i}: "
          f"{last_rss - first_rss:.1f} MB "
          f"({(last_rss - first_rss) / max(1, nframes) * 1024:.1f} KB/frame)")
    print(f"pymem growth: {last_py - first_py:.1f} MB "
          f"({(last_py - first_py) / max(1, nframes) * 1024:.1f} KB/frame)")
    if not args.tracemalloc:
        return
    print("\nTop python allocation growth sites:")
    for stat in last_snap.compare_to(first_snap, "traceback")[:8]:
        print(f"  +{stat.size_diff / 1e6:8.2f} MB  (count +{stat.count_diff})")
        for line in stat.traceback.format()[-3:]:
            print(f"    {line}")


if __name__ == "__main__":
    main()
