#!/usr/bin/env python
"""Diagnose the parallel(1 dev) dispatch-cost gap seen in bench run 1.

Times 24 async dispatches of the SAME compiled step four ways:
  a) bare engine.step(state, frame)                      — baseline
  b) engine.step(..., assets=committed_assets)           — assets kwarg only
  c) device_put(frame, dev) + step(assets=...)           — ParallelStreams body
  d) ParallelStreams.step([...])                         — full wrapper
"""

import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax

import dynaboa_tpu

dynaboa_tpu.enable_compilation_cache()

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))
import importlib

bench = importlib.import_module("bench")
from dynaboa_tpu.config import AdaptConfig
from dynaboa_tpu.parallel.streams import ParallelStreams, make_mesh

cfg = AdaptConfig(record_lowerlevel=False)
system = bench.build(cfg)
engine = system.engine
frames = bench.make_frames(8)
N = 24


def timed(label, fn, state_factory):
    state = state_factory()
    state, out = fn(state, 0)
    float(np.asarray(out["mpjpe"]).sum())          # warmup / compile
    state2 = state
    t0 = time.perf_counter()
    for i in range(N):
        state2, out = fn(state2, (i + 1) % 8)
    float(np.asarray(out["mpjpe"]).sum())
    dt = time.perf_counter() - t0
    print(f"[{label}] {N} frames in {dt:.3f}s -> {N / dt:.2f} fps",
          flush=True)


dev = jax.devices()[0]
committed_assets = jax.device_put(engine._assets, dev)

timed("a bare", lambda st, i: engine.step(st, frames[i]),
      lambda: engine.init_state(system.params))
timed("b assets-kwarg",
      lambda st, i: engine.step(st, frames[i], assets=committed_assets),
      lambda: engine.init_state(system.params))
timed("c device_put+assets",
      lambda st, i: engine.step(st, jax.device_put(frames[i], dev),
                                assets=committed_assets),
      lambda: engine.init_state(system.params))

par = ParallelStreams(engine, make_mesh(1))
sframes = [[f] for f in frames]


def par_fn(states, i):
    states, outs = par.step(states, sframes[i])
    return states, outs[0]


timed("d ParallelStreams", par_fn,
      lambda: par.init_states(system.params, 1))
