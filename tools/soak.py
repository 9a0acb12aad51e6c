#!/usr/bin/env python
"""Long-run soak of the adaptation runtime (VERDICT r3 items 2 & 8).

Two arms:

* ``sequential``: thousands of synthetic frames through the StreamRunner
  with periodic checkpointing, a mid-run kill + resume, and an injected
  non-finite frame that must trigger ``auto_reset`` — while host RSS stays
  bounded and fps stays stable window-over-window.
* ``parallel``: a 3DPW-scale (35k-frame) synthetic stream through
  ``--parallel_streams``-style lazy partitioning at S=8 — the r3 eager
  partitioner would have materialized ~21 GB on this host; the lazy
  StreamView path must hold RSS under 2 GB.

Writes ``SOAK_r05.json`` at the repo root; numbers are quoted by
docs/PERF.md.

Usage:
  python tools/soak.py sequential --frames 2500
  python tools/soak.py parallel --frames 35000 --streams 8 --tiny
"""

from __future__ import annotations

import argparse
import json
import os.path as osp
import sys
import time

import numpy as np

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, ROOT)


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return float("nan")


def peak_rss_mb() -> float:
    import resource

    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


class NaNInjectStream:
    """Wraps a stream, replacing the image of chosen frames with NaNs —
    drives the runner's divergence detection + auto_reset path the way a
    real adaptation blow-up would.  ``rss_every`` > 0 prints host RSS as a
    side effect of item access (growth-curve diagnostics)."""

    def __init__(self, base, nan_at=(), rss_every=0):
        self.base = base
        self.nan_at = set(nan_at)
        self.rss_every = rss_every
        self.samples: list[tuple[int, float]] = []

    def __len__(self):
        return len(self.base)

    def __getitem__(self, i):
        if self.rss_every and i % self.rss_every == 0:
            self.samples.append((i, rss_mb()))
            print(f"  [rss@frame {i}: {self.samples[-1][1]:.1f} MB]",
                  flush=True)
        it = dict(self.base[i])
        if i in self.nan_at:
            it["image"] = np.full_like(it["image"], np.nan)
        return it

    def __iter__(self):
        return (self[i] for i in range(len(self)))


def build_tiny_system(compute_dtype="bfloat16"):
    from dynaboa_tpu.apps.common import build_system
    from dynaboa_tpu.config import AdaptConfig, Paths

    cfg = AdaptConfig(record_lowerlevel=False, compute_dtype=compute_dtype)
    return build_system(cfg, Paths(), synthetic_fallback=True,
                        model_kwargs=dict(layers=(1, 1, 1, 1), width=16,
                                          regressor_dim=128),
                        num_vertices=256), cfg


def build_full_system():
    from dynaboa_tpu.apps.common import build_system
    from dynaboa_tpu.config import AdaptConfig, Paths

    cfg = AdaptConfig(record_lowerlevel=False, compute_dtype="bfloat16")
    return build_system(cfg, Paths(), synthetic_fallback=True), cfg


def soak_sequential(args) -> dict:
    from dynaboa_tpu.data import SyntheticStream
    from dynaboa_tpu.engine.runner import StreamRunner

    system, cfg = (build_tiny_system() if args.tiny else build_full_system())
    N = args.frames
    ckpt_every = args.checkpoint_every
    nan_at = {N // 3}              # one injected divergence
    stream = NaNInjectStream(SyntheticStream(num_frames=N, seed=11),
                             nan_at=nan_at, rss_every=args.rss_every)
    exp = args.expdir
    rss0 = rss_mb()

    # phase A: run to just past half, checkpointing periodically, then stop
    # (simulates a kill: the runner object is discarded)
    half = (N // 2 // ckpt_every) * ckpt_every
    runner = StreamRunner(system.engine, exp, checkpoint_every=ckpt_every,
                          log_every=args.log_every)
    state = system.engine.init_state(system.params)
    t0 = time.time()
    runner.run(stream, state, max_frames=half, auto_reset=True)
    resets_a = runner.reset_count
    frames_a = runner.frames_seen
    rss_a = rss_mb()
    wall_a = time.time() - t0

    # phase B: a FRESH runner resumes from the checkpoint and finishes
    stream.samples = []
    runner2 = StreamRunner(system.engine, exp, checkpoint_every=ckpt_every,
                           log_every=args.log_every)
    state2 = system.engine.init_state(system.params)
    t0 = time.time()
    resumed_final, summary = runner2.run(
        stream, state2, resume_from=osp.join(exp, "checkpoint.npz"),
        auto_reset=True)
    wall_b = time.time() - t0
    rss_b = rss_mb()

    # optional arm C: bit-exact resume at THIS scale.  A third fresh runner
    # runs the SAME stream straight through (no kill, no checkpoints) from
    # the same pristine weights; the kill+resume path above must land on the
    # bitwise-identical final carry.  At full model scale this exercises the
    # streamed multislice checkpoint writer end to end (the r4 soak caught a
    # ragged-tail head/tail swap there that tiny single-slice states could
    # not see — docs/PERF.md).  The injected NaN fires the auto_reset in
    # both runs identically (it lands well before the kill boundary) —
    # PROVIDED the control checkpoints on the same cadence: a checkpoint
    # forces a deferred-record materialize, and auto_reset detection (hence
    # the frame a reset applies at) rides the flush boundaries.  The first
    # run of this check used checkpoint_every=0 for the control and caught
    # exactly that: the echo reset landed at frame 164 vs 160 and the
    # carries diverged wholesale.
    bitexact = None
    if args.bitexact:
        import jax

        stream.rss_every = 0
        runner3 = StreamRunner(system.engine, args.expdir + "_ctl",
                               checkpoint_every=ckpt_every,
                               log_every=args.log_every)
        state3 = system.engine.init_state(system.params)
        t0 = time.time()
        final3, _ = runner3.run(stream, state3, auto_reset=True)
        wall_c = time.time() - t0
        diffs = []
        for a, b in zip(jax.tree.leaves(resumed_final),
                        jax.tree.leaves(final3)):
            a = np.asarray(a)
            b = np.asarray(b)
            same = a.shape == b.shape and a.dtype == b.dtype and bool(
                np.array_equal(a, b, equal_nan=True))
            if not same:
                diffs.append(float(np.abs(
                    a.astype(np.float64) - b.astype(np.float64)).max()))
        bitexact = {
            "resets_match": runner3.reset_count == runner2.reset_count
            + resets_a,
            "exact": not diffs,
            "mismatched_leaves": len(diffs),
            "max_abs_diff": max(diffs) if diffs else 0.0,
            "control_wall_seconds": round(wall_c, 1),
        }
        print(f"[bitexact] resumed-vs-straight carry: {bitexact}",
              flush=True)

    # fps stability: per-window fps over each phase's steady region (the
    # claim is phase B within ~10% of phase A AND flat window-over-window;
    # r4 recorded only phase B and its 22 -> 9.9 collapse was the blocking
    # checkpoint writer — VERDICT r4 item 4)
    def fps_windows(r, W=500):
        st = r.step_times[r._first_batch_frames or 32:]
        if len(st) >= W:
            return [round(1.0 / float(np.mean(st[i:i + W])), 2)
                    for i in range(0, len(st) - W + 1, W)]
        return [round(1.0 / float(np.mean(st)), 2)] if st else []

    windows_a = fps_windows(runner)
    windows = fps_windows(runner2)
    st = runner2.step_times[runner2._first_batch_frames or 32:]
    res = {
        # a --bitexact run is its own record: it must not overwrite the
        # long 2500-frame soak entry in SOAK_r04.json
        "arm": "sequential_bitexact" if args.bitexact else "sequential",
        "frames_total": N,
        "tiny": bool(args.tiny),
        "compute_dtype": cfg.compute_dtype,
        "phase_a_frames": frames_a,
        "phase_b_frames": runner2.frames_seen,
        "resumed_at": int(half),
        "every_frame_seen_once": frames_a + runner2.frames_seen == N,
        "injected_nan_frames": sorted(nan_at),
        "auto_resets": resets_a + runner2.reset_count,
        # intervals skipped by the non-blocking submit — either the
        # previous 434 MB write was still in flight OR the idle writer was
        # inside its duty-cycle cooldown (the common case with duty=1/3;
        # expected >0 on the tunnel; dispatch must not stall either way)
        "checkpoints_skipped": runner.ckpt_skipped + runner2.ckpt_skipped,
        "rss_mb": {"start": round(rss0, 1), "after_phase_a": round(rss_a, 1),
                   "end": round(rss_b, 1), "peak": round(peak_rss_mb(), 1)},
        # Steady-state growth: first in-run sample past the resume point's
        # load transient (checkpoint load pins ~1 state of host buffers
        # once) vs the last in-run sample.  The bound is on what grows WITH
        # STREAM LENGTH; one-off costs are reported via rss_mb above.
        "rss_growth_phase_b_mb": round(rss_b - rss_a, 1),
        "rss_steady_growth_mb": _steady_growth(stream.samples, half),
        "fps_windows_500_phase_a": windows_a,
        "fps_windows_500": windows,
        "fps_steady": round(1.0 / float(np.mean(st)), 2) if st else None,
        # realized dynamic-gate behavior on this stream (context for the
        # fps: synthetic noise keeps the gate firing, unlike the bench's
        # converged near-zero-extras regime)
        "extra_steps_mean": (round(float(np.mean(runner2.optim_step_record)),
                                   2) if runner2.optim_step_record else None),
        "extra_steps_p90": (float(np.percentile(runner2.optim_step_record, 90))
                            if runner2.optim_step_record else None),
        "wall_seconds": round(wall_a + wall_b, 1),
    }
    if bitexact is not None:
        res["bitexact_resume"] = bitexact
        assert bitexact["exact"], (
            "kill+resume final carry differs from the straight run: "
            f"{bitexact}")
    assert res["every_frame_seen_once"], res
    assert res["auto_resets"] >= 1, "injected NaN did not trigger auto_reset"
    growth = res["rss_steady_growth_mb"]
    if args.bitexact:
        # a bitexact run is short by design (its claim is state equality,
        # not RSS); phase B may not reach the steady-sample region
        assert growth is None or growth < args.rss_growth_limit_mb, res
    else:
        assert growth is not None and growth < args.rss_growth_limit_mb, res
    return res


def _steady_growth(samples, resumed_at):
    """Growth of the RSS FLOOR across phase B's steady region: min of the
    last-half samples minus min of the first-half samples (past the resume
    load).  The min filters the in-flight async-checkpoint transient
    (~32 MB slices + zip buffers + arena noise) that individual samples
    catch; the floor is what grows with stream length.  None without >= 4
    steady samples."""
    steady = [r for i, r in samples if i >= resumed_at + 250]
    if len(steady) < 4:
        return None
    h = len(steady) // 2
    return round(min(steady[h:]) - min(steady[:h]), 1)


def soak_parallel(args) -> dict:
    from dynaboa_tpu.data import SyntheticStream
    from dynaboa_tpu.parallel.streams import (make_mesh, partition_items,
                                              run_parallel)

    system, cfg = (build_tiny_system() if args.tiny else build_full_system())
    N, S = args.frames, args.streams

    class TrackedSynthetic(SyntheticStream):
        # 37-track structure mirroring 3DPW #PS (pw3d.py:34-35): whole
        # tracks per stream, round-robin
        @property
        def seq_lengths(self):
            n_tracks = 37
            per = self.n // n_tracks
            tail = self.n - per * (n_tracks - 1)
            return [per] * (n_tracks - 1) + [tail]

    stream = TrackedSynthetic(num_frames=N, seed=13)
    rss0 = rss_mb()
    groups = partition_items(stream, S)
    samples: list[float] = []

    def log_progress(msg):
        samples.append(rss_mb())
        print(msg, flush=True)

    t0 = time.time()
    summary = run_parallel(system.engine, system.params, groups,
                           mesh=make_mesh(1), log=log_progress,
                           progress_every=max(args.rss_every * 8, 256))
    # growth of the in-run RSS floor (min-of-halves, as in the sequential
    # arm): what grows WITH STREAM LENGTH.  Peak is reported but not
    # asserted on — it is dominated by the one-off XLA compile transient
    # (~1.2 GB on CPU), not by anything per-frame.
    h = len(samples) // 2
    steady_growth = (round(min(samples[h:]) - min(samples[:h]), 1)
                     if len(samples) >= 4 else None)
    res = {
        "arm": "parallel",
        "frames_total": N,
        "streams": S,
        "tiny": bool(args.tiny),
        "frames_run": summary["frames"],
        "aggregate_fps": round(summary["fps"], 2),
        "mpjpe": round(summary["mpjpe"], 3),
        "rss_mb": {"start": round(rss0, 1), "end": round(rss_mb(), 1),
                   "peak": round(peak_rss_mb(), 1)},
        "rss_steady_growth_mb": steady_growth,
        "wall_seconds": round(time.time() - t0, 1),
    }
    assert res["frames_run"] == N, res
    assert res["rss_mb"]["end"] < args.rss_limit_mb, (
        f"end RSS {res['rss_mb']['end']} MB exceeds the "
        f"{args.rss_limit_mb} MB bound — the lazy partition is leaking")
    if steady_growth is not None:
        assert steady_growth < args.rss_growth_limit_mb, res
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("arm", choices=["sequential", "parallel"])
    ap.add_argument("--frames", type=int, default=2500)
    ap.add_argument("--streams", type=int, default=8)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--bitexact", action="store_true",
                    help="sequential arm: also run a straight-through "
                    "control and require the kill+resume final carry to "
                    "match it bitwise")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--checkpoint_every", type=int, default=250)
    ap.add_argument("--log_every", type=int, default=500)
    ap.add_argument("--rss_limit_mb", type=float, default=2048.0)
    ap.add_argument("--rss_growth_limit_mb", type=float, default=500.0)
    ap.add_argument("--rss_every", type=int, default=80,
                    help="print host RSS every N item loads (diagnostics)")
    ap.add_argument("--expdir", default="/tmp/soak_exp")
    ap.add_argument("--out", default=osp.join(ROOT, "SOAK_r05.json"))
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import dynaboa_tpu

    dynaboa_tpu.enable_compilation_cache()

    res = (soak_sequential(args) if args.arm == "sequential"
           else soak_parallel(args))
    res["backend"] = jax.default_backend()

    existing = {}
    if osp.exists(args.out):
        with open(args.out) as f:
            existing = json.load(f)
    # the parallel arm proves different things per backend (CPU: the
    # dispatch loop is bounded where no transfer journal exists; TPU: the
    # journal bound holds at stream scale) — keep both records
    key = res["arm"]
    if key == "parallel" and res["backend"] != "cpu":
        key = f"parallel_{res['backend']}"
    existing[key] = res
    with open(args.out, "w") as f:
        json.dump(existing, f, indent=1)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
