"""Streaming benchmark / adaptation runner.

Capability parity with the reference entry loops (dynaboa_benchmark.py
excute():71-123, dynaboa_internet.py excute():72-90): iterate the ordered
frame stream, adapt on every frame, aggregate MPJPE / PA-MPJPE / PVE, print
running means every 200 frames, and dump the same artifact set
(res / lower_res / feat-sims / optim-step-record / per-frame predictions /
res.txt) in npz form.

Adds the capabilities the reference lacks (SURVEY §5): mid-run checkpointing
with bit-exact resume, a ``reset()`` remedy for adaptation divergence, wall-
clock phase timers, and `jax.profiler` trace hooks.
"""

from __future__ import annotations

import os
import os.path as osp
import time
from typing import Any

import jax
import numpy as np

from dynaboa_tpu.engine.bilevel import AdaptState, BilevelEngine, Frame
from dynaboa_tpu.engine.checkpoint import (AsyncCheckpointer, load_state,
                                           malloc_trim)
from dynaboa_tpu.metrics.writer import ScalarWriter


_fused_preprocess_jits: dict[int, Any] = {}


def _fused_preprocess(raw: np.ndarray, center, scale, out_res: int):
    """On-device crop/resize/normalize for raw-frame stream items (one jitted
    gather graph per (raw shape, out_res); SURVEY §7 fused-preprocessing
    north star)."""
    import jax
    import jax.numpy as jnp

    fn = _fused_preprocess_jits.get(out_res)
    if fn is None:
        from dynaboa_tpu.ops import image as I

        fn = jax.jit(lambda im, c, s: I.fused_crop_resize_normalize(
            im.astype(jnp.float32), c, s, out_res=out_res))
        _fused_preprocess_jits[out_res] = fn
    return fn(jnp.asarray(raw), jnp.asarray(center, jnp.float32),
              jnp.asarray(scale, jnp.float32))


def _pack_outputs(outs: list):
    """Stack a window of output trees and pack all leaves into two flat
    buffers (float32, int32).  Runs under jit — a single compiled program,
    a single device computation."""
    import jax.numpy as jnp

    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *outs)
    leaves = jax.tree.leaves(stacked)
    fl = [l.astype(jnp.float32).ravel() for l in leaves
          if jnp.issubdtype(l.dtype, jnp.floating)]
    il = [l.astype(jnp.int32).ravel() for l in leaves
          if not jnp.issubdtype(l.dtype, jnp.floating)]
    f = jnp.concatenate(fl) if fl else jnp.zeros((0,), jnp.float32)
    i = jnp.concatenate(il) if il else jnp.zeros((0,), jnp.int32)
    return f, i


_pack_outputs_jit = None


_PER_FRAME_KEYS = ("mpjpe", "pampjpe", "pve", "verts", "rotmat", "beta",
                   "cam")


def split_window_out(out: dict, W: int) -> list[dict]:
    """Split a batched-window step output into W per-frame records.

    Per-frame quantities (metrics, predictions, per-inner-step records)
    slice along the batch axis; per-update trajectories (per_step_mpjpe etc.,
    shaped (optim_steps+1, B)) slice along their second axis; window-level
    quantities (loss aux, optim_steps, feat sims — one bilevel update per
    window) are shared by every frame of the window."""
    res = []
    for j in range(W):
        o = {}
        for k, v in out.items():
            if k in _PER_FRAME_KEYS or k.startswith("lower_"):
                o[k] = v[j:j + 1]
            elif k in ("per_step_mpjpe", "per_step_pampjpe", "per_step_pve"):
                o[k] = v[:, j:j + 1]
            else:
                o[k] = v
        res.append(o)
    return res


def pack_outputs_async(outs: list):
    """Pack a window of on-device step-output trees into two flat device
    buffers (ONE jitted program) and start their device->host copies.

    Fetching trees leaf-by-leaf costs one host round trip per buffer —
    ~40 leaves/frame x a 16-frame window took 17 s on the tunneled-TPU
    setup (docs/PERF.md) while the same data packs into two flat buffers.
    ``copy_to_host_async`` overlaps even those two transfers with subsequent
    dispatches, so draining a window one flush later costs ~no blocking
    round trip at all (the r2 runner blocked ~2 RTTs per window here —
    ~4 ms/frame of its 30% host-overhead gap).

    Returns an opaque handle for :func:`unpack_outputs`.
    """
    global _pack_outputs_jit
    if _pack_outputs_jit is None:
        _pack_outputs_jit = jax.jit(_pack_outputs)
    flat_f, flat_i = _pack_outputs_jit(outs)
    for buf in (flat_f, flat_i):
        try:
            buf.copy_to_host_async()
        except (AttributeError, NotImplementedError):
            pass
    return (flat_f, flat_i, outs[0], len(outs))


def unpack_outputs(handle) -> list:
    """Complete a :func:`pack_outputs_async` fetch and rebuild the per-frame
    host trees.  The value fetch forces completion of the device chain up to
    the newest frame in the window (honest timing boundary — see
    docs/PERF.md on block_until_ready)."""
    flat_f, flat_i, sample0, W = handle
    host_f = np.asarray(flat_f)
    host_i = np.asarray(flat_i)

    # unpack on host following the same leaf order as _pack_outputs
    sample_leaves, treedef = jax.tree.flatten(sample0)
    host: list[np.ndarray] = []
    off_f = off_i = 0
    for sample in sample_leaves:
        shape = (W,) + tuple(np.shape(sample))
        n = int(np.prod(shape))
        if np.issubdtype(sample.dtype, np.floating):
            host.append(host_f[off_f:off_f + n].reshape(shape))
            off_f += n
        else:
            host.append(host_i[off_i:off_i + n].reshape(shape))
            off_i += n
    stacked_np = jax.tree.unflatten(treedef, host)
    return [jax.tree.map(lambda a, j=j: a[j], stacked_np) for j in range(W)]


def materialize_outputs(outs: list) -> list:
    """Synchronous pack + fetch (tests and one-shot callers)."""
    return unpack_outputs(pack_outputs_async(outs))


def frame_from_item(item: dict, keypoint_source: str = "gt") -> Frame:
    """Lift a dataset item (single frame, no batch dim) into a Frame.

    Items carrying ``raw_image`` (fused-preprocess stream mode) are cropped /
    resized / ImageNet-normalized on device; items carrying ``image`` arrive
    host-preprocessed (the reference's path, utils/dataprocess.py:48-96)."""
    j2d = item["op_j2d"] if keypoint_source == "openpose" else item["smpl_j2d"]
    if "raw_image" in item:
        from dynaboa_tpu import constants

        image = _fused_preprocess(
            item["raw_image"], item["center"], item["scale"],
            int(item.get("out_res", constants.IMG_RES)))[None]
    else:
        image = item["image"][None]
    return Frame(
        image=image,
        j2d=j2d[None],
        pose=item["pose"][None],
        betas=item["betas"][None],
        gender=np.asarray([item["gender"]], np.int32),
        mask=np.ones((1,), np.float32),
    )


def frame_from_window(items: list[dict],
                      keypoint_source: str = "gt") -> Frame:
    """Stack W consecutive frames into one batched Frame (B = W).

    Batched-window adaptation (SURVEY §2d variant): the window shares ONE
    bilevel update whose losses average over the W frames, recovering MXU
    occupancy that batch-1 streaming leaves on the table.  Each frame's
    prediction/metrics stay per-frame (everything downstream is batched).
    Temporal semantics: the history ring stores whole windows, so the
    motion loss pairs frame i of window t with frame i of window
    t - interval."""
    frames = [frame_from_item(it, keypoint_source) for it in items]
    import jax.numpy as jnp

    cat = (jnp.concatenate if any(
        not isinstance(f.image, np.ndarray) for f in frames)
        else np.concatenate)
    return Frame(*[cat([getattr(f, k) for f in frames], axis=0)
                   for k in Frame._fields])


class StreamRunner:
    def __init__(
        self,
        engine: BilevelEngine,
        exppath: str,
        save_predictions: bool = False,
        checkpoint_every: int = 0,
        log_every: int = 200,
        profile_dir: str | None = None,
        save_overlays: bool = False,
        img_root: str | None = None,
        faces=None,
        defer_window: int = 32,
        checkpoint_duty: float = 1.0 / 3.0,
    ):
        """``save_overlays`` renders the predicted mesh over the original
        frame via the in-repo rasterizer and writes image/Pred_{i}.png +
        mesh/Pred_{i}.obj (the reference's --save_res path,
        base_adaptor.py:429-443); needs streams that carry imgname/bbox and
        the SMPL ``faces`` topology.

        ``defer_window``: how many frames of device outputs queue before a
        host fetch materializes them for logging — per-frame fetches would
        serialize dispatch round trips (docs/PERF.md); 1 restores fully
        synchronous recording."""
        self.engine = engine
        self.exppath = exppath
        os.makedirs(osp.join(exppath, "result"), exist_ok=True)
        os.makedirs(osp.join(exppath, "image"), exist_ok=True)
        os.makedirs(osp.join(exppath, "mesh"), exist_ok=True)
        self.writer = ScalarWriter(exppath)
        self.save_predictions = save_predictions
        self.checkpoint_every = checkpoint_every
        self.log_every = log_every
        self.profile_dir = profile_dir
        self.save_overlays = save_overlays
        self.img_root = img_root or ""
        self.faces = faces
        self.defer_window = max(1, defer_window)
        # duty < 1 bounds checkpoint bandwidth on shared transports (the
        # tunnel the dispatches ride); 1.0 disables the cooldown for fast
        # local disks — plumbed through the apps as --checkpoint_duty
        self._ckpt = AsyncCheckpointer(duty=checkpoint_duty)

        self.reset_records()

    def reset_records(self):
        self._renderers: dict[tuple[int, int], Any] = {}
        self._first_batch_frames: int = 0
        self.mpjpe_all: list[float] = []
        self.pampjpe_all: list[float] = []
        self.pve_all: list[float] = []
        self.lower_mpjpe: dict[int, list[float]] = {}
        self.lower_pampjpe: dict[int, list[float]] = {}
        self.kp2d_lower: list[float] = []
        self.kp2d_upper: dict[int, float] = {}
        self.feat_sims: dict[int, list[float]] = {}
        # per-update trajectories (reference dynaboa_benchmark.py:158-191
        # records sims + metrics after EVERY dynamic update)
        self.step_sims: dict[int, np.ndarray] = {}
        self.step_losses: dict[int, np.ndarray] = {}
        self.step_stats: dict[int, tuple] = {}
        self.optim_step_record: list[int] = []
        self.step_times: list[float] = []
        self.reset_count: int = 0
        self.ckpt_failures: int = 0
        self.ckpt_skipped: int = 0
        self.frames_seen: int = 0
        # frames_seen at the last ACCEPTED periodic submit — lets run end
        # skip a redundant full rewrite when the final state is already
        # queued/on disk (434 MB and 14-25 s saved per shutdown at full
        # model scale on the tunnel)
        self._ckpt_submitted_frames: int = -1

    def reset_state(self, params, batch_size: int = 1,
                    img_res: int = 224) -> AdaptState:
        """Divergence remedy: fresh model/teacher/optimizer
        (reference dynaboa_webcam.py reload():184-195)."""
        return self.engine.init_state(params, batch_size=batch_size,
                                      img_res=img_res)

    def run(
        self,
        stream,
        init_state: AdaptState,
        keypoint_source: str = "gt",
        resume_from: str | None = None,
        max_frames: int | None = None,
        chunk_size: int = 1,
        window_size: int = 1,
        auto_reset: bool = False,
    ) -> tuple[AdaptState, dict]:
        """chunk_size > 1 dispatches lax.scan chunks (one XLA call per
        ``chunk_size`` frames) instead of per-frame steps — higher offline
        throughput.  Results are structurally identical (same dynamic-loop
        step counts); weights can differ on isolated near-zero-gradient
        coordinates by O(lr) because Adam amplifies fusion-order fp noise
        into sign flips (tested seam: tests/test_engine.py TestChunkedScan).

        window_size > 1 enables batched-window adaptation (SURVEY §2d
        variant): W consecutive frames share one bilevel update whose
        losses average over the window — higher MXU occupancy per update,
        W-fold fewer updates per frame.  ``init_state`` must be built with
        ``batch_size=window_size``.  Composes with chunk_size (a scan over
        windows).

        auto_reset=True makes divergence recovery automatic: when a
        materialized frame's loss or metrics go non-finite, the adaptation
        state resets to the initial weights (the reference only offers this
        as the webcam path's interactive 'r' key, dynaboa_webcam.py:184-195).
        Detection lags by up to 2x ``defer_window`` frames (recording is
        deferred one window and fetched one window behind); the reset
        applies from the next flush."""
        reset_template = None
        if auto_reset:
            # host snapshot of the INITIAL weights, taken before any resume
            # (a reset must restore the pristine model like the reference's
            # reload(), not a possibly-degraded checkpoint) and before the
            # first step donates the live buffers
            reset_template = jax.tree.map(np.asarray, init_state.params)
            reset_batch = int(init_state.hist_images.shape[1])
            reset_res = int(init_state.hist_images.shape[2])

        state = init_state
        start = 0
        if resume_from and osp.exists(resume_from):
            state = load_state(resume_from, init_state)
            start = int(state.step)
            print(f"---> resumed at frame {start}")

        n_total = len(stream)
        if self.profile_dir:
            jax.profiler.start_trace(self.profile_dir)
        try:
            pending: list[tuple[int, "Frame", dict]] = []
            # Outputs are recorded DEFERRED and PIPELINED: the adaptation
            # chain stays on device and python never blocks per frame — a
            # host fetch per frame costs a full dispatch round trip
            # (docs/PERF.md: 67 fps async vs ~13 fps host-synced on tunneled
            # TPUs).  Device outputs queue in ``deferred``; a full window is
            # packed into two flat buffers whose device->host copies start
            # immediately (``pack_outputs_async``) and are consumed one
            # window LATER, so even the two per-window fetch round trips
            # overlap with subsequent dispatches.
            deferred: list[tuple[int, Any, dict]] = []
            inflight: list[tuple[Any, list, int]] = []
            drained_since_trim = 0
            win_t0 = time.perf_counter()

            def drain_one():
                # Completing the fetch forces completion of the whole
                # on-device chain up to the newest frame of that window, so
                # wall time since the previous drain divided by the frame
                # count is the honest per-frame cost (a value fetch cannot
                # misreport readiness — see docs/PERF.md).
                nonlocal win_t0, state, drained_since_trim
                handle, idx_meta, n_frames = inflight.pop(0)
                outs_np = unpack_outputs(handle)
                # per-window host buffers (packed fetches, frame uploads)
                # are malloc'd and freed across threads; without periodic
                # trims glibc's arenas keep the freed high-water and the
                # RSS floor creeps ~0.04 MB/frame over long streams (the
                # parallel dispatch loop does the same — SOAK r5 notes)
                drained_since_trim += n_frames
                if not self._first_batch_frames:
                    # remember how many frames share the compile-tainted dt
                    self._first_batch_frames = n_frames
                dt = (time.perf_counter() - win_t0) / max(1, n_frames)
                # Trim BETWEEN the dt computation and the next window's t0:
                # the trim's wall time (tens of ms on a multi-GB heap) is a
                # host-hygiene cost, not per-frame adaptation cost, and
                # must not be charged to either timing window — step_times
                # backs the runner fps summary, bench.py's runner arm, and
                # the soak's window-flatness claim.
                if drained_since_trim >= 512:
                    drained_since_trim = 0
                    malloc_trim()
                win_t0 = time.perf_counter()
                diverged_at = None
                for (i, meta), out in zip(idx_meta, outs_np):
                    if isinstance(meta, list):   # batched window: B = W
                        for j, (m, o) in enumerate(
                                zip(meta, split_window_out(out, len(meta)))):
                            self.step_times.append(dt)
                            self._record(i + j, o, m)
                    else:
                        self.step_times.append(dt)
                        self._record(i, out, meta)
                    if reset_template is not None and diverged_at is None:
                        checks = [out.get("mpjpe", 0.0),
                                  out.get("upper", {}).get("loss", 0.0),
                                  out.get("lower", {}).get("loss", 0.0)]
                        if any(not np.isfinite(np.asarray(c)).all()
                               for c in checks):
                            diverged_at = i
                if diverged_at is not None:
                    # divergence remedy, automated (reference reload():
                    # dynaboa_webcam.py:184-195 — interactive-only there).
                    # Only the model/teacher/optimizer reset; the stream
                    # position (step) and motion history survive, exactly
                    # like the reference's reload (its self.history dict is
                    # untouched), so checkpoints keep counting correctly.
                    # Detection lags by up to 2 windows (deferred + in-flight).
                    self.reset_count += 1
                    print(f"---> non-finite adaptation detected at frame "
                          f"{diverged_at}; resetting model/teacher/optimizer "
                          f"(reset #{self.reset_count})")
                    fresh = self.reset_state(reset_template,
                                             batch_size=reset_batch,
                                             img_res=reset_res)
                    state = state._replace(
                        params=fresh.params,
                        teacher_params=fresh.teacher_params,
                        opt_state=fresh.opt_state)

            def seal_window():
                if not deferred:
                    return
                handle = pack_outputs_async([out for _, out, _ in deferred])
                idx_meta = [(i, meta) for i, _, meta in deferred]
                n_frames = sum(
                    len(m) if isinstance(m, list) else 1
                    for _, _, m in deferred)
                inflight.append((handle, idx_meta, n_frames))
                deferred.clear()

            def materialize():
                seal_window()
                while inflight:
                    drain_one()

            def flush():
                nonlocal state
                if not pending:
                    return
                if len(pending) == 1:
                    # explicit async device_put: passing numpy arguments to
                    # the jitted step uploads them inline with the dispatch
                    # (measured ~5x slower per step on the tunneled TPU)
                    state, out = self.engine.step(
                        state, jax.device_put(pending[0][1]))
                    outs = [out]
                else:
                    from dynaboa_tpu.engine.bilevel import stack_frame_list

                    stacked = stack_frame_list([f for _, f, _ in pending])
                    state, outs_stacked = self.engine.run_chunk(
                        state, jax.device_put(stacked))
                    outs = [jax.tree.map(lambda a, j=j: a[j], outs_stacked)
                            for j in range(len(pending))]
                for (i, _, meta), out in zip(pending, outs):
                    deferred.append((i, out, meta))
                pending.clear()
                n_deferred_frames = sum(
                    len(m) if isinstance(m, list) else 1
                    for _, _, m in deferred)
                if n_deferred_frames >= self.defer_window:
                    seal_window()
                    while len(inflight) > 1:
                        drain_one()

            win_items: list[tuple[int, dict]] = []
            # state.step counts engine steps = windows; frames = step * W
            frame_start = start * window_size

            for i, item in enumerate(iter(stream)):
                if i < frame_start:
                    continue
                if max_frames is not None and i >= max_frames:
                    break
                if window_size == 1:
                    frame = frame_from_item(item, keypoint_source)
                    meta = {k: item[k] for k in ("imgname", "bbox")
                            if k in item}
                    pending.append((i, frame, meta))
                else:
                    win_items.append((i, item))
                    if len(win_items) == window_size:
                        frame = frame_from_window(
                            [it for _, it in win_items], keypoint_source)
                        metas = [{k: it[k] for k in ("imgname", "bbox")
                                  if k in it} for _, it in win_items]
                        pending.append((win_items[0][0], frame, metas))
                        win_items = []
                with jax.profiler.StepTraceAnnotation("boa_step", step_num=i):
                    if len(pending) >= chunk_size:
                        flush()

                if self.checkpoint_every and (i + 1) % self.checkpoint_every == 0:
                    flush()
                    if reset_template is not None:
                        # the divergence check runs on host records, so a
                        # checkpoint must not snapshot weights a pending
                        # materialization would have reset; without
                        # auto-reset the snapshot only needs the device
                        # state, and draining host records here would
                        # reinstate the per-checkpoint dispatch stall the
                        # async checkpointer removes
                        materialize()
                    # async: snapshot on device (~ms), fetch + write in a
                    # worker thread overlapping subsequent dispatches (the
                    # blocking 434 MB fetch+write cost ~70 s/checkpoint on
                    # the tunneled TPU); atomic rename on completion
                    self._checkpoint(state)
                if (i + 1) % self.log_every == 0 and self.mpjpe_all:
                    print(
                        f"Step:{i}: MPJPE:{np.mean(self.mpjpe_all):.2f}, "
                        f"PAMPJPE:{np.mean(self.pampjpe_all):.2f}, "
                        f"PVE:{np.mean(self.pve_all):.2f}, "
                        f"{1.0 / np.mean(self.step_times[-self.log_every:]):.2f} fps"
                    )
            if win_items:
                # Final partial window: pad to window_size by repeating the
                # last real frame, mask the pad rows out of every loss term
                # (Frame.mask -> row_weighted_mean) and record only the real
                # frames — every stream frame is evaluated for any W (the
                # reference evaluates every frame; dropping tails would
                # shrink the protocol denominator by up to W-1 per track).
                T = len(win_items)
                items = [it for _, it in win_items]
                frame = frame_from_window(
                    items + [items[-1]] * (window_size - T), keypoint_source)
                frame = frame._replace(mask=np.concatenate(
                    [np.ones(T, np.float32),
                     np.zeros(window_size - T, np.float32)]))
                metas = [{k: it[k] for k in ("imgname", "bbox") if k in it}
                         for it in items]
                pending.append((win_items[0][0], frame, metas))
                print(f"---> final window padded: {T} real + "
                      f"{window_size - T} masked pad frames")
                win_items = []
            flush()
            materialize()
            if self.checkpoint_every and self.frames_seen:
                # Periodic submits are skippable when the writer lags (see
                # _checkpoint), so guarantee the on-disk resume point is the
                # run's FINAL state: one blocking submit at run end (outside
                # any timed region).  Failures are contained like the
                # periodic ones — the checkpoint is the backup path.
                skip_final = False
                if self._ckpt_submitted_frames == self.frames_seen:
                    # the last periodic submit already queued the final
                    # state; skip the redundant full rewrite (434 MB,
                    # 14-25 s on the tunnel) — but only if that write
                    # actually COMPLETED cleanly
                    try:
                        self._ckpt.wait()
                        skip_final = True
                    except RuntimeError:
                        pass   # fall through to the final write below
                for attempt in range(2):
                    if skip_final:
                        break
                    try:
                        self._ckpt.submit(
                            osp.join(self.exppath, "checkpoint.npz"), state,
                            block=True)
                        break
                    except RuntimeError as e:
                        # submit(block=True) waits first, so a STALE error
                        # from an earlier periodic write surfaces HERE,
                        # before the final state is even queued (the raise
                        # also clears it).  Retry once — abandoning the
                        # guaranteed final checkpoint over an already-
                        # cleared old failure would leave the resume point
                        # thousands of frames stale.
                        self.ckpt_failures += 1
                        if attempt == 1:
                            print(f"---> WARNING: {e} — run results are "
                                  f"unaffected; the final checkpoint was "
                                  f"not saved")
        finally:
            try:
                # checkpoint.npz is complete once run returns; a failed
                # write must not clobber a primary exception from the run
                # body or skip stop_trace/finalize — the checkpoint is the
                # backup path, the run's results are the product
                self._ckpt.wait()
            except RuntimeError as e:
                self.ckpt_failures += 1
                print(f"---> WARNING: final {e} — run results are "
                      f"unaffected; no checkpoint was saved this interval")
            finally:
                # join the worker so runners don't each leak an idle daemon
                # thread (and its glibc arena); a later run() resubmits and
                # restarts it transparently
                self._ckpt.close()
                if self.profile_dir:
                    jax.profiler.stop_trace()

        summary = self.finalize(n_total)
        return state, summary

    def _checkpoint(self, state: AdaptState) -> None:
        """Submit an async checkpoint, containing write failures.

        A checkpoint is recoverability insurance — its failure (ENOSPC,
        permissions, a dropped tunnel hardening a fetch) must not abort an
        otherwise-healthy multi-hour adaptation run.  Failures surface from
        the worker at the NEXT submit/wait; warn, count, and keep going —
        the next interval retries with a fresh snapshot.

        The submit is NON-BLOCKING: if the previous write is still in
        flight (the 434 MB fetch+write takes ~14-25 s on the tunneled TPU —
        longer than a fast stream's checkpoint interval), this interval is
        SKIPPED rather than stalling dispatch until the writer catches up.
        A blocking submit here coupled the whole dispatch loop to
        checkpoint throughput (the r4 soak's 22 -> 9.9 fps collapse,
        SOAK_r04.json); the cost of skipping is only a staler resume
        point — recoverability cadence degrades, throughput does not.
        Adaptation state is unaffected either way (the deterministic
        materialize boundary at the checkpoint cadence is handled by the
        caller BEFORE this), so bit-exact-resume semantics don't depend on
        which intervals actually wrote."""
        try:
            ok = self._ckpt.submit(osp.join(self.exppath, "checkpoint.npz"),
                                   state, block=False)
            if ok:
                self._ckpt_submitted_frames = self.frames_seen
            if not ok:
                self.ckpt_skipped += 1
                if self.ckpt_skipped in (1, 10, 100) or \
                        self.ckpt_skipped % 1000 == 0:
                    # "busy" and "cooldown" call for opposite responses:
                    # busy means the writer genuinely lags the cadence;
                    # cooldown is the duty-cycle bound working as designed
                    # on an idle writer (expected whenever checkpoint_every
                    # < write_time/duty). Don't send operators hunting for
                    # a slow writer that isn't slow.
                    if self._ckpt.last_refusal == "cooldown":
                        why = ("writer idle but cooling down — the "
                               "bandwidth duty cycle bounds write "
                               "frequency; pass --checkpoint_duty 1.0 "
                               "(fast local disk) to disable the bound")
                    else:
                        why = ("previous write still in flight — the "
                               "writer is slower than checkpoint_every")
                    print(f"---> checkpoint interval skipped "
                          f"({self.ckpt_skipped} skipped so far; {why}; "
                          f"resume point is the last completed write)")
        except RuntimeError as e:
            self.ckpt_failures += 1
            print(f"---> WARNING: {e} — run continues; the checkpoint "
                  f"will be retried at the next interval")

    def _record(self, i: int, out: dict, meta: dict | None = None):
        scalars = {}
        self.frames_seen += 1
        if "mpjpe" in out:
            m = float(np.mean(out["mpjpe"]))
            pa = float(np.mean(out["pampjpe"]))
            pv = float(np.mean(out["pve"]))
            # non-finite frames (divergence; see auto_reset) still reach the
            # scalar log for observability but are excluded from the running
            # aggregates — one NaN would poison every later mean
            if np.isfinite(m) and np.isfinite(pa) and np.isfinite(pv):
                self.mpjpe_all.append(m)
                self.pampjpe_all.append(pa)
                self.pve_all.append(pv)
            scalars.update({
                "metrics/mpjpe": m,
                "metrics/pampjpe": pa,
                "metrics/pve": pv,
            })
        for k, v in out.get("lower", {}).items():
            scalars[f"ll/{k}"] = float(np.mean(v))
        for k, v in out.get("upper", {}).items():
            if k.startswith("teacher_"):
                # reference key namespace: teacher/* (base_adaptor.py:338-343)
                scalars[f"teacher/{k[len('teacher_'):]}"] = float(np.mean(v))
            else:
                scalars[f"ul/{k}"] = float(np.mean(v))
        if "lower" in out and "s2dloss" in out["lower"]:
            self.kp2d_lower.append(float(np.mean(out["lower"]["s2dloss"])))
        if "upper" in out and "s2dloss" in out["upper"]:
            self.kp2d_upper[i] = float(np.mean(out["upper"]["s2dloss"]))
        j = 0
        while f"lower_{j}_mpjpe" in out:
            self.lower_mpjpe.setdefault(j, []).append(
                float(np.mean(out[f"lower_{j}_mpjpe"])))
            self.lower_pampjpe.setdefault(j, []).append(
                float(np.mean(out[f"lower_{j}_pampjpe"])))
            scalars[f"metrics/lower_{j}_mpjpe"] = self.lower_mpjpe[j][-1]
            scalars[f"metrics/lower_{j}_pampjpe"] = self.lower_pampjpe[j][-1]
            j += 1
        if "optim_steps" in out:
            self.optim_step_record.append(int(out["optim_steps"]))
            scalars["dynamic/optim_steps"] = self.optim_step_record[-1]
        if "feat_sim" in out:
            sims = np.asarray(out["feat_sim"])
            self.feat_sims[i] = sims.tolist()
            scalars["feat_sim/cos_sim"] = float(sims.mean())
            scalars["feat_sim/tap12"] = float(sims[12])
        if "per_step_sims" in out:
            nupd = int(out["optim_steps"]) + 1
            # .copy(): these slices are views into the packed window buffer
            # (unpack_outputs) — retaining a view per frame would keep every
            # window's whole flat buffer (~85 KB/frame) alive for the run
            self.step_sims[i] = np.asarray(out["per_step_sims"])[:nupd].copy()
            self.step_losses[i] = np.asarray(
                out["per_step_loss"])[:nupd].copy()
            if "per_step_mpjpe" in out:
                self.step_stats[i] = tuple(
                    np.asarray(out[k])[:nupd].mean(-1)
                    for k in ("per_step_mpjpe", "per_step_pampjpe",
                              "per_step_pve"))
        self.writer.write(i, scalars)

        if self.save_predictions:
            # the reference dumps the weak-perspective cam CONVERTED to a
            # camera translation [cam1, cam2, 2*5000/(224*cam0+1e-9)]
            # under the 'cam' key (dynaboa_internet.py:157-159,
            # dynaboa_benchmark.py:248-254); the raw crop-space cam rides
            # along as 'cam_crop'
            from dynaboa_tpu import constants

            cam = np.asarray(out["cam"])
            tz = (2.0 * constants.FOCAL_LENGTH
                  / (constants.IMG_RES * cam[:, 0] + 1e-9))
            cam_t = np.stack([cam[:, 1], cam[:, 2], tz], axis=-1)
            np.savez(
                osp.join(self.exppath, "result", f"Pred_{i}.npz"),
                verts=out["verts"], cam=cam_t, cam_crop=cam,
                rotmat=out["rotmat"], beta=out["beta"],
            )

        if self.save_overlays and meta and meta.get("imgname"):
            self._render_overlay(i, out, meta)

    def _render_overlay(self, i: int, out: dict, meta: dict):
        """--save_res parity: mesh over the original frame + OBJ dump
        (reference base_adaptor.py:429-443 via the in-repo rasterizer)."""
        path = meta["imgname"]
        if self.img_root and not osp.isabs(path):
            path = osp.join(self.img_root, path)
        if not osp.exists(path) or self.faces is None:
            return
        import cv2

        from dynaboa_tpu.viz.renderer import (Renderer, save_obj,
                                              convert_crop_cam_to_orig_img)

        img = cv2.imread(path)
        if img is None:
            return
        verts = np.asarray(out["verts"])[0]
        cam3 = np.asarray(out["cam"])[0]
        h, w = img.shape[:2]
        # one cached renderer per image size (the reference rebuilds its EGL
        # renderer every frame, dynaboa_webcam.py:77 — deliberately avoided)
        rend = self._renderers.get((w, h))
        if rend is None:
            rend = Renderer(resolution=(w, h), faces=self.faces)
            self._renderers[(w, h)] = rend
        orig_cam = convert_crop_cam_to_orig_img(
            np.asarray(cam3, np.float32).reshape(1, 3),
            np.asarray(meta["bbox"], np.float32).reshape(1, 3), w, h)[0]
        over = rend.render(img, verts, orig_cam,
                           color=(205 / 255, 129 / 255, 98 / 255))
        cv2.imwrite(osp.join(self.exppath, "image", f"Pred_{i}.png"), over)
        save_obj(osp.join(self.exppath, "mesh", f"Pred_{i}.obj"), verts,
                 self.faces)

    @staticmethod
    def _padded_trajectories(traj: dict[int, np.ndarray], prefix: str):
        """Pack ragged per-frame update trajectories into one NaN-padded
        (frames, max_updates) matrix + per-frame counts."""
        if not traj:
            return {}
        keys = list(traj.keys())
        counts = np.array([len(traj[i]) for i in keys], np.int32)
        mat = np.full((len(keys), int(counts.max())), np.nan, np.float32)
        for r, i in enumerate(keys):
            mat[r, : counts[r]] = traj[i]
        return {f"{prefix}_steps": np.asarray(keys),
                f"{prefix}": mat, f"{prefix}_counts": counts}

    def finalize(self, n_total: int) -> dict:
        """Artifact-dump parity with reference dynaboa_benchmark.py:105-123."""
        ex = self.exppath
        self.writer.flush()
        mean = lambda v: float(np.mean(v)) if len(v) else float("nan")
        # the FIRST materialization batch absorbs XLA compilation (all of its
        # frames share one compile-tainted dt, and it can exceed
        # defer_window when chunking/windowing batch frames); report
        # steady-state throughput when anything lies beyond it
        first_n = self._first_batch_frames or self.defer_window
        steady = (self.step_times[first_n:]
                  if len(self.step_times) > first_n
                  else self.step_times)
        summary = {
            "mpjpe": mean(self.mpjpe_all),
            "pampjpe": mean(self.pampjpe_all),
            "pve": mean(self.pve_all),
            "frames": self.frames_seen,
            "frames_total": n_total,
            "fps": 1.0 / mean(steady) if steady else 0.0,
            "checkpoint_failures": self.ckpt_failures,
            "checkpoint_skipped": self.ckpt_skipped,
        }
        print("--- Final ---")
        print(f"MPJPE:{summary['mpjpe']}, PAMPJPE:{summary['pampjpe']}, "
              f"PVE:{summary['pve']}  ({summary['fps']:.2f} adapted fps)")

        np.savez(osp.join(ex, "res.npz"), mpjpe=self.mpjpe_all,
                 pampjpe=self.pampjpe_all, pve=self.pve_all)
        np.savez(osp.join(ex, "lower_res.npz"),
                 mpjpe=np.array([self.lower_mpjpe[k] for k in
                                 sorted(self.lower_mpjpe)], dtype=object),
                 pampjpe=np.array([self.lower_pampjpe[k] for k in
                                   sorted(self.lower_pampjpe)], dtype=object),
                 allow_pickle=True)
        np.savez(osp.join(ex, "lowerlevel_kp2dloss.npz"),
                 kp2dloss=self.kp2d_lower)
        np.savez(osp.join(ex, "upperlevel_kp2dloss.npz"),
                 steps=list(self.kp2d_upper.keys()),
                 kp2dloss=list(self.kp2d_upper.values()))
        if self.feat_sims:
            np.savez(osp.join(ex, "feat_sims.npz"),
                     steps=list(self.feat_sims.keys()),
                     sims=np.asarray(list(self.feat_sims.values())),
                     **self._padded_trajectories(self.step_sims, "per_step"))
        if self.step_stats:
            # steps_statistic_res parity (reference dynaboa_benchmark.py:
            # 111-123,158-191): MPJPE/PA-MPJPE/PVE after EVERY dynamic update
            stats = {i: v[0] for i, v in self.step_stats.items()}
            np.savez(
                osp.join(ex, "steps_statistic_res.npz"),
                **self._padded_trajectories(stats, "mpjpe"),
                **self._padded_trajectories(
                    {i: v[1] for i, v in self.step_stats.items()}, "pampjpe"),
                **self._padded_trajectories(
                    {i: v[2] for i, v in self.step_stats.items()}, "pve"),
                **self._padded_trajectories(self.step_losses, "upper_loss"),
            )
        np.savez(osp.join(ex, "optim_step_record.npz"),
                 step=self.optim_step_record)
        with open(osp.join(ex, "res.txt"), "w") as f:
            f.write(f"MPJPE:{summary['mpjpe']}, "
                    f"PAMPJPE:{summary['pampjpe']}, PVE:{summary['pve']}\n")
            for k in sorted(self.lower_mpjpe):
                f.write(f"Lower-level Step:{k} "
                        f"MPJPE:{mean(self.lower_mpjpe[k])}, "
                        f"PAMPJPE:{mean(self.lower_pampjpe[k])}\n")
        return summary
