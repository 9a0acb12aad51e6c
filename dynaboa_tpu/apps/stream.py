#!/usr/bin/env python
"""Live webcam / video streaming adaptation with mesh overlay.

Capability parity with reference ``dynaboa_webcam.py``: capture -> 2D
keypoints -> keypoint-extent bbox crop (scaleFactor 1.2, conf binarized at
0.3) -> dynamic bilevel adaptation with losses over the 25 OpenPose joints ->
rendered overlay -> display / video writer.  The 'r' key (display mode)
resets model+teacher+optimizer while PRESERVING the motion-history ring and
frame counter, exactly like the reference's ``reload()`` which leaves
``self.history`` untouched (dynaboa_webcam.py:184-195); frames with no
detected person pass through unadapted (dynaboa_webcam.py:404,420-424).

Pipelining (headless mode): adaptation steps dispatch ahead of rendering by
two frames; each record's verts fetch starts immediately in a thread pool
(riding out the step's compute tail and the ~31 ms tunnel round trip), and
a render/write worker thread consumes records in order.  A per-frame
blocking fetch was the measured ~13 fps ceiling on tunneled TPUs
(docs/PERF.md).  Display mode stays synchronous with one frame of lag
(cv2.imshow + keys need the main thread).

Keypoint sources: --kp_source openpose (live bindings), or precomputed npz
(--kp_file) so the path runs without native pose dependencies.
``--fused_preprocess 1`` crops/resizes/normalizes on device (one jitted
gather graph per raw frame shape) instead of on the host.

Usage:
  python -m dynaboa_tpu.apps.stream --capture_mode video --video_file in.mp4 \
      --kp_file kps.npz --out_video out.mp4
"""

from __future__ import annotations

import os
import os.path as osp

import numpy as np



def build_parser():
    from dynaboa_tpu.apps.benchmark import build_parser as base_parser

    p = base_parser()
    p.set_defaults(expname="stream",
                   # webcam path runs without retrieval / mixtrain
                   retrieval=0, lower_level_mixtrain=0, upper_level_mixtrain=0,
                   record_lowerlevel=0)
    p.add_argument("--capture_mode", type=str, default="webcam",
                   choices=["webcam", "video"])
    p.add_argument("--camera_id", type=int, default=0)
    p.add_argument("--video_file", type=str, default=None)
    p.add_argument("--kp_source", type=str, default="precomputed",
                   choices=["openpose", "precomputed"])
    p.add_argument("--kp_file", type=str, default=None,
                   help="npz with (N, 25, 3) BODY_25 keypoints")
    p.add_argument("--openpose_models", type=str, default=None)
    p.add_argument("--out_video", type=str, default=None)
    p.add_argument("--display", type=int, default=0, choices=[0, 1])
    p.add_argument("--out_fps", type=float, default=10.0)
    p.add_argument("--test_basemodel", type=int, default=0)
    return p


def keypoints_to_bbox(kp2d: np.ndarray, scale_factor: float = 1.2):
    """bbox from keypoint extremes + conf binarization
    (reference dynaboa_webcam.py dataprocess():197-217).  The
    extremes->(center, scale) math is shared with the offline internet
    preprocess so the live and offline crop conventions cannot diverge."""
    from dynaboa_tpu.data.preprocess.internet import bbox_from_kp

    kp = kp2d[0].copy()
    center, scale = bbox_from_kp(kp, scale_factor)
    center = np.asarray(center, np.float32)
    bbox = np.array([center[0], center[1], scale * 200.0], np.float32)
    kp[:, 2] = kp[:, 2] > 0.3
    return kp, center, float(scale), bbox


def keypoints_to_frame(image_rgb: np.ndarray, kp2d: np.ndarray,
                       scale_factor: float = 1.2, fused: bool = False):
    """Crop + normalize the frame around the keypoint bbox; ``fused`` runs
    the crop/resize/normalize on device (runner's fused gather graph).

    ``image_rgb`` may be uint8 — in fused mode it is uploaded as-is (4x
    fewer bytes over the tunnel) and cast to float on device, saving the
    host-side full-frame astype (~3 ms/frame on the 1-core stream host)."""
    from dynaboa_tpu.data.streams import crop_and_normalize
    from dynaboa_tpu.ops import image as I

    kp, center, scale, bbox = keypoints_to_bbox(kp2d, scale_factor)
    kp_normed = I.normalize_j2d(kp, center, scale)
    # pad to the 49-slot layout (OpenPose half populated, GT half zero)
    j2d49 = np.zeros((49, 3), np.float32)
    j2d49[:25] = kp_normed

    if fused:
        from dynaboa_tpu.engine.runner import _fused_preprocess

        img = _fused_preprocess(np.ascontiguousarray(image_rgb),
                                center, scale, 224)
    else:
        if image_rgb.dtype != np.float32:
            image_rgb = image_rgb.astype(np.float32)
        img = crop_and_normalize(image_rgb, center, scale)
    return img, j2d49, bbox


class AdaptPipeline:
    """Depth-N-lag adaptation pipeline over an ordered frame stream.

    ``submit`` dispatches frame t's step asynchronously and returns the
    COMPLETED record of frame t-depth (or the pass-through record, for
    frames with no detected person — those ride the same queue so output
    order is preserved).  ``drain`` pops remaining records one at a time
    (None when empty).

    ``fetch_fn`` (optional) transforms each output record at submit time —
    the stream app passes a thread-pool fetch so the blocking device->host
    read of frame t's verts starts IMMEDIATELY (in a pool thread, riding
    out the step's compute tail + the ~31 ms tunnel round trip) while the
    main thread moves on; with depth 2 the fetch has two frame periods to
    complete before the renderer needs it.  No copy_to_host_async here: on
    the tunneled TPU it blocks the calling thread until the step's compute
    completes (~19 ms measured)."""

    def __init__(self, engine, state, depth: int = 1, fetch_fn=None,
                 augment_fn=None):
        import collections

        self.engine = engine
        self.state = state
        self.depth = depth
        self.fetch_fn = fetch_fn
        # augment_fn(frame, out) -> out: attach extra per-frame outputs
        # (e.g. the frozen base model's prediction for --test_basemodel)
        # before the fetch transform sees the record
        self.augment_fn = augment_fn
        self._pending = collections.deque()

    def _push(self, rec):
        self._pending.append(rec)
        if len(self._pending) > self.depth:
            return self._pending.popleft()
        return None

    def submit(self, frame, ctx):
        self.state, out = self.engine.step(self.state, frame)
        if self.augment_fn is not None:
            out = self.augment_fn(frame, out)
        if self.fetch_fn is not None:
            out = self.fetch_fn(out)
        return self._push((out, ctx))

    def submit_passthrough(self, ctx):
        return self._push((None, ctx))

    def drain(self):
        return self._pending.popleft() if self._pending else None

    def sync(self):
        """Block until every in-flight record has completed — the warmup
        barrier.  The tunnel service's FIRST execution of a freshly loaded
        program can take minutes (observed 15-683 s for identical work);
        without a barrier that stall lands on the first renders instead of
        the warmup frames."""
        for out, _ in self._pending:
            if out is None:
                continue
            if hasattr(out, "result"):
                out.result()
            else:
                np.asarray(out["cam"])

    def reset(self, engine_params):
        """The divergence remedy (reference reload():184-195): model,
        teacher and optimizer return to the pristine base weights while the
        motion-history ring, frame counter and RNG stream survive — the
        reference's ``self.history`` dict is likewise untouched."""
        fresh = self.engine.init_state(
            engine_params,
            batch_size=int(self.state.hist_images.shape[1]),
            img_res=int(self.state.hist_images.shape[2]))
        self.state = self.state._replace(
            params=fresh.params,
            teacher_params=fresh.teacher_params,
            opt_state=fresh.opt_state)


def main(argv=None):
    args = build_parser().parse_args(argv)
    exppath = osp.join(args.expdir, args.expname)
    os.makedirs(exppath, exist_ok=True)

    import cv2

    from dynaboa_tpu.apps.benchmark import cfg_from_args
    from dynaboa_tpu.apps.common import build_system, write_settings
    from dynaboa_tpu.config import Paths
    from dynaboa_tpu.engine.bilevel import Frame
    from dynaboa_tpu.viz.capture import (
        FrameSource,
        OpenPoseProvider,
        PrecomputedKeypoints,
    )
    from dynaboa_tpu.viz.renderer import Renderer, convert_crop_cam_to_orig_img

    write_settings(exppath, args)
    cfg = cfg_from_args(args).replace(keypoint_source="openpose")
    paths = Paths(basemodel=args.model_file)
    tiny = dict(model_kwargs=dict(layers=(1, 1, 1, 1), width=16,
                                  regressor_dim=128),
                num_vertices=256) if getattr(args, "tiny", 0) else {}
    system = build_system(cfg, paths, compute_metrics=False, **tiny)
    fused = bool(getattr(args, "fused_preprocess", 0))

    if args.kp_source == "openpose":
        provider = OpenPoseProvider(args.openpose_models)
    else:
        if not args.kp_file:
            raise SystemExit("--kp_file required with --kp_source precomputed")
        provider = PrecomputedKeypoints(args.kp_file)

    src = args.camera_id if args.capture_mode == "webcam" else args.video_file
    if args.capture_mode == "video":
        if not args.video_file:
            raise SystemExit("--video_file required with "
                             "--capture_mode video")
        cap = cv2.VideoCapture(src)
        if not cap.isOpened():
            raise SystemExit(f"cannot open video file {src!r}")
        read_next = lambda: cap.read()
    else:
        source = FrameSource(src)
        last_tick = [0]

        def read_next():
            # wait for a NEW tick: re-adapting the ring's latest frame at
            # full loop speed would desync PrecomputedKeypoints' per-call
            # index and write unbounded duplicate frames; a dead/ended
            # camera terminates the loop instead of replaying forever
            while True:
                tick, frame = source.read()
                if tick != last_tick[0]:
                    last_tick[0] = tick
                    return True, frame
                if source.ended:
                    return False, None
                _time.sleep(0.001)

    renderer = Renderer(faces=system.smpls.neutral.faces)
    writer = None
    zeros72 = np.zeros((1, 72), np.float32)
    zeros10 = np.zeros((1, 10), np.float32)
    gender = np.zeros((1,), np.int32)

    import jax
    import jax.numpy as jnp
    import time as _time

    # ONE device->host round trip per record (~31 ms each on the tunneled
    # TPU): verts+cam ride a single packed buffer instead of two fetches.
    # The batch-0 slice happens INSIDE the jit — an eager out["verts"][0]
    # would trigger its own remote compile on this platform (docs/PERF.md)
    _pack_vc = jax.jit(lambda v, c: jnp.concatenate(
        [v[0].reshape(-1), c.reshape(-1)]).astype(jnp.float32))

    def fetch_record(out):
        """Materialize {verts: (V,3), cam: (1,3)} with one packed fetch."""
        vshape, cshape = out["verts"].shape, out["cam"].shape
        nv = int(np.prod(vshape[1:]))
        flat = np.asarray(_pack_vc(out["verts"], out["cam"]))
        return {"verts": flat[:nv].reshape(vshape[1:]),
                "cam": flat[nv:].reshape(cshape)}

    # --test_basemodel (reference dynaboa_webcam.py:330-336, 414-417): the
    # FROZEN base model predicts the same crop and renders side by side
    # with the adapted mesh, so drift/improvement is visible live.  The
    # pristine weights stay in system.params (init_state copies them).
    base_params = system.params if args.test_basemodel else None

    E = {"fetch": 0.0, "render": 0.0, "write": 0.0, "n": 0}

    def emit(rec) -> bool:
        """Render + write/display one completed record.  Returns False when
        the user quit."""
        nonlocal writer
        out, ctx = rec
        frame_bgr = ctx["frame_bgr"]

        def render_one(fetched, color):
            # fetched: host {verts: (V,3), cam: (3,)} from fetch_record
            verts, cam = fetched["verts"], fetched["cam"]
            if not (np.isfinite(verts).all() and np.isfinite(cam).all()):
                # diverged weights (the reference's remedy is the manual
                # 'r' reload) — pass the frame through instead of feeding
                # the rasterizer NaNs
                return frame_bgr
            h, w = frame_bgr.shape[:2]
            orig_cam = convert_crop_cam_to_orig_img(
                cam, ctx["bbox"][None], w, h)[0]
            return renderer.render(frame_bgr, verts, orig_cam, color=color)

        _t0 = _time.perf_counter()
        if out is None:
            out_img = frame_bgr          # nobody detected: pass through
            if base_params is not None:
                # keep the writer's double-width geometry stable
                # (reference dynaboa_webcam.py:421-424 pads likewise)
                out_img = np.concatenate([out_img, frame_bgr], axis=1)
            E["render"] += _time.perf_counter() - _t0
        else:
            if hasattr(out, "result"):   # fetch-pool future (headless mode)
                out = out.result()
            else:                        # display mode: raw device arrays
                base = out.get("base")
                out = fetch_record(out)
                if base is not None:
                    out["base"] = fetch_record(base)
            E["fetch"] += _time.perf_counter() - _t0
            _t0 = _time.perf_counter()
            out_img = render_one(out, color=(205 / 255, 129 / 255, 98 / 255))
            if base_params is not None:
                # frozen base model beside the adapted mesh (reference's
                # test_basemodel view, color swapped like its [100,100,200])
                base_img = render_one(out["base"],
                                      color=(100 / 255, 100 / 255, 200 / 255))
                out_img = np.concatenate([out_img, base_img], axis=1)
            E["render"] += _time.perf_counter() - _t0
        _t0 = _time.perf_counter()
        if args.out_video:
            if writer is None:
                writer = cv2.VideoWriter(
                    args.out_video, cv2.VideoWriter_fourcc(*"mp4v"),
                    args.out_fps, (out_img.shape[1], out_img.shape[0]))
            writer.write(out_img)
        E["write"] += _time.perf_counter() - _t0
        E["n"] += 1
        if args.display:
            cv2.imshow("dynaboa_tpu", out_img)
            key = cv2.waitKey(1) & 0xFF
            if key == ord("q"):
                return False
            if key == ord("r"):
                pipeline.reset(system.params)
                print("the adaptor is reset")
        return True

    frame_idx = 0

    # Rendering/writing runs on a worker thread in headless mode, so the
    # verts fetch + rasterize + mp4 encode of frame t-1 overlaps the
    # decode/preprocess/dispatch of frame t (the 'q'/'r' keys need
    # cv2.imshow on the main thread, so display mode stays synchronous).
    emit_q = None
    fetch_pool = None
    fetch_fn = None
    if not args.display:
        import queue
        import threading
        from concurrent.futures import ThreadPoolExecutor

        emit_q = queue.Queue(maxsize=8)
        # Each blocking device->host fetch costs a full tunnel round trip
        # (~31 ms measured) regardless of size — latency, not bandwidth —
        # so in-flight fetches in pool threads overlap the device compute
        # and each other.  The pool fetches out of order; emit_q keeps the
        # render/write order.
        fetch_pool = ThreadPoolExecutor(max_workers=4)

        def fetch(out):
            base = out.get("base")
            rec = fetch_record(out)
            if base is not None:
                rec["base"] = fetch_record(base)
            return rec

        fetch_fn = lambda out: fetch_pool.submit(fetch, out)

        # A render/write/fetch failure must NOT kill the worker silently —
        # the bounded emit_q would fill and the main loop would hang
        # forever in put().  Latch the first error, keep draining, and let
        # the main loop stop and re-raise it.
        emit_err: list[BaseException] = []

        def emit_worker():
            while True:
                rec = emit_q.get()
                if rec is None:
                    return
                if emit_err:
                    continue             # error latched: drain without work
                try:
                    emit(rec)
                except BaseException as e:  # noqa: BLE001 — re-raised below
                    emit_err.append(e)

        emit_thread = threading.Thread(target=emit_worker, daemon=True)
        emit_thread.start()
    else:
        emit_err = []

    augment_fn = None
    if base_params is not None:
        if fused:
            raise SystemExit("--test_basemodel requires --fused_preprocess 0"
                             " (the base predict runs on the host crop)")

        def augment_fn(frame, out):
            pred = system.engine.predict(base_params, frame.image)
            return dict(out, base={"verts": pred["verts"],
                                   "cam": pred["cam"]})

    # depth 2 in headless mode: rendering lags the stream by two frames,
    # which gives each record's fetch two frame periods (~compute tail +
    # round trip) to finish before the renderer blocks on it
    pipeline = AdaptPipeline(system.engine,
                             system.engine.init_state(system.params),
                             depth=1 if args.display else 2,
                             fetch_fn=fetch_fn, augment_fn=augment_fn)

    def deliver(rec) -> bool:
        if emit_q is not None:
            emit_q.put(rec)
            return True
        return emit(rec)

    import time

    warmup, t_steady = 3, None
    synced, steady_at = False, None
    # DYNABOA_STREAM_TIMING=1 prints a per-phase main-loop breakdown at the
    # end (ms/frame over the steady window) — the app measures itself
    # because external replicas of this loop keep measuring differently
    timing = os.environ.get("DYNABOA_STREAM_TIMING") == "1"
    T = {"read": 0.0, "kp": 0.0, "prep": 0.0, "submit": 0.0, "deliver": 0.0}

    ok_continue = True
    while True:
        t0 = time.perf_counter()
        ok, frame_bgr = read_next()
        if not ok or frame_bgr is None:
            break
        t1 = time.perf_counter()
        frame_rgb = frame_bgr[:, :, ::-1]   # uint8 view; cast happens
        kp2d = provider.estimate(frame_bgr)  # on device (fused) or in prep
        t2 = time.perf_counter()

        if kp2d is None:
            t3 = t2
            done = pipeline.submit_passthrough({"frame_bgr": frame_bgr})
            t4 = time.perf_counter()
        else:
            img, j2d49, bbox = keypoints_to_frame(frame_rgb, kp2d,
                                                  fused=fused)
            t3 = time.perf_counter()
            f = Frame(image=img[None] if fused else
                      jax.device_put(img[None]),
                      j2d=j2d49[None], pose=zeros72,
                      betas=zeros10, gender=gender)
            done = pipeline.submit(f, {"frame_bgr": frame_bgr, "bbox": bbox})
            t4 = time.perf_counter()
        ok_continue = True
        if done is not None:
            ok_continue = deliver(done)
        t5 = time.perf_counter()
        if t_steady is not None:
            T["read"] += t1 - t0
            T["kp"] += t2 - t1
            T["prep"] += t3 - t2
            T["submit"] += t4 - t3
            T["deliver"] += t5 - t4
        frame_idx += 1
        if not ok_continue or emit_err:
            break
        if not synced and kp2d is not None:
            # warmup barrier: compile/cache-load AND the service's slow
            # first execution complete inside the FIRST DISPATCHED frame —
            # keyed on the first real submit, not frame index, so a stream
            # whose opening frames have no detected person doesn't land
            # the (observed 15-683 s) first-execution stall mid-measurement
            pipeline.sync()
            synced = True
            steady_at = frame_idx + warmup - 1
        if steady_at is not None and frame_idx == steady_at:
            t_steady = time.perf_counter()

    t_tail = time.perf_counter()
    while ok_continue and not emit_err and \
            (tail := pipeline.drain()) is not None:
        ok_continue = deliver(tail)
    if emit_q is not None:
        emit_q.put(None)
        emit_thread.join()
        fetch_pool.shutdown()
    if timing:
        print(f"tail drain+join: {time.perf_counter() - t_tail:.2f}s")

    if t_steady is not None and frame_idx > steady_at:
        n = frame_idx - steady_at
        fps = n / (time.perf_counter() - t_steady)
        print(f"steady: {fps:.2f} fps over {n} frames "
              f"(excl. {steady_at} warmup)")
        if timing:
            print("main-loop ms/frame: " +
                  " ".join(f"{k}={1e3 * v / n:.1f}" for k, v in T.items()))
            ne = max(E["n"], 1)
            print("emit ms/record: " +
                  " ".join(f"{k}={1e3 * E[k] / ne:.1f}"
                           for k in ("fetch", "render", "write")))
    if writer is not None:
        writer.release()
    if emit_err:
        raise RuntimeError("render/write worker failed") from emit_err[0]
    print(f"processed {frame_idx} frames")
    return frame_idx


if __name__ == "__main__":
    main()
