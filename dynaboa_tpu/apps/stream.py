#!/usr/bin/env python
"""Live webcam / video streaming adaptation with mesh overlay.

Capability parity with reference ``dynaboa_webcam.py``: capture -> 2D
keypoints -> keypoint-extent bbox crop (scaleFactor 1.2, conf binarized at
0.3) -> dynamic bilevel adaptation with losses over the 25 OpenPose joints ->
rendered overlay -> display / video writer.  The 'r' key (display mode)
resets model+teacher+optimizer (the divergence remedy, reference
reload():184-195); frames with no detected person pass through unadapted
(reference dynaboa_webcam.py:404,420-424).

Keypoint sources: --kp_source openpose (live bindings), or precomputed npz
(--kp_file) so the path runs without native pose dependencies.

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


def keypoints_to_frame(image_rgb: np.ndarray, kp2d: np.ndarray,
                       scale_factor: float = 1.2):
    """bbox from keypoint extremes + crop + conf binarization
    (reference dynaboa_webcam.py dataprocess():197-217)."""
    from dynaboa_tpu.data.streams import crop_and_normalize
    from dynaboa_tpu.ops import image as I

    kp = kp2d[0].copy()
    lo = kp[:, :2].min(0)
    hi = kp[:, :2].max(0)
    center = [(hi[0] + lo[0]) / 2, (hi[1] + lo[1]) / 2]
    scale = scale_factor * max(hi[0] - lo[0], hi[1] - lo[1]) / 200.0
    bbox = np.array([center[0], center[1], scale * 200.0], np.float32)

    kp[:, 2] = kp[:, 2] > 0.3
    kp_normed = I.normalize_j2d(kp, center, scale)
    # pad to the 49-slot layout (OpenPose half populated, GT half zero)
    j2d49 = np.zeros((49, 3), np.float32)
    j2d49[:25] = kp_normed

    img = crop_and_normalize(image_rgb, center, scale)
    return img, j2d49, bbox


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
    engine = system.engine
    state = engine.init_state(system.params)

    if args.kp_source == "openpose":
        provider = OpenPoseProvider(args.openpose_models)
    else:
        if not args.kp_file:
            raise SystemExit("--kp_file required with --kp_source precomputed")
        provider = PrecomputedKeypoints(args.kp_file)

    src = args.camera_id if args.capture_mode == "webcam" else args.video_file
    if args.capture_mode == "video":
        cap = cv2.VideoCapture(src)
        read_next = lambda: cap.read()
    else:
        source = FrameSource(src)
        read_next = lambda: (True, source.read()[1])

    renderer = Renderer(faces=system.smpls.neutral.faces)
    writer = None
    zeros72 = np.zeros((1, 72), np.float32)
    zeros10 = np.zeros((1, 10), np.float32)
    gender = np.zeros((1,), np.int32)

    frame_idx = 0
    while True:
        ok, frame_bgr = read_next()
        if not ok or frame_bgr is None:
            break
        frame_rgb = frame_bgr[:, :, ::-1].astype(np.float32)
        kp2d = provider.estimate(frame_bgr)

        if kp2d is None:
            out_img = frame_bgr  # nobody detected: pass the frame through
        else:
            img, j2d49, bbox = keypoints_to_frame(frame_rgb, kp2d)
            f = Frame(image=img[None], j2d=j2d49[None], pose=zeros72,
                      betas=zeros10, gender=gender)
            state, out = engine.step(state, f)
            verts = np.asarray(out["verts"][0])
            cam = np.asarray(out["cam"])
            h, w = frame_bgr.shape[:2]
            orig_cam = convert_crop_cam_to_orig_img(cam, bbox[None], w, h)[0]
            out_img = renderer.render(frame_bgr, verts, orig_cam,
                                      color=(205 / 255, 129 / 255, 98 / 255))

        if args.out_video:
            if writer is None:
                writer = cv2.VideoWriter(
                    args.out_video, cv2.VideoWriter_fourcc(*"mp4v"),
                    args.out_fps, (out_img.shape[1], out_img.shape[0]))
            writer.write(out_img)
        if args.display:
            cv2.imshow("dynaboa_tpu", out_img)
            key = cv2.waitKey(1) & 0xFF
            if key == ord("q"):
                break
            if key == ord("r"):
                state = engine.init_state(system.params)
                print("the adaptor is reset")
        frame_idx += 1

    if writer is not None:
        writer.release()
    print(f"processed {frame_idx} frames")
    return frame_idx


if __name__ == "__main__":
    main()
