#!/usr/bin/env python
"""Measure the stream (webcam/video) app's end-to-end throughput on the TPU.

Drives ``dynaboa_tpu.apps.stream`` in video mode over a synthetic clip with
precomputed BODY_25 keypoints — the full product path: decode -> bbox crop ->
dynamic bilevel adaptation (OpenPose-joint losses, no retrieval, per the
webcam config) -> one-frame-lag verts fetch -> rasterized overlay -> video
writer.  Reports fps excluding the first (compile-tainted) frame.

Usage: python tools/bench_stream_app.py [--frames 100] [--fused 1]
"""

from __future__ import annotations

import argparse
import os.path as osp
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


# A rough standing BODY_25 layout (x, y in a unit person box), so the
# keypoint target is CONSISTENT frame to frame.  Uniformly random keypoints
# per frame give the adaptor an unlearnable target: the model diverges, the
# similarity gate fires every frame, and (pre-guard) exploded vertices made
# the rasterizer scan the whole screen per triangle — benchmarking
# divergence rather than throughput.
_SKELETON = np.array([
    [0.50, 0.08], [0.50, 0.22], [0.38, 0.22], [0.33, 0.38], [0.30, 0.52],
    [0.62, 0.22], [0.67, 0.38], [0.70, 0.52], [0.50, 0.52], [0.42, 0.52],
    [0.42, 0.72], [0.42, 0.92], [0.58, 0.52], [0.58, 0.72], [0.58, 0.92],
    [0.47, 0.06], [0.53, 0.06], [0.44, 0.08], [0.56, 0.08], [0.60, 0.96],
    [0.62, 0.96], [0.57, 0.94], [0.40, 0.96], [0.38, 0.96], [0.43, 0.94],
], np.float32)


def make_clip(path: str, n: int, w: int = 320, h: int = 240, seed: int = 0):
    import cv2

    rng = np.random.default_rng(seed)
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30, (w, h))
    # smooth mid-gray frames with a dark person-box blob: pure per-pixel
    # noise gives the backbone garbage features, the adaptor diverges, and
    # the bench ends up measuring divergence handling instead of throughput
    base = np.full((h, w, 3), 128, np.uint8)
    base[30:210, 110:210] = 90
    for _ in range(n):
        frame = base + rng.integers(-6, 7, size=(h, w, 3)).astype(np.int16)
        vw.write(np.clip(frame, 0, 255).astype(np.uint8))
    vw.release()
    kps = np.zeros((n, 25, 3), np.float32)
    # person box centered in frame, gentle per-frame jitter (~real tracking)
    box_x, box_y, box_w, box_h = 110.0, 30.0, 100.0, 180.0
    base = np.stack([box_x + _SKELETON[:, 0] * box_w,
                     box_y + _SKELETON[:, 1] * box_h], -1)
    kps[:, :, :2] = base[None] + rng.normal(scale=1.5, size=(n, 25, 2))
    kps[:, :, 2] = 0.9
    return kps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=100)
    ap.add_argument("--fused", type=int, default=1)
    ap.add_argument("--warmup", type=int, default=2,
                    help="frames at the head treated as compile warmup")
    ap.add_argument("--compute_dtype", default="bfloat16")
    args = ap.parse_args()

    from dynaboa_tpu.apps import stream

    with tempfile.TemporaryDirectory() as d:
        vid = osp.join(d, "clip.mp4")
        kps = make_clip(vid, args.frames + args.warmup)
        kp_file = osp.join(d, "kps.npz")
        np.savez(kp_file, keypoints=kps)

        argv = ["--expdir", d, "--expname", "bench_stream",
                "--capture_mode", "video", "--video_file", vid,
                "--kp_file", kp_file,
                "--out_video", osp.join(d, "out.mp4"),
                "--fused_preprocess", str(args.fused),
                "--compute_dtype", args.compute_dtype,
                "--record_lowerlevel", "0"]

        # The app reports steady-state fps itself (excluding the
        # compile/cache-load-tainted head frames); capture and parse it.
        import contextlib
        import io
        import re

        buf = io.StringIO()
        t0 = time.perf_counter()
        with contextlib.redirect_stdout(buf):
            n = stream.main(argv)
        dt = time.perf_counter() - t0
        text = buf.getvalue()
        sys.stdout.write(text)
        m = re.search(r"steady: ([\d.]+) fps", text)
        steady = float(m.group(1)) if m else n / dt
        print(f"stream app: {n} frames, wall {dt:.2f}s, steady "
              f"{steady:.2f} fps (fused={args.fused}, {args.compute_dtype})")
        return steady


if __name__ == "__main__":
    main()
