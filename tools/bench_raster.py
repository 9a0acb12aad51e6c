#!/usr/bin/env python
"""Measure the rasterizer on a REAL-SMPL-shaped workload (VERDICT r3 weak 8).

The stream-app bench renders the synthetic SMPL stand-in — a noise blob
whose silhouette spans most of the crop — so its 37.7 ms/frame raster cost
overstates a real body.  This tool rasterizes a closed capsule mesh with the
real SMPL budget (6,880 vertices / 13,600 triangles, vs SMPL's
6,890 / 13,776) at human-like screen coverage and reports measured
ms/frame, replacing the "~3x faster with real assets" estimate with a
number.

Usage: python tools/bench_raster.py [--w 320] [--h 240] [--frames 50]
"""

from __future__ import annotations

import argparse
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def capsule_mesh(rings: int = 87, segs: int = 80,
                 height: float = 1.55, radius: float = 0.16):
    """Closed capsule with ~SMPL vertex/triangle counts, human proportions
    (1.7 units tall incl. caps, 0.32 wide — a standing body silhouette)."""
    vs, fs = [], []
    for i in range(rings):
        t = i / (rings - 1)                      # 0 bottom .. 1 top
        # capsule profile: hemispherical caps, cylindrical trunk
        cap = 0.15
        if t < cap:
            r = radius * np.sin(0.5 * np.pi * t / cap)
            y = -height / 2 - radius * np.cos(0.5 * np.pi * t / cap)
        elif t > 1 - cap:
            u = (1 - t) / cap
            r = radius * np.sin(0.5 * np.pi * u)
            y = height / 2 + radius * np.cos(0.5 * np.pi * u)
        else:
            r = radius
            y = -height / 2 + (t - cap) / (1 - 2 * cap) * height
        for j in range(segs):
            a = 2 * np.pi * j / segs
            vs.append([r * np.cos(a), y, r * np.sin(a)])
    for i in range(rings - 1):
        for j in range(segs):
            a = i * segs + j
            b = i * segs + (j + 1) % segs
            c = (i + 1) * segs + j
            d = (i + 1) * segs + (j + 1) % segs
            fs.append([a, b, c])
            fs.append([b, d, c])
    return (np.asarray(vs, np.float32), np.asarray(fs, np.int32))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--w", type=int, default=320)
    ap.add_argument("--h", type=int, default=240)
    ap.add_argument("--frames", type=int, default=50)
    args = ap.parse_args()

    from dynaboa_tpu.viz.renderer import Renderer

    verts, faces = capsule_mesh()
    print(f"mesh: {len(verts)} verts / {len(faces)} tris "
          f"(SMPL: 6890 / 13776)")
    img = np.full((args.h, args.w, 3), 128, np.uint8)
    rend = Renderer(resolution=(args.w, args.h), faces=faces)
    print(f"native rasterizer: {rend.use_native}")

    # body fills ~75% of frame height (standing person in a webcam crop)
    s = 0.75 / 0.85
    rng = np.random.default_rng(0)
    for label, scale in [("body-size (75% of frame height)", 1.0),
                         ("close-up (silhouette ~2x linear)", 2.0)]:
        cam = np.array([s * scale, s * scale, 0.0, 0.0], np.float32)
        rend.render(img, verts, cam)           # warm
        t0 = time.perf_counter()
        for i in range(args.frames):
            jitter = verts + rng.normal(scale=0.002, size=(1, 3)).astype(
                np.float32)
            out = rend.render(img, jitter, cam)
        dt = (time.perf_counter() - t0) / args.frames * 1e3
        cover = float((out != img).any(-1).mean())
        print(f"{label}: {dt:.2f} ms/frame ({cover * 100:.0f}% pixel "
              f"coverage at {args.w}x{args.h})")


if __name__ == "__main__":
    main()
