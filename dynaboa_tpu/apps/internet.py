#!/usr/bin/env python
"""Internet-video streaming adaptation (no ground truth).

CLI parity with reference ``dynaboa_internet.py``: identical adaptation
stack; inference caches per-frame verts / cam translation / rotmat / betas
(reference dynaboa_internet.py:144-168) instead of computing metrics.

Usage:
  python -m dynaboa_tpu.apps.internet --expdir exps --expname internet
"""

from __future__ import annotations

import os
import os.path as osp

from dynaboa_tpu.apps.benchmark import build_parser, cfg_from_args


def main(argv=None):
    parser = build_parser()
    parser.set_defaults(dataset="internet", expname="internet",
                        # reference run_on_internet.sh:1-9 preset
                        shape_prior_weight=2e-4)
    args = parser.parse_args(argv)
    exppath = osp.join(args.expdir, args.expname)
    os.makedirs(exppath, exist_ok=True)

    from dynaboa_tpu.apps.common import build_system, write_settings
    from dynaboa_tpu.config import Paths
    from dynaboa_tpu.data import InternetStream, SyntheticStream
    from dynaboa_tpu.engine.runner import StreamRunner

    write_settings(exppath, args)
    cfg = cfg_from_args(args)
    paths = Paths(basemodel=args.model_file)
    # unlabeled stream: metrics are undefined, predictions are the output
    tiny = dict(model_kwargs=dict(layers=(1, 1, 1, 1), width=16,
                                  regressor_dim=128),
                num_vertices=256) if getattr(args, "tiny", 0) else {}
    system = build_system(cfg, paths, compute_metrics=False, **tiny)

    fused = bool(getattr(args, "fused_preprocess", 0))
    if args.synthetic:
        stream = SyntheticStream(num_frames=args.synthetic, seed=args.seq_seed,
                                 fused_preprocess=fused)
    else:
        stream = InternetStream(paths.internet_root, fused_preprocess=fused)

    runner = StreamRunner(system.engine, exppath, save_predictions=True,
                          checkpoint_every=args.checkpoint_every,
                          checkpoint_duty=getattr(args, "checkpoint_duty",
                                                  1.0 / 3.0),
                          profile_dir=args.profile_dir,
                          save_overlays=bool(getattr(args, "save_res", 0)),
                          # InternetStream imgnames are relative to the
                          # stream's images/ subdirectory (streams.py _load)
                          img_root=osp.join(paths.internet_root, "images"),
                          faces=system.smpls.neutral.faces,
                          defer_window=getattr(args, "defer_window", 32))
    W = getattr(args, "window_size", 1)
    state = system.engine.init_state(system.params, batch_size=W)
    _, summary = runner.run(stream, state, resume_from=args.resume,
                            max_frames=args.max_frames,
                            chunk_size=args.chunk_size, window_size=W,
                            auto_reset=bool(getattr(args, "auto_reset", 0)))
    return summary


if __name__ == "__main__":
    main()
