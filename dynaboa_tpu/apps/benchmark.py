#!/usr/bin/env python
"""3DPW #PS streaming benchmark: per-frame dynamic bilevel adaptation + eval.

CLI parity with reference ``dynaboa_benchmark.py`` (flags at 16-65): same
flag names, same defaults, same artifact/metric surface.  Runs on real 3DPW
npz extras when present; ``--synthetic N`` runs the identical pipeline on a
deterministic synthetic stream (CI / no-data environments).

Usage:
  python -m dynaboa_tpu.apps.benchmark --expdir exps --expname 3dpw
"""

from __future__ import annotations

import argparse
import os
import os.path as osp


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--expdir", type=str, default="exps")
    p.add_argument("--expname", type=str, default="3dpw")
    p.add_argument("--dataset", type=str, default="3dpw",
                   choices=["3dpw", "internet"])
    p.add_argument("--seed", type=int, default=22)
    p.add_argument("--seq_seed", type=int, default=22)
    p.add_argument("--model_file", type=str, default="data/basemodel.pt")
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--save_res", type=int, default=0, choices=[0, 1])

    p.add_argument("--lr", type=float, default=3e-6)
    p.add_argument("--beta1", type=float, default=0.5)
    p.add_argument("--beta2", type=float, default=0.9)

    p.add_argument("--use_boa", type=int, default=1, choices=[0, 1])
    p.add_argument("--fastlr", type=float, default=8e-6)
    p.add_argument("--inner_step", type=int, default=1)
    p.add_argument("--record_lowerlevel", type=int, default=1)
    p.add_argument("--s2dloss_weight", type=float, default=10)
    p.add_argument("--shape_prior_weight", type=float, default=2e-6)
    p.add_argument("--pose_prior_weight", type=float, default=1e-4)

    p.add_argument("--use_frame_losses_lower", type=int, default=1)
    p.add_argument("--use_frame_losses_upper", type=int, default=1)
    p.add_argument("--use_temporal_losses_lower", type=int, default=0)
    p.add_argument("--use_temporal_losses_upper", type=int, default=1)

    p.add_argument("--sample_num", type=int, default=1)
    p.add_argument("--retrieval", type=int, default=1, choices=[0, 1])

    p.add_argument("--dynamic_boa", type=int, default=1, choices=[0, 1])
    p.add_argument("--cos_sim_threshold", type=float, default=3.1e-4)
    p.add_argument("--optim_steps", type=int, default=7)

    p.add_argument("--lower_level_mixtrain", type=int, default=1)
    p.add_argument("--upper_level_mixtrain", type=int, default=1)
    p.add_argument("--labelloss_weight", type=float, default=0.1)

    p.add_argument("--use_meanteacher", type=int, default=1, choices=[0, 1])
    p.add_argument("--alpha", type=float, default=0.1)
    p.add_argument("--teacherloss_weight", type=float, default=0.1)

    p.add_argument("--use_motion", type=int, default=1, choices=[0, 1])
    p.add_argument("--interval", type=int, default=5)
    p.add_argument("--motionloss_weight", type=float, default=0.8)

    # framework extensions (not in the reference)
    p.add_argument("--synthetic", type=int, default=0,
                   help="run on N synthetic frames instead of 3DPW")
    p.add_argument("--max_frames", type=int, default=None)
    p.add_argument("--checkpoint_every", type=int, default=0)
    p.add_argument("--checkpoint_duty", type=float, default=1.0 / 3.0,
                   help="fraction of wall time the async checkpoint writer "
                        "may spend writing (bounds checkpoint bandwidth on "
                        "shared transports); 1.0 disables the cooldown — "
                        "use on fast local disks")
    p.add_argument("--resume", type=str, default=None)
    p.add_argument("--profile_dir", type=str, default=None)
    p.add_argument("--parallel_streams", type=int, default=0,
                   help="run N independent adaptation streams over the "
                        "device mesh (whole (seq, person) tracks per "
                        "stream, private weights each — the scale-out "
                        "mode; 0 = the reference's single sequential pass). "
                        "Reduced artifact set: res.txt only — no "
                        "scalars.jsonl / per-step npz / optim_step_record; "
                        "--save_res, --checkpoint_every/--resume, "
                        "--window_size, --chunk_size, --auto_reset and "
                        "--profile_dir do not apply and error if set")
    p.add_argument("--chunk_size", type=int, default=1,
                   help="frames per lax.scan dispatch (offline throughput)")
    p.add_argument("--window_size", type=int, default=1,
                   help="batched-window adaptation: W consecutive frames "
                        "share one bilevel update (higher MXU occupancy, "
                        "W-fold fewer updates/frame)")
    p.add_argument("--defer_window", type=int, default=32,
                   help="frames of device outputs queued before a host "
                        "fetch materializes them for logging")
    p.add_argument("--auto_reset", type=int, default=0, choices=[0, 1],
                   help="reset model/teacher/optimizer automatically when "
                        "adaptation diverges (non-finite loss/metrics)")
    p.add_argument("--tiny", type=int, default=0,
                   help="CI smoke mode: tiny network + body model")
    p.add_argument("--fused_preprocess", type=int, default=0, choices=[0, 1],
                   help="stream raw frames and crop/resize/normalize on "
                        "device (fused XLA gather graph)")
    p.add_argument("--compute_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="backbone conv precision (bfloat16 doubles MXU rate; "
                        "params/updates stay float32)")
    p.add_argument("--use_pallas_lbs", type=int, default=0, choices=[0, 1],
                   help="fused Pallas skinning kernel for no-grad SMPL "
                        "decodes (see tools/bench_lbs.py measurements)")
    return p


def cfg_from_args(args):
    from dynaboa_tpu.config import AdaptConfig

    return AdaptConfig(
        lr=args.lr, beta1=args.beta1, beta2=args.beta2,
        use_boa=bool(args.use_boa), fastlr=args.fastlr,
        inner_step=args.inner_step,
        record_lowerlevel=bool(args.record_lowerlevel),
        s2dloss_weight=args.s2dloss_weight,
        shape_prior_weight=args.shape_prior_weight,
        pose_prior_weight=args.pose_prior_weight,
        use_frame_losses_lower=bool(args.use_frame_losses_lower),
        use_frame_losses_upper=bool(args.use_frame_losses_upper),
        use_temporal_losses_lower=bool(args.use_temporal_losses_lower),
        use_temporal_losses_upper=bool(args.use_temporal_losses_upper),
        retrieval=bool(args.retrieval), sample_num=args.sample_num,
        lower_level_mixtrain=bool(args.lower_level_mixtrain),
        upper_level_mixtrain=bool(args.upper_level_mixtrain),
        labelloss_weight=args.labelloss_weight,
        dynamic_boa=bool(args.dynamic_boa),
        cos_sim_threshold=args.cos_sim_threshold,
        optim_steps=args.optim_steps,
        use_meanteacher=bool(args.use_meanteacher), alpha=args.alpha,
        teacherloss_weight=args.teacherloss_weight,
        use_motion=bool(args.use_motion), interval=args.interval,
        motionloss_weight=args.motionloss_weight,
        seed=args.seed,
        compute_dtype=getattr(args, "compute_dtype", "float32"),
        use_pallas_lbs=bool(getattr(args, "use_pallas_lbs", 0)),
    )


def main(argv=None):
    args = build_parser().parse_args(argv)
    exppath = osp.join(args.expdir, args.expname)
    os.makedirs(exppath, exist_ok=True)

    from dynaboa_tpu.apps.common import build_system, write_settings
    from dynaboa_tpu.config import Paths
    from dynaboa_tpu.data import PW3DStream, SyntheticStream
    from dynaboa_tpu.engine.runner import StreamRunner

    write_settings(exppath, args)
    cfg = cfg_from_args(args)
    paths = Paths(basemodel=args.model_file)
    tiny = dict(model_kwargs=dict(layers=(1, 1, 1, 1), width=16,
                                  regressor_dim=128),
                num_vertices=256) if args.tiny else {}
    system = build_system(cfg, paths, **tiny)
    if any(system.synthetic.values()):
        print(f"---> synthetic stand-ins active: "
              f"{[k for k, v in system.synthetic.items() if v]}")

    fused = bool(getattr(args, "fused_preprocess", 0))
    if args.synthetic:
        stream = SyntheticStream(num_frames=args.synthetic, seed=args.seq_seed,
                                 fused_preprocess=fused)
    else:
        stream = PW3DStream(paths.dataset_npz_path, paths.pw3d_root,
                            fused_preprocess=fused)
        stream.record_order(osp.join(exppath, "seq_order.record"))

    if args.parallel_streams:
        from dynaboa_tpu.parallel import streams as P

        # the parallel path produces the reduced artifact set (res.txt);
        # error rather than silently ignore sequential-only flags
        ignored = {"--save_res": args.save_res,
                   "--checkpoint_every": args.checkpoint_every,
                   "--resume": args.resume,
                   "--window_size": args.window_size != 1,
                   "--chunk_size": args.chunk_size != 1,
                   "--auto_reset": args.auto_reset,
                   "--profile_dir": args.profile_dir}
        bad = [k for k, v in ignored.items() if v]
        if bad:
            raise SystemExit(
                f"--parallel_streams does not support {', '.join(bad)}: "
                "the parallel path writes the reduced artifact set "
                "(res.txt) and runs streams without "
                "checkpoint/window/chunk/reset machinery")

        groups = P.partition_items(stream, args.parallel_streams)
        summary = P.run_parallel(system.engine, system.params, groups,
                                 keypoint_source=cfg.keypoint_source,
                                 progress_every=max(
                                     64, 64 * args.parallel_streams))
        with open(osp.join(exppath, "res.txt"), "w") as f:
            f.write(f"MPJPE:{summary['mpjpe']}, "
                    f"PAMPJPE:{summary['pampjpe']}, "
                    f"PVE:{summary['pve']}\n")
        return summary

    runner = StreamRunner(
        system.engine, exppath,
        save_predictions=bool(args.save_res),
        checkpoint_every=args.checkpoint_every,
        checkpoint_duty=getattr(args, "checkpoint_duty", 1.0 / 3.0),
        profile_dir=args.profile_dir,
        save_overlays=bool(args.save_res),
        img_root=paths.pw3d_root,
        faces=system.smpls.neutral.faces,
        defer_window=getattr(args, "defer_window", 32),
    )
    W = getattr(args, "window_size", 1)
    state = system.engine.init_state(system.params, batch_size=W)
    _, summary = runner.run(stream, state, resume_from=args.resume,
                            max_frames=args.max_frames,
                            chunk_size=args.chunk_size,
                            window_size=W,
                            auto_reset=bool(getattr(args, "auto_reset", 0)))
    return summary


if __name__ == "__main__":
    main()
