#!/usr/bin/env python
"""Run the full-model-scale composed parity harness and record the evidence.

Torch mirror runs on CPU; the engine runs on the default backend (the TPU on
the bench host) with float32 matmul precision forced to 'highest' so TPU
matmul rounding does not pollute the torch comparison.  Writes
``PARITY_FULLSCALE.json`` at the repo root — the committed record the
opt-in pytest (tests/test_fullscale_parity.py) mirrors.

Usage:  python tools/fullscale_parity.py [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import sys
import time

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, osp.join(ROOT, "tests"))


def merge_record(existing: dict, res: dict, retrieval: bool) -> dict:
    """Merge a fresh parity record with the on-disk one so neither arm
    clobbers the other: a --retrieval run nests under ``retrieval_on``
    (preserving the base record), and a base run replaces only the base
    keys (preserving a previously recorded retrieval_on arm — it costs
    tens of CPU-minutes to regenerate)."""
    if retrieval:
        existing = dict(existing)
        existing["retrieval_on"] = res
        return existing
    res = dict(res)
    if "retrieval_on" in existing:
        res["retrieval_on"] = existing["retrieval_on"]
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true",
                    help="force the engine onto the CPU backend")
    ap.add_argument("--frames", type=int, default=3,
                    help="composed frames to run (>=3 pins the multi-frame "
                         "Adam chain, teacher EMA drift and history-ring "
                         "interaction at full scale — VERDICT r3 item 5)")
    ap.add_argument("--retrieval", action="store_true",
                    help="turn on-device exemplar retrieval ON (singleton-"
                         "cluster store; pins per-update cluster choice at "
                         "full backbone scale — VERDICT r4 item 9).  The "
                         "record lands under the 'retrieval_on' key next to "
                         "the base run")
    ap.add_argument("--out", default=osp.join(ROOT, "PARITY_FULLSCALE.json"))
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    import dynaboa_tpu

    dynaboa_tpu.enable_compilation_cache()

    from test_fullscale_parity import check_fullscale, run_fullscale

    # Load the existing record BEFORE the tens-of-CPU-minutes run: a
    # corrupt/truncated file (e.g. a previous run killed mid-dump) must
    # fail the merge up front — or degrade to a fresh record with a loud
    # warning — not crash after the expensive parity run completes.
    existing = {}
    if osp.exists(args.out):
        try:
            with open(args.out) as f:
                loaded = json.load(f)
            if isinstance(loaded, dict):
                existing = loaded
            else:
                print(f"WARNING: {args.out} is not a JSON object; "
                      f"starting a fresh record", file=sys.stderr)
        except (OSError, ValueError) as e:
            print(f"WARNING: could not read existing {args.out} ({e}); "
                  f"starting a fresh record", file=sys.stderr)

    t0 = time.time()
    res = run_fullscale(n_frames=args.frames, retrieval=args.retrieval)
    res["wall_seconds"] = round(time.time() - t0, 1)
    res["backend"] = jax.default_backend()
    check_fullscale(res)
    res["checks"] = "PASSED (step counts equal, losses rtol<=5e-3, "
    res["checks"] += "weight/teacher drift under the Adam bound, sims atol<=5e-4)"
    res = merge_record(existing, res, args.retrieval)
    # atomic replace: a killed run must never leave a truncated record
    tmp = args.out + ".tmp"
    with open(tmp, "w") as f:
        json.dump(res, f, indent=1)
    os.replace(tmp, args.out)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
