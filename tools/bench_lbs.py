#!/usr/bin/env python
"""Microbenchmark: einsum LBS vs the fused Pallas skinning kernel.

Decides whether AdaptConfig.use_pallas_lbs pays off on the current platform
(VERDICT r1 item 5).  Runs the full 6890-vertex SMPL decode at B in {1, 8, 40}
and prints per-path step times.

Usage:  python tools/bench_lbs.py            # on the TPU
        JAX_PLATFORMS=cpu python tools/bench_lbs.py --interpret
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true",
                    help="run the Pallas kernel in interpret mode (CPU)")
    ap.add_argument("--batches", type=int, nargs="+", default=[1, 8, 40])
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import dynaboa_tpu

    dynaboa_tpu.enable_compilation_cache()

    from dynaboa_tpu.kernels.lbs import PallasSMPL
    from dynaboa_tpu.models.smpl import lbs, synthetic_smpl_model
    from dynaboa_tpu.ops.rotations import batch_rodrigues

    model = synthetic_smpl_model(seed=0)
    pal = PallasSMPL(model, interpret=args.interpret)
    ein = jax.jit(lambda b, r: lbs(model, b, r))

    print(f"backend: {jax.default_backend()}  V={model.v_template.shape[0]}")
    rng = np.random.default_rng(0)
    for B in args.batches:
        betas = jnp.asarray(rng.normal(scale=0.3, size=(B, 10)),
                            jnp.float32)
        pose = jnp.asarray(rng.normal(scale=0.2, size=(B, 72)), jnp.float32)
        rotmats = batch_rodrigues(pose.reshape(-1, 3)).reshape(-1, 24, 3, 3)
        rotmats = jax.block_until_ready(rotmats)

        results = {}
        for name, fn in (("einsum", ein), ("pallas", pal)):
            v, j = fn(betas, rotmats)          # compile + warmup
            jax.block_until_ready(v)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                v, j = fn(betas, rotmats)
            jax.block_until_ready(v)
            results[name] = (time.perf_counter() - t0) / args.iters * 1e6

        # correctness cross-check while we're here
        ve, _ = ein(betas, rotmats)
        vp, _ = pal(betas, rotmats)
        err = float(jnp.max(jnp.abs(ve - vp)))
        win = "pallas" if results["pallas"] < results["einsum"] else "einsum"
        print(f"B={B:3d}  einsum {results['einsum']:9.1f} us   "
              f"pallas {results['pallas']:9.1f} us   -> {win} "
              f"(max |diff| {err:.2e})")


if __name__ == "__main__":
    main()
