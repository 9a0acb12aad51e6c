#!/usr/bin/env python
"""Attribute the worst-case ~8 ms/update floor to its components.

VERDICT r3 item 1 asked either to push the forced-gate worst case above
20 fps or to prove the per-update floor irreducible.  Both flag-gated
protocol-divergence experiments (``fast_extra_updates`` dropping the
exemplar row from extra gradients, ``probe_res_factor`` halving the probe
resolution) measured flat (~16 fps, BENCH r4) — evidence the floor is not
FLOP-bound.  This tool pins that down by timing each component of one
dynamic update (reference protocol: dynaboa_benchmark.py:147-192) as its
own scanned jitted program:

* ``grad``            — value_and_grad of the upper-level loss (the batched
                        backbone fwd+bwd over frame+history+exemplars)
* ``fwd_batched``     — the same batched forward WITHOUT the backward
* ``fwd1``            — a B=1 backbone forward (the teacher forward and the
                        post-update convergence probe each cost one)
* ``adam_ema``        — outer Adam update + teacher EMA over the full tree
* ``decode_metrics``  — B=1 SMPL decode + MPJPE/PA-MPJPE/PVE record

Each arm runs ``--iters`` iterations inside ONE ``lax.scan`` program
(dispatch overhead amortized away; the loop body's input depends on the
carry so XLA cannot hoist it), traced through the engine's
``_inject_assets`` seam so assets ride as arguments, and is timed with a
host value fetch (docs/PERF.md: ``block_until_ready`` is unreliable
here).  Per-arm XLA FLOP estimates (``compiled.cost_analysis()``) give a
speed-of-light comparison against the v5e MXU.

Usage:  python tools/profile_update_floor.py [--iters 64] [--cpu]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    import dynaboa_tpu

    dynaboa_tpu.enable_compilation_cache()

    import bench
    from dynaboa_tpu.config import AdaptConfig

    cfg = AdaptConfig(record_lowerlevel=False, compute_dtype=args.dtype)
    system = bench.build(cfg)
    eng = system.engine
    frame = bench.make_frames(1)[0]
    assets = eng._assets

    # -- reproduce the worst-case per-update cost with the REAL program ----
    state = eng.init_state(system.params)
    state, out = eng.step(state, frame, cos_sim_threshold=-1.0)
    float(np.asarray(out["mpjpe"]).sum())       # compile + service warmup
    n_rep, t0 = 12, time.perf_counter()
    for _ in range(n_rep):
        state, out = eng.step(state, frame, cos_sim_threshold=-1.0)
    float(np.asarray(out["mpjpe"]).sum())
    frame_ms = (time.perf_counter() - t0) / n_rep * 1e3
    n_upd = 1 + cfg.optim_steps
    print(f"[full-step] {frame_ms:.1f} ms/frame at {n_upd} updates "
          f"-> {frame_ms / n_upd:.2f} ms/update (forced gate)", flush=True)

    params = state.params
    teacher = state.teacher_params

    results = {"full_step_ms_per_frame": round(frame_ms, 2),
               "updates_per_frame": n_upd,
               "full_step_ms_per_update": round(frame_ms / n_upd, 3),
               "iters": args.iters, "dtype": args.dtype,
               "arms": {}}

    def run_arm(label, make_body, carry0, extra_args=()):
        """Time `iters` scanned iterations of make_body as one program."""
        def prog(carry, frame_, state_, teacher_, assets_, *extra):
            with eng._inject_assets(assets_):
                body = make_body(frame_, state_, teacher_, *extra)

                def f(c, _):
                    return body(c), None

                carry, _ = jax.lax.scan(f, carry, None, length=args.iters)
            return carry

        jf = jax.jit(prog)
        t0 = time.perf_counter()
        c = jf(carry0, frame, state, teacher, assets, *extra_args)
        leaf = jax.tree.leaves(c)[0]
        float(np.asarray(leaf).reshape(-1)[0])
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        c = jf(carry0, frame, state, teacher, assets, *extra_args)
        leaf = jax.tree.leaves(c)[0]
        float(np.asarray(leaf).reshape(-1)[0])
        per_ms = (time.perf_counter() - t0) / args.iters * 1e3
        flops = None
        try:
            ca = (jf.lower(carry0, frame, state, teacher, assets,
                           *extra_args).compile().cost_analysis())
            if ca:
                flops = float(ca.get("flops", 0.0)) / args.iters
        except Exception:
            pass
        sol = ""
        if flops:
            # v5e bf16 MXU peak ~197 TFLOP/s
            sol_ms = flops / 197e12 * 1e3
            sol = (f"; {flops / 1e9:.2f} GFLOP/iter, MXU speed-of-light "
                   f"{sol_ms:.3f} ms -> {100 * sol_ms / per_ms:.1f}% util")
        print(f"[{label}] {per_ms:.3f} ms/iter "
              f"(compile+warm {compile_s:.1f}s){sol}", flush=True)
        results["arms"][label] = {
            "ms_per_iter": round(per_ms, 4),
            "gflop_per_iter": round(flops / 1e9, 3) if flops else None,
        }
        return per_ms

    # feedback coupling: output scalar folded into the carry at ~0 weight so
    # consecutive iterations are data-dependent (no hoisting/DCE), without
    # perturbing the numbers being timed
    def couple(tree, scalar):
        eps = jnp.asarray(1e-20, jnp.float32)
        return jax.tree.map(
            lambda a: a + (eps * scalar).astype(a.dtype), tree)

    # -- arm: batched upper-level gradient ---------------------------------
    def grad_body(frame_, state_, teacher_):
        _, _, _, feats = eng._forward(state_.params, frame_.image)
        bank = eng._retrieve(feats[5][0], jax.random.PRNGKey(0))

        def body(p):
            (_, (_, _)), g = jax.value_and_grad(
                eng._level_loss, has_aux=True
            )(p, frame_, state_, bank, "upper", teacher_)
            return jax.tree.map(lambda a, b: a - 1e-6 * b.astype(a.dtype),
                                p, g)

        return body

    grad_ms = run_arm("grad(batched fwd+bwd)", grad_body, params)

    # -- arm: the same batched forward, no backward ------------------------
    def fwdb_body(frame_, state_, teacher_):
        _, _, _, feats = eng._forward(state_.params, frame_.image)
        bank = eng._retrieve(feats[5][0], jax.random.PRNGKey(0))
        slot = state_.step % eng.cfg.interval
        x = jnp.concatenate(
            [frame_.image, state_.hist_images[slot], bank.images], axis=0)
        print(f"    (batched rows: {x.shape[0]})", flush=True)

        def body(p):
            rotmat, shape, cam, _ = eng._forward(p, x)
            return couple(p, rotmat.sum() + shape.sum() + cam.sum())

        return body

    fwdb_ms = run_arm("fwd_batched", fwdb_body, params)

    # -- arm: B=1 forward (teacher / probe each cost one) ------------------
    def fwd1_body(frame_, state_, teacher_):
        def body(p):
            rotmat, shape, cam, feats = eng._forward(p, frame_.image)
            return couple(p, rotmat.sum() + feats[12].sum())

        return body

    fwd1_ms = run_arm("fwd1(probe/teacher)", fwd1_body, params)

    # -- arm: Adam + teacher EMA over the full tree ------------------------
    def adam_body(frame_, state_, teacher_):
        grads = jax.tree.map(lambda a: 1e-6 * jnp.ones_like(a), params)

        def body(c):
            p, o, t = c
            p, o = eng._outer_update(grads, p, o)
            t = eng._ema_teacher(t, p)
            return (p, o, t)

        return body

    adam_ms = run_arm("adam_ema", adam_body,
                      (params, state.opt_state, teacher))

    # -- arm: B=1 SMPL decode + metric record ------------------------------
    def dm_body(frame_, state_, teacher_):
        from dynaboa_tpu.metrics.eval import gt_targets

        rotmat, shape, _, _ = eng._forward(state_.params, frame_.image)
        tgt = gt_targets(eng.smpls, frame_.pose, frame_.betas,
                         frame_.gender)

        def body(acc):
            r = couple(rotmat, acc)
            _, verts = eng._decode(r, shape, no_grad=True)
            m = eng._metrics(verts, frame_, tgt)
            return acc + m["mpjpe"].sum().astype(jnp.float32)

        return body

    dm_ms = run_arm("decode_metrics", dm_body, jnp.zeros((), jnp.float32))

    parts = grad_ms + 2 * fwd1_ms + adam_ms + dm_ms
    print(f"\n[sum] grad {grad_ms:.2f} + 2xfwd1 {2 * fwd1_ms:.2f} "
          f"+ adam_ema {adam_ms:.2f} + decode_metrics {dm_ms:.2f} "
          f"= {parts:.2f} ms vs measured {frame_ms / n_upd:.2f} ms/update",
          flush=True)
    bwd_ms = grad_ms - fwdb_ms
    print(f"[split] batched fwd {fwdb_ms:.2f} ms, backward+rest of grad "
          f"{bwd_ms:.2f} ms", flush=True)
    results["sum_ms"] = round(parts, 3)
    results["grad_minus_fwd_ms"] = round(bwd_ms, 3)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
