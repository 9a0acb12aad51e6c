#!/usr/bin/env python
"""Minimal repro for the per-frame host-RSS ratchet seen in run_parallel.

Loops device_put of a frame-sized (~600 KB) host array into a trivial jit,
drops every reference, trims the heap, and prints RSS — if RSS still grows
per iteration the retention is inside the platform client, not our code.
"""
import argparse
import ctypes

import numpy as np


def rss_mb():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0


def trim():
    try:
        ctypes.CDLL("libc.so.6").malloc_trim(0)
    except OSError:
        pass


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--every", type=int, default=200)
    ap.add_argument("--mode", default="stepdrop",
                    choices=["put_only", "stepdrop", "sync", "threadput",
                             "noput", "tiny", "reuse", "jitarg", "delete",
                             "gc"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print("device:", dev, flush=True)

    @jax.jit
    def step(x):
        return jnp.float32(x.sum())

    outs = []
    from concurrent.futures import ThreadPoolExecutor
    pool = ThreadPoolExecutor(max_workers=2)

    # warmup
    step(jax.device_put(np.zeros((224, 224, 3), np.float32), dev))

    shared = np.zeros((224, 224, 3), np.float32)
    base = None
    for i in range(args.iters):
        shape = (16, 16) if args.mode == "tiny" else (224, 224, 3)
        host = np.random.default_rng(i).normal(size=shape).astype(np.float32)
        if args.mode == "noput":
            pass
        elif args.mode in ("put_only", "tiny"):
            jax.device_put(host, dev)
        elif args.mode == "delete":
            x = jax.device_put(host, dev)
            o = step(x)
            x.delete()
            outs.append(o)
        elif args.mode == "gc":
            import gc
            x = jax.device_put(host, dev)
            outs.append(step(x))
            del x
            if i % 50 == 0:
                gc.collect()
        elif args.mode == "reuse":
            np.copyto(shared, host)
            outs.append(step(jax.device_put(shared, dev)))
        elif args.mode == "jitarg":
            outs.append(step(host))     # let jit do the transfer itself
        elif args.mode == "threadput":
            x = pool.submit(jax.device_put, host, dev).result()
            outs.append(step(x))
        else:
            x = jax.device_put(host, dev)
            o = step(x)
            if args.mode == "sync":
                o.block_until_ready()
            outs.append(o)
        del host
        if len(outs) >= 64:
            np.asarray(outs[0])     # force at least one executed
            outs.clear()
        if i % args.every == 0:
            trim()
            r = rss_mb()
            if base is None:
                base = r
            print(f"iter {i:6d}  RSS {r:8.1f} MB  (+{r - base:7.1f})",
                  flush=True)
    trim()
    print(f"final RSS {rss_mb():.1f} MB (+{rss_mb() - base:.1f} over "
          f"{args.iters} iters)", flush=True)


if __name__ == "__main__":
    main()
