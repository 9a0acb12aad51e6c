#!/usr/bin/env python
"""Build the source-exemplar retrieval store from scratch.

The reference ships its retrieval assets precomputed (joblib files under
data/retrieval_res, loaded at base_adaptor.py:74-80); this tool regenerates
them from any labeled source archive: run the base model over every exemplar
crop, pool the 2048-d feature (tap 5), k-means cluster, and write an npz the
framework can load (or keep in memory).

Usage:
  python tools/build_retrieval.py --source data/retrieval_res/h36m_... \
      --h36m-root /data/h36m --out data/retrieval_res/clusters.npz \
      [--clusters 10]
"""

from __future__ import annotations

import argparse

import numpy as np


def kmeans(feats: np.ndarray, k: int, iters: int = 50, seed: int = 0):
    """Numpy k-means over cosine-normalized features with k-means++ seeding
    (uniform seeding can drop a true cluster when two seeds land in one)."""
    rng = np.random.default_rng(seed)
    f = feats / np.maximum(np.linalg.norm(feats, axis=1, keepdims=True), 1e-12)
    # k-means++: each next seed drawn proportional to cosine distance from
    # the nearest already-chosen seed
    seeds = [rng.integers(len(f))]
    for _ in range(1, k):
        d = np.min(1.0 - f @ f[seeds].T, axis=1)
        d = np.maximum(d, 0.0)
        p = d / d.sum() if d.sum() > 0 else None
        seeds.append(int(rng.choice(len(f), p=p)))
    centers = f[seeds].copy()
    assign = np.zeros(len(f), np.int64)
    for _ in range(iters):
        sims = f @ centers.T
        new_assign = sims.argmax(1)
        if (new_assign == assign).all():
            break
        assign = new_assign
        for c in range(k):
            members = f[assign == c]
            if len(members):
                centers[c] = members.mean(0)
                centers[c] /= max(np.linalg.norm(centers[c]), 1e-12)
    return centers, assign


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", required=True,
                    help="joblib/npz source-exemplar archive")
    ap.add_argument("--h36m-root", required=True)
    ap.add_argument("--basemodel", default="data/basemodel.pt")
    ap.add_argument("--out", required=True)
    ap.add_argument("--clusters", type=int, default=10)
    args = ap.parse_args()

    import jax
    from dynaboa_tpu.data.source import load_source_exemplars
    from dynaboa_tpu.models.hmr import load_basemodel

    bank = load_source_exemplars(args.source, args.h36m_root)
    model, params = load_basemodel(args.basemodel)

    @jax.jit
    def feat(img):
        _, _, _, feats = model.apply({"params": params}, img)
        return feats[5]

    feats = np.concatenate([
        np.asarray(feat(bank.images[i:i + 8]))
        for i in range(0, bank.images.shape[0], 8)
    ])
    centers, assign = kmeans(feats, args.clusters)
    np.savez(args.out, centers=centers, assignments=assign, feats=feats)
    sizes = np.bincount(assign, minlength=args.clusters)
    print(f"wrote {args.out}: {args.clusters} clusters, sizes {sizes}")


if __name__ == "__main__":
    main()
