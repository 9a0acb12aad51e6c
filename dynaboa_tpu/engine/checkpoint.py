"""Bit-exact checkpoint / resume for streaming adaptation.

The reference can only *load* its pretrained basemodel — state is never saved
mid-run, so a crashed stream cannot resume (SURVEY §5).  Here the checkpoint
is the full ``AdaptState`` (params, teacher params, Adam moments, history
ring, frame index, rng key), so a stream resumes bit-exactly.
"""

from __future__ import annotations

import os

import jax
import numpy as np

from dynaboa_tpu.engine.bilevel import AdaptState


def save_state(path: str, state: AdaptState) -> None:
    """Serialize the full adaptation state to one .npz file."""
    leaves, treedef = jax.tree.flatten(state)
    arrays = {f"leaf_{i:04d}": np.asarray(x) for i, x in enumerate(leaves)}
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **arrays)


def load_state(path: str, template: AdaptState) -> AdaptState:
    """Restore a checkpoint into the structure of ``template`` (the treedef
    carries the pytree layout; array dtypes/shapes must match)."""
    data = np.load(path)
    leaves, treedef = jax.tree.flatten(template)
    restored = []
    for i, leaf in enumerate(leaves):
        arr = data[f"leaf_{i:04d}"]
        if hasattr(leaf, "dtype") and arr.shape != np.shape(leaf):
            raise ValueError(
                f"checkpoint leaf {i} shape {arr.shape} != template "
                f"{np.shape(leaf)}")
        restored.append(jax.numpy.asarray(arr, dtype=getattr(leaf, "dtype", None)))
    return jax.tree.unflatten(treedef, restored)
