"""Bit-exact checkpoint / resume for streaming adaptation.

The reference can only *load* its pretrained basemodel — state is never saved
mid-run, so a crashed stream cannot resume (SURVEY §5).  Here the checkpoint
is the full ``AdaptState`` (params, teacher params, Adam moments, history
ring, frame index, rng key), so a stream resumes bit-exactly.

Fetch path: the state's ~300 leaves are packed on device into one flat
buffer per dtype (one small jitted concat) and fetched in a handful of
transfers.  A leaf-by-leaf ``np.asarray`` fetch costs one blocking tunnel
round trip per leaf (~31 ms each on the axon setup, docs/PERF.md) — ~10 s
of pure latency per 434 MB full-model checkpoint before transfer time.
The on-disk format (``leaf_%04d`` npz entries) is unchanged.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from dynaboa_tpu.engine.bilevel import AdaptState

_pack_cache: dict = {}


def _pack_by_dtype(leaves):
    """Concatenate raveled leaves into one 1-D array per dtype."""
    groups: dict[str, list] = {}
    for leaf in leaves:
        groups.setdefault(str(leaf.dtype), []).append(leaf.ravel())
    return {k: jnp.concatenate(v) if len(v) > 1 else v[0]
            for k, v in groups.items()}


def _pack_state(state: AdaptState):
    """Snapshot the state into per-dtype flat device buffers (one small
    jitted concat).  The returned buffers are independent of the state's own
    buffers, so the caller may keep adapting (donating the live state) while
    these are fetched/written in the background."""
    leaves, _ = jax.tree.flatten(state)
    # non-array leaves (python scalars in opt_state etc.) pass through
    arr_idx = [i for i, l in enumerate(leaves) if hasattr(l, "dtype")]
    arrs = [leaves[i] for i in arr_idx]
    key = tuple((str(a.dtype), a.shape) for a in arrs)
    if key not in _pack_cache:
        _pack_cache[key] = jax.jit(_pack_by_dtype)
    packed = _pack_cache[key](arrs)
    for buf in packed.values():
        try:
            buf.copy_to_host_async()
        except (AttributeError, NotImplementedError):
            pass
    return leaves, arr_idx, arrs, packed


def _write_packed(path: str, leaves, arr_idx, arrs, packed) -> None:
    host = {k: np.asarray(v) for k, v in packed.items()}
    offs = {k: 0 for k in host}
    out = list(leaves)
    for i, a in zip(arr_idx, arrs):
        k = str(a.dtype)
        n = int(np.prod(a.shape)) if a.shape else 1
        out[i] = host[k][offs[k]:offs[k] + n].reshape(a.shape)
        offs[k] += n
    arrays = {f"leaf_{i:04d}": np.asarray(x) for i, x in enumerate(out)}
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:   # file object: savez must not append ".npz"
        np.savez(f, **arrays)
    os.replace(tmp, path)       # atomic: a crash never leaves a torn file


def fetch_state(state: AdaptState) -> list[np.ndarray]:
    """Device->host fetch of every leaf via per-dtype packed buffers.

    A leaf-by-leaf fetch costs one blocking round trip per leaf; packed,
    the full-model 434 MB state moves in a handful of transfers (warm
    save 70 s -> 14 s measured on the tunneled TPU)."""
    leaves, arr_idx, arrs, packed = _pack_state(state)
    host = {k: np.asarray(v) for k, v in packed.items()}
    offs = {k: 0 for k in host}
    out = list(leaves)
    for i, a in zip(arr_idx, arrs):
        k = str(a.dtype)
        n = int(np.prod(a.shape)) if a.shape else 1
        out[i] = host[k][offs[k]:offs[k] + n].reshape(a.shape).copy()
        offs[k] += n
    return out


def save_state(path: str, state: AdaptState) -> None:
    """Serialize the full adaptation state to one .npz file."""
    _write_packed(path, *_pack_state(state))


class AsyncCheckpointer:
    """Checkpoint without stalling the dispatch loop.

    ``submit`` snapshots the state on device (a ~ms pack dispatch) and hands
    the fetch + npz write to a worker thread — the device->host transfer and
    the (atomic) file write overlap subsequent adaptation dispatches; numpy
    releases the GIL for the transfer, so even this 1-core host keeps
    dispatching.  At most one write is in flight: a new submit first joins
    the previous one (checkpoints are ordered, never interleaved)."""

    def __init__(self):
        self._thread = None

    def submit(self, path: str, state: AdaptState) -> None:
        import threading

        self.wait()
        args = _pack_state(state)
        self._thread = threading.Thread(
            target=_write_packed, args=(path,) + args, daemon=True)
        self._thread.start()

    def wait(self) -> None:
        if self._thread is not None:
            self._thread.join()
            self._thread = None


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
